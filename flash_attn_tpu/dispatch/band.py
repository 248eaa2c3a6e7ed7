"""Static packed band grids — TPU-native causal/local load balancing.

The reference balances causal tile load with dynamic schedulers
(hopper/tile_scheduler.hpp:493 ``SingleTileBwdLPT``,
flash_attn/cute/tile_scheduler.py:458 ``SingleTileLPTScheduler`` — atomic
work-stealing over a reordered tile space). TPUs have no global atomics and
(on v5e) a single sequential core, so load *imbalance across cores* is not
the problem — the cost is the skipped grid iterations themselves: a
rectangular (q_block, kv_block) grid still pays DMA-issue + barrier overhead
for every out-of-band iteration it predicates away (measured 85 vs 137 TF/s
causal/non-causal on v5e, round 1).

The TPU-native answer is *static grid packing*: every attention mask the
kernels support (causal, sliding window, chunked, sink) yields a static
per-q-block KV band [j_min[i], j_max[i]] computable in Python at trace time.
We enumerate only the in-band (i, j) pairs in a single flat grid dimension
of length T = sum(lengths), and decode i(t), j(t) inside index maps with
pure arithmetic on Python-constant prefix sums (index maps must not read
scalar-prefetch memory — that stalls the Mosaic compile, DESIGN.md).
"""

import bisect
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp


def kv_band_static(
    nq: int,
    nk: int,
    block_q: int,
    block_k: int,
    shift: int,
    causal: bool,
    window_left: Optional[int],
    window_right: Optional[int],
    sink_token_length: int,
    attention_chunk: int,
) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """Python mirror of kernels.flash_fwd._kv_block_bounds.

    Returns (j_min, j_max) per q block as Python int tuples. Empty bands
    (fully-masked q rows, e.g. seqlen_q > seqlen_k causal tops) are clamped
    to the single block [0, 0] so the row still gets one fully-masked
    iteration (the kernel's -inf mask produces out=0 / lse=-inf there).
    """
    j_min_l, j_max_l = [], []
    for i in range(nq):
        j_max = nk - 1
        wr = 0 if causal else window_right
        if causal or wr is not None:
            col_hi = i * block_q + (block_q - 1) + shift + wr
            j_max = min(j_max, col_hi // block_k)
        j_min = 0
        if window_left is not None and sink_token_length == 0:
            col_lo = i * block_q + shift - window_left
            j_min = max(0, col_lo // block_k)
        if attention_chunk > 0 and sink_token_length == 0 \
                and window_left is None:
            rs = i * block_q + shift
            col_lo = rs - rs % attention_chunk
            j_min = max(0, col_lo // block_k)
        j_min = min(j_min, nk - 1)
        if j_max < j_min:
            j_min, j_max = 0, 0
        j_min_l.append(j_min)
        j_max_l.append(j_max)
    return tuple(j_min_l), tuple(j_max_l)


class PackedBand:
    """Flat enumeration of in-band (i, j) tile pairs, row-major.

    t runs over [0, T); row i owns t in [tri[i], tri[i+1]) and maps to
    j = j_min[i] + (t - tri[i]). ``decode`` builds i/j/row-start/row-end as
    traced scalars from Python-constant tables (select chains — cheap on
    the scalar core, legal in index maps).
    """

    def __init__(self, j_min: Sequence[int], j_max: Sequence[int]):
        self.j_min = tuple(int(x) for x in j_min)
        self.j_max = tuple(int(x) for x in j_max)
        self.nq = len(self.j_min)
        tri = [0]
        for lo, hi in zip(self.j_min, self.j_max):
            tri.append(tri[-1] + (hi - lo + 1))
        self.tri = tuple(tri)
        self.num_tiles = tri[-1]
        # Closed-form decode (causal triangles): when every row starts at
        # j=0 and row lengths are affine (L[i] = g*i + f, the pure-causal
        # shape for bq % bk == 0), tri is quadratic and i(t) is one scalar
        # sqrt + a +-1 correction, replacing the ~4*nq select chain.
        # MEASURED (v5e): the scalar f32 sqrt is EXPENSIVE — at nq=8 the
        # sqrt decode lost 4-7% (causal fwd 94.5 -> 87.7, fused bwd
        # 86.6 -> 82.8) vs the chain, so it only engages where the chain
        # is long enough to lose (nq > 32); short bands keep the chain.
        self._affine = None
        if self.nq > 32 and all(lo == 0 for lo in self.j_min):
            lengths = [hi + 1 for hi in self.j_max]
            g = lengths[1] - lengths[0]
            if g >= 0 and all(
                    lengths[m + 1] - lengths[m] == g
                    for m in range(self.nq - 1)):
                self._affine = (g, lengths[0])

    @property
    def is_rectangular(self) -> bool:
        return all(lo == 0 for lo in self.j_min) and all(
            hi == self.j_max[0] for hi in self.j_max)

    def decode(self, t):
        """t (traced int32) -> (i, j, t_row_first, t_row_last)."""
        if self._affine is not None:
            g, f = self._affine

            def tri(m):
                # tri[m] = g*m*(m-1)/2 + f*m, exact in int32
                return (g * m * (m - 1)) // 2 + f * m

            if g == 0:
                i0 = t // f
            else:
                # max i with (g/2) i^2 + (f - g/2) i <= t; f32 sqrt
                # estimate, exact integer +-1 correction below.
                bb = float(f) - g / 2.0
                tf = t.astype(jnp.float32)
                est = (jnp.sqrt(bb * bb + 2.0 * g * tf) - bb) / float(g)
                i0 = est.astype(jnp.int32)
            i0 = jnp.clip(i0, 0, self.nq - 1)
            # row i owns t iff tri(i) <= t < tri(i+1); est is within +-1
            i = jnp.where(tri(i0) > t, i0 - 1, i0)
            i = jnp.where(
                jnp.logical_and(i < self.nq - 1, tri(i + 1) <= t), i + 1, i)
            start = tri(i)
            return i, t - start, start, tri(i + 1) - 1
        i = jnp.int32(0)
        start = jnp.int32(0)
        jmin = jnp.int32(self.j_min[0])
        last = jnp.int32(self.tri[1] - 1)
        for m in range(1, self.nq):
            c = t >= self.tri[m]
            i = jnp.where(c, jnp.int32(m), i)
            start = jnp.where(c, jnp.int32(self.tri[m]), start)
            jmin = jnp.where(c, jnp.int32(self.j_min[m]), jmin)
            last = jnp.where(c, jnp.int32(self.tri[m + 1] - 1), last)
        j = jmin + (t - start)
        return i, j, start, last

    def i_of(self, t):
        return self.decode(t)[0]

    def j_of(self, t):
        return self.decode(t)[1]

    def row_of(self, t_py: int) -> int:
        """Python-side decode (for tests)."""
        return bisect.bisect_right(self.tri, t_py) - 1
