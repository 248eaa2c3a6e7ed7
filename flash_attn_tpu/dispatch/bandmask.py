"""Precomputed additive band masks — one-VPU-pass causal masking.

The causal/right-window mask costs two full VPU passes per (bq, bk) tile
(broadcast compare + select) inside kernels that are VPU-bound (measured:
non-causal fwd 137 TF/s vs causal 94.5 on v5e — the mask is the bulk of the
gap; the reference hides this cost in spare CUDA warp issue slots, TPUs
cannot). Branching the mask away regressed twice (Mosaic loses its software
pipeline across scalar branches; see flash_fwd.py / flash_bwd_fused.py
NOTEs), so the remaining lever is making the mask itself one op.

MEASURED RESULT (v5e, 2026-08-17): the one-add scheme is NOT a win — fwd
causal 94.5 -> 93-96 (noise), fused bwd causal 86.6 -> 83.1. The compare+
select it replaces runs on register-resident iotas (near-free on the VPU),
while the mask-slice add costs a genuine VMEM->vreg load pass per tile
(bq*bk*4 bytes). A no-mask perf probe bounds the entire causal mask cost at
~4-6% (96 -> 100.2 TF/s), so no mask scheme can buy more than that.
``ENABLE`` below therefore defaults to False; the machinery is kept for
hardware where VMEM loads are cheaper relative to VPU ops, and as the
measured record of why the "obvious" optimization is off.

Scheme: every right-edge mask ``valid = col <= row + r_tile`` with
``r_tile = i*bq + (shift + wr) - j*bk`` is an additive bias that is a
*column-shifted slice of one static band matrix*. Precompute

    M[r, c] = 0 if c <= r + c0 else -inf,  c0 = bk + rho,
    rho = (shift + wr) mod 128

of shape (bq, bq + 2*bk) f32, keep it resident in VMEM (constant index map
-> fetched once), and per tile add ``M[:, o : o+bk]`` with the 128-aligned
dynamic lane offset ``o = clip(c0 - r_tile, 0, bq+bk)``:

 - full tiles (r_tile >= bk + rho): o clamps to 0, the slice is all-zero
   (c < bk <= c0), the add is a no-op numerically;
 - diagonal tiles: the slice IS the causal mask (-inf where col > row + r);
 - fully-masked rows (e.g. strict-causal row 0) get all -inf, reproducing
   the kernels' existing -inf/-inf -> lse=-inf, out=0 contract exactly.

o is always a multiple of 128 because bq, bk are multiples of 128 and rho
absorbs (shift + wr) mod 128 — so the dynamic slice stays lane-aligned for
ANY static shift/window (cross-seqlen causal, strict causal, pure right
windows). Eligibility is decided statically in `band_mask_config`.
"""

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")

# Off by default: measured slower than the register-iota compare+select on
# v5e (see module docstring). Flip for A/B probes on other TPU generations.
ENABLE = False


@dataclass(frozen=True)
class BandMaskCfg:
    """Static parameters of the additive band mask fast path."""
    edge: int      # shift + wr: valid iff col <= row + (i*bq - j*bk + edge)
    rho: int       # edge mod 128
    block_q: int
    block_k: int
    max_o: int     # largest in-band slice offset (128-multiple)

    @property
    def c0(self) -> int:
        return self.block_k + self.rho

    @property
    def width(self) -> int:
        return self.max_o + self.block_k

    def build(self) -> jax.Array:
        """The (bq, bq + 2*bk) f32 additive mask, 0 in-band / -inf out."""
        rows = jnp.arange(self.block_q, dtype=jnp.int32)[:, None]
        cols = jnp.arange(self.width, dtype=jnp.int32)[None, :]
        return jnp.where(cols <= rows + self.c0, 0.0, NEG_INF).astype(
            jnp.float32)

    def offset(self, i, j):
        """Traced 128-aligned lane offset for tile (i, j)."""
        r_tile = i * self.block_q + self.edge - j * self.block_k
        return jnp.clip(self.c0 - r_tile, 0, self.max_o)


def band_mask_config(
    *,
    causal: bool,
    window_left: Optional[int],
    window_right: Optional[int],
    attention_chunk: int,
    mask_mod,
    shift: int,
    seqlen_k: int,
    block_q: int,
    block_k: int,
    j_min: Optional[Sequence[int]] = None,
    j_max: Optional[Sequence[int]] = None,
) -> Optional[BandMaskCfg]:
    """Return a BandMaskCfg when the kernel's ONLY column mask is the
    right edge (causal or right window) — else None (general mask path).

    j_min/j_max: the static band (dispatch/band.kv_band_static output) when
    a packed band is in use; rows whose natural band was empty get clamped
    to [0, 0] there, and for those the clipped offset would fabricate a
    partially-valid mask — detected here and rejected (-> general path,
    which writes -inf via the compare). Without a packed band the kernel
    visits every (i, j) including far-past-diagonal tiles; those clamp to
    the all-invalid end of M only if they stay within the clip range, so
    the fast path requires the packed band.
    """
    if not ENABLE:
        return None
    wr = 0 if causal else window_right
    if wr is None:
        return None  # no right edge -> nothing to accelerate
    if window_left is not None or attention_chunk > 0 or mask_mod is not None:
        return None
    if seqlen_k % block_k != 0:
        return None  # boundary column mask needs the general path
    if block_q % 128 != 0 or block_k % 128 != 0:
        return None
    if j_min is None or j_max is None:
        return None
    edge = shift + wr
    rho = edge % 128
    c0 = block_k + rho
    # The mask matrix only needs to span the in-band offset range: o is
    # linear-increasing in j, so per-row extremes sit at j_min/j_max.
    # Fully-valid far-left tiles clip to the all-zero head (o=0, correct);
    # max_o covers every partially/fully-masked tile exactly. Rows whose
    # natural band was empty (clamped to [0,0] upstream) inflate max_o to
    # keep their all--inf slice exact; cap the width so a degenerate band
    # cannot blow VMEM.
    max_o = 0
    for i, (a, b) in enumerate(zip(j_min, j_max)):
        for j in (a, b):
            o = c0 - (i * block_q + edge - j * block_k)
            max_o = max(max_o, o)
    max_o = -((-max_o) // 128) * 128  # round up to a lane multiple
    if max_o + block_k > 2 * (block_q + block_k):
        return None
    return BandMaskCfg(edge=edge, rho=rho, block_q=block_q,
                       block_k=block_k, max_o=max_o)
