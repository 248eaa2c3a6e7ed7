"""Split-edge causal forward: maskless bulk + masked diagonal edge.

The measured causal gap vs non-causal on v5e decomposes into (a) diagonal
half-tile waste ~= max(bq,bk)/(s+max(bq,bk)) and (b) ~4-6% mask VPU cost on
EVERY tile (DESIGN.md "causal scheduling"). The reference's CUDA kernels
split each row's iteration space into masking and non-masking phases inside
one kernel (csrc/flash_attn/src/flash_fwd_kernel.h:55 n_masking_steps;
hopper/mainloop_fwd_sm90_tma_gmma_ws.hpp separate masked tail loop) — a
per-tile branch, which on TPU costs 10-20% because Mosaic drops software
pipelining across scalar branches (two measured attempts, DESIGN.md).

The TPU-native expression of the same idea is TWO kernel launches over
disjoint static bands, merged by the standard split-KV combine algebra:

  bulk: every KV tile FULLY below the diagonal for its q block — runs the
        standard fwd kernel with causal=False over a band override, so the
        mask code never traces in: zero VPU mask cost, no half tiles.
  edge: per q block, the 1..ceil(bq/bk)+1 tiles straddling the diagonal —
        the standard causal kernel over the complementary band override.

combine_splits (kernels/flash_decode.py, the reference's
hopper/flash_fwd_combine_kernel.h algebra) merges the two partials; the
extra HBM traffic is 3 reads + 1 write of (out, lse) ~= 2-3% of causal fwd
time at seq 8k. Rows whose bulk band is empty (the first ceil(bk/bq) q
blocks) are never written by the bulk kernel; their partial is zero-filled
with lse=-inf so the combine reduces to the edge partial there.
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.dispatch.band import kv_band_static
from flash_attn_tpu.dispatch.config import (
    get_fwd_config,
    scoped_vmem_limit,
    scoped_vmem_ok,
)
from flash_attn_tpu.kernels.flash_decode import combine_splits
from flash_attn_tpu.kernels.flash_fwd import _next_pow2, flash_attention_fwd

LOG2E = math.log2(math.e)
LN2 = math.log(2.0)

NEG_INF = float("-inf")


def fwd_split_eligible(sq: int, sk: int, block_q: int, block_k: int) -> bool:
    """True when the split driver will NOT fall back to the standard
    kernel: whole tiles (no boundary column mask in the bulk), at least
    one fully-below-diagonal tile, and both passes' score temporaries fit
    under the raised scoped-VMEM cap (bulk at (bq, bk); diag-merge edge at
    (bq, bq) — r2_session.log OOMs). Must mirror the fallback tests in
    flash_attention_fwd_split exactly — the FA_FWD_SPLIT gate in
    flash_attention_fwd relies on it to avoid mutual recursion."""
    if sq % block_q != 0 or sk % block_k != 0:
        return False
    if not (scoped_vmem_ok(block_q, block_k, 2)
            and scoped_vmem_ok(block_q, block_q, 2)):
        return False
    shift = sk - sq
    if shift < 0:
        return False
    nq = sq // block_q
    nk = sk // block_k
    full_last = max(0, min(((nq - 1) * block_q + shift + 1) // block_k, nk))
    return full_last >= 1


def split_bands(
    nq: int, nk: int, block_q: int, block_k: int, shift: int
) -> Tuple[Tuple[Tuple[int, ...], Tuple[int, ...]],
           Tuple[Tuple[int, ...], Tuple[int, ...]], int]:
    """Causal band split into (bulk, edge) per-q-block KV bands.

    bulk row i = [0, full_i - 1] where full_i counts KV tiles with every
    column <= the block's minimum query row (tile j is full iff
    (j+1)*block_k - 1 <= i*block_q + shift); empty rows are (0, -1).
    edge row i = [full_i, j_max_i] (never empty: the diagonal tile always
    exists). Returns (bulk, edge, n_empty) with n_empty the count of
    leading bulk-empty q blocks.
    """
    _, jmax = kv_band_static(nq, nk, block_q, block_k, shift,
                             True, None, None, 0, 0)
    bulk_lo, bulk_hi, edge_lo, edge_hi = [], [], [], []
    n_empty = 0
    for i in range(nq):
        full_i = (i * block_q + shift + 1) // block_k
        full_i = max(0, min(full_i, nk))
        hi = jmax[i]
        full_i = min(full_i, hi + 1)  # never past the causal band
        bulk_lo.append(0)
        bulk_hi.append(full_i - 1)
        if full_i == 0:
            n_empty += 1
        edge_lo.append(full_i)
        edge_hi.append(hi)
    return ((tuple(bulk_lo), tuple(bulk_hi)),
            (tuple(edge_lo), tuple(edge_hi)), n_empty)


def flash_attention_fwd_split(
    q,  # (b, h, sq, d)
    k,  # (b, h_k, sk, d)
    v,  # (b, h_k, sk, dv)
    softmax_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    edge_block_q: Optional[int] = None,
    edge_block_k: Optional[int] = None,
    interpret: bool = False,
):
    """Causal-only split-edge forward. Returns (out, lse) like
    flash_attention_fwd(causal=True). Supports the plain hot path only
    (no window/chunk/sink/alibi/softcap/dropout/flex hooks/fp8) — the
    dispatcher falls back to the standard kernel elsewhere.
    """
    b, h, sq, d = q.shape
    sk = k.shape[2]
    shift = sk - sq
    assert shift >= 0, (sq, sk)
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)

    cfg = get_fwd_config(d, v.shape[-1], sq, sk, True)
    bq = block_q or cfg.block_q
    bk = block_k or cfg.block_k
    # Mirror the kernel's own clamp so the band grid matches its tiling.
    bq = min(bq, _next_pow2(sq))
    bk = min(bk, _next_pow2(sk))
    if sq % bq != 0 or sk % bk != 0:
        # Partial boundary blocks need the boundary column mask — the
        # maskless bulk premise breaks; use the standard kernel.
        return flash_attention_fwd(
            q, k, v, softmax_scale=softmax_scale, causal=True,
            block_q=block_q, block_k=block_k, interpret=interpret)
    nq, nk = sq // bq, sk // bk
    bulk, edge, n_empty = split_bands(nq, nk, bq, bk, shift)

    ebq = edge_block_q or bq
    ebk = edge_block_k or bk
    if ebq != bq or ebk != bk:
        # Disjointness of the two passes needs edge tiles nested inside
        # bulk tiles: every edge q block must sit inside ONE bulk q block
        # (one full_i), and the bulk column boundary full_i*bk must land
        # on an edge-tile boundary.
        if (ebq <= bq and bq % ebq == 0 and ebk <= bk and bk % ebk == 0
                and sq % ebq == 0 and sk % ebk == 0):
            edge = _rescale_edge(bq, bk, ebq, ebk, shift, sq, sk, nk)
        else:
            ebq, ebk = bq, bk

    if bulk[1][-1] < 0:  # no full tiles at all (tiny seqlen): edge-only
        return flash_attention_fwd(
            q, k, v, softmax_scale=softmax_scale, causal=True,
            block_q=bq, block_k=bk, interpret=interpret)

    if (ebq == bq and ebk == bk and bq % bk == 0 and shift % bq == 0):
        # Diagonal-first + init-from-partial: the pure diagonal kernel
        # writes a normalized partial; the bulk kernel SEEDS each row's
        # online-softmax state from it ((m, l, acc) = (lse_d, 1, out_d) is
        # a valid carry), so the merge is amortized once per ROW inside
        # the bulk pass instead of a per-step partial-reading merge
        # kernel. Rows with no full tiles (the first q block when
        # shift == 0) are never visited by the bulk band: their final
        # out/lse IS the diagonal partial, patched below.
        out_d, lse_d = _diag_attn(
            q, k, v, softmax_scale=softmax_scale, block_q=bq, shift=shift,
            interpret=interpret)
        out, lse = flash_attention_fwd(
            q, k, v, softmax_scale=softmax_scale, causal=False,
            block_q=bq, block_k=bk, band_override=bulk,
            init_partial=(out_d, lse_d), interpret=interpret)
        if n_empty:
            ze = n_empty * bq
            out = jax.lax.dynamic_update_slice(
                out, out_d[:, :, :ze].astype(out.dtype), (0, 0, 0, 0))
            lse = jax.lax.dynamic_update_slice(
                lse, lse_d[:, :, :ze], (0, 0, 0))
        return out, lse

    out_b, lse_b = flash_attention_fwd(
        q, k, v, softmax_scale=softmax_scale, causal=False,
        block_q=bq, block_k=bk, band_override=bulk, interpret=interpret)

    out_e, lse_e = flash_attention_fwd(
        q, k, v, softmax_scale=softmax_scale, causal=True,
        block_q=ebq, block_k=ebk, band_override=edge, interpret=interpret)

    if n_empty:
        # Bulk never visited the first n_empty q blocks: their out/lse
        # blocks are uninitialized memory. Kill them so the combine
        # reduces to the edge partial (w = exp(-inf) = 0, out term 0).
        ze = n_empty * bq
        out_b = out_b.at[:, :, :ze].set(0)
        lse_b = lse_b.at[:, :, :ze].set(NEG_INF)

    out_p = jnp.stack([out_b.astype(jnp.float32), out_e.astype(jnp.float32)])
    lse_p = jnp.stack([lse_b, lse_e])
    out, lse = combine_splits(out_p, lse_p)
    return out.astype(q.dtype), lse


def _diag_kernel(q_ref, k_ref, v_ref, out_ref, lse_ref, *,
                 block_q, gang, scale_log2, out_dtype):
    """Pure diagonal-tile attention: each grid step computes ``gang``
    consecutive diagonal (bq, bq) tiles (their q rows AND their KV
    windows are contiguous, so one (gang*bq, d) slab fetch serves all;
    the sub-tiles are statically-sliced independent softmaxes). Ganging
    amortizes the per-step pipeline overhead, which measurement put at
    ~3.5 us/step vs 2.7 us of MXU work at bq=1024 (see DESIGN.md). The
    causal mask is the CONSTANT lower triangle on register-resident
    iotas — a VMEM-resident additive mask tile was measured SLOWER
    (3.44 vs 3.27 ms at seq8k: the mask-slice add is a genuine
    VMEM->vreg pass, the same finding as the removed bandmask probe — DESIGN.md). A single
    tile is a complete softmax — no online carries. The merge with the
    bulk pass happens INSIDE the bulk kernel (init-from-partial seeding,
    flash_fwd.py _init): this kernel reads q/k/v and writes out/lse
    only, so the per-step HBM traffic per tile is ~1 MB vs the 1.5 MB
    of the previous read-bulk-partial merge kernel."""
    bq = block_q
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, bq), 1)
    tri = cols <= rows
    for g in range(gang):
        sl = slice(g * bq, (g + 1) * bq)
        q = q_ref[0, 0, sl]  # (bq, d)
        k = k_ref[0, 0, sl]  # (bq, d)
        v = v_ref[0, 0, sl]  # (bq, dv)
        qs = (q.astype(jnp.float32) * scale_log2).astype(q.dtype)
        s2 = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s2 = jnp.where(tri, s2, float("-inf"))
        m_e = jnp.max(s2, axis=-1, keepdims=True)  # (bq, 1); finite
        p = jnp.exp2(s2 - m_e)
        l_e = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        inv = 1.0 / l_e  # (bq, 1) reciprocal, then a (bq, dv) multiply
        out_ref[0, 0, sl] = (pv * inv).astype(out_dtype)
        lse_ref[0, 0, 0, sl] = (m_e * LN2 + jnp.log(l_e))[:, 0]


def _diag_attn(q, k, v, *, softmax_scale, block_q, shift, interpret):
    """Launch the pure diagonal-tile kernel. Requires block_q | shift (the
    KV window index map moves in block_q units). Returns a NORMALIZED
    partial (out_d f32, lse_d f32) for init-from-partial seeding."""
    b, h, sq, d = q.shape
    h_k = k.shape[1]
    dv = v.shape[-1]
    group = h // h_k
    bq = block_q
    nq = sq // bq
    # gang consecutive diagonal tiles per grid step (contiguous q rows AND
    # contiguous KV windows when shift % (gang*bq) == 0)
    gang = 2 if (nq % 2 == 0 and shift % (2 * bq) == 0) else 1
    gb = gang * bq
    ng = nq // gang
    koff = shift // gb

    grid = (b, h, ng)
    q_spec = pl.BlockSpec((1, 1, gb, d), lambda b_, h_, i: (b_, h_, i, 0))
    k_spec = pl.BlockSpec(
        (1, 1, gb, d), lambda b_, h_, i: (b_, h_ // group, i + koff, 0))
    v_spec = pl.BlockSpec(
        (1, 1, gb, dv), lambda b_, h_, i: (b_, h_ // group, i + koff, 0))
    out_spec = pl.BlockSpec((1, 1, gb, dv), lambda b_, h_, i: (b_, h_, i, 0))
    lse_spec = pl.BlockSpec((1, 1, 1, gb), lambda b_, h_, i: (b_, h_, 0, i))

    kernel = functools.partial(
        _diag_kernel, block_q=bq, gang=gang,
        scale_log2=softmax_scale * LOG2E, out_dtype=q.dtype)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec],
        out_specs=[out_spec, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, dv), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, sq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            # gang x (bq, bq) fp32 score temporaries on the kernel stack
            vmem_limit_bytes=scoped_vmem_limit(bq, bq, 2 * gang),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * sq * bq * (d + dv) // 2,
            bytes_accessed=2 * b * h * sq * (d + 2 * dv),
            transcendentals=b * h * sq * bq // 2,
        ),
        interpret=interpret,
    )(q, k, v)
    return out, lse[:, :, 0, :]


def _rescale_edge(bq, bk, ebq, ebk, shift, sq, sk, nk):
    """Edge band re-tiled at (ebq, ebk) <= (bq, bk), ebq | bq and ebk | bk:
    per edge q block, all KV columns the bulk pass (at (bq, bk) tiling)
    did NOT cover. Nesting guarantees the bulk boundary full_i*bk is an
    ebk multiple and each edge block maps to exactly one bulk block, so
    the passes stay disjoint (no double counting in the combine)."""
    enq, enk = sq // ebq, sk // ebk
    _, jmax = kv_band_static(enq, enk, ebq, ebk, shift, True, None, None,
                             0, 0)
    lo, hi = [], []
    for ei in range(enq):
        i = (ei * ebq) // bq  # the bulk q block containing these rows
        full_i = max(0, min((i * bq + shift + 1) // bk, nk))
        full_cols = full_i * bk
        assert full_cols % ebk == 0
        # Never empty: the first edge sub-block's max col i*bq+ebq-1+shift
        # >= full_cols for ebq >= 2 (see driver constraint), so
        # full_cols // ebk <= jmax[ei]; clamp defensively anyway.
        e_lo = min(full_cols // ebk, jmax[ei])
        lo.append(e_lo)
        hi.append(jmax[ei])
    return tuple(lo), tuple(hi)
