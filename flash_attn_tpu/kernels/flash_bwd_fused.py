"""Fused single-pass flash-attention backward (Pallas TPU).

Round-1 shipped a deterministic *two-kernel* backward (flash_bwd.py): a
dK/dV kernel and a dQ kernel, each recomputing the score matrix. That costs
7 big matmuls per (q_tile, kv_tile) pair against the 5 of the reference's
fused backward (csrc/flash_attn/src/flash_bwd_kernel.h:81
``compute_dq_dk_dv_1colblock``; hopper/mainloop_bwd_sm90_tma_gmma_ws.hpp) —
a 1.4x FLOP ceiling before any scheduling effects.

The reference fuses by accumulating dQ with ``atomicAdd`` (or semaphore
serialization in deterministic mode). TPUs have no global atomics, but a
v5e core has ~128 MiB of VMEM (measured, benchmarks/vmem_probe.py) — enough
to keep *full-sequence fp32 accumulators resident*:

    grid (batch, kv_head, group, T)   T = packed (i, n) band, i-major
      dq_acc  (block_q, d)   — accumulated over n within a row, flushed per i
      dk_all  (d, seqlen_k)  — accumulated over (g, i, n), DMA'd out per
      dv_all  (dv, seqlen_k)    (batch, kv_head) segment (d-major so the
                                lane axis is the 128-aligned seq axis)

Five matmuls per tile: S = QK^T, dP = dO V^T, dV += P^T dO, dK += dS^T Q,
dQ += dS K. GQA head reduction (the group grid dim) falls out of the dk/dv
accumulators for free, and determinism is structural (fixed iteration
order, no atomics) — the reference's ``deterministic=`` flag is always on.

The (i, n) space is the same packed band the forward uses
(dispatch/band.py), so causal/local backward pays zero skipped-iteration
overhead. dK/dV leave through a manual async copy at segment end (the
block-spec flush machinery would rewrite garbage blocks every iteration).

Falls back to flash_bwd.py's two-kernel path only when the full-KV
accumulators would not fit VMEM (see ``fits_vmem``).
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.dispatch.band import PackedBand, kv_band_static
from flash_attn_tpu.dispatch.config import get_bwd_config, normalize_window
from flash_attn_tpu.kernels.dropout_rng import dropout_keep
from flash_attn_tpu.kernels.flash_bwd import _scores_log2, _next_pow2

LOG2E = math.log2(math.e)
NEG_INF = float("-inf")

# VMEM budget for the resident fp32 dK/dV accumulators (bytes). The v5e has
# ~128 MiB; leave room for the double-buffered q/do/k/v pipeline blocks and
# the out blocks.
_ACC_VMEM_BUDGET = 80 * 1024 * 1024


def fits_vmem(seqlen_k: int, d: int, dv: int, block_q: int) -> bool:
    # fp32 accumulators + (bshd path) low-precision cast staging buffers.
    acc = 4 * (seqlen_k * (d + dv) + block_q * d) + 2 * seqlen_k * (d + dv)
    return acc <= _ACC_VMEM_BUDGET


def _bwd_fused_kernel(*refs, band: PackedBand, block_q, block_k, seqlen_q,
                      seqlen_k, num_q_blocks, num_kv_blocks, group, scale,
                      softcap, causal, window_left, window_right,
                      attention_chunk, sink_token_length, has_alibi,
                      dropout_p, num_heads, score_mod, mask_mod,
                      dq_dtype, dk_dtype, dv_dtype, num_aux, num_batch,
                      num_kv_heads, bshd, hf=1, gq=1, group_eff=1,
                      head_dim=None, head_dim_v=None):
    refs = list(refs)
    seed_ref = refs.pop(0) if dropout_p > 0.0 else None
    slopes_ref = refs.pop(0) if has_alibi else None
    aux = tuple(refs.pop(0)[...] for _ in range(num_aux))
    (q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
     dq_ref, dk_hbm, dv_hbm, *rest) = refs
    # daux outputs are block-spec'd with constant index maps: Pallas keeps
    # each block resident in VMEM across the whole sequential grid (standard
    # revisited-accumulator pattern) and writes back once at the end — no
    # manual DMA, so arbitrary aux shapes stay alignment-safe.
    daux_refs = rest[:num_aux]
    if bshd:
        (dq_acc, dk_all, dv_all, dk_st, dv_st, copy_sems) = rest[num_aux:]
    else:
        (dq_acc, dk_all, dv_all, copy_sems) = rest[num_aux:]

    b_idx = pl.program_id(0)
    hk_idx = pl.program_id(1)   # kv-head BLOCK index when hf > 1
    g = pl.program_id(2)
    t = pl.program_id(3)
    # hf > 1 implies group == 1; gq > 1 folds the GQA group in-kernel
    # (grid g then ranges over group_eff = group // gq)
    h_idx = hk_idx * group + g * gq
    shift = seqlen_k - seqlen_q

    i, n, t_first, t_last = band.decode(t)
    seg_first = jnp.logical_and(g == 0, t == 0)
    seg_last = jnp.logical_and(g == group_eff - 1,
                               t == band.num_tiles - 1)
    grid_first = jnp.logical_and(jnp.logical_and(b_idx == 0, hk_idx == 0),
                                 seg_first)
    grid_last = jnp.logical_and(
        jnp.logical_and(b_idx == num_batch - 1, hk_idx == num_kv_heads - 1),
        seg_last)

    @pl.when(seg_first)
    def _seg_init():
        dk_all[...] = jnp.zeros_like(dk_all)
        dv_all[...] = jnp.zeros_like(dv_all)

    if num_aux:
        @pl.when(grid_first)
        def _aux_init():
            for ref in daux_refs:
                ref[...] = jnp.zeros_like(ref)

    @pl.when(t == t_first)
    def _row_init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    # bshd fast path: the public (b, s, h, d) arrays are viewed as
    # (b, s, h*d) (free bitcast) and blocked (1, blk, d) with the head
    # selected by the index map — Mosaic requires the last two block dims
    # be (8, 128)-divisible or full, which (blk, d) satisfies for
    # d % 128 == 0. This streams the public layout straight into the
    # kernel with no materialized (s, h) transpose (those transposes were
    # ~15% of whole-grad time). For small head dims the wrapper falls back
    # to bhsd blocks (1, 1, blk, d) with boundary transposes.
    if bshd:
        q_all = q_ref[0]        # (bq, hf*d)
        do_all = do_ref[0]      # (bq, hf*dv)
        k_all = k_ref[0]        # (bk, hf*d)
        v_all = v_ref[0]        # (bk, hf*dv)
    else:
        q_all = q_ref[0, 0]
        do_all = do_ref[0, 0]
        k_all = k_ref[0, 0]
        v_all = v_ref[0, 0]

    row_pad = seqlen_q % block_q != 0
    if row_pad:
        # Boundary q blocks are padded with garbage; zero the rows so they
        # cannot leak into dK/dV (0 * garbage = NaN).
        rv = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0) + i * block_q
        q_all = jnp.where(rv < seqlen_q, q_all, 0)
        do_all = jnp.where(rv < seqlen_q, do_all, 0)
    if seqlen_k % block_k != 0:
        cv = jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0) + n * block_k
        k_all = jnp.where(cv < seqlen_k, k_all, 0)
        v_all = jnp.where(cv < seqlen_k, v_all, 0)


    d_h = head_dim if head_dim is not None else q_all.shape[-1]
    dv_h = head_dim_v if head_dim_v is not None else do_all.shape[-1]

    def head_body(hh, masked):
        """One head's 5-matmul tile update. With head folding (hf > 1,
        bshd, group == 1) the loaded blocks span hf heads on the lane axis;
        static 128-aligned slices select head hh."""
        if hf > 1:
            q = q_all[:, hh * d_h:(hh + 1) * d_h]
            do = do_all[:, hh * dv_h:(hh + 1) * dv_h]
            k = k_all[:, hh * d_h:(hh + 1) * d_h]
            v = v_all[:, hh * dv_h:(hh + 1) * dv_h]
        elif gq > 1:
            # group folding: per-q-head slices against the SHARED kv head
            q = q_all[:, hh * d_h:(hh + 1) * d_h]
            do = do_all[:, hh * dv_h:(hh + 1) * dv_h]
            k, v = k_all, v_all
        else:
            q, do, k, v = q_all, do_all, k_all, v_all
        h_cur = hk_idx * hf + hh if hf > 1 else h_idx + hh
        lse2 = lse_ref[0, hh, 0].reshape(block_q, 1) * LOG2E
        delta = delta_ref[0, hh, 0].reshape(block_q, 1)
        slope = slopes_ref[b_idx, h_cur] if has_alibi else None

        s2, ds_chain = _scores_log2(
            q, k, i, n, block_q, block_k, scale=scale, softcap=softcap,
            causal=causal, window_left=window_left,
            window_right=window_right, attention_chunk=attention_chunk,
            sink_token_length=sink_token_length,
            seqlen_k=seqlen_k, shift=shift, slope=slope,
            score_mod=score_mod, mask_mod=mask_mod, b_idx=b_idx,
            h_idx=h_cur, aux=aux, masked=masked,
        )
        lse2_safe = jnp.where(lse2 == NEG_INF, 0.0, lse2)
        p = jnp.exp2(s2 - lse2_safe)          # (bq, bk); masked -> 0
        if row_pad:
            p = jnp.where(rv < seqlen_q, p, 0)
        # dP = dO V^T
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_p > 0.0:
            drows = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            dcols = n * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            keep = dropout_keep(seed_ref[0, 0], b_idx * num_heads + h_cur,
                                drows, dcols, dropout_p)
            inv_keep = 1.0 / (1.0 - dropout_p)
            p_v = jnp.where(keep, p, 0.0) * inv_keep
            dp_d = jnp.where(keep, dp, 0.0) * inv_keep
        else:
            p_v = p
            dp_d = dp
        ds, daux = ds_chain(p * (dp_d - delta))
        if num_aux:
            # Deterministic aux-cotangent accumulation: the vjp emits a
            # full aux-shaped contribution per tile (zeros off this tile's
            # indices); summed across the whole sequential grid in fp32
            # (the TPU answer to the reference's atomic buffer-grad
            # accumulation in flex attention — fixed order, no atomics).
            for ref, da in zip(daux_refs, daux):
                ref[...] += da.astype(jnp.float32)
        if row_pad:
            ds = jnp.where(rv < seqlen_q, ds, 0)
        p_lo = p_v.astype(do.dtype)
        ds_lo = ds.astype(q.dtype)

        # dQ += dS K * scale  (row accumulator)
        dq_acc[:, pl.ds(hh * d_h, d_h)] += jax.lax.dot_general(
            ds_lo, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dV[n] += P^T dO ; dK[n] += dS^T Q.
        # bshd path: accumulators are seq-major (seqlen_k, hf*d) — d%128==0
        # keeps the lane axis aligned, block_k row offsets are 8-multiples,
        # and the segment flush DMAs straight into the public
        # (b, sk, h_k*d) view (no output transpose pass).
        # bhsd fallback: TRANSPOSED (d, seqlen_k) accumulators — for d<128
        # the lane axis must be the 128-aligned KV-sequence axis (d=64
        # blocks are not sliceable on lanes).
        off = n * block_k
        kvh = hh if hf > 1 else 0
        if bshd:
            dv_all[pl.ds(off, block_k), pl.ds(kvh * dv_h, dv_h)] += (
                jax.lax.dot_general(
                    p_lo, do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
            dk_all[pl.ds(off, block_k), pl.ds(kvh * d_h, d_h)] += (
                jax.lax.dot_general(
                    ds_lo, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
        else:
            dv_all[:, pl.ds(off, block_k)] += jax.lax.dot_general(
                do, p_lo, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dk_all[:, pl.ds(off, block_k)] += jax.lax.dot_general(
                q, ds_lo, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    def tile_body(masked):
        for hh in range(max(hf, gq)):
            head_body(hh, masked)

    # NOTE an interior-tile fast path (pl.when(is_full) -> mask-free
    # branch, pl.when(~is_full) -> masked branch) was tried here and
    # REGRESSED 86.5 -> 72.7 TF/s on v5e, the same pathology as the
    # round-1 forward lax.cond attempt (85 -> 54): Mosaic loses its
    # software-pipelined schedule across scalar branches, which costs more
    # than the ~2 mask VPU passes save. Branchless masked compute wins.
    tile_body(None)

    @pl.when(t == t_last)
    def _row_flush():
        if bshd:
            dq_ref[0] = (dq_acc[...] * scale).astype(dq_dtype)
        else:
            dq_ref[0, 0] = (dq_acc[...] * scale).astype(dq_dtype)

    @pl.when(seg_last)
    def _seg_flush():
        if bshd:
            # Cast to the public dtype in VMEM and DMA straight into the
            # (b, sk, h_k*d) output view: no f32 materialization, no
            # transpose pass. dK picks up the softmax scale here.
            dk_st[...] = (dk_all[...] * scale).astype(dk_st.dtype)
            dv_st[...] = dv_all[...].astype(dv_st.dtype)
            d_ = dk_st.shape[-1]
            dv_d = dv_st.shape[-1]
            cp_k = pltpu.make_async_copy(
                dk_st, dk_hbm.at[b_idx, :, pl.ds(hk_idx * d_, d_)],
                copy_sems.at[0])
            cp_v = pltpu.make_async_copy(
                dv_st, dv_hbm.at[b_idx, :, pl.ds(hk_idx * dv_d, dv_d)],
                copy_sems.at[1])
        else:
            # dK picks up the softmax scale once, at flush.
            dk_all[...] = dk_all[...] * scale
            cp_k = pltpu.make_async_copy(
                dk_all, dk_hbm.at[b_idx, hk_idx], copy_sems.at[0])
            cp_v = pltpu.make_async_copy(
                dv_all, dv_hbm.at[b_idx, hk_idx], copy_sems.at[1])
        cp_k.start()
        cp_v.start()
        cp_k.wait()
        cp_v.wait()

    del grid_last  # daux write-back is handled by the grid machinery


@functools.partial(
    jax.jit,
    static_argnames=(
        "softmax_scale", "causal", "window_size", "softcap",
        "attention_chunk", "sink_token_length", "block_q", "block_k",
        "interpret", "dropout_p", "score_mod", "mask_mod",
        "strict_causal", "band_override",
    ),
)
def flash_attention_bwd_fused(
    do,   # (b, sq, h, dv)   — bshd (public layout, no transpose needed)
    q,    # (b, sq, h, d)
    k,    # (b, sk, h_k, d)
    v,    # (b, sk, h_k, dv)
    out,  # (b, sq, h, dv)
    lse,  # (b, h, sq) natural-log
    alibi_slopes=None,
    learnable_sink=None,
    dropout_p: float = 0.0,
    dropout_seed=None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[Optional[int], Optional[int]] = (None, None),
    softcap: float = 0.0,
    attention_chunk: int = 0,
    sink_token_length: int = 0,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    score_mod=None,
    mask_mod=None,
    aux_tensors=None,  # tuple of arrays handed to score_mod/mask_mod
    interpret: bool = False,
    strict_causal: bool = False,  # col < row (striped ring attention)
    band_override=None,  # ((j_min,...), (j_max,...)) per q block; rows
    # with j_max < j_min are EMPTY — their dQ blocks are never written
    # (callers must zero them); dK/dV are zero-init per segment so they
    # stay correct. Used by the split-edge causal driver
    # (flash_bwd_split.py).
):
    """Fused-backward twin of flash_bwd.flash_attention_bwd.

    Returns (dq, dk, dv[, daux]): dq (b, sq, h, d) bshd in q.dtype,
    dk (b, sk, h_k, d) / dv (b, sk, h_k, dv) bshd, GQA-reduced in fp32
    VMEM accumulators (returned in k/v dtype on the d%128==0 fast path,
    fp32 on the fallback — callers cast to input dtype either way).
    With aux_tensors, appends a tuple of fp32 aux-shaped cotangents
    (deterministic fixed-order accumulation).
    """
    b, sq, h, d = q.shape
    _, sk, h_k, _ = k.shape
    dv_dim = v.shape[-1]
    group = h // h_k
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    window_left, window_right = normalize_window(window_size)
    if strict_causal:
        assert not causal and window_right is None, (causal, window_right)
        window_right = -1
    del learnable_sink  # only affects lse, already folded in

    cfg = get_bwd_config(d, dv_dim, sq, sk, causal)
    bq = min(block_q or cfg.block_q, _next_pow2(sq))
    bk = min(block_k or cfg.block_k, _next_pow2(sk))
    nq = pl.cdiv(sq, bq)
    nk = pl.cdiv(sk, bk)
    shift = sk - sq
    sk_pad = nk * bk

    if band_override is not None:
        jmin_s, jmax_s = band_override
        assert len(jmin_s) == nq and len(jmax_s) == nq, (nq, band_override)
    else:
        jmin_s, jmax_s = kv_band_static(
            nq, nk, bq, bk, shift, causal, window_left, window_right,
            sink_token_length, attention_chunk,
        )
    band = PackedBand(jmin_s, jmax_s)

    # Preprocess: delta = rowsum(dO * O) (fp32) — the reference's
    # flash_bwd_preprocess_kernel as a fused XLA reduction. (b, sq, h) ->
    # (b, h, 1, sq): tiny relative to the q/k/v streams.
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1)  # (b, h, sq)
    lse = lse.astype(jnp.float32)[:, :, None, :]
    delta = delta[:, :, None, :]

    def amap(fn):
        return lambda b_, hk, g, t: fn(b_, hk, g, band.i_of(t), band.j_of(t))

    in_specs = []
    inputs = []
    if dropout_p > 0.0:
        in_specs.append(pl.BlockSpec(
            (1, 1), amap(lambda b_, hk, g, i, n: (0, 0)),
            memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(dropout_seed, jnp.uint32).reshape(1, 1))
    if alibi_slopes is not None:
        in_specs.append(pl.BlockSpec(
            (b, h), amap(lambda b_, hk, g, i, n: (0, 0)),
            memory_space=pltpu.SMEM))
        inputs.append(alibi_slopes.astype(jnp.float32))
    aux_tensors = tuple(aux_tensors) if aux_tensors else ()
    for ax in aux_tensors:
        nd = ax.ndim
        in_specs.append(pl.BlockSpec(
            ax.shape, amap(lambda b_, hk, g, i, n, nd=nd: (0,) * nd)))
        inputs.append(ax)
    # bshd fast path requires the head-merged (b, s, h*d) view to be
    # d-block sliceable on the lane axis: Mosaic wants the last block dim
    # 128-divisible (or full). Small head dims fall back to bhsd blocks.
    bshd = d % 128 == 0 and dv_dim % 128 == 0
    # Head folding: accumulate dK/dV for hf consecutive kv heads per VMEM
    # segment, cutting the per-segment fixed cost (accumulator zero-init +
    # flush DMA + pipeline restart — measured ~45us on v5e) by hf. Only on
    # the bshd path with group == 1, where the hf heads are contiguous on
    # the lane axis of every operand (single-block DMAs). Round-4 fix for
    # the seq4k backward: 64 segments of 12 tiles ran at 89 TF/s computed
    # vs 128.5 for 32-tile segments (benchmarks/r4_bwd_parts.py).
    hf = 1
    if bshd and group == 1 and dropout_p == 0.0:
        import os
        hf_cap = int(os.environ.get("FA_BWD_FOLD", "8"))
        while (hf < h_k and h_k % (hf * 2) == 0 and hf < hf_cap
               and fits_vmem(sk_pad, (hf * 2) * d, (hf * 2) * dv_dim, bq)):
            hf *= 2
    # GQA group folding (round 5, the hf analogue for group > 1): one grid
    # step covers the whole group of one kv head — K/V blocks load once,
    # dK/dV accumulate once, and segments shrink by group (the r4 seq4k
    # fixed-cost fix, extended to GQA as VERDICT r4 #3 asked).
    gq = 1
    if (bshd and group > 1 and dropout_p == 0.0 and group <= 16
            and fits_vmem(sk_pad, d, dv_dim, bq)):
        import os as _os
        if _os.environ.get("FA_BWD_FOLD_GROUP", "1") == "1":
            gq = group
    group_eff = group // gq
    wq = max(hf, gq)  # q-side head fold width
    n_hkb = h_k // hf
    lse_spec = pl.BlockSpec(
        (1, wq, 1, bq),
        amap(lambda b_, hk, g, i, n: (b_, hk * group_eff + g, 0, i)))
    if bshd:
        q_in = q.reshape(b, sq, h * d)
        do_in = do.reshape(b, sq, h * dv_dim)
        k_in = k.reshape(b, sk, h_k * d)
        v_in = v.reshape(b, sk, h_k * dv_dim)
        in_specs += [
            pl.BlockSpec((1, bq, wq * d),
                         amap(lambda b_, hk, g, i, n:
                              (b_, i, hk * group_eff + g))),
            pl.BlockSpec((1, bq, wq * dv_dim),
                         amap(lambda b_, hk, g, i, n:
                              (b_, i, hk * group_eff + g))),
            lse_spec,
            lse_spec,
            pl.BlockSpec((1, bk, hf * d),
                         amap(lambda b_, hk, g, i, n: (b_, n, hk))),
            pl.BlockSpec((1, bk, hf * dv_dim),
                         amap(lambda b_, hk, g, i, n: (b_, n, hk))),
        ]
    else:
        q_in, do_in, k_in, v_in = (
            jnp.swapaxes(x, 1, 2) for x in (q, do, k, v))
        in_specs += [
            pl.BlockSpec((1, 1, bq, d),
                         amap(lambda b_, hk, g, i, n: (b_, hk * group + g, i, 0))),
            pl.BlockSpec((1, 1, bq, dv_dim),
                         amap(lambda b_, hk, g, i, n: (b_, hk * group + g, i, 0))),
            lse_spec,
            lse_spec,
            pl.BlockSpec((1, 1, bk, d),
                         amap(lambda b_, hk, g, i, n: (b_, hk, n, 0))),
            pl.BlockSpec((1, 1, bk, dv_dim),
                         amap(lambda b_, hk, g, i, n: (b_, hk, n, 0))),
        ]
    inputs += [q_in, do_in, lse, delta, k_in, v_in]
    grid = (b, n_hkb, group_eff, band.num_tiles)

    kernel = functools.partial(
        _bwd_fused_kernel,
        band=band, block_q=bq, block_k=bk, seqlen_q=sq, seqlen_k=sk,
        num_q_blocks=nq, num_kv_blocks=nk, group=group, scale=softmax_scale,
        softcap=softcap, causal=causal, window_left=window_left,
        window_right=window_right, attention_chunk=attention_chunk,
        sink_token_length=sink_token_length,
        has_alibi=alibi_slopes is not None, dropout_p=dropout_p,
        num_heads=h, score_mod=score_mod, mask_mod=mask_mod,
        dq_dtype=q.dtype, dk_dtype=jnp.float32, dv_dtype=jnp.float32,
        num_aux=len(aux_tensors), num_batch=b, num_kv_heads=n_hkb,
        bshd=bshd, hf=hf, gq=gq, group_eff=group_eff,
        head_dim=d, head_dim_v=dv_dim,
    )

    daux_out_specs = [
        pl.BlockSpec(ax.shape,
                     amap(lambda b_, hk, g, i, n, nd=ax.ndim: (0,) * nd))
        for ax in aux_tensors
    ]
    daux_out_shapes = [jax.ShapeDtypeStruct(ax.shape, jnp.float32)
                       for ax in aux_tensors]

    if bshd:
        dq_spec = pl.BlockSpec(
            (1, bq, wq * d),
            amap(lambda b_, hk, g, i, n: (b_, i, hk * group_eff + g)))
        dq_shape = jax.ShapeDtypeStruct((b, sq, h * d), q.dtype)
        dkv_shapes = [
            jax.ShapeDtypeStruct((b, sk_pad, h_k * d), k.dtype),
            jax.ShapeDtypeStruct((b, sk_pad, h_k * dv_dim), v.dtype),
        ]
        acc_scratch = [
            pltpu.VMEM((bq, wq * d), jnp.float32),      # dq row accumulator
            pltpu.VMEM((sk_pad, hf * d), jnp.float32),  # dk full-KV seq-major
            pltpu.VMEM((sk_pad, hf * dv_dim), jnp.float32),  # dv full-KV
            pltpu.VMEM((sk_pad, hf * d), k.dtype),      # dk cast staging
            pltpu.VMEM((sk_pad, hf * dv_dim), v.dtype),  # dv cast staging
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        dq_spec = pl.BlockSpec(
            (1, 1, bq, d),
            amap(lambda b_, hk, g, i, n: (b_, hk * group + g, i, 0)))
        dq_shape = jax.ShapeDtypeStruct((b, h, sq, d), q.dtype)
        dkv_shapes = [
            jax.ShapeDtypeStruct((b, h_k, d, sk_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, h_k, dv_dim, sk_pad), jnp.float32),
        ]
        acc_scratch = [
            pltpu.VMEM((bq, d), jnp.float32),          # dq row accumulator
            pltpu.VMEM((d, sk_pad), jnp.float32),      # dk full-KV (d-major)
            pltpu.VMEM((dv_dim, sk_pad), jnp.float32),  # dv full-KV (d-major)
            pltpu.SemaphoreType.DMA((2,)),
        ]

    from flash_attn_tpu.utils.fa_logging import log_kernel_launch
    log_kernel_launch(
        "flash_bwd_fused", grid=grid,
        blocks={"q": (bq, d), "kv": (bk, d)},
        causal=causal, bshd=bshd, fold_heads=hf, fold_group=gq,
        seqlen_q=sq, seqlen_k=sk,
        acc_vmem_bytes=4 * sk_pad * hf * (d + dv_dim), dtype=q.dtype)

    dq, dk, dv, *daux = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            dq_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + daux_out_specs,
        out_shape=[dq_shape] + dkv_shapes + daux_out_shapes,
        scratch_shapes=acc_scratch,
        compiler_params=pltpu.CompilerParams(
            # The daux revisited accumulators sum across (b, h_k) too, so
            # every grid dim must stay sequential when aux grads are live.
            dimension_semantics=(
                ("arbitrary",) * 4 if aux_tensors else
                ("parallel", "parallel", "arbitrary", "arbitrary")),
            # full-KV fp32 accumulators (x hf folded heads) + the resident
            # band mask exceed the default 16 MiB scoped-VMEM limit at long
            # seqlens (v5e ~128M physical)
            vmem_limit_bytes=108 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * sq * sk * d // (2 if causal else 1),
            bytes_accessed=2 * (q.size * 2 + k.size * group * 2)
            + 4 * (q.size + k.size + v.size),
            transcendentals=b * h * sq * sk // (2 if causal else 1),
        ),
        interpret=interpret,
    )(*inputs)

    if bshd:
        dq = dq.reshape(b, sq, h, d)
        dk = dk.reshape(b, sk_pad, h_k, d)
        dv = dv.reshape(b, sk_pad, h_k, dv_dim)
    else:
        dq = jnp.swapaxes(dq, 1, 2)
        # (b, h_k, d, sk_pad) -> bshd (b, sk, h_k, d); XLA fuses the
        # transpose with the caller's dtype cast into one copy pass.
        dk = jnp.transpose(dk, (0, 3, 1, 2))
        dv = jnp.transpose(dv, (0, 3, 1, 2))
    if sk_pad != sk:
        dk = dk[:, :sk]
        dv = dv[:, :sk]
    if aux_tensors:
        return dq, dk, dv, tuple(daux)
    return dq, dk, dv


def flash_attention_bwd_auto(do, q, k, v, out, lse, **kw):
    """Dispatch with bshd (public-layout) inputs and outputs: fused
    single-pass kernel when the full-KV accumulators fit VMEM (virtually
    always) and the layouts are DMA-aligned, else the two-kernel flash_bwd
    path (which takes bhsd — transposed only on this rare fallback)."""
    import os

    from flash_attn_tpu.kernels.flash_bwd import flash_attention_bwd

    d = q.shape[-1]
    dv_dim = v.shape[-1]
    sk = k.shape[1]
    sq = q.shape[1]
    cfg = get_bwd_config(d, dv_dim, sq, sk, kw.get("causal", False))
    bq = kw.get("block_q") or cfg.block_q
    bk = min(kw.get("block_k") or cfg.block_k, _next_pow2(sk))
    sk_pad = pl.cdiv(sk, bk) * bk
    # The (d, sk_pad) accumulators need a 128-multiple lane (KV) axis and
    # 8-multiple sublane (head) axis for the manual segment-flush DMA.
    aligned = sk_pad % 128 == 0 and d % 8 == 0 and dv_dim % 8 == 0
    plain_causal = (
        kw.get("causal", False) and sq <= sk
        and kw.get("alibi_slopes") is None
        and kw.get("learnable_sink") is None
        and not kw.get("dropout_p", 0.0)
        and not kw.get("softcap", 0.0)
        and not kw.get("attention_chunk", 0)
        and not kw.get("sink_token_length", 0)
        and kw.get("score_mod") is None
        and kw.get("mask_mod") is None
        and not kw.get("aux_tensors")
        and not kw.get("strict_causal", False)
        and kw.get("window_size", (None, None)) == (None, None))
    if (plain_causal and aligned and fits_vmem(sk_pad, d, dv_dim, bq)
            and os.environ.get("FA_BWD_SPLIT", "1") == "1"):
        # Split-edge causal backward (flash_bwd_split.py): maskless bulk
        # over full tiles + masked diagonal edge, additive partial merge.
        # DEFAULT-ON since round 3: measured 95.3 vs 87.1 TF/s on v5e
        # (benchmarks/r2_session.log); FA_BWD_SPLIT=0 restores the fused
        # single-launch kernel. The driver falls back internally on
        # ineligible shapes (partial tiles, scoped-VMEM-bound configs).
        from flash_attn_tpu.kernels.flash_bwd_split import (
            flash_attention_bwd_split)

        return flash_attention_bwd_split(
            do, q, k, v, out, lse,
            softmax_scale=kw.get("softmax_scale"),
            block_q=kw.get("block_q"), block_k=kw.get("block_k"),
            interpret=kw.get("interpret", False))
    if aligned and fits_vmem(sk_pad, d, dv_dim, bq):
        return flash_attention_bwd_fused(do, q, k, v, out, lse, **kw)
    if kw.pop("aux_tensors", None):
        raise NotImplementedError(
            "aux_tensors grads need the fused backward (full-KV "
            "accumulators exceed VMEM or layout misaligned for this shape)")
    tr = lambda x: jnp.swapaxes(x, 1, 2)
    dq, dk, dv = flash_attention_bwd(
        tr(do), tr(q), tr(k), tr(v), tr(out), lse, **kw)
    return tr(dq), tr(dk), tr(dv)
