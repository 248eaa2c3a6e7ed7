"""Software-pipelined (paired-tile) fused flash-attention backward.

The fused single-pass backward (flash_bwd_fused.py) runs, per band tile,
five MXU matmuls serialized against a VPU softmax/ds chain: S and dP feed
the exp2/ds elementwise block, whose outputs feed the dV/dK/dQ accumulation
matmuls. On v5e the VPU chain is ~40% of the MXU time and Mosaic cannot
overlap them *within* one tile — the dataflow is a straight line.

This kernel processes TWO consecutive band tiles per grid step. The tiles
touch disjoint data, so the instruction scheduler is free to run tile B's
S/dP matmuls while tile A's VPU chain executes, and tile A's accumulation
matmuls while tile B's VPU chain executes — the TPU analogue of the
reference FA3 pingpong/warp-specialized softmax pipelining
(hopper/mainloop_bwd_sm90_tma_gmma_ws.hpp overlap of softmax and GEMMs),
done by static instruction scheduling instead of warp scheduling.

Differences from flash_bwd_fused:
  - grid (b, h_k, group, ceil(T/2)) over tile PAIRS (t0, t1) = (2u, 2u+1);
    odd T gets one zero-contribution pad tile (contributions scaled by 0).
  - dQ leaves through a manual async copy (like dK/dV) instead of a
    block-spec'd output: a pair may straddle a q-row boundary, which would
    need TWO different output blocks in one grid step.
  - bshd fast path only (d % 128 == 0); the dispatcher falls back to the
    unpaired fused kernel otherwise.

Numerics are bit-identical in structure to the fused kernel: same fixed
iteration order (t0 before t1), fp32 accumulators, no atomics —
deterministic by construction.
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.dispatch.band import PackedBand, kv_band_static
from flash_attn_tpu.dispatch.bandmask import BandMaskCfg, band_mask_config
from flash_attn_tpu.dispatch.config import get_bwd_config, normalize_window
from flash_attn_tpu.kernels.dropout_rng import dropout_keep
from flash_attn_tpu.kernels.flash_bwd import _scores_log2, _next_pow2

LOG2E = math.log2(math.e)
NEG_INF = float("-inf")

_ACC_VMEM_BUDGET = 80 * 1024 * 1024


def _bwd_paired_kernel(*refs, band: PackedBand, block_q, block_k, seqlen_q,
                       seqlen_k, num_q_blocks, group, scale, softcap, causal,
                       window_left, window_right, attention_chunk,
                       sink_token_length, has_alibi, dropout_p, num_heads,
                       score_mod, mask_mod, dq_dtype, num_aux, num_batch,
                       num_kv_heads, bmask: Optional[BandMaskCfg]):
    refs = list(refs)
    seed_ref = refs.pop(0) if dropout_p > 0.0 else None
    slopes_ref = refs.pop(0) if has_alibi else None
    bmask_ref = refs.pop(0) if bmask is not None else None
    aux = tuple(refs.pop(0)[...] for _ in range(num_aux))
    (q0_ref, do0_ref, lse0_ref, dl0_ref, k0_ref, v0_ref,
     q1_ref, do1_ref, lse1_ref, dl1_ref, k1_ref, v1_ref,
     dq_hbm, dk_hbm, dv_hbm, *rest) = refs
    daux_refs = rest[:num_aux]
    (dq_acc, dk_all, dv_all, dq_st, dk_st, dv_st, copy_sems) = rest[num_aux:]

    b_idx = pl.program_id(0)
    hk_idx = pl.program_id(1)
    g = pl.program_id(2)
    u = pl.program_id(3)
    num_pairs = pl.num_programs(3)
    h_idx = hk_idx * group + g
    shift = seqlen_k - seqlen_q
    d = dq_st.shape[-1]
    dv_dim = dv_st.shape[-1]

    T = band.num_tiles
    t0 = 2 * u
    t1 = jnp.minimum(2 * u + 1, T - 1)  # pad pair clamps to the last tile
    valid1 = 2 * u + 1 <= T - 1

    i0, n0, first0, last0 = band.decode(t0)
    i1, n1, first1, last1 = band.decode(t1)

    seg_first = jnp.logical_and(g == 0, u == 0)
    seg_last = jnp.logical_and(g == group - 1, u == num_pairs - 1)
    grid_first = jnp.logical_and(jnp.logical_and(b_idx == 0, hk_idx == 0),
                                 seg_first)

    @pl.when(seg_first)
    def _seg_init():
        dk_all[...] = jnp.zeros_like(dk_all)
        dv_all[...] = jnp.zeros_like(dv_all)

    if num_aux:
        @pl.when(grid_first)
        def _aux_init():
            for ref in daux_refs:
                ref[...] = jnp.zeros_like(ref)

    row_pad = seqlen_q % block_q != 0
    col_pad = seqlen_k % block_k != 0

    def tile(q_ref, do_ref, lse_ref, dl_ref, k_ref, v_ref, i, n, t,
             t_first, t_last, live, sem_slot, st_ref):
        """One band tile: init dq_acc at row start, accumulate, flush at
        row end. ``live`` is False only for the odd-T pad tile (all
        contributions scaled to zero; flush suppressed)."""
        @pl.when(jnp.logical_and(t == t_first, live))
        def _row_init():
            dq_acc[...] = jnp.zeros_like(dq_acc)

        q = q_ref[0]        # (bq, d)
        do = do_ref[0]      # (bq, dv)
        k = k_ref[0]        # (bk, d)
        v = v_ref[0]        # (bk, dv)
        lse2 = lse_ref[0, 0, 0].reshape(block_q, 1) * LOG2E
        delta = dl_ref[0, 0, 0].reshape(block_q, 1)
        slope = slopes_ref[b_idx, h_idx] if has_alibi else None

        if row_pad:
            rv = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0) + i * block_q
            q = jnp.where(rv < seqlen_q, q, 0)
            do = jnp.where(rv < seqlen_q, do, 0)
        if col_pad:
            cv = jax.lax.broadcasted_iota(
                jnp.int32, (block_k, 1), 0) + n * block_k
            k = jnp.where(cv < seqlen_k, k, 0)
            v = jnp.where(cv < seqlen_k, v, 0)

        if bmask is not None:
            o = pl.multiple_of(bmask.offset(i, n), 128)
            mask_bias = bmask_ref[:, pl.ds(o, block_k)]
        else:
            mask_bias = None

        s2, ds_chain = _scores_log2(
            q, k, i, n, block_q, block_k, scale=scale, softcap=softcap,
            causal=causal, window_left=window_left,
            window_right=window_right, attention_chunk=attention_chunk,
            sink_token_length=sink_token_length,
            seqlen_k=seqlen_k, shift=shift, slope=slope,
            score_mod=score_mod, mask_mod=mask_mod, b_idx=b_idx,
            h_idx=h_idx, aux=aux, masked=None, mask_bias=mask_bias,
        )
        lse2_safe = jnp.where(lse2 == NEG_INF, 0.0, lse2)
        p = jnp.exp2(s2 - lse2_safe)
        if row_pad:
            p = jnp.where(rv < seqlen_q, p, 0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_p > 0.0:
            drows = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            dcols = n * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            keep = dropout_keep(seed_ref[0, 0], b_idx * num_heads + h_idx,
                                drows, dcols, dropout_p)
            inv_keep = 1.0 / (1.0 - dropout_p)
            p_v = jnp.where(keep, p, 0.0) * inv_keep
            dp_d = jnp.where(keep, dp, 0.0) * inv_keep
        else:
            p_v = p
            dp_d = dp
        # Pad-tile kill switch: scale the matmul operands by a 0/1 scalar —
        # the pad tile re-reads the last real tile's blocks, so its
        # contributions must vanish (two broadcast multiplies, only
        # materialized when T is odd).
        gate = None if isinstance(live, bool) else \
            jnp.where(live, jnp.float32(1), jnp.float32(0))
        ds, daux = ds_chain(p * (dp_d - delta))
        if gate is not None:
            p_v = p_v * gate
            ds = ds * gate
        if num_aux:
            for ref, da in zip(daux_refs, daux):
                if gate is not None:
                    da = da * gate
                ref[...] += da.astype(jnp.float32)
        if row_pad:
            ds = jnp.where(rv < seqlen_q, ds, 0)
        p_lo = p_v.astype(do.dtype)
        ds_lo = ds.astype(q.dtype)

        dq_acc[...] += jax.lax.dot_general(
            ds_lo, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        off = n * block_k
        dv_all[pl.ds(off, block_k), :] += jax.lax.dot_general(
            p_lo, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_all[pl.ds(off, block_k), :] += jax.lax.dot_general(
            ds_lo, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(jnp.logical_and(t == t_last, live))
        def _row_flush():
            st_ref[...] = (dq_acc[...] * scale).astype(dq_dtype)
            cp = pltpu.make_async_copy(
                st_ref,
                dq_hbm.at[b_idx, pl.ds(i * block_q, block_q),
                          pl.ds(h_idx * d, d)],
                copy_sems.at[sem_slot])
            cp.start()
            cp.wait()

    tile(q0_ref, do0_ref, lse0_ref, dl0_ref, k0_ref, v0_ref,
         i0, n0, t0, first0, last0, True, 0, dq_st.at[0])
    tile(q1_ref, do1_ref, lse1_ref, dl1_ref, k1_ref, v1_ref,
         i1, n1, t1, first1, last1,
         True if band.num_tiles % 2 == 0 else valid1, 1, dq_st.at[1])

    @pl.when(seg_last)
    def _seg_flush():
        dk_st[...] = (dk_all[...] * scale).astype(dk_st.dtype)
        dv_st[...] = dv_all[...].astype(dv_st.dtype)
        cp_k = pltpu.make_async_copy(
            dk_st, dk_hbm.at[b_idx, :, pl.ds(hk_idx * d, d)],
            copy_sems.at[2])
        cp_v = pltpu.make_async_copy(
            dv_st, dv_hbm.at[b_idx, :, pl.ds(hk_idx * dv_dim, dv_dim)],
            copy_sems.at[3])
        cp_k.start()
        cp_v.start()
        cp_k.wait()
        cp_v.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "softmax_scale", "causal", "window_size", "softcap",
        "attention_chunk", "sink_token_length", "block_q", "block_k",
        "interpret", "dropout_p", "score_mod", "mask_mod", "strict_causal",
        "band_override",
    ),
)
def flash_attention_bwd_paired(
    do,   # (b, sq, h, dv) bshd
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
    aux_tensors=None,
    interpret: bool = False,
    strict_causal: bool = False,
    band_override=None,  # ((j_min,...), (j_max,...)); empty rows allowed
    # (j_max < j_min): their dQ rows are never written — callers must
    # overwrite them (split-edge driver, flash_bwd_split.py).
):
    """Paired-tile twin of flash_bwd_fused.flash_attention_bwd_fused.

    Same contract: returns (dq, dk, dv[, daux]) in bshd. Requires
    d % 128 == 0 and dv % 128 == 0 (bshd streaming layout); callers
    dispatch through flash_bwd_fused.flash_attention_bwd_auto.
    """
    b, sq, h, d = q.shape
    _, sk, h_k, _ = k.shape
    dv_dim = v.shape[-1]
    group = h // h_k
    assert d % 128 == 0 and dv_dim % 128 == 0, (d, dv_dim)
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    window_left, window_right = normalize_window(window_size)
    if strict_causal:
        assert not causal and window_right is None, (causal, window_right)
        window_right = -1
    del learnable_sink

    cfg = get_bwd_config(d, dv_dim, sq, sk, causal)
    bq = min(block_q or cfg.block_q, _next_pow2(sq))
    bk = min(block_k or cfg.block_k, _next_pow2(sk))
    nq = pl.cdiv(sq, bq)
    nk = pl.cdiv(sk, bk)
    shift = sk - sq
    sk_pad = nk * bk
    sq_pad = nq * bq

    if band_override is not None:
        jmin_s, jmax_s = band_override
        assert len(jmin_s) == nq and len(jmax_s) == nq, (nq, band_override)
    else:
        jmin_s, jmax_s = kv_band_static(
            nq, nk, bq, bk, shift, causal, window_left, window_right,
            sink_token_length, attention_chunk,
        )
    band = PackedBand(jmin_s, jmax_s)
    bmask = band_mask_config(
        causal=causal, window_left=window_left, window_right=window_right,
        attention_chunk=attention_chunk, mask_mod=mask_mod, shift=shift,
        seqlen_k=sk, block_q=bq, block_k=bk, j_min=jmin_s, j_max=jmax_s,
    )

    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1)  # (b, h, sq)
    lse = lse.astype(jnp.float32)[:, :, None, :]
    delta = delta[:, :, None, :]

    num_pairs = pl.cdiv(band.num_tiles, 2)
    T = band.num_tiles
    grid = (b, h_k, group, num_pairs)

    def t_of(u, which):
        t = 2 * u + which
        # clamp the odd-T pad tile onto the last real tile
        return jnp.minimum(t, T - 1) if T % 2 else t

    def amap(which, fn):
        return lambda b_, hk, g, u: fn(
            b_, hk, g, band.i_of(t_of(u, which)), band.j_of(t_of(u, which)))

    in_specs = []
    inputs = []
    if dropout_p > 0.0:
        in_specs.append(pl.BlockSpec(
            (1, 1), lambda b_, hk, g, u: (0, 0), memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(dropout_seed, jnp.uint32).reshape(1, 1))
    if alibi_slopes is not None:
        in_specs.append(pl.BlockSpec(
            (b, h), lambda b_, hk, g, u: (0, 0), memory_space=pltpu.SMEM))
        inputs.append(alibi_slopes.astype(jnp.float32))
    if bmask is not None:
        in_specs.append(pl.BlockSpec(
            (bq, bmask.width), lambda b_, hk, g, u: (0, 0)))
        inputs.append(bmask.build())
    aux_tensors = tuple(aux_tensors) if aux_tensors else ()
    for ax in aux_tensors:
        nd = ax.ndim
        in_specs.append(pl.BlockSpec(
            ax.shape, lambda b_, hk, g, u, nd=nd: (0,) * nd))
        inputs.append(ax)

    q_in = q.reshape(b, sq, h * d)
    do_in = do.reshape(b, sq, h * dv_dim)
    k_in = k.reshape(b, sk, h_k * d)
    v_in = v.reshape(b, sk, h_k * dv_dim)
    for which in (0, 1):
        lse_spec = pl.BlockSpec(
            (1, 1, 1, bq),
            amap(which, lambda b_, hk, g, i, n: (b_, hk * group + g, 0, i)))
        in_specs += [
            pl.BlockSpec((1, bq, d), amap(
                which, lambda b_, hk, g, i, n: (b_, i, hk * group + g))),
            pl.BlockSpec((1, bq, dv_dim), amap(
                which, lambda b_, hk, g, i, n: (b_, i, hk * group + g))),
            lse_spec,
            lse_spec,
            pl.BlockSpec((1, bk, d),
                         amap(which, lambda b_, hk, g, i, n: (b_, n, hk))),
            pl.BlockSpec((1, bk, dv_dim),
                         amap(which, lambda b_, hk, g, i, n: (b_, n, hk))),
        ]
        inputs += [q_in, do_in, lse, delta, k_in, v_in]

    kernel = functools.partial(
        _bwd_paired_kernel,
        band=band, block_q=bq, block_k=bk, seqlen_q=sq, seqlen_k=sk,
        num_q_blocks=nq, group=group, scale=softmax_scale,
        softcap=softcap, causal=causal, window_left=window_left,
        window_right=window_right, attention_chunk=attention_chunk,
        sink_token_length=sink_token_length,
        has_alibi=alibi_slopes is not None, dropout_p=dropout_p,
        num_heads=h, score_mod=score_mod, mask_mod=mask_mod,
        dq_dtype=q.dtype, num_aux=len(aux_tensors), num_batch=b,
        num_kv_heads=h_k, bmask=bmask,
    )

    daux_out_specs = [
        pl.BlockSpec(ax.shape,
                     lambda b_, hk, g, u, nd=ax.ndim: (0,) * nd)
        for ax in aux_tensors
    ]
    daux_out_shapes = [jax.ShapeDtypeStruct(ax.shape, jnp.float32)
                       for ax in aux_tensors]

    out_shapes = [
        jax.ShapeDtypeStruct((b, sq_pad, h * d), q.dtype),        # dq
        jax.ShapeDtypeStruct((b, sk_pad, h_k * d), k.dtype),      # dk
        jax.ShapeDtypeStruct((b, sk_pad, h_k * dv_dim), v.dtype),  # dv
    ]
    acc_scratch = [
        pltpu.VMEM((bq, d), jnp.float32),            # dq row accumulator
        pltpu.VMEM((sk_pad, d), jnp.float32),        # dk full-KV
        pltpu.VMEM((sk_pad, dv_dim), jnp.float32),   # dv full-KV
        pltpu.VMEM((2, bq, d), q.dtype),             # dq cast staging x2
        pltpu.VMEM((sk_pad, d), k.dtype),            # dk cast staging
        pltpu.VMEM((sk_pad, dv_dim), v.dtype),       # dv cast staging
        pltpu.SemaphoreType.DMA((4,)),
    ]

    from flash_attn_tpu.utils.fa_logging import log_kernel_launch
    log_kernel_launch(
        "flash_bwd_paired", grid=grid,
        blocks={"q": (bq, d), "kv": (bk, d)},
        causal=causal, seqlen_q=sq, seqlen_k=sk,
        acc_vmem_bytes=4 * sk_pad * (d + dv_dim), dtype=q.dtype)

    dq, dk, dv, *daux = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + daux_out_specs,
        out_shape=out_shapes + daux_out_shapes,
        scratch_shapes=acc_scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("arbitrary",) * 4 if aux_tensors else
                ("parallel", "parallel", "arbitrary", "arbitrary")),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * sq * sk * d // (2 if causal else 1),
            bytes_accessed=2 * (q.size * 2 + k.size * group * 2)
            + 4 * (q.size + k.size + v.size),
            transcendentals=b * h * sq * sk // (2 if causal else 1),
        ),
        interpret=interpret,
    )(*inputs)

    dq = dq.reshape(b, sq_pad, h, d)
    dk = dk.reshape(b, sk_pad, h_k, d)
    dv = dv.reshape(b, sk_pad, h_k, dv_dim)
    if sq_pad != sq:
        dq = dq[:, :sq]
    if sk_pad != sk:
        dk = dk[:, :sk]
        dv = dv[:, :sk]
    if aux_tensors:
        return dq, dk, dv, tuple(daux)
    return dq, dk, dv
