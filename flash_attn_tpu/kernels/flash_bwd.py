"""Pallas TPU flash-attention backward kernels.

TPU-native redesign of the reference backward
(csrc/flash_attn/src/flash_bwd_kernel.h:81 ``compute_dq_dk_dv_1colblock``,
hopper/mainloop_bwd_sm90_tma_gmma_ws.hpp). The reference accumulates dQ with
``atomicAdd`` (or a semaphore-serialized deterministic mode,
mainloop_bwd_sm90...:626). TPUs have no global atomics, so the natural —
and always-deterministic — decomposition is two kernels:

  1. dK/dV kernel: grid over KV blocks; inner sequential loop over (q-head in
     group, q-block), accumulating dK/dV in VMEM scratch. GQA head reduction
     happens inside the kernel (grid dim over the head group), so dK/dV come
     out already reduced to the h_k heads.
  2. dQ kernel: grid over Q blocks; inner sequential loop over KV blocks.

Both recompute the score matrix from (q, k, lse) — the standard
memory-linear recomputation. The dO*O row-sum preprocess
(hopper/flash_bwd_preprocess_kernel.h:22) is a trivially-fused XLA reduction
here, not a separate kernel.
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.dispatch.config import get_bwd_config, normalize_window
from flash_attn_tpu.kernels.dropout_rng import dropout_keep

LOG2E = math.log2(math.e)
NEG_INF = float("-inf")


def _scores_log2(q, k, i, j, block_q, block_k, *, scale, softcap, causal,
                 window_left, window_right, attention_chunk,
                 sink_token_length, seqlen_k, shift, slope,
                 score_mod=None, mask_mod=None, b_idx=None, h_idx=None,
                 aux=(), masked=None):
    """Recompute the masked base-2 score block s2 (block_q, block_k) exactly
    as the forward kernel built it. Returns (s2, ds_chain) where
    ds_chain(ds) -> (ds_raw, daux): dL/d(raw scaled scores) plus this tile's
    aux-tensor cotangent contributions (daux is () unless aux given) —
    identity unless softcap or a score_mod applies (both pointwise maps
    whose vjp is traced inline).

    ``masked``: None -> apply whatever mask the static flags require (the
    default); False -> the caller statically guarantees every element of
    this tile is valid, skip all mask VPU work (interior-tile fast path,
    the reference tile-scheduler's "no-mask specialization"); True ->
    force the mask block."""
    plain = softcap == 0.0 and score_mod is None
    s_raw = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # Fast path: fold softmax scale and the exp2 conversion into ONE
    # multiply (VPU passes on the (bq,bk) tile are the causal-kernel
    # bottleneck; every pass counts).
    s = None if plain else s_raw * scale

    # Vector iotas ((bq,1) rows / (1,bk) cols): each mask term is ONE
    # broadcast compare on the (bq,bk) tile instead of the round-1
    # matrix-iota build — same restructure as the forward kernel's mask
    # (mask cost was ~1/3 of causal VPU time on v5e).
    rows = i * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, 1), 0
    )
    cols = j * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (1, block_k), 1
    )

    dtanh = None
    mod_vjp = None
    if softcap > 0.0:
        t = jnp.tanh(s / softcap)
        dtanh = 1.0 - t * t
        s = t * softcap
    if score_mod is not None:
        # score_mod/mask_mod get full matrices per their (b, h, rows, cols)
        # contract.
        rows_m = jnp.broadcast_to(rows, (block_q, block_k))
        cols_m = jnp.broadcast_to(cols, (block_q, block_k))
        if aux:
            s, mod_vjp = jax.vjp(
                lambda x, a: score_mod(x, b_idx, h_idx, rows_m, cols_m, a),
                s, aux)
        else:
            s, mod_vjp = jax.vjp(
                lambda x: score_mod(x, b_idx, h_idx, rows_m, cols_m), s)
    s2 = s_raw * (scale * LOG2E) if plain else s * LOG2E
    if slope is not None:
        if causal:
            bias = jnp.broadcast_to(
                (cols - (seqlen_k - 1)).astype(jnp.float32),
                (block_q, block_k))
        else:
            bias = -jnp.abs(rows + shift - cols).astype(jnp.float32)
        s2 = s2 + slope * LOG2E * bias

    needs_mask = (
        causal or window_right is not None or window_left is not None
        or attention_chunk > 0 or (seqlen_k % block_k != 0)
        or mask_mod is not None
    ) if masked is None else masked
    if needs_mask:
        valid = None

        def _and(a, b):
            return b if a is None else jnp.logical_and(a, b)

        wr = 0 if causal else window_right
        if causal or wr is not None:
            valid = _and(valid, cols <= rows + (shift + wr))
        if window_left is not None:
            in_window = cols >= rows + (shift - window_left)
            if sink_token_length > 0:
                in_window = jnp.logical_or(in_window, cols < sink_token_length)
            valid = _and(valid, in_window)
        if attention_chunk > 0:
            rs = rows + shift
            limit = rs - rs % attention_chunk
            valid = _and(
                valid,
                jnp.logical_and(cols >= limit, cols < limit + attention_chunk),
            )
        if seqlen_k % block_k != 0:
            valid = _and(valid, jnp.broadcast_to(
                cols < seqlen_k, (block_q, block_k)))
        if mask_mod is not None:
            rows_m = jnp.broadcast_to(rows, (block_q, block_k))
            cols_m = jnp.broadcast_to(cols, (block_q, block_k))
            valid = _and(valid, mask_mod(b_idx, h_idx, rows_m, cols_m)
                         if not aux else
                         mask_mod(b_idx, h_idx, rows_m, cols_m, aux))
        valid = jnp.broadcast_to(valid, (block_q, block_k))
        s2 = jnp.where(valid, s2, NEG_INF)
        if dtanh is not None:
            dtanh = jnp.where(valid, dtanh, 0.0)

    def ds_chain(ds):
        daux = ()
        if mod_vjp is not None:
            if aux:
                ds, daux = mod_vjp(ds)
            else:
                ds = mod_vjp(ds)[0]
        if dtanh is not None:
            ds = ds * dtanh
        return ds, daux

    return s2, ds_chain


def _q_block_bounds(j, block_q, block_k, shift, num_q_blocks, causal,
                    window_left, window_right, sink_token_length,
                    attention_chunk):
    """Valid q-block band [i_min, i_max] for KV block j (mirror of the fwd
    _kv_block_bounds, solved for rows)."""
    i_min = 0
    wr = 0 if causal else window_right
    if causal or wr is not None:
        # col <= row + shift + wr  =>  row >= col - shift - wr
        row_lo = j * block_k - shift - wr
        i_min = jnp.maximum(0, row_lo // block_q)
    i_max = num_q_blocks - 1
    if window_left is not None and sink_token_length == 0:
        # col >= row + shift - wl  =>  row <= col + wl - shift
        row_hi = j * block_k + (block_k - 1) + window_left - shift
        i_max = jnp.minimum(i_max, row_hi // block_q)
    if attention_chunk > 0 and sink_token_length == 0 and window_left is None:
        # rows in chunk of col: row+shift in [col_lo_chunk, ...); row bounded
        # below by chunk start of the *lowest* col in block.
        row_hi = j * block_k + (block_k - 1) + attention_chunk - shift
        i_max = jnp.minimum(i_max, row_hi // block_q)
    return i_min, i_max


def _dkdv_kernel(*refs, block_q, block_k, seqlen_q, seqlen_k, num_q_blocks,
                 group, scale, softcap, causal, window_left, window_right,
                 attention_chunk, sink_token_length, has_alibi, dropout_p,
                 num_heads, score_mod, mask_mod, k_dtype, v_dtype):
    refs = list(refs)
    seed_ref = refs.pop(0) if dropout_p > 0.0 else None
    slopes_ref = refs.pop(0) if has_alibi else None
    (q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
     dk_ref, dv_ref, dk_acc, dv_acc) = refs

    b_idx = pl.program_id(0)
    hk_idx = pl.program_id(1)
    n = pl.program_id(2)   # kv block
    g = pl.program_id(3)   # head within GQA group
    i = pl.program_id(4)   # q block
    shift = seqlen_k - seqlen_q

    @pl.when(jnp.logical_and(g == 0, i == 0))
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    i_min, i_max = _q_block_bounds(
        n, block_q, block_k, shift, num_q_blocks, causal,
        window_left, window_right, sink_token_length, attention_chunk,
    )

    @pl.when(jnp.logical_and(i >= i_min, i <= i_max))
    def _compute():
        q = q_ref[0, 0]       # (bq, d)
        do = do_ref[0, 0]     # (bq, dv)
        k = k_ref[0, 0]       # (bk, d)
        v = v_ref[0, 0]       # (bk, dv)
        lse2 = lse_ref[0, 0, 0].reshape(block_q, 1) * LOG2E
        delta = delta_ref[0, 0, 0].reshape(block_q, 1)
        slope = (slopes_ref[b_idx, hk_idx * group + g]
                 if has_alibi else None)
        row_pad = seqlen_q % block_q != 0
        if row_pad:
            # Padded q rows hold garbage that would otherwise leak into the
            # dK/dV sums (and 0*garbage = NaN); zero every operand row and the
            # derived p/ds rows below.
            rv = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0) + i * block_q
            q = jnp.where(rv < seqlen_q, q, 0)
            do = jnp.where(rv < seqlen_q, do, 0)

        s2, ds_chain = _scores_log2(
            q, k, i, n, block_q, block_k, scale=scale, softcap=softcap,
            causal=causal, window_left=window_left, window_right=window_right,
            attention_chunk=attention_chunk, sink_token_length=sink_token_length,
            seqlen_k=seqlen_k, shift=shift, slope=slope,
            score_mod=score_mod, mask_mod=mask_mod,
            b_idx=b_idx, h_idx=hk_idx * group + g,
        )
        lse2_safe = jnp.where(lse2 == NEG_INF, 0.0, lse2)
        p = jnp.exp2(s2 - lse2_safe)  # (bq, bk); masked -> 0
        if row_pad:
            p = jnp.where(rv < seqlen_q, p, 0)
        if dropout_p > 0.0:
            # regenerate the fwd's keep mask from the same counters
            drows = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            dcols = n * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            keep = dropout_keep(
                seed_ref[0, 0], b_idx * num_heads + hk_idx * group + g,
                drows, dcols, dropout_p)
            scale_keep = 1.0 / (1.0 - dropout_p)
            p_v = jnp.where(keep, p, 0.0) * scale_keep
        else:
            p_v = p
        # dV += P_dropped^T dO
        dv_acc[...] += jax.lax.dot_general(
            p_v.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dP = dO V^T ; dS = P * (D*dP/(1-p) - delta) [* dtanh]
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if dropout_p > 0.0:
            dp = jnp.where(keep, dp, 0.0) * scale_keep
        ds, _ = ds_chain(p * (dp - delta))
        if row_pad:
            ds = jnp.where(rv < seqlen_q, ds, 0)
        # dK += dS^T Q * scale
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(jnp.logical_and(g == group - 1, i == num_q_blocks - 1))
    def _epilogue():
        dk_ref[0, 0] = dk_acc[...].astype(k_dtype)
        dv_ref[0, 0] = dv_acc[...].astype(v_dtype)


def _dq_kernel(*refs, block_q, block_k, seqlen_q, seqlen_k, num_kv_blocks,
               scale, softcap, causal, window_left, window_right,
               attention_chunk, sink_token_length, has_alibi, dropout_p,
               num_heads, score_mod, mask_mod, q_dtype):
    refs = list(refs)
    seed_ref = refs.pop(0) if dropout_p > 0.0 else None
    slopes_ref = refs.pop(0) if has_alibi else None
    (q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
     dq_ref, dq_acc) = refs

    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    i = pl.program_id(2)
    j = pl.program_id(3)
    shift = seqlen_k - seqlen_q

    @pl.when(j == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    from flash_attn_tpu.kernels.flash_fwd import _kv_block_bounds
    j_min, j_max = _kv_block_bounds(
        i, block_q, block_k, shift, num_kv_blocks, causal,
        window_left, window_right, sink_token_length, attention_chunk,
    )

    @pl.when(jnp.logical_and(j >= j_min, j <= j_max))
    def _compute():
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        if seqlen_k % block_k != 0:
            # Padded K/V rows are garbage; dq rows beyond seqlen_q are
            # discarded on write, but garbage K/V would inject NaN through
            # 0 * garbage products.
            cv = jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0) + j * block_k
            k = jnp.where(cv < seqlen_k, k, 0)
            v = jnp.where(cv < seqlen_k, v, 0)
        lse2 = lse_ref[0, 0, 0].reshape(block_q, 1) * LOG2E
        delta = delta_ref[0, 0, 0].reshape(block_q, 1)
        slope = (slopes_ref[b_idx, h_idx]
                 if has_alibi else None)

        s2, ds_chain = _scores_log2(
            q, k, i, j, block_q, block_k, scale=scale, softcap=softcap,
            causal=causal, window_left=window_left, window_right=window_right,
            attention_chunk=attention_chunk, sink_token_length=sink_token_length,
            seqlen_k=seqlen_k, shift=shift, slope=slope,
            score_mod=score_mod, mask_mod=mask_mod, b_idx=b_idx, h_idx=h_idx,
        )
        lse2_safe = jnp.where(lse2 == NEG_INF, 0.0, lse2)
        p = jnp.exp2(s2 - lse2_safe)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if dropout_p > 0.0:
            drows = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            dcols = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            keep = dropout_keep(seed_ref[0, 0], b_idx * num_heads + h_idx,
                                drows, dcols, dropout_p)
            dp = jnp.where(keep, dp, 0.0) * (1.0 / (1.0 - dropout_p))
        ds, _ = ds_chain(p * (dp - delta))
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(j == num_kv_blocks - 1)
    def _epilogue():
        dq_ref[0, 0] = dq_acc[...].astype(q_dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "softmax_scale", "causal", "window_size", "softcap",
        "attention_chunk", "sink_token_length", "block_q", "block_k",
        "interpret", "dropout_p", "score_mod", "mask_mod",
        "strict_causal",
    ),
)
def flash_attention_bwd(
    do,   # (b, h, sq, dv)
    q,    # (b, h, sq, d)
    k,    # (b, h_k, sk, d)
    v,    # (b, h_k, sk, dv)
    out,  # (b, h, sq, dv)
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
    interpret: bool = False,
    strict_causal: bool = False,  # col < row (striped ring attention)
):
    """Returns (dq, dk, dv) in the kernel layout (b, h[, h_k], s, d), fp32."""
    b, h, sq, d = q.shape
    _, h_k, sk, _ = k.shape
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

    # Preprocess: delta = rowsum(dO * O) (fp32), the reference's
    # flash_bwd_preprocess_kernel — a plain fused XLA reduction on TPU.
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # (b, h, sq)
    # (b, h, 1, sq) layout so seq rides the 128-lane axis inside the kernels.
    lse = lse.astype(jnp.float32)[:, :, None, :]
    delta = delta[:, :, None, :]

    common = dict(
        block_q=bq, block_k=bk, seqlen_q=sq, seqlen_k=sk,
        scale=softmax_scale, softcap=softcap, causal=causal,
        window_left=window_left, window_right=window_right,
        attention_chunk=attention_chunk, sink_token_length=sink_token_length,
        has_alibi=alibi_slopes is not None,
        dropout_p=dropout_p, num_heads=h,
        score_mod=score_mod, mask_mod=mask_mod,
    )
    seed_arr = (jnp.asarray(dropout_seed, jnp.uint32).reshape(1, 1)
                if dropout_p > 0.0 else None)
    seed_spec5 = pl.BlockSpec((1, 1), lambda b_, hk, n, g, i: (0, 0),
                              memory_space=pltpu.SMEM)
    seed_spec4 = pl.BlockSpec((1, 1), lambda b_, h_, i, j: (0, 0),
                              memory_space=pltpu.SMEM)

    # ---------------- dK/dV kernel ----------------
    def iclamp(j, i):
        i_min, i_max = _q_block_bounds(
            j, bq, bk, shift, nq, causal, window_left, window_right,
            sink_token_length, attention_chunk,
        )
        return jnp.clip(jnp.clip(i, i_min, i_max), 0, nq - 1)

    dkdv_in_specs = []
    dkdv_inputs = []
    if dropout_p > 0.0:
        dkdv_in_specs.append(seed_spec5)
        dkdv_inputs.append(seed_arr)
    if alibi_slopes is not None:
        dkdv_in_specs.append(
            pl.BlockSpec((b, h), lambda b_, hk, n, g, i: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        dkdv_inputs.append(alibi_slopes.astype(jnp.float32))
    dkdv_in_specs += [
        pl.BlockSpec((1, 1, bq, d),
                     lambda b_, hk, n, g, i: (b_, hk * group + g, iclamp(n, i), 0)),
        pl.BlockSpec((1, 1, bq, dv_dim),
                     lambda b_, hk, n, g, i: (b_, hk * group + g, iclamp(n, i), 0)),
        pl.BlockSpec((1, 1, 1, bq),
                     lambda b_, hk, n, g, i: (b_, hk * group + g, 0, iclamp(n, i))),
        pl.BlockSpec((1, 1, 1, bq),
                     lambda b_, hk, n, g, i: (b_, hk * group + g, 0, iclamp(n, i))),
        pl.BlockSpec((1, 1, bk, d), lambda b_, hk, n, g, i: (b_, hk, n, 0)),
        pl.BlockSpec((1, 1, bk, dv_dim), lambda b_, hk, n, g, i: (b_, hk, n, 0)),
    ]
    dkdv_inputs += [q, do, lse, delta, k, v]

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkdv_kernel, num_q_blocks=nq, group=group,
            k_dtype=jnp.float32, v_dtype=jnp.float32, **common,
        ),
        grid=(b, h_k, nk, group, nq),
        in_specs=dkdv_in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bk, d), lambda b_, hk, n, g, i: (b_, hk, n, 0)),
            pl.BlockSpec((1, 1, bk, dv_dim), lambda b_, hk, n, g, i: (b_, hk, n, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h_k, sk, d), jnp.float32),
            jax.ShapeDtypeStruct((b, h_k, sk, dv_dim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, dv_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "arbitrary", "arbitrary"
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * b * h * sq * sk * (d + dv_dim) // (2 if causal else 1) // 2,
            bytes_accessed=2 * (q.size + k.size * group + v.size * group) * 2,
            transcendentals=b * h * sq * sk // (2 if causal else 1),
        ),
        interpret=interpret,
    )(*dkdv_inputs)

    # ---------------- dQ kernel ----------------
    from flash_attn_tpu.kernels.flash_fwd import _kv_block_bounds

    def jclamp(i, j):
        j_min, j_max = _kv_block_bounds(
            i, bq, bk, shift, nk, causal, window_left, window_right,
            sink_token_length, attention_chunk,
        )
        return jnp.clip(jnp.clip(j, j_min, j_max), 0, nk - 1)

    dq_in_specs = []
    dq_inputs = []
    if dropout_p > 0.0:
        dq_in_specs.append(seed_spec4)
        dq_inputs.append(seed_arr)
    if alibi_slopes is not None:
        dq_in_specs.append(
            pl.BlockSpec((b, h), lambda b_, h_, i, j: (0, 0),
                         memory_space=pltpu.SMEM)
        )
        dq_inputs.append(alibi_slopes.astype(jnp.float32))
    dq_in_specs += [
        pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
        pl.BlockSpec((1, 1, bq, dv_dim), lambda b_, h_, i, j: (b_, h_, i, 0)),
        pl.BlockSpec((1, 1, 1, bq), lambda b_, h_, i, j: (b_, h_, 0, i)),
        pl.BlockSpec((1, 1, 1, bq), lambda b_, h_, i, j: (b_, h_, 0, i)),
        pl.BlockSpec((1, 1, bk, d),
                     lambda b_, h_, i, j: (b_, h_ // group, jclamp(i, j), 0)),
        pl.BlockSpec((1, 1, bk, dv_dim),
                     lambda b_, h_, i, j: (b_, h_ // group, jclamp(i, j), 0)),
    ]
    dq_inputs += [q, do, lse, delta, k, v]

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, num_kv_blocks=nk, q_dtype=jnp.float32, **common,
        ),
        grid=(b, h, nq, nk),
        in_specs=dq_in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * b * h * sq * sk * d // (2 if causal else 1),
            bytes_accessed=2 * (q.size + k.size * group + v.size * group) * 2,
            transcendentals=b * h * sq * sk // (2 if causal else 1),
        ),
        interpret=interpret,
    )(*dq_inputs)

    return dq, dk, dv


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p
