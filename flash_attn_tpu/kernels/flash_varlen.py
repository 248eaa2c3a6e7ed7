"""Pallas TPU varlen (packed / ragged) flash attention, forward + backward.

TPU-native redesign of the reference varlen path
(csrc/flash_attn/flash_api.cpp:539 ``mha_varlen_fwd``,
csrc/flash_attn/src/block_info.h:13 ``BlockInfo``,
hopper/seqlen.h:14 ``SeqlenInfo``). Design differences, deliberate:

 - The packed (total_tokens, heads, dim) tensors are tiled *flat* across
   sequence boundaries with dense aligned blocks — no per-sequence tile
   origins, so every DMA is aligned and full-width. Per-token segment ids
   (and in-sequence positions) carried in VMEM sideband vectors reconstruct
   the sequence structure as masks, and per-tile [min,max] tile bands
   (dispatch/varlen_meta.py, the analogue of the reference's
   prepare_varlen_num_blocks metadata) skip empty tiles.
 - `seqused_q/k` (reference hopper/flash_api.cpp seqused semantics) are
   honored by marking trailing tokens with sentinel segments.
 - The same two-kernel deterministic backward split as flash_bwd.py.
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.dispatch.config import (
    get_bwd_config,
    get_fwd_config,
    normalize_window,
)
from flash_attn_tpu.dispatch.varlen_meta import (
    K_PAD_SEG,
    Q_PAD_SEG,
    compute_varlen_meta,
)
from flash_attn_tpu.kernels.dropout_rng import dropout_keep

LOG2E = math.log2(math.e)
LN2 = math.log(2.0)
NEG_INF = float("-inf")


def _varlen_mask_and_bias(
    s2, seg_q, pos_q, shift_q, sk_q, seg_k, pos_k, slope, *,
    causal, window_left, window_right, attention_chunk, softcap_dtanh,
):
    """Apply segment + causal/local/chunk masks and optional ALiBi bias to the
    base-2 score block. seg_q/pos_q/shift_q/sk_q are (bq,1); seg_k/pos_k are
    (1,bk); slope is (bq,1) or None."""
    if slope is not None:
        if causal:
            bias = (pos_k - (sk_q - 1)).astype(jnp.float32)
        else:
            bias = -jnp.abs(pos_q + shift_q - pos_k).astype(jnp.float32)
        s2 = s2 + slope * LOG2E * bias

    valid = seg_q == seg_k  # (bq, bk); sentinels never match
    wr = 0 if causal else window_right
    if causal or wr is not None:
        valid = jnp.logical_and(valid, pos_k <= pos_q + shift_q + wr)
    if window_left is not None:
        valid = jnp.logical_and(valid, pos_k >= pos_q + shift_q - window_left)
    if attention_chunk > 0:
        rs = pos_q + shift_q
        limit = rs - rs % attention_chunk
        valid = jnp.logical_and(
            valid, jnp.logical_and(pos_k >= limit, pos_k < limit + attention_chunk)
        )
    s2 = jnp.where(valid, s2, NEG_INF)
    if softcap_dtanh is not None:
        softcap_dtanh = jnp.where(valid, softcap_dtanh, 0.0)
    return s2, softcap_dtanh


def _varlen_fwd_kernel(
    jband_min_ref, jband_max_ref,  # scalar prefetch (NQ,)
    *refs,
    block_q, block_k, num_kv_blocks,
    scale_log2, softcap, causal, window_left, window_right, attention_chunk,
    has_alibi, dropout_p, out_dtype, has_sink=False,
):
    refs = list(refs)
    seed_ref = refs.pop(0) if dropout_p > 0.0 else None
    (segq_ref, posq_ref, shiftq_ref, skq_ref, segk_ref, posk_ref,
     kval_ref) = refs[:7]
    rest = refs[7:]
    slope_ref = rest.pop(0) if has_alibi else None
    sink_ref = rest.pop(0) if has_sink else None
    (q_ref, k_ref, v_ref, out_ref, lse_ref, acc, m_s, l_s) = rest

    h_idx = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc[...] = jnp.zeros_like(acc)

    j_min = jband_min_ref[i]
    j_max = jband_max_ref[i]
    should_run = jnp.logical_and(j >= j_min, j <= j_max)

    @pl.when(should_run)
    def _compute():
        q = q_ref[0]  # (bq, d)
        k = k_ref[0]  # (bk, d)
        v = v_ref[0]  # (bk, dv)
        kval = kval_ref[...]  # (bk, 1) int32: 1 if k token is real
        v = jnp.where(kval > 0, v, 0)

        if softcap > 0.0:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (scale_log2 / LOG2E)
            t = jnp.tanh(s / softcap)
            s2 = t * softcap * LOG2E
        else:
            qs = (q.astype(jnp.float32) * scale_log2).astype(q.dtype)
            s2 = jax.lax.dot_general(
                qs, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        seg_q = segq_ref[...]     # (bq, 1)
        pos_q = posq_ref[...]
        shift_q = shiftq_ref[...]
        sk_q = skq_ref[...]
        seg_k = segk_ref[...]     # (1, bk)
        pos_k = posk_ref[...]
        slope = slope_ref[0] if has_alibi else None  # (bq, 1)
        s2, _ = _varlen_mask_and_bias(
            s2, seg_q, pos_q, shift_q, sk_q, seg_k, pos_k, slope,
            causal=causal, window_left=window_left, window_right=window_right,
            attention_chunk=attention_chunk, softcap_dtanh=None,
        )

        m_prev = m_s[...]
        l_prev = l_s[...]
        row_max = jnp.max(s2, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(row_max, m_prev.shape))
        m_safe = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp2(s2 - m_safe[:, :1])
        corr = jnp.exp2(m_prev - m_safe)
        row_sum = jnp.sum(p, axis=-1, keepdims=True)
        l_s[...] = l_prev * corr + jnp.broadcast_to(row_sum, l_prev.shape)
        m_s[...] = m_new
        if dropout_p > 0.0:
            # counters: (head, flat row token, flat col token)
            drows = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            dcols = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            keep = dropout_keep(seed_ref[0, 0], h_idx, drows, dcols,
                                dropout_p)
            p = jnp.where(keep, p, 0.0)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc[...] = acc[...] * corr[:, :1] + pv

    @pl.when(j == num_kv_blocks - 1)
    def _epilogue():
        m = m_s[:, :1]
        l = l_s[:, :1]
        if has_sink:
            # same per-head sink fold as the dense kernel's epilogue: the
            # sink logit joins the softmax denominator only
            sink = sink_ref[0, h_idx].astype(jnp.float32)
            m_nat = m * LN2
            m_tot = jnp.maximum(m_nat, sink)
            l = l * jnp.exp(m_nat - m_tot) + jnp.exp(sink - m_tot)
            o = acc[...] * jnp.exp(m_nat - m_tot)
            lse = m_tot + jnp.log(l)
        else:
            o = acc[...]
            lse = m * LN2 + jnp.log(l)
        inv_l = jnp.where(l == 0.0, 0.0, 1.0 / l)
        if dropout_p > 0.0:
            inv_l = inv_l / (1.0 - dropout_p)
        out_ref[0] = (o * inv_l).astype(out_dtype)
        lse_ref[0, 0] = lse[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_seqlen_q", "max_seqlen_k", "softmax_scale", "causal",
        "window_size", "softcap", "attention_chunk", "block_q", "block_k",
        "interpret", "dropout_p",
    ),
)
def flash_attention_varlen_fwd(
    q,  # (total_q, h, d)
    k,  # (total_k, h_k, d)
    v,  # (total_k, h_k, dv)
    cu_seqlens_q,  # (b+1,) int32
    cu_seqlens_k,  # (b+1,) int32
    max_seqlen_q: int,
    max_seqlen_k: int,
    seqused_q=None,
    seqused_k=None,
    alibi_slopes=None,  # (b, h) f32
    learnable_sink=None,  # (h,) logits
    dropout_p: float = 0.0,
    dropout_seed=None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[Optional[int], Optional[int]] = (None, None),
    softcap: float = 0.0,
    attention_chunk: int = 0,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    meta=None,  # precomputed VarlenMeta from get_scheduler_metadata
    interpret: bool = False,
):
    """Returns (out (total_q, h, dv), lse (h, total_q) fp32)."""
    total_q, h, d = q.shape
    total_k, h_k, _ = k.shape
    dv = v.shape[-1]
    group = h // h_k
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    window_left, window_right = normalize_window(window_size)

    cfg = get_fwd_config(d, dv, max_seqlen_q, max_seqlen_k, causal)
    bq = min(block_q or cfg.block_q, _next_pow2(total_q))
    bk = min(block_k or cfg.block_k, _next_pow2(total_k))
    nq = pl.cdiv(total_q, bq)
    nk = pl.cdiv(total_k, bk)

    if meta is None:
        meta = compute_varlen_meta(
            cu_seqlens_q, cu_seqlens_k, bq, bk, nq, nk,
            causal=causal, window_left=window_left, window_right=window_right,
            seqused_q=seqused_q, seqused_k=seqused_k,
        )
    # else: caller-supplied schedule (get_scheduler_metadata) — the caller
    # pins block_q/block_k to the values the metadata was built with
    # (interface.py), the analogue of hopper/flash_api.cpp:1004 reusing
    # precomputed scheduler metadata instead of recomputing per call.
    col = lambda x: x.reshape(-1, 1)           # (total_pad, 1) q-side
    row = lambda x: x.reshape(1, -1)           # (1, total_pad) k-side
    shift_q = meta.sk_of_q - meta.sq_of_q
    kvalid = (meta.seg_k != K_PAD_SEG).astype(jnp.int32)

    # q-side sideband blocks (bq,1); k-side (1,bk)
    qcol_spec = pl.BlockSpec((bq, 1), lambda h_, i, j, *_: (i, 0))
    krow_spec = pl.BlockSpec((1, bk), lambda h_, i, j, *_: (0, j))
    kcol_spec = pl.BlockSpec((bk, 1), lambda h_, i, j, *_: (j, 0))

    # transpose packed tensors to (heads, total, dim)
    qt = jnp.swapaxes(q, 0, 1)
    kt = jnp.swapaxes(k, 0, 1)
    vt = jnp.swapaxes(v, 0, 1)

    in_specs = []
    inputs = []
    if dropout_p > 0.0:
        assert dropout_seed is not None
        in_specs.append(pl.BlockSpec((1, 1), lambda h_, i, j, *_: (0, 0),
                                     memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(dropout_seed, jnp.uint32).reshape(1, 1))
    in_specs += [
        qcol_spec, qcol_spec, qcol_spec, qcol_spec,  # seg/pos/shift/sk (q)
        krow_spec, krow_spec,                        # seg/pos (k)
        kcol_spec,                                   # kvalid
    ]
    inputs += [
        col(meta.seg_q), col(meta.pos_q), col(shift_q), col(meta.sk_of_q),
        row(meta.seg_k), row(meta.pos_k),
        kvalid.reshape(-1, 1),
    ]
    if alibi_slopes is not None:
        # slope per (head, token): gather to the packed layout outside.
        b = cu_seqlens_q.shape[0] - 1
        seg_c = jnp.clip(meta.seg_q, 0, b - 1)
        slope_ht = alibi_slopes.astype(jnp.float32).T[:, seg_c]  # (h, total_pad)
        in_specs.append(
            pl.BlockSpec((1, bq, 1), lambda h_, i, j, *_: (h_, i, 0))
        )
        inputs.append(slope_ht[:, :, None])
    if learnable_sink is not None:
        in_specs.append(pl.BlockSpec(
            (1, h), lambda h_, i, j, *_: (0, 0), memory_space=pltpu.SMEM))
        inputs.append(learnable_sink.reshape(1, h).astype(jnp.float32))
    in_specs += [
        pl.BlockSpec((1, bq, d), lambda h_, i, j, *_: (h_, i, 0)),
        pl.BlockSpec((1, bk, d),
                     lambda h_, i, j, *_: (h_ // group, j, 0)),
        pl.BlockSpec((1, bk, dv),
                     lambda h_, i, j, *_: (h_ // group, j, 0)),
    ]
    inputs += [qt, kt, vt]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(h, nq, nk),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bq, dv), lambda h_, i, j, *_: (h_, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda h_, i, j, *_: (h_, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, dv), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _varlen_fwd_kernel,
        block_q=bq, block_k=bk, num_kv_blocks=nk,
        scale_log2=softmax_scale * LOG2E, softcap=softcap, causal=causal,
        window_left=window_left, window_right=window_right,
        attention_chunk=attention_chunk,
        has_alibi=alibi_slopes is not None, dropout_p=dropout_p,
        out_dtype=q.dtype, has_sink=learnable_sink is not None,
    )

    from flash_attn_tpu.utils.fa_logging import log_kernel_launch
    log_kernel_launch(
        "flash_varlen_fwd", blocks={"q": (bq, d), "kv": (bk, d)},
        total_q=total_q, heads=h, causal=causal)

    out_t, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((h, total_q, dv), q.dtype),
            jax.ShapeDtypeStruct((h, 1, total_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(meta.jband_min, meta.jband_max, *inputs)
    return jnp.swapaxes(out_t, 0, 1), lse[:, 0, :]


# ----------------------------- backward -----------------------------------


def _varlen_dkdv_kernel(
    iband_min_ref, iband_max_ref,
    *refs,
    block_q, block_k, num_q_blocks, group, scale, softcap, causal,
    window_left, window_right, attention_chunk, has_alibi, dropout_p,
):
    refs = list(refs)
    seed_ref = refs.pop(0) if dropout_p > 0.0 else None
    slope_ref = None
    if has_alibi:
        (segq_ref, posq_ref, shiftq_ref, skq_ref, segk_ref, posk_ref,
         kval_ref, slope_ref, q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    else:
        (segq_ref, posq_ref, shiftq_ref, skq_ref, segk_ref, posk_ref,
         kval_ref, q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs

    hk_idx = pl.program_id(0)
    n = pl.program_id(1)   # kv block
    g = pl.program_id(2)   # gqa group member
    i = pl.program_id(3)   # q block

    @pl.when(jnp.logical_and(g == 0, i == 0))
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    i_min = iband_min_ref[n]
    i_max = iband_max_ref[n]

    @pl.when(jnp.logical_and(i >= i_min, i <= i_max))
    def _compute():
        q = q_ref[0]
        do = do_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        seg_q = segq_ref[...]
        qvalid = seg_q != Q_PAD_SEG  # (bq, 1)
        q = jnp.where(qvalid, q, 0)
        do = jnp.where(qvalid, do, 0)
        kval = kval_ref[...]
        v = jnp.where(kval > 0, v, 0)
        k = jnp.where(kval > 0, k, 0)
        lse2 = lse_ref[0].reshape(block_q, 1) * LOG2E
        delta = delta_ref[0].reshape(block_q, 1)

        s2, dtanh = _varlen_scores(
            q, k, segq_ref, posq_ref, shiftq_ref, skq_ref, segk_ref, posk_ref,
            slope_ref, scale=scale, softcap=softcap, causal=causal,
            window_left=window_left, window_right=window_right,
            attention_chunk=attention_chunk, has_alibi=has_alibi,
        )
        lse2_safe = jnp.where(lse2 == NEG_INF, 0.0, lse2)
        p = jnp.exp2(s2 - lse2_safe)
        p = jnp.where(qvalid, p, 0)
        if dropout_p > 0.0:
            head = hk_idx * group + g
            drows = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            dcols = n * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            keep = dropout_keep(seed_ref[0, 0], head, drows, dcols, dropout_p)
            scale_keep = 1.0 / (1.0 - dropout_p)
            p_v = jnp.where(keep, p, 0.0) * scale_keep
        else:
            p_v = p
        dv_acc[...] += jax.lax.dot_general(
            p_v.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if dropout_p > 0.0:
            dp = jnp.where(keep, dp, 0.0) * scale_keep
        ds = p * (dp - delta)
        if dtanh is not None:
            ds = ds * dtanh
        ds = jnp.where(qvalid, ds, 0)
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(jnp.logical_and(g == group - 1, i == num_q_blocks - 1))
    def _epilogue():
        dk_ref[0] = dk_acc[...]
        dv_ref[0] = dv_acc[...]


def _varlen_scores(q, k, segq_ref, posq_ref, shiftq_ref, skq_ref, segk_ref,
                   posk_ref, slope_ref, *, scale, softcap, causal,
                   window_left, window_right, attention_chunk, has_alibi):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dtanh = None
    if softcap > 0.0:
        t = jnp.tanh(s / softcap)
        dtanh = 1.0 - t * t
        s = t * softcap
    s2 = s * LOG2E
    slope = slope_ref[0] if has_alibi else None
    s2, dtanh = _varlen_mask_and_bias(
        s2, segq_ref[...], posq_ref[...], shiftq_ref[...], skq_ref[...],
        segk_ref[...], posk_ref[...], slope,
        causal=causal, window_left=window_left, window_right=window_right,
        attention_chunk=attention_chunk, softcap_dtanh=dtanh,
    )
    return s2, dtanh


def _varlen_dq_kernel(
    jband_min_ref, jband_max_ref,
    *refs,
    block_q, block_k, num_kv_blocks, scale, softcap, causal,
    window_left, window_right, attention_chunk, has_alibi, dropout_p,
):
    refs = list(refs)
    seed_ref = refs.pop(0) if dropout_p > 0.0 else None
    slope_ref = None
    if has_alibi:
        (segq_ref, posq_ref, shiftq_ref, skq_ref, segk_ref, posk_ref,
         kval_ref, slope_ref, q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
         dq_ref, dq_acc) = refs
    else:
        (segq_ref, posq_ref, shiftq_ref, skq_ref, segk_ref, posk_ref,
         kval_ref, q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
         dq_ref, dq_acc) = refs

    h_idx = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    j_min = jband_min_ref[i]
    j_max = jband_max_ref[i]

    @pl.when(jnp.logical_and(j >= j_min, j <= j_max))
    def _compute():
        q = q_ref[0]
        do = do_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        kval = kval_ref[...]
        k = jnp.where(kval > 0, k, 0)
        v = jnp.where(kval > 0, v, 0)
        lse2 = lse_ref[0].reshape(block_q, 1) * LOG2E
        delta = delta_ref[0].reshape(block_q, 1)

        s2, dtanh = _varlen_scores(
            q, k, segq_ref, posq_ref, shiftq_ref, skq_ref, segk_ref, posk_ref,
            slope_ref, scale=scale, softcap=softcap, causal=causal,
            window_left=window_left, window_right=window_right,
            attention_chunk=attention_chunk, has_alibi=has_alibi,
        )
        lse2_safe = jnp.where(lse2 == NEG_INF, 0.0, lse2)
        p = jnp.exp2(s2 - lse2_safe)
        p = jnp.where(jnp.isnan(p), 0.0, p)  # padded rows: lse garbage
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if dropout_p > 0.0:
            drows = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            dcols = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            keep = dropout_keep(seed_ref[0, 0], h_idx, drows, dcols,
                                dropout_p)
            dp = jnp.where(keep, dp, 0.0) * (1.0 / (1.0 - dropout_p))
        ds = p * (dp - delta)
        if dtanh is not None:
            ds = ds * dtanh
        ds = jnp.where(jnp.isnan(ds), 0.0, ds)
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(j == num_kv_blocks - 1)
    def _epilogue():
        dq_ref[0] = dq_acc[...]


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_seqlen_q", "max_seqlen_k", "softmax_scale", "causal",
        "window_size", "softcap", "attention_chunk", "block_q", "block_k",
        "interpret", "dropout_p",
    ),
)
def flash_attention_varlen_bwd(
    do,   # (total_q, h, dv)
    q, k, v,
    out,  # (total_q, h, dv)
    lse,  # (h, total_q)
    cu_seqlens_q, cu_seqlens_k,
    max_seqlen_q: int, max_seqlen_k: int,
    seqused_q=None, seqused_k=None,
    alibi_slopes=None,
    dropout_p: float = 0.0,
    dropout_seed=None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[Optional[int], Optional[int]] = (None, None),
    softcap: float = 0.0,
    attention_chunk: int = 0,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
):
    total_q, h, d = q.shape
    total_k, h_k, _ = k.shape
    dv_dim = v.shape[-1]
    group = h // h_k
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    window_left, window_right = normalize_window(window_size)

    cfg = get_bwd_config(d, dv_dim, max_seqlen_q, max_seqlen_k, causal)
    bq = min(block_q or cfg.block_q, _next_pow2(total_q))
    bk = min(block_k or cfg.block_k, _next_pow2(total_k))
    nq = pl.cdiv(total_q, bq)
    nk = pl.cdiv(total_k, bk)

    meta = compute_varlen_meta(
        cu_seqlens_q, cu_seqlens_k, bq, bk, nq, nk,
        causal=causal, window_left=window_left, window_right=window_right,
        seqused_q=seqused_q, seqused_k=seqused_k,
    )
    col = lambda x: x.reshape(-1, 1)
    rowv = lambda x: x.reshape(1, -1)
    shift_q = meta.sk_of_q - meta.sq_of_q
    kvalid = (meta.seg_k != K_PAD_SEG).astype(jnp.int32).reshape(-1, 1)

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = delta.T  # (h, total_q)
    lse_h = lse.astype(jnp.float32)

    qt = jnp.swapaxes(q, 0, 1)
    kt = jnp.swapaxes(k, 0, 1)
    vt = jnp.swapaxes(v, 0, 1)
    dot = jnp.swapaxes(do, 0, 1)
    # (h, 1, total) layouts for lse/delta so seq rides lanes
    lse3 = lse_h[:, None, :]
    delta3 = delta[:, None, :]

    b = cu_seqlens_q.shape[0] - 1
    slope_in = None
    if alibi_slopes is not None:
        seg_c = jnp.clip(meta.seg_q, 0, b - 1)
        slope_in = alibi_slopes.astype(jnp.float32).T[:, seg_c][:, :, None]

    common = dict(
        block_q=bq, block_k=bk, scale=softmax_scale, softcap=softcap,
        causal=causal, window_left=window_left, window_right=window_right,
        attention_chunk=attention_chunk, has_alibi=alibi_slopes is not None,
        dropout_p=dropout_p,
    )
    seed_arr = (jnp.asarray(dropout_seed, jnp.uint32).reshape(1, 1)
                if dropout_p > 0.0 else None)

    # ---------- dK/dV ----------
    def sideband_specs(idx_q, idx_k):
        # idx_q(i)->q-block index, idx_k(j)->k-block index as functions of grid
        return [
            pl.BlockSpec((bq, 1), lambda *a: (idx_q(*a), 0)),
            pl.BlockSpec((bq, 1), lambda *a: (idx_q(*a), 0)),
            pl.BlockSpec((bq, 1), lambda *a: (idx_q(*a), 0)),
            pl.BlockSpec((bq, 1), lambda *a: (idx_q(*a), 0)),
            pl.BlockSpec((1, bk), lambda *a: (0, idx_k(*a))),
            pl.BlockSpec((1, bk), lambda *a: (0, idx_k(*a))),
            pl.BlockSpec((bk, 1), lambda *a: (idx_k(*a), 0)),
        ]

    sideband_inputs = [
        col(meta.seg_q), col(meta.pos_q), col(shift_q), col(meta.sk_of_q),
        rowv(meta.seg_k), rowv(meta.pos_k), kvalid,
    ]

    # dkdv grid: (h_k, nk, group, nq); scalar prefetch: iband
    idx_q = lambda hk, n, g, i, *_: i
    idx_k = lambda hk, n, g, i, *_: n
    dkdv_specs = sideband_specs(idx_q, idx_k)
    dkdv_inputs = list(sideband_inputs)
    if dropout_p > 0.0:
        dkdv_specs.insert(0, pl.BlockSpec(
            (1, 1), lambda hk, n, g, i, *_: (0, 0), memory_space=pltpu.SMEM))
        dkdv_inputs.insert(0, seed_arr)
    if slope_in is not None:
        dkdv_specs.append(pl.BlockSpec(
            (1, bq, 1), lambda hk, n, g, i, *_: (hk * group + g, i, 0)))
        dkdv_inputs.append(slope_in)
    dkdv_specs += [
        pl.BlockSpec((1, bq, d), lambda hk, n, g, i, *_: (hk * group + g, i, 0)),
        pl.BlockSpec((1, bq, dv_dim),
                     lambda hk, n, g, i, *_: (hk * group + g, i, 0)),
        pl.BlockSpec((1, 1, bq), lambda hk, n, g, i, *_: (hk * group + g, 0, i)),
        pl.BlockSpec((1, 1, bq), lambda hk, n, g, i, *_: (hk * group + g, 0, i)),
        pl.BlockSpec((1, bk, d), lambda hk, n, g, i, *_: (hk, n, 0)),
        pl.BlockSpec((1, bk, dv_dim), lambda hk, n, g, i, *_: (hk, n, 0)),
    ]
    dkdv_inputs += [qt, dot, lse3, delta3, kt, vt]

    dk, dv = pl.pallas_call(
        functools.partial(_varlen_dkdv_kernel, num_q_blocks=nq, group=group,
                          **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(h_k, nk, group, nq),
            in_specs=dkdv_specs,
            out_specs=[
                pl.BlockSpec((1, bk, d), lambda hk, n, g, i, *_: (hk, n, 0)),
                pl.BlockSpec((1, bk, dv_dim), lambda hk, n, g, i, *_: (hk, n, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk, d), jnp.float32),
                pltpu.VMEM((bk, dv_dim), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((h_k, total_k, d), jnp.float32),
            jax.ShapeDtypeStruct((h_k, total_k, dv_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(meta.iband_min, meta.iband_max, *dkdv_inputs)

    # ---------- dQ ----------
    idx_q2 = lambda h_, i, j, *_: i
    idx_k2 = lambda h_, i, j, *_: j
    dq_specs = sideband_specs(idx_q2, idx_k2)
    dq_inputs = list(sideband_inputs)
    if dropout_p > 0.0:
        dq_specs.insert(0, pl.BlockSpec(
            (1, 1), lambda h_, i, j, *_: (0, 0), memory_space=pltpu.SMEM))
        dq_inputs.insert(0, seed_arr)
    if slope_in is not None:
        dq_specs.append(pl.BlockSpec(
            (1, bq, 1), lambda h_, i, j, *_: (h_, i, 0)))
        dq_inputs.append(slope_in)
    dq_specs += [
        pl.BlockSpec((1, bq, d), lambda h_, i, j, *_: (h_, i, 0)),
        pl.BlockSpec((1, bq, dv_dim), lambda h_, i, j, *_: (h_, i, 0)),
        pl.BlockSpec((1, 1, bq), lambda h_, i, j, *_: (h_, 0, i)),
        pl.BlockSpec((1, 1, bq), lambda h_, i, j, *_: (h_, 0, i)),
        pl.BlockSpec((1, bk, d), lambda h_, i, j, *_: (h_ // group, j, 0)),
        pl.BlockSpec((1, bk, dv_dim), lambda h_, i, j, *_: (h_ // group, j, 0)),
    ]
    dq_inputs += [qt, dot, lse3, delta3, kt, vt]

    dq = pl.pallas_call(
        functools.partial(_varlen_dq_kernel, num_kv_blocks=nk, **common),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(h, nq, nk),
            in_specs=dq_specs,
            out_specs=pl.BlockSpec((1, bq, d), lambda h_, i, j, *_: (h_, i, 0)),
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((h, total_q, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(meta.jband_min, meta.jband_max, *dq_inputs)

    return (
        jnp.swapaxes(dq, 0, 1),
        jnp.swapaxes(dk, 0, 1),
        jnp.swapaxes(dv, 0, 1),
    )


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p
