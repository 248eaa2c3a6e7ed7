"""Golden fp32 reference attention + test fixtures.

TPU-native re-implementation of the reference's golden-test machinery
(cf. flash_attn/utils/testing.py:228 ``attention_ref``,
tests/test_util.py ``attn_bias_from_alibi_slopes``,
flash_attn/utils/testing.py:11 ``generate_random_padding_mask``).

The numerics contract everywhere in this repo follows the reference
(README.md:551-555): the kernel output (computed in bf16/fp16/fp8) must satisfy

    max|out - ref_fp32| <= 2 * max|out_lowprec_ref - ref_fp32| + atol_floor

where ``out_lowprec_ref`` is the same full-matrix attention computed with the
kernel's precision (``upcast=False``).
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "attention_ref",
    "attn_bias_from_alibi_slopes",
    "generate_random_padding_mask",
    "construct_local_mask",
    "construct_chunk_mask",
    "check_against_ref",
]


def construct_local_mask(
    seqlen_q: int,
    seqlen_k: int,
    window_size: Tuple[Optional[int], Optional[int]] = (None, None),
    sink_token_length: int = 0,
    query_padding_mask=None,  # (b, sq) bool, True = valid
    key_padding_mask=None,  # (b, sk) bool
    key_leftpad=None,  # (b,) int
):
    """True where the position is MASKED OUT (same convention as the reference).

    Local (sliding-window) mask aligned to the bottom-right: query i attends to
    keys j with  i + sk - sq - window_left <= j <= i + sk - sq + window_right.
    """
    row_idx = jnp.arange(seqlen_q, dtype=jnp.int32)[:, None]  # (sq, 1)
    col_idx = jnp.arange(seqlen_k, dtype=jnp.int32)[None, :]  # (1, sk)
    if key_leftpad is not None:
        key_leftpad = key_leftpad.reshape(-1, 1, 1, 1)
        col_idx = jnp.broadcast_to(
            col_idx[None, None], (key_leftpad.shape[0], 1, 1, seqlen_k)
        )
        col_idx = jnp.where(col_idx >= key_leftpad, col_idx - key_leftpad, 2**30)
    sk = (
        seqlen_k
        if key_padding_mask is None
        else key_padding_mask.sum(-1).reshape(-1, 1, 1, 1)
    )
    sq = (
        seqlen_q
        if query_padding_mask is None
        else query_padding_mask.sum(-1).reshape(-1, 1, 1, 1)
    )
    shift = sk - sq
    if window_size[0] is None:
        return col_idx > row_idx + shift + window_size[1]
    sk_full = (
        jnp.full_like(col_idx, seqlen_k) if key_padding_mask is None else sk
    )
    return jnp.logical_or(
        col_idx > jnp.minimum(row_idx + shift + window_size[1], sk_full),
        jnp.logical_and(
            col_idx < row_idx + shift - window_size[0],
            col_idx >= sink_token_length,
        ),
    )


def construct_chunk_mask(
    seqlen_q: int,
    seqlen_k: int,
    attention_chunk: int,
    query_padding_mask=None,
    key_padding_mask=None,
    key_leftpad=None,
):
    """Chunked-causal mask (llama4 style): query attends only within its chunk."""
    row_idx = jnp.arange(seqlen_q, dtype=jnp.int32)[:, None]
    col_idx = jnp.arange(seqlen_k, dtype=jnp.int32)[None, :]
    if key_leftpad is not None:
        key_leftpad = key_leftpad.reshape(-1, 1, 1, 1)
        col_idx = jnp.broadcast_to(
            col_idx[None, None], (key_leftpad.shape[0], 1, 1, seqlen_k)
        )
        col_idx = jnp.where(col_idx >= key_leftpad, col_idx - key_leftpad, 2**30)
    sk = (
        seqlen_k
        if key_padding_mask is None
        else key_padding_mask.sum(-1).reshape(-1, 1, 1, 1)
    )
    sq = (
        seqlen_q
        if query_padding_mask is None
        else query_padding_mask.sum(-1).reshape(-1, 1, 1, 1)
    )
    shift = row_idx + sk - sq
    col_limit_left = shift - shift % attention_chunk
    return jnp.logical_or(
        col_idx < col_limit_left, col_idx >= col_limit_left + attention_chunk
    )


def attn_bias_from_alibi_slopes(
    slopes,  # (b, h) or (h,)
    seqlen_q: int,
    seqlen_k: int,
    query_padding_mask=None,
    key_padding_mask=None,
    causal: bool = False,
    key_leftpad=None,
):
    """ALiBi bias, broadcastable to (b, h, sq, sk). Mirrors
    benchmarks/benchmark_alibi.py:43 semantics."""
    if slopes.ndim == 1:
        slopes = slopes[None, :]
    slopes = slopes[:, :, None, None]  # (b, h, 1, 1)
    if causal:
        bias = jnp.arange(-seqlen_k + 1, 1, dtype=jnp.float32)
        return bias[None, None, None, :] * slopes
    row_idx = jnp.arange(seqlen_q, dtype=jnp.int32)[:, None]
    col_idx = jnp.arange(seqlen_k, dtype=jnp.int32)[None, :]
    if key_leftpad is not None:
        key_leftpad = key_leftpad.reshape(-1, 1, 1, 1)
        col_idx = jnp.broadcast_to(
            col_idx[None, None], (key_leftpad.shape[0], 1, 1, seqlen_k)
        )
        col_idx = jnp.where(col_idx >= key_leftpad, col_idx - key_leftpad, 2**30)
    sk = (
        seqlen_k
        if key_padding_mask is None
        else key_padding_mask.sum(-1).reshape(-1, 1, 1, 1)
    )
    sq = (
        seqlen_q
        if query_padding_mask is None
        else query_padding_mask.sum(-1).reshape(-1, 1, 1, 1)
    )
    relative_pos = jnp.abs(row_idx + sk - sq - col_idx)
    return -slopes * relative_pos.astype(jnp.float32)


def generate_random_padding_mask(
    max_seqlen: int, batch_size: int, key, mode: str = "random", zero_lengths=False
):
    assert mode in ["full", "random", "third"]
    if mode == "full":
        lengths = jnp.full((batch_size, 1), max_seqlen, dtype=jnp.int32)
    elif mode == "random":
        lengths = jax.random.randint(
            key,
            (batch_size, 1),
            max(0 if zero_lengths else 1, max_seqlen - 20),
            max_seqlen + 1,
        )
    else:  # third
        lengths = jax.random.randint(
            key, (batch_size, 1), max_seqlen // 3, max_seqlen + 1
        )
    if zero_lengths:
        idx = jnp.arange(batch_size)
        lengths = jnp.where(((idx % 5 == 0) | (idx == batch_size - 1))[:, None], 0, lengths)
    return jnp.arange(max_seqlen)[None, :] < lengths


def attention_ref(
    q,  # (b, sq, h, d)
    k,  # (b, sk, h_k, d)
    v,  # (b, sk, h_k, dv)
    query_padding_mask=None,  # (b, sq) bool, True = keep
    key_padding_mask=None,  # (b, sk) bool
    key_leftpad=None,  # (b,) int32
    attn_bias=None,  # broadcastable to (b, h, sq, sk)
    dropout_p: float = 0.0,
    dropout_mask=None,  # (b, h, sq, sk) bool, True = keep
    causal: bool = False,
    qv=None,  # (b, sq, h, dv)
    q_descale=None,  # (b, h_k)
    k_descale=None,  # (b, h_k)
    v_descale=None,  # (b, h_k)
    window_size: Tuple[Optional[int], Optional[int]] = (None, None),
    attention_chunk: int = 0,
    sink_token_length: int = 0,
    learnable_sink=None,  # (h,)
    softcap: float = 0.0,
    softmax_scale: Optional[float] = None,
    upcast: bool = True,
    reorder_ops: bool = False,
):
    """Full-matrix golden reference attention (fp32 by default).

    Returns (output (b, sq, h, dv), attention (b, h, sq, sk)).
    Semantics mirror the reference's attention_ref
    (flash_attn/utils/testing.py:228): bottom-right-aligned causal/local masks,
    GQA head replication, softcap before masking, bias after masking,
    dropout after softmax, zero-fill of fully-masked rows.
    """
    if causal:
        window_size = (window_size[0], 0)
    dtype_og = q.dtype
    if upcast:
        q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
        qv = qv.astype(jnp.float32) if qv is not None else None
    h, h_k = q.shape[2], k.shape[2]
    g = h // h_k
    if q_descale is not None:
        qd = jnp.repeat(q_descale, g, axis=1)[:, None, :, None]  # (b,1,h,1)
        q = (q.astype(jnp.float32) * qd).astype(q.dtype)
        if qv is not None:
            qv = (qv.astype(jnp.float32) * qd).astype(qv.dtype)
    if k_descale is not None:
        k = (k.astype(jnp.float32) * k_descale[:, None, :, None]).astype(k.dtype)
    if v_descale is not None:
        v = (v.astype(jnp.float32) * v_descale[:, None, :, None]).astype(v.dtype)
    seqlen_q, seqlen_k = q.shape[1], k.shape[1]
    k = jnp.repeat(k, g, axis=2)
    v = jnp.repeat(v, g, axis=2)
    d = q.shape[-1]
    dv = v.shape[-1]
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d if qv is None else d + dv)
    if not reorder_ops:
        scores = jnp.einsum("bthd,bshd->bhts", q * softmax_scale, k)
    else:
        scores = jnp.einsum("bthd,bshd->bhts", q, k * softmax_scale)
    if qv is not None:
        scores = scores + jnp.einsum("bthd,bshd->bhts", qv * softmax_scale, v)
    if softcap > 0:
        scores = jnp.tanh(scores / softcap) * softcap
    neg_inf = jnp.array(float("-inf"), scores.dtype)
    if key_padding_mask is not None:
        scores = jnp.where(
            (~key_padding_mask)[:, None, None, :], neg_inf, scores
        )
    local_mask = None
    if window_size[0] is not None or window_size[1] is not None:
        local_mask = construct_local_mask(
            seqlen_q, seqlen_k, window_size, sink_token_length,
            query_padding_mask, key_padding_mask, key_leftpad,
        )
    if attention_chunk > 0:
        chunk_mask = construct_chunk_mask(
            seqlen_q, seqlen_k, attention_chunk,
            query_padding_mask, key_padding_mask, key_leftpad,
        )
        local_mask = (
            jnp.logical_or(local_mask, chunk_mask)
            if local_mask is not None
            else chunk_mask
        )
    if local_mask is not None:
        scores = jnp.where(local_mask, neg_inf, scores)
    if attn_bias is not None:
        scores = scores + attn_bias
    if learnable_sink is None:
        # Safe softmax that returns 0 for fully-masked rows.
        m = jnp.max(scores, axis=-1, keepdims=True)
        m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
        e = jnp.exp(scores - m_safe)
        e = jnp.where(jnp.isneginf(scores), 0.0, e)
        denom = e.sum(axis=-1, keepdims=True)
        attention = (e / jnp.where(denom == 0, 1.0, denom)).astype(v.dtype)
    else:
        scores32 = scores.astype(jnp.float32)
        logits_max = jnp.max(scores32, axis=-1, keepdims=True)
        sink = learnable_sink.reshape(1, -1, 1, 1).astype(jnp.float32)
        m = jnp.maximum(sink, logits_max)
        e = jnp.exp(scores32 - m)
        e = jnp.where(jnp.isneginf(scores32), 0.0, e)
        normalizer = e.sum(axis=-1, keepdims=True) + jnp.exp(sink - m)
        attention = (e / normalizer).astype(v.dtype)
    if query_padding_mask is not None:
        attention = jnp.where(
            (~query_padding_mask)[:, None, :, None], 0.0, attention
        )
    if key_padding_mask is not None:
        attention = jnp.where(
            (~key_padding_mask)[:, None, None, :], 0.0, attention
        )
    if local_mask is not None:
        attention = jnp.where(
            jnp.all(local_mask, axis=-1, keepdims=True), 0.0, attention
        )
    dropout_scaling = 1.0 / (1 - dropout_p)
    if dropout_mask is not None:
        attention_drop = jnp.where(~dropout_mask, 0.0, attention)
    else:
        attention_drop = attention
    output = jnp.einsum("bhts,bshd->bthd", attention_drop, v * dropout_scaling)
    if query_padding_mask is not None:
        output = jnp.where((~query_padding_mask)[:, :, None, None], 0.0, output)
    return output.astype(dtype_og), attention.astype(dtype_og)


def check_against_ref(out, out_ref_fp32, out_ref_lowprec, *, mult: float = 2.0,
                      atol: float = 1e-5, msg: str = ""):
    """The reference numerics contract: kernel error <= mult x low-precision
    reference error (+ tiny absolute floor). Raises AssertionError."""
    out = np.asarray(out, dtype=np.float32)
    ref = np.asarray(out_ref_fp32, dtype=np.float32)
    ref_lp = np.asarray(out_ref_lowprec, dtype=np.float32)
    err = np.abs(out - ref).max()
    err_lp = np.abs(ref_lp - ref).max()
    assert err <= mult * err_lp + atol, (
        f"{msg} kernel max err {err:.3e} > {mult} x lowprec ref err "
        f"{err_lp:.3e} + {atol:.1e}"
    )
    return err, err_lp
