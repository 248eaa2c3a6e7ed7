"""Forward/backward kernel tests against the golden fp32 reference.

Numerics contract follows the reference (tests/test_flash_attn.py:704):
kernel error <= 2x the error of a same-precision full-matrix reference.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_func, flash_attn_qkvpacked_func
from flash_attn_tpu.utils.testing import (
    attention_ref,
    attn_bias_from_alibi_slopes,
    check_against_ref,
)


def _make_qkv(key, b, sq, sk, h, h_k, d, dv=None, dtype=jnp.bfloat16):
    dv = dv or d
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, sk, h_k, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, sk, h_k, dv), dtype=jnp.float32)
    return q.astype(dtype), k.astype(dtype), v.astype(dtype)


SEQLEN_PAIRS = [
    (113, 203),
    (128, 217),
    (256, 256),
    (384, 256),
    (640, 128),
    (512, 512),
    (1024, 1024),
]


@pytest.mark.parametrize("mha_type", ["mha", "gqa", "mqa"])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("d", [64, 128])
@pytest.mark.parametrize("seqlen_q,seqlen_k", SEQLEN_PAIRS[:5])
def test_flash_attn_output(seqlen_q, seqlen_k, d, causal, mha_type):
    key = jax.random.PRNGKey(hash((seqlen_q, seqlen_k, d, causal)) % 2**31)
    b, h = 2, 6
    h_k = {"mha": h, "gqa": 2, "mqa": 1}[mha_type]
    q, k, v = _make_qkv(key, b, seqlen_q, seqlen_k, h, h_k, d)

    out = flash_attn_func(q, k, v, causal=causal)
    ref, _ = attention_ref(q, k, v, causal=causal)
    ref_lp, _ = attention_ref(q, k, v, causal=causal, upcast=False, reorder_ops=True)
    check_against_ref(out, ref, ref_lp, msg=f"fwd {mha_type} causal={causal}")


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "window_size", [(15, 0), (31, 11), (None, 7)],
)
def test_flash_attn_local(causal, window_size):
    key = jax.random.PRNGKey(7)
    b, h, d = 2, 4, 64
    sq, sk = 257, 320
    q, k, v = _make_qkv(key, b, sq, sk, h, h, d)
    ws_api = tuple(-1 if w is None else w for w in window_size)

    out = flash_attn_func(q, k, v, causal=causal, window_size=ws_api)
    ref, _ = attention_ref(q, k, v, causal=causal, window_size=window_size)
    ref_lp, _ = attention_ref(
        q, k, v, causal=causal, window_size=window_size, upcast=False,
        reorder_ops=True,
    )
    check_against_ref(out, ref, ref_lp, msg=f"local {window_size}")


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_alibi(causal):
    key = jax.random.PRNGKey(11)
    b, h, d = 2, 4, 64
    sq, sk = 255, 255
    q, k, v = _make_qkv(key, b, sq, sk, h, h, d)
    slopes = jax.random.uniform(jax.random.PRNGKey(1), (b, h)) * 0.3

    out = flash_attn_func(q, k, v, causal=causal, alibi_slopes=slopes)
    bias = attn_bias_from_alibi_slopes(slopes, sq, sk, causal=causal)
    ref, _ = attention_ref(q, k, v, attn_bias=bias, causal=causal)
    ref_lp, _ = attention_ref(
        q, k, v, attn_bias=bias, causal=causal, upcast=False, reorder_ops=True
    )
    check_against_ref(out, ref, ref_lp, msg=f"alibi causal={causal}")


@pytest.mark.parametrize("softcap", [30.0])
@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_softcap(causal, softcap):
    key = jax.random.PRNGKey(13)
    b, h, d = 2, 4, 128
    sq, sk = 192, 256
    q, k, v = _make_qkv(key, b, sq, sk, h, h, d)

    out = flash_attn_func(q, k, v, causal=causal, softcap=softcap)
    ref, _ = attention_ref(q, k, v, causal=causal, softcap=softcap)
    ref_lp, _ = attention_ref(
        q, k, v, causal=causal, softcap=softcap, upcast=False, reorder_ops=True
    )
    check_against_ref(out, ref, ref_lp, msg=f"softcap causal={causal}")


def test_flash_attn_chunked_causal():
    key = jax.random.PRNGKey(17)
    b, h, d = 2, 4, 64
    sq = sk = 384
    q, k, v = _make_qkv(key, b, sq, sk, h, h, d)
    chunk = 128

    out = flash_attn_func(q, k, v, causal=True, attention_chunk=chunk)
    ref, _ = attention_ref(q, k, v, causal=True, attention_chunk=chunk)
    ref_lp, _ = attention_ref(
        q, k, v, causal=True, attention_chunk=chunk, upcast=False,
        reorder_ops=True,
    )
    check_against_ref(out, ref, ref_lp, msg="chunked")


def test_flash_attn_learnable_sink():
    key = jax.random.PRNGKey(19)
    b, h, d = 2, 4, 64
    sq = sk = 256
    q, k, v = _make_qkv(key, b, sq, sk, h, h, d)
    sink = jax.random.normal(jax.random.PRNGKey(2), (h,))

    out = flash_attn_func(q, k, v, causal=True, learnable_sink=sink)
    ref, _ = attention_ref(q, k, v, causal=True, learnable_sink=sink)
    ref_lp, _ = attention_ref(
        q, k, v, causal=True, learnable_sink=sink, upcast=False,
        reorder_ops=True,
    )
    check_against_ref(out, ref, ref_lp, msg="sink")


def test_flash_attn_lse():
    key = jax.random.PRNGKey(23)
    b, h, d = 1, 2, 64
    sq = sk = 256
    q, k, v = _make_qkv(key, b, sq, sk, h, h, d, dtype=jnp.float32)
    _, lse, _ = flash_attn_func(q, k, v, causal=True, return_attn_probs=True)
    scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    mask = jnp.tril(jnp.ones((sq, sk), bool))
    s = jnp.where(mask, s, -jnp.inf)
    lse_ref = jax.nn.logsumexp(s, axis=-1)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(lse_ref), atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("mha_type", ["mha", "gqa"])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("d", [64, 128])
@pytest.mark.parametrize("seqlen_q,seqlen_k", [(128, 217), (256, 256), (384, 256)])
def test_flash_attn_backward(seqlen_q, seqlen_k, d, causal, mha_type):
    key = jax.random.PRNGKey(hash(("bwd", seqlen_q, seqlen_k, d, causal)) % 2**31)
    b, h = 2, 4
    h_k = {"mha": h, "gqa": 2}[mha_type]
    q, k, v = _make_qkv(key, b, seqlen_q, seqlen_k, h, h_k, d)
    g = jax.random.normal(jax.random.PRNGKey(3), (b, seqlen_q, h, d), jnp.float32
                          ).astype(q.dtype)

    def f_kernel(q, k, v):
        return (flash_attn_func(q, k, v, causal=causal) * g).sum()

    def f_ref(q, k, v, upcast=True):
        out, _ = attention_ref(q, k, v, causal=causal, upcast=upcast,
                               reorder_ops=not upcast)
        return (out * g).sum()

    dq, dk, dv = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    dq_ref, dk_ref, dv_ref = jax.grad(
        lambda *a: f_ref(*a, upcast=True), argnums=(0, 1, 2)
    )(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    dq_lp, dk_lp, dv_lp = jax.grad(
        lambda *a: f_ref(*a, upcast=False), argnums=(0, 1, 2)
    )(q, k, v)

    for name, got, ref, lp in [
        ("dq", dq, dq_ref, dq_lp),
        ("dk", dk, dk_ref, dk_lp),
        ("dv", dv, dv_ref, dv_lp),
    ]:
        check_against_ref(got, ref, lp, mult=3.0, atol=1e-4,
                          msg=f"{name} {mha_type} causal={causal}")


def test_flash_attn_qkvpacked():
    key = jax.random.PRNGKey(29)
    b, s, h, d = 2, 256, 4, 64
    q, k, v = _make_qkv(key, b, s, s, h, h, d)
    qkv = jnp.stack([q, k, v], axis=2)
    out = flash_attn_qkvpacked_func(qkv, causal=True)
    ref, _ = attention_ref(q, k, v, causal=True)
    ref_lp, _ = attention_ref(q, k, v, causal=True, upcast=False, reorder_ops=True)
    check_against_ref(out, ref, ref_lp, msg="qkvpacked")


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attn_s_dmask(causal):
    """return_attn_probs returns (out, lse, S_dmask) — the reference's
    3-tuple contract (flash_attn/flash_attn_interface.py:879). S_dmask rows
    are normalized by the kernel's lse, match the fp32 reference attention
    matrix, and out == S_dmask @ v."""
    key = jax.random.PRNGKey(31)
    b, sq, sk, h, d = 1, 256, 256, 4, 64
    q, k, v = _make_qkv(key, b, sq, sk, h, h, d, dtype=jnp.float32)
    out, lse, s_dmask = flash_attn_func(q, k, v, causal=causal,
                                        return_attn_probs=True)
    assert s_dmask.shape == (b, h, sq, sk)
    _, attn_ref = attention_ref(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(s_dmask), np.asarray(attn_ref),
                               atol=2e-3, rtol=1e-2)
    # probabilities: rows sum to 1 and reproduce out
    np.testing.assert_allclose(
        np.asarray(s_dmask.sum(-1)), 1.0, atol=2e-3)
    out_from_probs = jnp.einsum("bhts,bshd->bthd", s_dmask, v)
    np.testing.assert_allclose(np.asarray(out_from_probs, np.float32),
                               np.asarray(out, np.float32), atol=5e-3)


def test_flash_attn_s_dmask_dropout_sign():
    """With dropout, dropped entries are negated (reference sign encoding:
    keep-mask = S_dmask >= 0) and match the kernel's counter-hash RNG."""
    from flash_attn_tpu.kernels.dropout_rng import dropout_mask_reference

    key = jax.random.PRNGKey(37)
    b, s, h, d = 1, 128, 2, 64
    q, k, v = _make_qkv(key, b, s, s, h, h, d, dtype=jnp.float32)
    rng = jax.random.PRNGKey(5)
    out, lse, s_dmask = flash_attn_func(
        q, k, v, dropout_p=0.3, dropout_rng=rng, causal=True,
        return_attn_probs=True)
    seed = jax.random.bits(rng, dtype=jnp.uint32)
    keep = dropout_mask_reference(seed, b, h, s, s, 0.3)
    got_keep = np.asarray(s_dmask) >= 0
    # strictly-positive probs only (masked-out entries are 0 either way)
    live = np.asarray(jnp.abs(s_dmask)) > 0
    np.testing.assert_array_equal(got_keep[live], np.asarray(keep)[live])


@pytest.mark.parametrize("causal", [False, True])
def test_learnable_sink_grads(causal):
    """The learnable-sink logit trains (round-3; reference computes dsink
    in its backward — LearnableSinkBwdTensors): dq/dk/dv/dsink match
    autodiff through the fp32 reference."""
    b, s, h, d = 1, 192, 4, 64
    q, k, v = _make_qkv(jax.random.PRNGKey(41), b, s, s, h, h, d,
                        dtype=jnp.float32)
    sink = jnp.asarray(np.linspace(-0.5, 1.5, h), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(43), (b, s, h, d))

    def f_kernel(q, k, v, sink):
        out = flash_attn_func(q, k, v, causal=causal, learnable_sink=sink)
        return (out * g).sum()

    def f_ref(q, k, v, sink):
        out, _ = attention_ref(q, k, v, causal=causal, learnable_sink=sink)
        return (out * g).sum()

    grads = jax.grad(f_kernel, argnums=(0, 1, 2, 3))(q, k, v, sink)
    refs = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, sink)
    for name, got, ref in zip(("dq", "dk", "dv", "dsink"), grads, refs):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=2e-3, rtol=2e-3, err_msg=f"{name} causal={causal}")
