"""Dropout tests: kernel vs golden reference with the reconstructed mask
(the analogue of the reference's S_dmask-based dropout checks,
tests/test_flash_attn.py:600-710), plus drop-fraction statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_func
from flash_attn_tpu.kernels.dropout_rng import dropout_mask_reference
from flash_attn_tpu.utils.testing import attention_ref, check_against_ref


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("p", [0.17])
def test_dropout_fwd_matches_ref_with_mask(causal, p):
    b, s, h, d = 2, 256, 4, 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, s, h, d)).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d)).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d)).astype(jnp.bfloat16)
    rng = jax.random.PRNGKey(42)
    seed = jax.random.bits(rng, dtype=jnp.uint32)

    out = flash_attn_func(q, k, v, dropout_p=p, causal=causal, dropout_rng=rng)
    keep = dropout_mask_reference(seed, b, h, s, s, p)
    ref, _ = attention_ref(q, k, v, dropout_p=p, dropout_mask=keep,
                           causal=causal)
    ref_lp, _ = attention_ref(q, k, v, dropout_p=p, dropout_mask=keep,
                              causal=causal, upcast=False, reorder_ops=True)
    check_against_ref(out, ref, ref_lp, msg=f"dropout fwd causal={causal}")


def test_dropout_fraction():
    seed = jnp.uint32(1234)
    keep = dropout_mask_reference(seed, 2, 2, 128, 128, 0.3)
    frac = float(jnp.mean(keep.astype(jnp.float32)))
    assert abs(frac - 0.7) < 0.01
    # different seed -> different mask
    keep2 = dropout_mask_reference(jnp.uint32(77), 2, 2, 128, 128, 0.3)
    assert not bool(jnp.all(keep == keep2))


@pytest.mark.parametrize("causal", [True])
def test_dropout_backward(causal):
    p = 0.2
    b, s, h, d = 2, 192, 4, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d)).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d)).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d)).astype(jnp.bfloat16)
    g = jax.random.normal(jax.random.PRNGKey(3), (b, s, h, d)).astype(jnp.bfloat16)
    rng = jax.random.PRNGKey(7)
    seed = jax.random.bits(rng, dtype=jnp.uint32)
    keep = dropout_mask_reference(seed, b, h, s, s, p)

    def f_kernel(q, k, v):
        out = flash_attn_func(q, k, v, dropout_p=p, causal=causal,
                              dropout_rng=rng)
        return (out.astype(jnp.float32) * g.astype(jnp.float32)).sum()

    def f_ref(q, k, v, upcast=True):
        out, _ = attention_ref(q, k, v, dropout_p=p, dropout_mask=keep,
                               causal=causal, upcast=upcast,
                               reorder_ops=not upcast)
        return (out.astype(jnp.float32) * g.astype(jnp.float32)).sum()

    dq, dk, dv = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    dq_ref, dk_ref, dv_ref = jax.grad(
        lambda *a: f_ref(*a, upcast=True), argnums=(0, 1, 2)
    )(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    dq_lp, dk_lp, dv_lp = jax.grad(
        lambda *a: f_ref(*a, upcast=False), argnums=(0, 1, 2)
    )(q, k, v)
    for name, got, ref, lp in [("dq", dq, dq_ref, dq_lp),
                               ("dk", dk, dk_ref, dk_lp),
                               ("dv", dv, dv_ref, dv_lp)]:
        check_against_ref(got, ref, lp, mult=3.0, atol=1e-4,
                          msg=f"dropout {name}")


def test_varlen_dropout_fwd_bwd():
    """Varlen dropout vs the reference with the flat-coordinate mask."""
    from flash_attn_tpu import flash_attn_varlen_func
    from flash_attn_tpu.kernels.dropout_rng import dropout_keep
    from flash_attn_tpu.utils.padding import pad_input, unpad_input
    from flash_attn_tpu.utils.testing import generate_random_padding_mask

    p_drop = 0.15
    b, s, h, d = 2, 192, 2, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d)).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d)).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d)).astype(jnp.bfloat16)
    qmask = generate_random_padding_mask(s, b, jax.random.PRNGKey(3))
    kmask = qmask
    q_un, idx_q, cu_q, msq, _ = unpad_input(q, qmask)
    k_un, _, cu_k, msk, _ = unpad_input(k, kmask)
    v_un, _, _, _, _ = unpad_input(v, kmask)
    rng = jax.random.PRNGKey(9)
    seed = jax.random.bits(rng, dtype=jnp.uint32)

    out_un = flash_attn_varlen_func(
        q_un, k_un, v_un, cu_q, cu_k, msq, msk, causal=True,
        dropout_p=p_drop, dropout_rng=rng)
    out = pad_input(out_un, idx_q, b, s)

    # rebuild the flat-coordinate keep mask per (b, h)
    cu_q_np = np.asarray(cu_q)
    cu_k_np = np.asarray(cu_k)
    keep = np.ones((b, h, s, s), bool)
    for bi in range(b):
        lq = cu_q_np[bi + 1] - cu_q_np[bi]
        lk = cu_k_np[bi + 1] - cu_k_np[bi]
        rows = jnp.arange(cu_q_np[bi], cu_q_np[bi] + lq, dtype=jnp.int32)[:, None]
        cols = jnp.arange(cu_k_np[bi], cu_k_np[bi] + lk, dtype=jnp.int32)[None, :]
        for hi in range(h):
            keep[bi, hi, :lq, :lk] = np.asarray(
                dropout_keep(seed, jnp.asarray(hi), rows, cols, p_drop))
    ref, _ = attention_ref(q, k, v, qmask, kmask, causal=True,
                           dropout_p=p_drop, dropout_mask=jnp.asarray(keep))
    ref_lp, _ = attention_ref(q, k, v, qmask, kmask, causal=True,
                              dropout_p=p_drop, dropout_mask=jnp.asarray(keep),
                              upcast=False, reorder_ops=True)
    check_against_ref(out, ref, ref_lp, msg="varlen dropout fwd")

    # backward
    g_un = jax.random.normal(jax.random.PRNGKey(5), q_un.shape).astype(q.dtype)
    def f(qq, kk, vv):
        o = flash_attn_varlen_func(qq, kk, vv, cu_q, cu_k, msq, msk,
                                   causal=True, dropout_p=p_drop,
                                   dropout_rng=rng)
        return (o.astype(jnp.float32) * g_un.astype(jnp.float32)).sum()
    dq_un, dk_un, dv_un = jax.grad(f, argnums=(0, 1, 2))(q_un, k_un, v_un)
    assert all(bool(jnp.isfinite(x.astype(jnp.float32)).all())
               for x in (dq_un, dk_un, dv_un))

    g_pad = pad_input(g_un, idx_q, b, s)
    def f_ref(qq, kk, vv, upcast=True):
        o, _ = attention_ref(qq, kk, vv, qmask, kmask, causal=True,
                             dropout_p=p_drop, dropout_mask=jnp.asarray(keep),
                             upcast=upcast, reorder_ops=not upcast)
        return (o.astype(jnp.float32) * g_pad.astype(jnp.float32)).sum()
    dq_r, dk_r, dv_r = jax.grad(lambda *a: f_ref(*a, upcast=True),
                                argnums=(0, 1, 2))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    dq_l, dk_l, dv_l = jax.grad(lambda *a: f_ref(*a, upcast=False),
                                argnums=(0, 1, 2))(q, k, v)
    for name, got_un, idx, rf, lp in [
            ("dq", dq_un, idx_q, dq_r, dq_l), ("dk", dk_un, idx_q, dk_r, dk_l),
            ("dv", dv_un, idx_q, dv_r, dv_l)]:
        got = pad_input(got_un, idx, b, s)
        check_against_ref(got, rf, lp, mult=3.0, atol=1e-4,
                          msg=f"varlen dropout {name}")
