"""Varlen (packed) attention tests vs the golden reference.

Mirrors the reference's varlen suites (tests/test_flash_attn.py varlen
parametrizations) using padded<->packed conversion and per-batch masks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_varlen_func
from flash_attn_tpu.utils.padding import pad_input, unpad_input
from flash_attn_tpu.utils.testing import (
    attention_ref,
    attn_bias_from_alibi_slopes,
    check_against_ref,
    generate_random_padding_mask,
)


def _setup(key, b, sq, sk, h, h_k, d, dtype=jnp.bfloat16, pad_mode="random"):
    kq, kk, kv, km1, km2 = jax.random.split(key, 5)
    q = jax.random.normal(kq, (b, sq, h, d)).astype(dtype)
    k = jax.random.normal(kk, (b, sk, h_k, d)).astype(dtype)
    v = jax.random.normal(kv, (b, sk, h_k, d)).astype(dtype)
    qmask = generate_random_padding_mask(sq, b, km1, mode=pad_mode)
    kmask = generate_random_padding_mask(sk, b, km2, mode=pad_mode)
    return q, k, v, qmask, kmask


@pytest.mark.parametrize("mha_type", ["mha", "gqa"])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("d", [64, 128])
@pytest.mark.parametrize("seqlen_q,seqlen_k", [(128, 128), (257, 320), (512, 512)])
def test_varlen_output(seqlen_q, seqlen_k, d, causal, mha_type):
    key = jax.random.PRNGKey(hash(("vl", seqlen_q, seqlen_k, d, causal)) % 2**31)
    b, h = 3, 4
    h_k = {"mha": h, "gqa": 2}[mha_type]
    q, k, v, qmask, kmask = _setup(key, b, seqlen_q, seqlen_k, h, h_k, d)

    q_un, idx_q, cu_q, msq, _ = unpad_input(q, qmask)
    k_un, idx_k, cu_k, msk, _ = unpad_input(k, kmask)
    v_un, _, _, _, _ = unpad_input(v, kmask)

    out_un = flash_attn_varlen_func(
        q_un, k_un, v_un, cu_q, cu_k, msq, msk, causal=causal
    )
    out = pad_input(out_un, idx_q, b, seqlen_q)

    ref, _ = attention_ref(q, k, v, qmask, kmask, causal=causal)
    ref_lp, _ = attention_ref(
        q, k, v, qmask, kmask, causal=causal, upcast=False, reorder_ops=True
    )
    # Zero padded-query rows in all (kernel writes 0 there via masks).
    check_against_ref(out, ref, ref_lp, msg=f"varlen {mha_type} causal={causal}")


@pytest.mark.parametrize("causal", [False, True])
def test_varlen_local_alibi_softcap(causal):
    key = jax.random.PRNGKey(99)
    b, h, d = 2, 4, 64
    sq, sk = 193, 260
    q, k, v, qmask, kmask = _setup(key, b, sq, sk, h, h, d)
    slopes = jax.random.uniform(jax.random.PRNGKey(5), (b, h)) * 0.3

    q_un, idx_q, cu_q, msq, _ = unpad_input(q, qmask)
    k_un, _, cu_k, msk, _ = unpad_input(k, kmask)
    v_un, _, _, _, _ = unpad_input(v, kmask)

    # local window
    out = pad_input(
        flash_attn_varlen_func(
            q_un, k_un, v_un, cu_q, cu_k, msq, msk, causal=causal,
            window_size=(17, 0 if causal else 5),
        ), idx_q, b, sq,
    )
    ws = (17, 0 if causal else 5)
    ref, _ = attention_ref(q, k, v, qmask, kmask, causal=causal, window_size=ws)
    ref_lp, _ = attention_ref(q, k, v, qmask, kmask, causal=causal,
                              window_size=ws, upcast=False, reorder_ops=True)
    check_against_ref(out, ref, ref_lp, msg=f"varlen local causal={causal}")

    # alibi
    out = pad_input(
        flash_attn_varlen_func(
            q_un, k_un, v_un, cu_q, cu_k, msq, msk, causal=causal,
            alibi_slopes=slopes,
        ), idx_q, b, sq,
    )
    bias = attn_bias_from_alibi_slopes(slopes, sq, sk, qmask, kmask, causal=causal)
    ref, _ = attention_ref(q, k, v, qmask, kmask, attn_bias=bias, causal=causal)
    ref_lp, _ = attention_ref(q, k, v, qmask, kmask, attn_bias=bias,
                              causal=causal, upcast=False, reorder_ops=True)
    check_against_ref(out, ref, ref_lp, msg=f"varlen alibi causal={causal}")

    # softcap
    out = pad_input(
        flash_attn_varlen_func(
            q_un, k_un, v_un, cu_q, cu_k, msq, msk, causal=causal, softcap=30.0,
        ), idx_q, b, sq,
    )
    ref, _ = attention_ref(q, k, v, qmask, kmask, causal=causal, softcap=30.0)
    ref_lp, _ = attention_ref(q, k, v, qmask, kmask, causal=causal,
                              softcap=30.0, upcast=False, reorder_ops=True)
    check_against_ref(out, ref, ref_lp, msg=f"varlen softcap causal={causal}")


def test_varlen_zero_length():
    """Zero-length sequences must produce zero output, no NaNs."""
    key = jax.random.PRNGKey(123)
    b, h, d = 4, 2, 64
    sq = sk = 128
    q, k, v, qmask, kmask = _setup(key, b, sq, sk, h, h, d)
    kmask = kmask.at[1].set(False)  # batch 1 has no keys

    q_un, idx_q, cu_q, msq, _ = unpad_input(q, qmask)
    k_un, _, cu_k, msk, _ = unpad_input(k, kmask)
    v_un, _, _, _, _ = unpad_input(v, kmask)

    out = pad_input(
        flash_attn_varlen_func(q_un, k_un, v_un, cu_q, cu_k, msq, msk,
                               causal=True),
        idx_q, b, sq,
    )
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
    np.testing.assert_allclose(np.asarray(out[1], np.float32), 0.0)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("mha_type", ["mha", "gqa"])
def test_varlen_backward(causal, mha_type):
    key = jax.random.PRNGKey(hash(("vlbwd", causal, mha_type)) % 2**31)
    b, h, d = 2, 4, 64
    sq, sk = 200, 256
    h_k = {"mha": h, "gqa": 2}[mha_type]
    q, k, v, qmask, kmask = _setup(key, b, sq, sk, h, h_k, d)

    q_un, idx_q, cu_q, msq, _ = unpad_input(q, qmask)
    k_un, idx_k, cu_k, msk, _ = unpad_input(k, kmask)
    v_un, _, _, _, _ = unpad_input(v, kmask)
    g_un = jax.random.normal(jax.random.PRNGKey(7), q_un.shape).astype(q.dtype)

    def f_kernel(q_un, k_un, v_un):
        out = flash_attn_varlen_func(q_un, k_un, v_un, cu_q, cu_k, msq, msk,
                                     causal=causal)
        return (out.astype(jnp.float32) * g_un.astype(jnp.float32)).sum()

    dq_un, dk_un, dv_un = jax.grad(f_kernel, argnums=(0, 1, 2))(q_un, k_un, v_un)
    dq = pad_input(dq_un, idx_q, b, sq)
    dk = pad_input(dk_un, idx_k, b, sk)
    dv = pad_input(dv_un, idx_k, b, sk)

    g_pad = pad_input(g_un, idx_q, b, sq)

    def f_ref(q, k, v, upcast=True):
        out, _ = attention_ref(q, k, v, qmask, kmask, causal=causal,
                               upcast=upcast, reorder_ops=not upcast)
        return (out.astype(jnp.float32) * g_pad.astype(jnp.float32)).sum()

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
                          msg=f"varlen {name} causal={causal} {mha_type}")


def test_unpad_input_for_concatenated_sequences():
    """Reference bert_padding.py:131 docstring example: per-sample
    cu_seqlens for rows holding concatenated short samples, and varlen
    attention over them equals per-sample full attention."""
    from flash_attn_tpu.utils.padding import (
        unpad_input_for_concatenated_sequences)
    from flash_attn_tpu.interface import flash_attn_varlen_func

    b, s, h, d = 3, 6, 2, 32
    mask_len = jnp.asarray([[2, 3, 0, 0, 0, 0],
                            [3, 2, 0, 0, 0, 0],
                            [6, 0, 0, 0, 0, 0]], jnp.int32)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)

    packed, indices, cu, max_sl = unpad_input_for_concatenated_sequences(
        x, mask_len)
    np.testing.assert_array_equal(np.asarray(cu), [0, 2, 5, 8, 10, 16])
    assert max_sl == 6
    # rows use 5, 5, 6 of 6 slots: valid tokens front-packed, tail zero
    expect = np.concatenate([np.asarray(x[0, :5]), np.asarray(x[1, :5]),
                             np.asarray(x[2, :6]),
                             np.zeros((2, h, d), np.float32)])
    np.testing.assert_array_equal(np.asarray(packed), expect)

    # jittable variant: static max_segments pads cu with repeated totals
    _, _, cu_pad, _ = unpad_input_for_concatenated_sequences(
        x, mask_len, max_segments=8)
    np.testing.assert_array_equal(np.asarray(cu_pad),
                                  [0, 2, 5, 8, 10, 16, 16, 16, 16])

    # varlen attention with per-sample cu_seqlens == block-diagonal ref
    out = flash_attn_varlen_func(packed, packed, packed, cu, cu,
                                 max_sl, max_sl, causal=True)
    cu_np = np.asarray(cu)
    for i in range(len(cu_np) - 1):
        lo, hi = int(cu_np[i]), int(cu_np[i + 1])
        seg = packed[lo:hi][None]  # (1, len, h, d)
        ref = attention_ref(seg, seg, seg, causal=True)[0]
        np.testing.assert_allclose(np.asarray(out[lo:hi]), np.asarray(ref[0]),
                                   atol=2e-3, rtol=1e-2)


@pytest.mark.parametrize("causal", [False, True])
def test_varlen_scheduler_metadata_consumed(causal):
    """scheduler_metadata= must be consumed by the kernel (the reference
    reuses precomputed scheduler metadata, hopper/flash_api.cpp:1004): the
    output with a precomputed schedule matches the inline-schedule output,
    and grads flow through the metadata-carrying call."""
    from flash_attn_tpu import get_scheduler_metadata

    key = jax.random.PRNGKey(7)
    b, h, d = 3, 4, 64
    sq, sk = 193, 260
    q, k, v, qmask, kmask = _setup(key, b, sq, sk, h, h, d)

    q_un, idx_q, cu_q, msq, _ = unpad_input(q, qmask)
    k_un, _, cu_k, msk, _ = unpad_input(k, kmask)
    v_un, _, _, _, _ = unpad_input(v, kmask)

    md = get_scheduler_metadata(
        b, msq, msk, h, h, d, cu_seqlens_q=cu_q, cu_seqlens_k=cu_k,
        causal=causal)
    out_md = flash_attn_varlen_func(
        q_un, k_un, v_un, cu_q, cu_k, msq, msk, causal=causal,
        scheduler_metadata=md)
    # Same schedule contents -> same kernel result when tiles agree; always
    # numerically equivalent.
    out_inline = flash_attn_varlen_func(
        q_un, k_un, v_un, cu_q, cu_k, msq, msk, causal=causal,
        block_table=None)
    np.testing.assert_allclose(
        np.asarray(out_md, np.float32), np.asarray(out_inline, np.float32),
        atol=2e-2, rtol=1e-2)

    # grads flow (meta cotangent is symbolically zero)
    def loss(q_, k_, v_):
        return flash_attn_varlen_func(
            q_, k_, v_, cu_q, cu_k, msq, msk, causal=causal,
            scheduler_metadata=md).astype(jnp.float32).sum()

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q_un, k_un, v_un)
    for g in (dq, dk, dv):
        assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))


def test_varlen_learnable_sink_fwd_and_grads():
    """learnable_sink x varlen crossing (the reference FA4 varlen supports
    the sink; round-3): fwd matches per-sequence dense references and all
    grads incl. dsink match autodiff through the fp32 reference."""
    from flash_attn_tpu.utils.testing import attention_ref

    lens = [48, 96, 33]
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    total = int(cu[-1])
    h, d = 4, 64
    q = jax.random.normal(jax.random.PRNGKey(51), (total, h, d))
    k = jax.random.normal(jax.random.PRNGKey(52), (total, h, d))
    v = jax.random.normal(jax.random.PRNGKey(53), (total, h, d))
    sink = jnp.asarray(np.linspace(-0.5, 1.0, h), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(54), (total, h, d))

    def f_kernel(q, k, v, sink):
        out = flash_attn_varlen_func(
            q, k, v, cu, cu, max(lens), max(lens), causal=True,
            learnable_sink=sink)
        return out, (out * g).sum()

    out, _ = f_kernel(q, k, v, sink)
    for s_i in range(len(lens)):
        lo, hi = int(cu[s_i]), int(cu[s_i + 1])
        ref, _ = attention_ref(q[None, lo:hi], k[None, lo:hi],
                               v[None, lo:hi], causal=True,
                               learnable_sink=sink)
        np.testing.assert_allclose(
            np.asarray(out[lo:hi], np.float32), np.asarray(ref[0]),
            atol=2e-3, rtol=2e-3, err_msg=f"seq {s_i}")

    def loss_kernel(q, k, v, sink):
        return f_kernel(q, k, v, sink)[1]

    def loss_ref(q, k, v, sink):
        tot = 0.0
        for s_i in range(len(lens)):
            lo, hi = int(cu[s_i]), int(cu[s_i + 1])
            ref, _ = attention_ref(q[None, lo:hi], k[None, lo:hi],
                                   v[None, lo:hi], causal=True,
                                   learnable_sink=sink)
            tot = tot + (ref[0] * g[lo:hi]).sum()
        return tot

    grads = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, sink)
    refs = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, sink)
    for name, got, ref in zip(("dq", "dk", "dv", "dsink"), grads, refs):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=3e-3, rtol=3e-3, err_msg=name)
