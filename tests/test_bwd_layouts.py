"""Backward layout/path parity (reference tests/test_flash_attn.py:2303
``test_flash_attn_bwd_transpose``: grads must be layout-independent).

On TPU the two layout-sensitive implementations are the fused bshd-native
single-pass backward (flash_bwd_fused) and the two-kernel bhsd backward
(flash_bwd). Both must produce the same grads as each other and as the
fp32 reference, for even/odd shapes and GQA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.kernels.flash_bwd import flash_attention_bwd
from flash_attn_tpu.kernels.flash_bwd_fused import (
    flash_attention_bwd_fused,
    fits_vmem,
)
from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,sk,h,h_k,d", [
    (256, 256, 4, 4, 128),
    (192, 320, 4, 2, 128),   # cross-len + GQA
    (256, 256, 2, 2, 64),    # d=64: fused falls to bhsd-block layout
])
def test_fused_vs_twokernel_grads(sq, sk, h, h_k, d, causal):
    b = 2
    ks = jax.random.split(jax.random.PRNGKey(sq + d + causal), 4)
    q = jax.random.normal(ks[0], (b, h, sq, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h_k, sk, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h_k, sk, d), jnp.bfloat16)
    do = jax.random.normal(ks[3], (b, h, sq, d), jnp.bfloat16)

    interp = jax.default_backend() == "cpu"
    out, lse = flash_attention_fwd(q, k, v, causal=causal, return_lse=True,
                                   interpret=interp)

    # two-kernel path (bhsd)
    dq2, dk2, dv2 = flash_attention_bwd(do, q, k, v, out, lse, causal=causal,
                                        interpret=interp)

    # fused path (bshd inputs)
    tr = lambda x: jnp.swapaxes(x, 1, 2)
    dq1, dk1, dv1 = flash_attention_bwd_fused(
        tr(do), tr(q), tr(k), tr(v), tr(out), lse, causal=causal,
        interpret=interp)
    dq1, dk1, dv1 = tr(dq1), tr(dk1), tr(dv1)

    for name, a, bb in (("dq", dq1, dq2), ("dk", dk1, dk2), ("dv", dv1, dv2)):
        aa = np.asarray(a, np.float32)
        bbb = np.asarray(bb, np.float32)
        # identical math, different tiling/layout: near-bitwise agreement
        err = np.abs(aa - bbb).max()
        tol = 2e-2 * max(1.0, np.abs(bbb).max())
        assert err <= tol, (name, err, tol)


def test_fused_vmem_gate():
    """The auto dispatcher's VMEM gate: huge seqlen_k must route to the
    two-kernel path rather than over-allocating VMEM accumulators."""
    assert fits_vmem(4096, 128, 128, 512)
    assert not fits_vmem(65536, 128, 128, 512)


@pytest.mark.parametrize(
    "b,sq,sk,h,hk,causal,bq,bk",
    [
        (2, 256, 256, 4, 2, True, 64, 64),   # odd/even tile rows, GQA
        (1, 192, 256, 2, 2, True, 64, 64),   # row pad + bottom-right shift
        (2, 256, 256, 4, 4, False, 64, 128),
        (1, 256, 320, 2, 1, True, 64, 64),   # col pad, group 2
    ],
)
def test_paired_matches_fused(b, sq, sk, h, hk, causal, bq, bk):
    """The paired-tile pipelined backward (flash_bwd_paired) is numerically
    identical to the fused single-pass kernel: same tile math, same fixed
    iteration order, just two tiles per grid step."""
    from flash_attn_tpu.kernels.flash_bwd_fused import (
        flash_attention_bwd_fused)
    from flash_attn_tpu.kernels.flash_bwd_paired import (
        flash_attention_bwd_paired)
    from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd

    d = 128
    kq, kk, kv, kdo = jax.random.split(jax.random.PRNGKey(b + sq), 4)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, sk, hk, d), jnp.float32)
    v = jax.random.normal(kv, (b, sk, hk, d), jnp.float32)
    do = jax.random.normal(kdo, (b, sq, h, d), jnp.float32)
    tr = lambda x: jnp.swapaxes(x, 1, 2)
    interp = jax.default_backend() == "cpu"
    out_bh, lse = flash_attention_fwd(
        tr(q), tr(k), tr(v), causal=causal, block_q=bq, block_k=bk,
        interpret=interp)
    out = tr(out_bh)
    kw = dict(causal=causal, block_q=bq, block_k=bk, interpret=interp)
    r_fused = flash_attention_bwd_fused(do, q, k, v, out, lse, **kw)
    r_paired = flash_attention_bwd_paired(do, q, k, v, out, lse, **kw)
    for name, a, bb in zip(("dq", "dk", "dv"), r_fused, r_paired):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(bb, np.float32),
            atol=1e-5, rtol=1e-5, err_msg=name)


@pytest.mark.parametrize(
    "b,sq,sk,h,hk,causal,win,alibi,softcap",
    [
        (2, 256, 256, 4, 2, True, (None, None), False, 0.0),
        (1, 192, 256, 2, 2, True, (None, None), False, 0.0),
        (2, 256, 256, 4, 4, False, (None, None), False, 0.0),
        (1, 256, 320, 2, 1, True, (None, None), False, 0.0),
        (1, 256, 256, 2, 2, False, (96, 0), False, 0.0),
        (2, 256, 256, 4, 2, True, (None, None), True, 8.0),
    ],
)
def test_paired_fwd_matches_baseline(b, sq, sk, h, hk, causal, win, alibi,
                                     softcap):
    """flash_fwd_paired (two KV tiles per grid step, bshd-native) is
    numerically identical to the baseline forward kernel."""
    from flash_attn_tpu.kernels.flash_fwd_paired import (
        flash_attention_fwd_paired)

    d = 128
    interp = jax.default_backend() == "cpu"
    tr = lambda x: jnp.swapaxes(x, 1, 2)
    ks = jax.random.split(jax.random.PRNGKey(sq + sk + h), 3)
    q = jax.random.normal(ks[0], (b, sq, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, sk, hk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, sk, hk, d), jnp.float32)
    slopes = (jnp.linspace(0.01, 0.1, b * h).reshape(b, h) if alibi
              else None)
    kw = dict(causal=causal, window_size=win, alibi_slopes=slopes,
              softcap=softcap, block_q=64, block_k=64, interpret=interp)
    o1, l1 = flash_attention_fwd(tr(q), tr(k), tr(v), **kw)
    o2, l2 = flash_attention_fwd_paired(q, k, v, **kw)
    np.testing.assert_allclose(np.asarray(tr(o1), np.float32),
                               np.asarray(o2, np.float32), atol=2e-5)
    np.testing.assert_allclose(np.nan_to_num(np.asarray(l1)),
                               np.nan_to_num(np.asarray(l2)), atol=2e-5)


def test_paired_fwd_d256_and_dropout():
    """Paired fwd at d=256 and with dropout matches the baseline kernel
    (dropout_keep depends only on absolute (row, col), so pairing cannot
    change the mask)."""
    from flash_attn_tpu.kernels.flash_fwd_paired import (
        flash_attention_fwd_paired)

    interp = jax.default_backend() == "cpu"
    tr = lambda x: jnp.swapaxes(x, 1, 2)
    for d, dropout in ((256, 0.0), (128, 0.3)):
        b, s, h = 1, 256, 2
        ks = jax.random.split(jax.random.PRNGKey(d), 3)
        q = jax.random.normal(ks[0], (b, s, h, d), jnp.float32)
        k = jax.random.normal(ks[1], (b, s, h, d), jnp.float32)
        v = jax.random.normal(ks[2], (b, s, h, d), jnp.float32)
        kw = dict(causal=True, block_q=64, block_k=64, interpret=interp,
                  dropout_p=dropout,
                  dropout_seed=jnp.uint32(7) if dropout else None)
        o1, l1 = flash_attention_fwd(tr(q), tr(k), tr(v), **kw)
        o2, l2 = flash_attention_fwd_paired(q, k, v, **kw)
        np.testing.assert_allclose(np.asarray(tr(o1), np.float32),
                                   np.asarray(o2, np.float32), atol=2e-5)
        np.testing.assert_allclose(np.nan_to_num(np.asarray(l1)),
                                   np.nan_to_num(np.asarray(l2)), atol=2e-5)
