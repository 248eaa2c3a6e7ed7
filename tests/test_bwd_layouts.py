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


@pytest.mark.parametrize("causal", [False, True])
def test_fused_head_fold_multi_segment(monkeypatch, causal):
    """Head folding with hf < h_k: more than one kv-head BLOCK per batch,
    exercising the folded segment-flush DMA at a nonzero head offset
    (dst column hk_block * hf * d)."""
    monkeypatch.setenv("FA_BWD_FOLD", "2")
    b, h, s, d = 1, 4, 256, 128
    ks = jax.random.split(jax.random.PRNGKey(3 + causal), 4)
    q = jax.random.normal(ks[0], (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, h, s, d), jnp.bfloat16)
    do = jax.random.normal(ks[3], (b, h, s, d), jnp.bfloat16)
    interp = jax.default_backend() == "cpu"
    out, lse = flash_attention_fwd(q, k, v, causal=causal, return_lse=True,
                                   interpret=interp)
    dq2, dk2, dv2 = flash_attention_bwd(do, q, k, v, out, lse, causal=causal,
                                        interpret=interp)
    tr = lambda x: jnp.swapaxes(x, 1, 2)
    dq1, dk1, dv1 = flash_attention_bwd_fused(
        tr(do), tr(q), tr(k), tr(v), tr(out), lse, causal=causal,
        interpret=interp)
    for name, a, bb in (("dq", tr(dq1), dq2), ("dk", tr(dk1), dk2),
                        ("dv", tr(dv1), dv2)):
        aa = np.asarray(a, np.float32)
        bbb = np.asarray(bb, np.float32)
        err = np.abs(aa - bbb).max()
        tol = 2e-2 * max(1.0, np.abs(bbb).max())
        assert err <= tol, (name, err, tol)
