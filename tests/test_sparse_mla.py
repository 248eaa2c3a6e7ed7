"""Sparse top-k MLA (DSA) — fwd + grads vs a dense masked fp32 reference.

Reference surface being covered: gather_kv_indices forward
(/root/reference/flash_attn/cute/interface.py:935-955),
_flash_attn_bwd_sparse_mla (cute/interface.py:2645) incl. the qv-term
gradient (cute/flash_bwd_mla_dq_dqv_sm100.py), and the topk gather
(cute/topk_gather_kv.py). The dense reference builds an additive mask
selecting exactly the per-row index set and runs full-matrix attention.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_sparse_mla_func
from flash_attn_tpu.kernels.flash_sparse_mla import (
    sparse_mla_bwd,
    sparse_mla_fwd,
)


def _dense_ref(q, k, v, qv, indices, softmax_scale, causal):
    """Full-matrix fp32 attention restricted to each row's index set.
    Duplicate indices contribute multiply (gather semantics), expressed
    as per-(row, kv) multiplicity weights on the exp terms."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    dv = v.shape[-1]
    qf = q.astype(jnp.float32)
    kf = k[:, :, 0].astype(jnp.float32)
    vf = v[:, :, 0].astype(jnp.float32)
    s = jnp.einsum("bthd,bsd->bhts", qf, kf)
    if qv is not None:
        s = s + jnp.einsum("bthd,bsd->bhts", qv.astype(jnp.float32), vf)
    s = s * softmax_scale
    # multiplicity[b, t, s] = #times s appears among row t's valid indices
    valid = indices >= 0
    if causal:
        shift = sk - sq
        pos = jnp.arange(sq, dtype=jnp.int32)[None, :, None] + shift
        valid = jnp.logical_and(valid, indices <= pos)
    onehot = jax.nn.one_hot(jnp.where(valid, indices, sk), sk + 1,
                            dtype=jnp.float32)[..., :sk]
    mult = onehot.sum(axis=2)  # (b, sq, sk)
    w = mult[:, None]  # (b, 1, sq, sk) broadcast over heads
    e = jnp.exp(s - jnp.max(jnp.where(w > 0, s, -jnp.inf), axis=-1,
                            keepdims=True))
    e = jnp.where(w > 0, e * w, 0.0)
    denom = e.sum(axis=-1, keepdims=True)
    p = e / jnp.where(denom == 0, 1.0, denom)
    out = jnp.einsum("bhts,bsd->bthd", p, vf)
    return out


def _mk(b, sq, sk, h, d, dv, topk, *, causal, with_qv, key=0,
        dtype=jnp.float32, with_invalid=True):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    q = jax.random.normal(ks[0], (b, sq, h, d), jnp.float32).astype(dtype)
    k = jax.random.normal(ks[1], (b, sk, 1, d), jnp.float32).astype(dtype)
    v = jax.random.normal(ks[2], (b, sk, 1, dv), jnp.float32).astype(dtype)
    qv = (jax.random.normal(ks[3], (b, sq, h, dv), jnp.float32).astype(dtype)
          if with_qv else None)
    idx = jax.random.randint(ks[4], (b, sq, topk), 0, sk, jnp.int32)
    if with_invalid:
        # sprinkle -1 sentinels
        drop = jax.random.bernoulli(ks[4], 0.15, (b, sq, topk))
        idx = jnp.where(drop, -1, idx)
    return q, k, v, qv, idx


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("with_qv", [False, True])
def test_sparse_mla_fwd(causal, with_qv):
    b, sq, sk, h, d, dv, topk = 1, 64, 256, 8, 64, 32, 32
    q, k, v, qv, idx = _mk(b, sq, sk, h, d, dv, topk,
                           causal=causal, with_qv=with_qv)
    scale = 1.0 / np.sqrt(d if qv is None else d + dv)
    out = flash_attn_sparse_mla_func(q, k, v, idx, qv=qv, causal=causal)
    ref = _dense_ref(q, k, v, qv, idx, scale, causal)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_sparse_mla_fwd_absorbed_shapes():
    """The DeepSeek absorbed decode shape family (d=576, dv=512) at a
    reduced topk; bf16 like production."""
    b, sq, sk, h, d, dv, topk = 1, 8, 128, 16, 576, 512, 64
    q, k, v, qv, idx = _mk(b, sq, sk, h, d, dv, topk, causal=True,
                           with_qv=True, dtype=jnp.bfloat16)
    scale = 1.0 / np.sqrt(d + dv)
    out = flash_attn_sparse_mla_func(q, k, v, idx, qv=qv, causal=True)
    ref = _dense_ref(q.astype(jnp.float32), k.astype(jnp.float32),
                     v.astype(jnp.float32), qv.astype(jnp.float32),
                     idx, scale, True)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref)).max()
    # the only low-precision steps are the bf16 P/V inputs of the PV matmul
    # (scores and softmax are fp32): a few bf16 ulps of the O(1) outputs
    assert err <= 0.02, err


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("with_qv", [False, True])
def test_sparse_mla_grads(causal, with_qv):
    """dq/dk/dv/dqv match autodiff through the dense masked reference."""
    b, sq, sk, h, d, dv, topk = 1, 32, 128, 4, 32, 16, 16
    q, k, v, qv, idx = _mk(b, sq, sk, h, d, dv, topk,
                           causal=causal, with_qv=with_qv, key=3)
    scale = 1.0 / np.sqrt(d if qv is None else d + dv)
    g = jax.random.normal(jax.random.PRNGKey(9), (b, sq, h, dv))

    def loss_kernel(q, k, v, qv):
        out = flash_attn_sparse_mla_func(q, k, v, idx, qv=qv, causal=causal)
        return (out * g).sum()

    def loss_ref(q, k, v, qv):
        return (_dense_ref(q, k, v, qv, idx, scale, causal) * g).sum()

    if with_qv:
        grads = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(q, k, v, qv)
        refs = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, qv)
        names = ("dq", "dk", "dv", "dqv")
    else:
        grads = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v, qv)
        refs = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v, qv)
        names = ("dq", "dk", "dv")
    for name, got, ref in zip(names, grads, refs):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref, np.float32),
            atol=5e-4, rtol=1e-3, err_msg=f"{name} causal={causal}")


def test_sparse_mla_bwd_deterministic():
    """dK scatter accumulation is bitwise deterministic across re-runs
    (the reference's CUDA sparse bwd cannot promise this — atomics)."""
    b, sq, sk, h, d, dv, topk = 1, 32, 64, 4, 32, 16, 16
    q, k, v, qv, idx = _mk(b, sq, sk, h, d, dv, topk, causal=False,
                           with_qv=True, key=11)
    out, lse = sparse_mla_fwd(q, k, v, qv, idx)
    do = jnp.ones_like(out)
    r1 = sparse_mla_bwd(do, q, k, v, qv, idx, out, lse)
    r2 = sparse_mla_bwd(do, q, k, v, qv, idx, out, lse)
    for a, b_ in zip(r1, r2):
        if a is not None:
            assert (np.asarray(a) == np.asarray(b_)).all()


def test_sparse_mla_all_invalid_row():
    """A row whose indices are all -1 produces zero output and -inf lse."""
    b, sq, sk, h, d, dv, topk = 1, 16, 64, 2, 32, 16, 8
    q, k, v, qv, idx = _mk(b, sq, sk, h, d, dv, topk, causal=False,
                           with_qv=True, key=13, with_invalid=False)
    idx = idx.at[:, 0].set(-1)
    out, lse = sparse_mla_fwd(q, k, v, qv, idx)
    assert np.abs(np.asarray(out[:, 0], np.float32)).max() == 0.0
    assert np.isneginf(np.asarray(lse[:, :, 0])).all()


def test_sparse_mla_packed_varlen_pattern():
    """Varlen usage (the reference's cu_seqlens sparse path,
    cute/interface.py:2709-2716): pack sequences on the batch=1 token
    axis; the INDEXER restricts each row's indices to its own sequence
    (and causality), so the kernel runs with causal=False and -1
    sentinels — outputs must equal per-sequence dense runs."""
    d, dv, h, topk = 32, 16, 4, 8
    lens_q = [12, 20]
    lens_k = [24, 40]
    cu_q = np.concatenate([[0], np.cumsum(lens_q)])
    cu_k = np.concatenate([[0], np.cumsum(lens_k)])
    total_q, total_k = cu_q[-1], cu_k[-1]
    ks = jax.random.split(jax.random.PRNGKey(21), 4)
    q = jax.random.normal(ks[0], (1, total_q, h, d))
    k = jax.random.normal(ks[1], (1, total_k, 1, d))
    v = jax.random.normal(ks[2], (1, total_k, 1, dv))
    qv = jax.random.normal(ks[3], (1, total_q, h, dv))

    # indexer: for packed row t of sequence s at local position p, pick
    # up to topk GLOBAL positions within [cu_k[s], cu_k[s] + p_k] (causal)
    rng = np.random.default_rng(5)
    idx = np.full((1, total_q, topk), -1, np.int32)
    for s in range(len(lens_q)):
        for p in range(lens_q[s]):
            t = cu_q[s] + p
            hi = cu_k[s] + (lens_k[s] - lens_q[s]) + p + 1  # causal bound
            n = min(topk, hi - cu_k[s])
            idx[0, t, :n] = rng.choice(
                np.arange(cu_k[s], hi), size=n, replace=False)
    idx = jnp.asarray(idx)

    out = flash_attn_sparse_mla_func(q, k, v, idx, qv=qv, causal=False)

    # per-sequence dense comparison with LOCAL indices
    scale = 1.0 / np.sqrt(d + dv)
    for s in range(len(lens_q)):
        qs_ = q[:, cu_q[s]:cu_q[s + 1]]
        ks_ = k[:, cu_k[s]:cu_k[s + 1]]
        vs_ = v[:, cu_k[s]:cu_k[s + 1]]
        qvs = qv[:, cu_q[s]:cu_q[s + 1]]
        loc = np.asarray(idx[:, cu_q[s]:cu_q[s + 1]])
        loc = np.where(loc >= 0, loc - cu_k[s], -1)
        ref = _dense_ref(qs_, ks_, vs_, qvs, jnp.asarray(loc), scale, False)
        np.testing.assert_allclose(
            np.asarray(out[:, cu_q[s]:cu_q[s + 1]], np.float32),
            np.asarray(ref), atol=3e-4, rtol=1e-3, err_msg=f"seq {s}")
