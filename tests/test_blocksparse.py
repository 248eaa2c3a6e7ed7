"""Block-sparse attention vs dense masked softmax."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.kernels.flash_blocksparse import (
    blockmask_to_kv_indices,
    flash_attention_blocksparse_fwd,
)


@pytest.mark.parametrize("causal", [False, True])
def test_blocksparse_matches_dense_mask(causal):
    h, sq, sk, d = 2, 512, 512, 64
    bq = bk = 128
    nq, nk = sq // bq, sk // bk
    q = jax.random.normal(jax.random.PRNGKey(0), (h, sq, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (h, sk, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (h, sk, d), jnp.float32)
    blockmask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.6, (nq, nk))
    blockmask = blockmask.at[:, 0].set(True)  # no empty rows

    kv_num, kv_idx = blockmask_to_kv_indices(blockmask)
    out, lse = flash_attention_blocksparse_fwd(
        q, k, v, kv_num, kv_idx, causal=causal, block_q=bq, block_k=bk,
        interpret=True)

    # dense reference: expand block mask to element mask
    em = np.kron(np.asarray(blockmask), np.ones((bq, bk), bool))
    if causal:
        em &= np.tril(np.ones((sq, sk), bool))
    scale = 1.0 / math.sqrt(d)
    sc = jnp.einsum("hqd,hkd->hqk", q, k) * scale
    sc = jnp.where(jnp.asarray(em)[None], sc, -jnp.inf)
    m = jnp.max(sc, -1, keepdims=True)
    m = jnp.where(jnp.isneginf(m), 0.0, m)
    e = jnp.where(jnp.isneginf(sc), 0.0, jnp.exp(sc - m))
    den = e.sum(-1, keepdims=True)
    p = e / jnp.where(den == 0, 1.0, den)
    ref = jnp.einsum("hqk,hkd->hqd", p, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_blocksparse_empty_row():
    h, s, d = 1, 256, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (h, s, d), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (h, s, d), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (h, s, d), jnp.float32)
    blockmask = jnp.zeros((2, 2), bool).at[1, 0].set(True)
    kv_num, kv_idx = blockmask_to_kv_indices(blockmask)
    out, lse = flash_attention_blocksparse_fwd(
        q, k, v, kv_num, kv_idx, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out[:, :128]), 0.0, atol=1e-6)
    assert bool(jnp.all(jnp.isneginf(lse[:, :128])))
