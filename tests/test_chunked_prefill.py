"""Chunked prefill through the paged decode path: processing a prompt in
chunks against a paged KV cache must equal full-sequence attention (the
serving-engine prefix/chunked-prefill capability; reference covers this via
mha_fwd_kvcache with seqlen_q > 1 + paged block tables)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_func, flash_attn_with_kvcache


def test_chunked_prefill_equals_full_attention():
    b, s, h, h_k, d = 2, 512, 8, 2, 64
    page_size, chunk = 128, 128
    ppseq = s // page_size
    num_pages = b * ppseq
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d)).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h_k, d)).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h_k, d)).astype(jnp.bfloat16)

    full = flash_attn_func(q, k, v, causal=True)

    kp = jnp.zeros((num_pages, h_k, page_size, d), jnp.bfloat16)
    vp = jnp.zeros((num_pages, h_k, page_size, d), jnp.bfloat16)
    table = jnp.arange(num_pages, dtype=jnp.int32).reshape(b, ppseq)

    outs = []
    lens = jnp.zeros((b,), jnp.int32)
    for lo in range(0, s, chunk):
        hi = lo + chunk
        out_c, kp, vp = flash_attn_with_kvcache(
            q[:, lo:hi], kp, vp, k=k[:, lo:hi], v=v[:, lo:hi],
            cache_seqlens=lens, block_table=table, causal=True,
        )
        outs.append(out_c)
        lens = lens + chunk
    chunked = jnp.concatenate(outs, axis=1)

    np.testing.assert_allclose(
        np.asarray(chunked, np.float32), np.asarray(full, np.float32),
        atol=3e-2, rtol=3e-2,
    )
    # the cache now contains the full K: one more decode step sees everything
    q1 = jax.random.normal(jax.random.PRNGKey(3), (b, 1, h, d)).astype(jnp.bfloat16)
    out1 = flash_attn_with_kvcache(
        q1, kp, vp, cache_seqlens=lens, block_table=table, causal=True)
    ref1 = flash_attn_func(
        q1, k, v, causal=False)  # attends over all s keys
    np.testing.assert_allclose(
        np.asarray(out1, np.float32), np.asarray(ref1, np.float32),
        atol=3e-2, rtol=3e-2,
    )
