"""Cross-device sharded decode: heads TP + cache sequence CP with
LSE-combine across the seq axis must match single-device decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.kernels.flash_decode import flash_attention_decode
from flash_attn_tpu.parallel.decode import sharded_decode_attention
from flash_attn_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("seq_shards", [2, 4])
def test_sharded_decode_matches_single(seq_shards):
    mesh = make_mesh(data=1, model=8 // seq_shards, seq=seq_shards)
    b, h, h_k, d, s_max = 2, 8, 8, 64, 512
    q = jax.random.normal(jax.random.PRNGKey(0), (b, 1, h, d), jnp.float32)
    kc = jax.random.normal(jax.random.PRNGKey(1), (b, h_k, s_max, d), jnp.float32)
    vc = jax.random.normal(jax.random.PRNGKey(2), (b, h_k, s_max, d), jnp.float32)
    seqlens = jnp.array([500, 200], jnp.int32)

    fn = sharded_decode_attention(mesh, interpret=True)
    out = fn(q, kc, vc, seqlens)

    ref, _ = flash_attention_decode(q, kc, vc, seqlens, causal=False,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
