"""Split-edge causal backward vs the standard fused backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.kernels.flash_bwd_fused import flash_attention_bwd_fused
from flash_attn_tpu.kernels.flash_bwd_split import flash_attention_bwd_split
from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd


def _setup(key, b, h, h_k, sq, sk, d, dtype=jnp.bfloat16):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, sq, d), jnp.float32).astype(dtype)
    k = jax.random.normal(kk, (b, h_k, sk, d), jnp.float32).astype(dtype)
    v = jax.random.normal(kv, (b, h_k, sk, d), jnp.float32).astype(dtype)
    out, lse = flash_attention_fwd(q, k, v, causal=True, interpret=True)
    do = jnp.ones_like(out)
    tr = lambda x: jnp.swapaxes(x, 1, 2)  # fused bwd is bshd-native
    return tr(do), tr(q), tr(k), tr(v), tr(out), lse


@pytest.mark.parametrize("sq,sk", [(512, 512), (512, 1024)])
@pytest.mark.parametrize("bq,bk", [(128, 128), (256, 128), (128, 256)])
def test_bwd_split_matches_fused(sq, sk, bq, bk):
    key = jax.random.PRNGKey(hash((sq, sk, bq, bk)) % 2**31)
    do, q, k, v, out, lse = _setup(key, 1, 4, 2, sq, sk, 128)
    ds = flash_attention_bwd_split(do, q, k, v, out, lse,
                                   block_q=bq, block_k=bk, interpret=True)
    dr = flash_attention_bwd_fused(do, q, k, v, out, lse, causal=True,
                                   block_q=bq, block_k=bk, interpret=True)
    for got, want, name in zip(ds, dr, ("dq", "dk", "dv")):
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=3e-2, rtol=3e-2, err_msg=f"{name} sq={sq} bq={bq} bk={bk}")


def test_bwd_split_fallback_partial_blocks():
    do, q, k, v, out, lse = _setup(jax.random.PRNGKey(9), 1, 2, 2,
                                   384, 384, 128)
    ds = flash_attention_bwd_split(do, q, k, v, out, lse,
                                   block_q=256, block_k=256, interpret=True)
    dr = flash_attention_bwd_fused(do, q, k, v, out, lse, causal=True,
                                   block_q=256, block_k=256, interpret=True)
    for got, want in zip(ds, dr):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
