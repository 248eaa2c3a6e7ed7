"""Seqlen-pair breadth sweeps — the reference's main parametrized surface
(tests/test_flash_attn.py:704 sweeps ~20 (sq, sk) pairs x dtype x causal x
mha/gqa for fwd and bwd). All slow-marked (tests/conftest.py): the smoke
tier keeps representatives; this module is the full-suite breadth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_func
from flash_attn_tpu.utils.testing import attention_ref, check_against_ref

SEQLEN_PAIRS = [
    (113, 203), (113, 211), (108, 256), (256, 512),
    (512, 256), (1023, 1024), (1024, 1023), (1024, 1024),
]

pytestmark = pytest.mark.slow


def _mk(key, b, sq, sk, h, h_k, d, dtype=jnp.bfloat16):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, sq, h, d), jnp.float32).astype(dtype)
    k = jax.random.normal(kk, (b, sk, h_k, d), jnp.float32).astype(dtype)
    v = jax.random.normal(kv, (b, sk, h_k, d), jnp.float32).astype(dtype)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,sk", SEQLEN_PAIRS)
def test_fwd_seqlen_sweep(sq, sk, causal):
    key = jax.random.PRNGKey(hash((sq, sk, causal)) % 2**31)
    q, k, v = _mk(key, 1, sq, sk, 4, 2, 64)
    out = flash_attn_func(q, k, v, causal=causal)
    ref, _ = attention_ref(q, k, v, causal=causal)
    ref_lp, _ = attention_ref(q, k, v, causal=causal, upcast=False,
                              reorder_ops=True)
    check_against_ref(out, ref, ref_lp, msg=f"fwd {sq}/{sk} causal={causal}")


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("sq,sk", [(113, 203), (256, 512), (512, 256),
                                   (1024, 1024)])
def test_bwd_seqlen_sweep(sq, sk, causal):
    if causal and sq > sk:
        pytest.skip("causal needs sk >= sq (reference constraint)")
    key = jax.random.PRNGKey(hash((sq, sk, causal, 1)) % 2**31)
    q, k, v = _mk(key, 1, sq, sk, 4, 2, 64)
    g = jax.random.normal(jax.random.PRNGKey(7), (1, sq, 4, 64),
                          jnp.float32).astype(jnp.bfloat16)

    def f_kernel(q, k, v):
        return (flash_attn_func(q, k, v, causal=causal)
                .astype(jnp.float32) * g.astype(jnp.float32)).sum()

    def f_ref(q, k, v, upcast):
        out, _ = attention_ref(q, k, v, causal=causal, upcast=upcast,
                               reorder_ops=not upcast)
        return (out.astype(jnp.float32) * g.astype(jnp.float32)).sum()

    grads = jax.grad(f_kernel, argnums=(0, 1, 2))(q, k, v)
    refs = jax.grad(lambda *a: f_ref(*a, True), argnums=(0, 1, 2))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    lps = jax.grad(lambda *a: f_ref(*a, False), argnums=(0, 1, 2))(q, k, v)
    for name, got, ref, lp in zip(("dq", "dk", "dv"), grads, refs, lps):
        check_against_ref(got, ref, lp, mult=3.0, atol=1e-4,
                          msg=f"{name} {sq}/{sk} causal={causal}")


@pytest.mark.parametrize("dtype", [jnp.float16, jnp.bfloat16])
@pytest.mark.parametrize("sq,sk", [(384, 384), (512, 768)])
def test_dtype_seqlen_sweep(sq, sk, dtype):
    key = jax.random.PRNGKey(hash((sq, sk, str(dtype))) % 2**31)
    q, k, v = _mk(key, 1, sq, sk, 4, 4, 64, dtype=dtype)
    out = flash_attn_func(q, k, v, causal=True)
    ref, _ = attention_ref(q, k, v, causal=True)
    ref_lp, _ = attention_ref(q, k, v, causal=True, upcast=False,
                              reorder_ops=True)
    check_against_ref(out, ref, ref_lp, msg=f"{dtype} {sq}/{sk}")


@pytest.mark.parametrize("sq,sk", [(256, 512), (512, 512)])
@pytest.mark.parametrize("feature", ["window", "softcap", "alibi", "sink"])
def test_feature_seqlen_sweep(sq, sk, feature):
    """Every mask/bias feature at cross-seqlen shapes."""
    from flash_attn_tpu.utils.testing import attn_bias_from_alibi_slopes

    key = jax.random.PRNGKey(hash((sq, sk, feature)) % 2**31)
    h = 4
    q, k, v = _mk(key, 1, sq, sk, h, h, 64)
    kw, ref_kw = {}, {}
    bias = None
    if feature == "window":
        kw["window_size"] = (64, 0)
        ref_kw["window_size"] = (64, 0)
    elif feature == "softcap":
        kw["softcap"] = 30.0
        ref_kw["softcap"] = 30.0
    elif feature == "alibi":
        slopes = jnp.asarray(np.geomspace(1, 1 / 256, h), jnp.float32)
        kw["alibi_slopes"] = slopes
        bias = attn_bias_from_alibi_slopes(slopes, sq, sk, causal=True)
    elif feature == "sink":
        kw["learnable_sink"] = jnp.asarray(np.linspace(-1, 1, h), jnp.float32)
        ref_kw["learnable_sink"] = kw["learnable_sink"]
    out = flash_attn_func(q, k, v, causal=True, **kw)
    ref, _ = attention_ref(q, k, v, causal=True, attn_bias=bias, **ref_kw)
    ref_lp, _ = attention_ref(q, k, v, causal=True, attn_bias=bias,
                              upcast=False, reorder_ops=True, **ref_kw)
    check_against_ref(out, ref, ref_lp, msg=f"{feature} {sq}/{sk}")


@pytest.mark.parametrize("h,h_k", [(8, 8), (8, 4), (8, 2), (8, 1)])
def test_gqa_ratio_sweep(h, h_k):
    """GQA group sizes 1..8 fwd+bwd (the reference parametrizes mha/gqa/
    mqa through its main sweeps)."""
    key = jax.random.PRNGKey(hash((h, h_k)) % 2**31)
    q, k, v = _mk(key, 1, 256, 384, h, h_k, 64)
    g = jax.random.normal(jax.random.PRNGKey(3), (1, 256, h, 64),
                          jnp.float32).astype(jnp.bfloat16)
    out = flash_attn_func(q, k, v, causal=True)
    ref, _ = attention_ref(q, k, v, causal=True)
    ref_lp, _ = attention_ref(q, k, v, causal=True, upcast=False,
                              reorder_ops=True)
    check_against_ref(out, ref, ref_lp, msg=f"gqa {h}/{h_k}")

    dq = jax.grad(lambda q: (flash_attn_func(q, k, v, causal=True)
                             .astype(jnp.float32)
                             * g.astype(jnp.float32)).sum())(q)
    dq_ref = jax.grad(lambda q: (attention_ref(q, k, v, causal=True)[0]
                                 * g.astype(jnp.float32)).sum())(
        q.astype(jnp.float32))
    dq_lp = jax.grad(lambda q: (attention_ref(q, k, v, causal=True,
                                              upcast=False,
                                              reorder_ops=True)[0]
                                .astype(jnp.float32)
                                * g.astype(jnp.float32)).sum())(q)
    check_against_ref(dq, dq_ref, dq_lp, mult=3.0, atol=1e-4,
                      msg=f"dq gqa {h}/{h_k}")


@pytest.mark.parametrize("window", [(32, 0), (64, 16)])
def test_paged_decode_window_sweep(window):
    """paged KV x sliding window in decode."""
    from flash_attn_tpu import flash_attn_with_kvcache
    from flash_attn_tpu.utils.testing import attention_ref as aref

    b, h, h_k, d = 2, 4, 2, 64
    page_size, pages_per_seq = 64, 4
    s_max = page_size * pages_per_seq
    num_pages = b * pages_per_seq
    q = jax.random.normal(jax.random.PRNGKey(1), (b, 1, h, d), jnp.bfloat16)
    kp = jax.random.normal(jax.random.PRNGKey(2),
                           (num_pages, h_k, page_size, d), jnp.bfloat16)
    vp = jax.random.normal(jax.random.PRNGKey(3),
                           (num_pages, h_k, page_size, d), jnp.bfloat16)
    table = jnp.arange(num_pages, dtype=jnp.int32).reshape(b, pages_per_seq)
    seqlens = jnp.array([s_max - 3, s_max // 2], jnp.int32)
    out = flash_attn_with_kvcache(
        q, kp, vp, cache_seqlens=seqlens, block_table=table, causal=True,
        window_size=window)
    k_lin = (kp[table].reshape(b, pages_per_seq, h_k, page_size, d)
             .transpose(0, 1, 3, 2, 4).reshape(b, s_max, h_k, d))
    v_lin = (vp[table].reshape(b, pages_per_seq, h_k, page_size, d)
             .transpose(0, 1, 3, 2, 4).reshape(b, s_max, h_k, d))
    kmask = jnp.arange(s_max)[None, :] < seqlens[:, None]
    ref, _ = aref(q.astype(jnp.float32), k_lin.astype(jnp.float32),
                  v_lin.astype(jnp.float32), None, kmask, causal=True,
                  window_size=(window[0], 0))
    ref_lp, _ = aref(q, k_lin, v_lin, None, kmask, causal=True,
                     window_size=(window[0], 0), upcast=False,
                     reorder_ops=True)
    check_against_ref(out, ref, ref_lp, msg=f"paged window {window}")
