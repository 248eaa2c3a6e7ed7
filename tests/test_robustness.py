"""Robustness analogues of reference suites:
 - large-magnitude inputs (tests/test_flash_attn.py:2247 bwd_overflow)
 - AOT lowering/serialization (hopper/test_torch_compile_and_export.py —
   here jax.jit lowering + jax.export round trip)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_func
from flash_attn_tpu.utils.testing import attention_ref, check_against_ref


@pytest.mark.parametrize("magnitude", [10.0, 30.0])
def test_bwd_overflow_large_inputs(magnitude):
    """Large-magnitude q/k must not overflow the exp2 softmax or gradients."""
    b, s, h, d = 1, 256, 2, 64
    q = (jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d)) * magnitude
         ).astype(jnp.bfloat16)
    k = (jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d)) * magnitude
         ).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d)).astype(jnp.bfloat16)
    g = jax.random.normal(jax.random.PRNGKey(3), (b, s, h, d)).astype(jnp.bfloat16)

    out = flash_attn_func(q, k, v, causal=True)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
    ref, _ = attention_ref(q, k, v, causal=True)
    ref_lp, _ = attention_ref(q, k, v, causal=True, upcast=False,
                              reorder_ops=True)
    check_against_ref(out, ref, ref_lp, msg=f"overflow fwd m={magnitude}")

    dq, dk, dv = jax.grad(
        lambda q, k, v: (flash_attn_func(q, k, v, causal=True)
                         .astype(jnp.float32) * g.astype(jnp.float32)).sum(),
        argnums=(0, 1, 2))(q, k, v)
    for name, x in [("dq", dq), ("dk", dk), ("dv", dv)]:
        assert bool(jnp.isfinite(x.astype(jnp.float32)).all()), name


def test_jax_export_roundtrip():
    """flash_attn_func must survive jax.export serialize/deserialize (the
    torch.compile/export composability contract)."""
    from jax import export

    b, s, h, d = 1, 256, 2, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d)).astype(jnp.bfloat16)

    fn = jax.jit(lambda q, k, v: flash_attn_func(q, k, v, causal=True))
    exp = export.export(fn)(
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
    )
    blob = exp.serialize()
    rehydrated = export.deserialize(blob)
    out = rehydrated.call(q, q, q)
    direct = fn(q, q, q)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(direct, np.float32))


def test_grad_through_vmap():
    """vmap composability: flash_attn_func under jax.vmap (extra leading
    axis) forward + backward."""
    n, b, s, h, d = 3, 1, 128, 2, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (n, b, s, h, d))

    f = jax.vmap(lambda q, k, v: flash_attn_func(q, k, v, causal=True))
    out = f(q, q, q)
    assert out.shape == (n, b, s, h, d)
    ref0 = flash_attn_func(q[1], q[1], q[1], causal=True)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref0),
                               atol=1e-6)


def test_jax_export_roundtrip_varlen_persistent():
    """The persistent flat-walk varlen forward (round 5: manual DMA walk,
    scalar-prefetch schedule) must also survive jax.export — serving
    deployments export the prefill step."""
    from jax import export

    from flash_attn_tpu import flash_attn_varlen_func

    total, h, d = 384, 2, 64
    cu = jnp.asarray([0, 200, 384], jnp.int32)
    q = jax.random.normal(jax.random.PRNGKey(0), (total, h, d)
                          ).astype(jnp.bfloat16)

    fn = jax.jit(lambda q, k, v, cu: flash_attn_varlen_func(
        q, k, v, cu, cu, 200, 200, causal=True))
    exp = export.export(fn)(
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct(cu.shape, cu.dtype),
    )
    rehydrated = export.deserialize(exp.serialize())
    out = rehydrated.call(q, q, q, cu)
    direct = fn(q, q, q, cu)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(direct, np.float32),
                               atol=1e-5, rtol=1e-5)
