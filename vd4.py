import time, jax, jax.numpy as jnp
from flash_attn_tpu import flash_attn_with_kvcache
from flash_attn_tpu.utils.testing import attention_ref
b, h, hk, d, s_max = 2, 8, 8, 128, 512
q = jax.random.normal(jax.random.PRNGKey(3), (b, 1, h, d), jnp.bfloat16)
kc32 = jax.random.normal(jax.random.PRNGKey(4), (b, hk, s_max, d))
kd = jnp.abs(kc32).max(axis=(2, 3)) / 127.0
kc = jnp.clip(jnp.round(kc32 / kd[:, :, None, None]), -127, 127).astype(jnp.int8)
sl = jnp.array([500, 257], jnp.int32)
t0 = time.time()
f1 = jax.jit(lambda q, kc, kd, sl: flash_attn_with_kvcache(
    q, kc, kc, cache_seqlens=sl, causal=True, k_descale=kd, v_descale=kd))
r = f1(q, kc, kd, sl)
print("jit kernel alone: %.1fs" % (time.time() - t0), flush=True)
t0 = time.time()
def ref(q, kc, kd, sl):
    deq = jnp.swapaxes(kc.astype(jnp.float32) * kd[:, :, None, None], 1, 2)
    kmask = jnp.arange(s_max)[None] < sl[:, None]
    o = attention_ref(q.astype(jnp.float32), deq, deq, None, kmask, causal=True)
    return o[0] if isinstance(o, tuple) else o
r2 = jax.jit(ref)(q, kc, kd, sl)
print("jit ref alone: %.1fs" % (time.time() - t0), flush=True)
t0 = time.time()
err = jax.jit(lambda q, kc, kd, sl: jnp.abs(
    f1(q, kc, kd, sl).astype(jnp.float32) - ref(q, kc, kd, sl)).max())(q, kc, kd, sl)
print("combined: %.1fs err=%.4f" % (time.time() - t0, float(err)), flush=True)
