import jax, jax.numpy as jnp
from flash_attn_tpu import flash_attn_with_kvcache
from flash_attn_tpu.utils.testing import attention_ref
b, h, hk, d, s_max = 2, 8, 8, 128, 512
kk = jax.random.split(jax.random.PRNGKey(3), 3)
q = jax.random.normal(kk[0], (b, 1, h, d), jnp.bfloat16)
kc32 = jax.random.normal(kk[1], (b, hk, s_max, d))
vc32 = jax.random.normal(kk[2], (b, hk, s_max, d))
kd = jnp.abs(kc32).max(axis=(2, 3)) / 127.0
vd_ = jnp.abs(vc32).max(axis=(2, 3)) / 127.0
kc = jnp.clip(jnp.round(kc32 / kd[:, :, None, None]), -127, 127).astype(jnp.int8)
vc = jnp.clip(jnp.round(vc32 / vd_[:, :, None, None]), -127, 127).astype(jnp.int8)
sl = jnp.array([500, 257], jnp.int32)
out = jax.jit(lambda *a: flash_attn_with_kvcache(
    a[0], a[1], a[2], cache_seqlens=a[5], causal=True,
    k_descale=a[3], v_descale=a[4]))(q, kc, vc, kd, vd_, sl)
def ref(q, kc, vc, kd, vd_, sl):
    dk = jnp.swapaxes(kc.astype(jnp.float32) * kd[:, :, None, None], 1, 2)
    dv = jnp.swapaxes(vc.astype(jnp.float32) * vd_[:, :, None, None], 1, 2)
    kmask = jnp.arange(s_max)[None] < sl[:, None]
    o = attention_ref(q.astype(jnp.float32), dk, dv, None, kmask, causal=True)
    return o[0] if isinstance(o, tuple) else o
r = jax.jit(ref)(q, kc, vc, kd, vd_, sl)
import numpy as np
print("int8 decode err:", float(np.abs(np.asarray(out, np.float32) - np.asarray(r)).max()))
h2 = 4
q2 = jax.random.normal(jax.random.PRNGKey(6), (b, 1, h2, d), jnp.bfloat16)
out2 = jax.jit(lambda *a: flash_attn_with_kvcache(
    a[0], a[1], a[2], cache_seqlens=a[5], causal=True,
    k_descale=a[3], v_descale=a[4]))(q2, kc[:, :h2], vc[:, :h2], kd[:, :h2], vd_[:, :h2], sl)
r2 = jax.jit(ref)(q2, kc[:, :h2], vc[:, :h2], kd[:, :h2], vd_[:, :h2], sl)
print("h_k=4 int8 err:", float(np.abs(np.asarray(out2, np.float32) - np.asarray(r2)).max()))
