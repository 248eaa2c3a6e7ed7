import jax, jax.numpy as jnp
from flash_attn_tpu import flash_attn_with_kvcache
from flash_attn_tpu.utils.testing import attention_ref

@jax.jit
def both(q, kc, vc, kd, vd_, sl):
    out = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=sl, causal=True,
                                  k_descale=kd, v_descale=vd_)
    deq_k = jnp.swapaxes(kc.astype(jnp.float32) * kd[:, :, None, None], 1, 2)
    deq_v = jnp.swapaxes(vc.astype(jnp.float32) * vd_[:, :, None, None], 1, 2)
    kmask = jnp.arange(kc.shape[2])[None] < sl[:, None]
    ref = attention_ref(q.astype(jnp.float32), deq_k, deq_v, None, kmask,
                        causal=True)
    if isinstance(ref, tuple): ref = ref[0]
    return jnp.abs(out.astype(jnp.float32) - ref).max()

import sys
b, h, hk, d, s_max = 2, 8, 8, 128, 512
print("start", flush=True)
q = jax.random.normal(jax.random.PRNGKey(3), (b, 1, h, d), jnp.bfloat16)
kc32 = jax.random.normal(jax.random.PRNGKey(4), (b, hk, s_max, d))
vc32 = jax.random.normal(jax.random.PRNGKey(5), (b, hk, s_max, d))
kd = jnp.abs(kc32).max(axis=(2, 3)) / 127.0
vd_ = jnp.abs(vc32).max(axis=(2, 3)) / 127.0
kc = jnp.clip(jnp.round(kc32 / kd[:, :, None, None]), -127, 127).astype(jnp.int8)
vc = jnp.clip(jnp.round(vc32 / vd_[:, :, None, None]), -127, 127).astype(jnp.int8)
sl = jnp.array([500, 257], jnp.int32)
import sys; print("inputs built", flush=True); print("int8 decode vs oracle err:", float(both(q, kc, vc, kd, vd_, sl)))
h2 = 4
q2 = jax.random.normal(jax.random.PRNGKey(6), (b, 1, h2, d), jnp.bfloat16)
print("h_k=4 int8 err:", float(both(q2, kc[:, :h2], vc[:, :h2], kd[:, :h2], vd_[:, :h2], sl)))
