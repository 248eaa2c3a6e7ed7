"""Round-3 verify drive: split-edge causal fwd/bwd as the DEFAULT path,
exercised through the public flash_attn_func on the real chip, numerics
vs the fp32 reference."""
import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu import flash_attn_func
from flash_attn_tpu.utils.testing import attention_ref

_fetch = jax.jit(lambda r: jnp.sum(r.astype(jnp.float32)))


def run(b, sq, sk, h, h_k, d, causal=True):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, sq, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, sk, h_k, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, sk, h_k, d), jnp.float32)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

    def loss(q, k, v):
        return flash_attn_func(q, k, v, causal=causal).astype(
            jnp.float32).sum()

    out = jax.jit(lambda q, k, v: flash_attn_func(q, k, v, causal=causal))(
        qb, kb, vb)
    dq, dk, dv = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qb, kb, vb)
    float(_fetch(out))

    ref = attention_ref(q, k, v, causal=causal)[0]
    ref_lp = attention_ref(qb, kb, vb, causal=causal,
                           upcast=False)[0].astype(jnp.float32)
    err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
    err_lp = float(jnp.abs(ref_lp - ref).max())
    ok = err <= 2 * err_lp + 1e-4
    fin = all(bool(jnp.isfinite(x.astype(jnp.float32)).all())
              for x in (out, dq, dk, dv))
    print(f"b={b} sq={sq} sk={sk} h={h}/{h_k} d={d} causal={causal}: "
          f"err={err:.4f} 2x-bound={2*err_lp:.4f} contract={'OK' if ok else 'FAIL'}"
          f" grads-finite={fin} |dq|={float(jnp.abs(dq).mean()):.4f}",
          flush=True)
    assert ok and fin


if __name__ == "__main__":
    run(1, 1024, 1024, 8, 8, 128, causal=True)      # split fwd+bwd default
    run(1, 1024, 2048, 8, 2, 128, causal=True)      # GQA + cross-seqlen
    run(1, 1000, 1000, 4, 4, 64, causal=True)       # partial tiles fallback
    run(1, 1024, 1024, 8, 8, 128, causal=False)     # non-causal unchanged
    print("drive OK")
