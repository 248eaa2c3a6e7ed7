import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
import bench
from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd

b, h, s, d = 4, 16, 8192, 128
kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
useful = 4.0 * b * h * s * s * d
for (bq, bk) in [(1024, 1024), (1024, 2048), (2048, 1024), (2048, 2048),
                 (512, 2048), (1024, 4096), (4096, 1024)]:
    try:
        fn = lambda q, k, v: flash_attention_fwd(
            q, k, v, causal=False, block_q=bq, block_k=bk)[0]
        t = bench.bench_device_loop(fn, q, k, v, N=30)
        print(f"dense ({bq},{bk}): {useful/t/1e12:.1f} TF/s ({t*1e3:.2f} ms)")
    except Exception as e:
        print(f"dense ({bq},{bk}): {type(e).__name__}: {str(e)[:80]}")
