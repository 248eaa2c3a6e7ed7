import sys; sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp
import bench
from flash_attn_tpu.kernels.flash_fwd_split import flash_attention_fwd_split

b, h, s, d = 4, 16, 8192, 128
kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
useful = 4.0 * b * h * s * s * d / 2
for (bq, bk, ebq, ebk) in [
    (1024, 1024, None, None),
    (512, 512, None, None),
    (1024, 512, None, None),
    (2048, 1024, None, None),
    (1024, 1024, 512, 512),
    (1024, 1024, 256, 256),
]:
    try:
        fn = lambda q, k, v: flash_attention_fwd_split(
            q, k, v, block_q=bq, block_k=bk,
            edge_block_q=ebq, edge_block_k=ebk)[0]
        t = bench.bench_device_loop(fn, q, k, v, N=30)
        print(f"bq={bq} bk={bk} ebq={ebq} ebk={ebk}: {useful/t/1e12:.1f} TF/s ({t*1e3:.2f} ms)")
    except Exception as e:
        print(f"bq={bq} bk={bk} ebq={ebq} ebk={ebk}: {type(e).__name__} {e}")
