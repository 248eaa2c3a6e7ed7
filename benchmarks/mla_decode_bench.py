"""MLA decode harness — µs / GB/s / TFLOPS (reference
hopper/benchmark_mla_decode.py:30-40: seqlen 8k, 128 q heads MQA,
hdim 576/512 absorbed layout; scaled-down variants included for the
single-v5e chip).

Run: python benchmarks/mla_decode_bench.py
"""

import time

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
import jax.numpy as jnp

from flash_attn_tpu.kernels.flash_decode import flash_attention_decode

_fetch = jax.jit(lambda r: jnp.sum(r.astype(jnp.float32)))


def bench(fn, *a, iters=10):
    r = fn(*a)
    float(_fetch(r[0]))
    t0 = time.time()
    for _ in range(iters):
        r = fn(*a)
    float(_fetch(r[0]))
    return (time.time() - t0) / iters


def run(b, h, ctx, d, dv, tag):
    h_k = 1  # MQA (absorbed MLA)
    q = jax.random.normal(jax.random.PRNGKey(0), (b, 1, h, d), jnp.bfloat16)
    kc = jax.random.normal(jax.random.PRNGKey(1), (b, h_k, ctx, d),
                           jnp.bfloat16)
    vc = kc[..., :dv]
    sl = jnp.full((b,), ctx - 1, jnp.int32)
    from functools import partial
    fn = partial(flash_attention_decode, causal=True,
                 softmax_scale=1.0 / (d ** 0.5))
    t = bench(fn, q, kc, vc, sl)
    # bytes: KV cache read once per step (V aliases K's first dv dims)
    gb = b * h_k * ctx * d * 2 / 1e9
    fl = 2 * b * h * ctx * (d + dv)
    print(f"{tag}: {t*1e6:.0f} us  {gb/t:.0f} GB/s  {fl/t/1e12:.2f} TF/s",
          flush=True)


def main():
    # scaled MLA absorbed decode shapes (q heads x ctx)
    run(4, 16, 4096, 576, 512, "b4 h16 ctx4k 576/512")
    run(8, 32, 4096, 576, 512, "b8 h32 ctx4k 576/512")
    run(2, 64, 8192, 576, 512, "b2 h64 ctx8k 576/512")


if __name__ == "__main__":
    main()
