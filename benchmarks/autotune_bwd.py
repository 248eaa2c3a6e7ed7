"""Backward-kernel tile sweep on real TPU (same role as autotune_fwd)."""

import itertools
import time

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp

from flash_attn_tpu.kernels.flash_bwd import flash_attention_bwd
from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd

_fetch = jax.jit(lambda r: jnp.sum(r.astype(jnp.float32)))


def bench(fn, *args, iters=8, warmup=2):
    r = None
    for _ in range(warmup):
        r = fn(*args)
    float(_fetch(r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(_fetch(r))
    return (time.perf_counter() - t0) / iters


def main():
    b, h, s, d = 4, 16, 4096, 128
    causal = True
    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
    do = jax.random.normal(kg, (b, h, s, d), jnp.bfloat16)
    out, lse = jax.jit(lambda q, k, v: flash_attention_fwd(
        q, k, v, causal=causal))(q, k, v)
    flops = 2.5 * 4.0 * b * h * s * s * d / 2

    results = {}
    for bq, bk in itertools.product((256, 512, 1024), (256, 512, 1024)):
        try:
            fn = jax.jit(lambda do, q, k, v, out, lse, bq=bq, bk=bk:
                         flash_attention_bwd(do, q, k, v, out, lse,
                                             causal=causal, block_q=bq,
                                             block_k=bk)[0])
            t = bench(fn, do, q, k, v, out, lse)
            tf = flops / t / 1e12
            print(f"bwd bq={bq} bk={bk}: {t*1e3:.2f} ms  {tf:.1f} TF/s",
                  flush=True)
            results[(bq, bk)] = tf
        except Exception as e:
            print(f"bwd bq={bq} bk={bk}: FAIL {type(e).__name__} "
                  f"{str(e)[:100]}", flush=True)
    if results:
        best = max(results, key=results.get)
        print(f"best: bq={best[0]} bk={best[1]} -> {results[best]:.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
