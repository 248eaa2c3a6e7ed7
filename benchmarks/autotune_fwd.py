"""Forward-kernel tile-size sweep on real TPU.

The reference autotunes SM90 tile configs (flash_attn/cute/
sm90_config_search.py); this is the TPU analogue: sweep (block_q, block_k)
per (hdim, seqlen, causal), print a table, feed winners back into
dispatch/config.py tables.

Run: PYTHONPATH=. python benchmarks/autotune_fwd.py
"""

import itertools
import statistics
import time

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp

from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd

_fetch = jax.jit(lambda r: jnp.sum(r.astype(jnp.float32)))


def bench(fn, *args, iters=10, warmup=2):
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
    b, h, s = 4, 16, 8192
    results = {}
    for d in (128, 64):
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
        v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
        for causal in (False, True):
            flops = 4.0 * b * h * s * s * d / (2 if causal else 1)
            for bq, bk in itertools.product((256, 512, 1024), (512, 1024, 2048)):
                try:
                    fn = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention_fwd(
                        q, k, v, causal=causal, block_q=bq, block_k=bk,
                        return_lse=True)[0])
                    t = bench(fn, q, k, v)
                    tf = flops / t / 1e12
                    print(f"d={d} causal={causal} bq={bq} bk={bk}: "
                          f"{t*1e3:.2f} ms  {tf:.1f} TF/s", flush=True)
                    results[(d, causal, bq, bk)] = tf
                except Exception as e:
                    print(f"d={d} causal={causal} bq={bq} bk={bk}: FAIL "
                          f"{type(e).__name__} {str(e)[:80]}", flush=True)
    print("\nbest per (d, causal):")
    for d in (128, 64):
        for causal in (False, True):
            cand = {k: v for k, v in results.items()
                    if k[0] == d and k[1] == causal}
            if cand:
                best = max(cand, key=cand.get)
                print(f"  d={d} causal={causal}: bq={best[2]} bk={best[3]} "
                      f"-> {cand[best]:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
