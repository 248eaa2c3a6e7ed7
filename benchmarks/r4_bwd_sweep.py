"""Round-4 bwd tile sweep at the seq4k headline (VERDICT r3 #1): re-run the
bwd autotune WITH the scoped-VMEM model (larger tiles now compile), all
three gradients live (the round-3 DCE rule), split AND fused kernels.

Usage: python benchmarks/r4_bwd_sweep.py <split|fused> <bq> <bk> [s]
One config per invocation (compiles are minutes each; run serially).
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_fetch = jax.jit(lambda r: jnp.sum(r.astype(jnp.float32)))


def bench_fn(fn, *args, iters=20, warmup=2, repeats=2):
    r = None
    for _ in range(warmup):
        r = fn(*args)
    float(_fetch(r))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        float(_fetch(r))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    kind = sys.argv[1]
    bq = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2] != "-" else None
    bk = int(sys.argv[3]) if len(sys.argv) > 3 and sys.argv[3] != "-" else None
    s = int(sys.argv[4]) if len(sys.argv) > 4 else 4096
    b, h, d = 4, 16, 128

    from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.bfloat16) for kk in ks)
    out, lse = jax.jit(lambda q, k, v: flash_attention_fwd(
        q, k, v, causal=True, return_lse=True))(q, k, v)
    do = jnp.ones_like(out)
    tr = lambda x: jnp.swapaxes(x, 1, 2)
    do_t, q_t, k_t, v_t, out_t = tr(do), tr(q), tr(k), tr(v), tr(out)

    if kind == "split":
        from flash_attn_tpu.kernels.flash_bwd_split import (
            flash_attention_bwd_split)
        f = lambda do, q, k, v, out, lse: flash_attention_bwd_split(
            do, q, k, v, out, lse, block_q=bq, block_k=bk)
    else:
        from flash_attn_tpu.kernels.flash_bwd_fused import (
            flash_attention_bwd_fused)
        f = lambda do, q, k, v, out, lse: flash_attention_bwd_fused(
            do, q, k, v, out, lse, causal=True, block_q=bq, block_k=bk)

    # all grads live (round-3 DCE rule)
    fn = jax.jit(lambda do, q, k, v, out, lse: sum(
        x[0, 0, 0, 0].astype(jnp.float32) for x in f(do, q, k, v, out, lse)))
    t = bench_fn(fn, do_t, q_t, k_t, v_t, out_t, lse)
    tf = 2.5 * 4.0 * b * h * s * s * d / 2 / t / 1e12
    print(f"bwd {kind} s={s} bq={bq} bk={bk}: {tf:.2f} TF/s-equiv "
          f"({t*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        sys.exit(1)
