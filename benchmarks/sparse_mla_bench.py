"""Sparse top-k MLA (DSA) throughput at DeepSeek-like shapes.

Reference comparison manner: hopper/benchmark_mla_decode.py /
benchmarks/benchmark_mla_paged_kv.py (per-op us / TFLOPS / GB/s). Counted
flops: 2 * sq * h * topk * (d + dv) for scores (q.k + qv.v) + 2 * sq * h *
topk * dv for PV; the gather reads topk * (d + dv) bf16 per query row.
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

from flash_attn_tpu.kernels.flash_sparse_mla import (
    sparse_mla_bwd,
    sparse_mla_fwd,
)

_fetch = jax.jit(lambda r: jnp.sum(r.astype(jnp.float32)))


def main(sq=512, sk=8192, h=128, d=576, dv=512, topk=2048, bwd=False):
    b = 1
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (b, sq, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, sk, 1, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, sk, 1, dv), jnp.bfloat16)
    qv = jax.random.normal(ks[3], (b, sq, h, dv), jnp.bfloat16)
    idx = jax.random.randint(ks[4], (b, sq, topk), 0, sk, jnp.int32)

    fwd = jax.jit(lambda q, k, v, qv, idx: sparse_mla_fwd(
        q, k, v, qv, idx, causal=True)[0])
    r = fwd(q, k, v, qv, idx)
    float(_fetch(r))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(5):
            r = fwd(q, k, v, qv, idx)
        float(_fetch(r))
        best = min(best, (time.perf_counter() - t0) / 5)
    flops = 2 * b * sq * h * topk * (d + dv + dv)
    gb = b * sq * topk * (d + dv) * 2 / 1e9
    print(f"sparse MLA fwd sq={sq} h={h} topk={topk} {d}/{dv}: "
          f"{best*1e3:.2f} ms, {flops/best/1e12:.1f} TF/s, "
          f"gather {gb/best:.0f} GB/s", flush=True)

    if bwd:
        out, lse = jax.jit(lambda *a: sparse_mla_fwd(*a, causal=True))(
            q, k, v, qv, idx)
        do = jnp.ones_like(out)
        bwd_fn = jax.jit(lambda do, q, k, v, qv, idx, out, lse: sum(
            x[0, 0, 0].astype(jnp.float32).sum() if x.ndim == 4
            else x[0, 0, 0, 0].astype(jnp.float32)
            for x in sparse_mla_bwd(do, q, k, v, qv, idx, out, lse,
                                    causal=True)))
        r = bwd_fn(do, q, k, v, qv, idx, out, lse)
        float(_fetch(r))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(3):
                r = bwd_fn(do, q, k, v, qv, idx, out, lse)
            float(_fetch(r))
            best = min(best, (time.perf_counter() - t0) / 3)
        bflops = flops * 2.5
        print(f"sparse MLA bwd: {best*1e3:.2f} ms, "
              f"{bflops/best/1e12:.1f} TF/s-equiv", flush=True)


if __name__ == "__main__":
    sq = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    bwd = len(sys.argv) > 3 and sys.argv[3] == "bwd"
    main(sq=sq, h=h, bwd=bwd)
