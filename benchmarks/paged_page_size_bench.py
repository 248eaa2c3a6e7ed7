"""Decode bandwidth vs page size (round-3 multi-page-per-tile validation).

Target (VERDICT #7): paged decode GB/s at page 64 within ~15% of the
contiguous cache. Reference comparison harness:
benchmarks/benchmark_mla_paged_kv.py:20-33 (page sizes {none,16,64,128}).
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

from flash_attn_tpu import flash_attn_with_kvcache

_fetch = jax.jit(lambda r: jnp.sum(r.astype(jnp.float32)))


def bench(page_size, b=8, h=32, h_k=8, d=128, ctx=4096, dtype=jnp.bfloat16):
    q = jax.random.normal(jax.random.PRNGKey(0), (b, 1, h, d), dtype)
    seqlens = jnp.full((b,), ctx - 1, jnp.int32)
    N = 50
    if page_size is None:
        kc = jax.random.normal(jax.random.PRNGKey(1), (b, h_k, ctx, d), dtype)
        vc = jax.random.normal(jax.random.PRNGKey(2), (b, h_k, ctx, d), dtype)
        kw = {}
        label = "contiguous"
    else:
        ppseq = ctx // page_size
        num_pages = b * ppseq
        kc = jax.random.normal(jax.random.PRNGKey(1),
                               (num_pages, h_k, page_size, d), dtype)
        vc = jax.random.normal(jax.random.PRNGKey(2),
                               (num_pages, h_k, page_size, d), dtype)
        perm = jax.random.permutation(jax.random.PRNGKey(3), num_pages)
        kw = {"block_table": perm.reshape(b, ppseq)}
        label = f"page {page_size}"

    def steps(q, kc, vc, seqlens, table=None):
        def body(i, carry):
            acc, q = carry
            o = flash_attn_with_kvcache(
                q, kc, vc, cache_seqlens=seqlens, causal=True,
                **({"block_table": table} if table is not None else {}))
            return acc + o[0, 0, 0, 0].astype(jnp.float32), q + 1e-6
        acc, _ = jax.lax.fori_loop(0, N, body, (jnp.float32(0), q))
        return acc

    fn = jax.jit(steps)
    args = (q, kc, vc, seqlens) + ((kw["block_table"],) if kw else ())
    r = fn(*args)
    float(_fetch(r))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(3):
            r = fn(*args)
        float(_fetch(r))
        best = min(best, (time.perf_counter() - t0) / 3 / N)
    gb = 2 * b * h_k * ctx * d * jnp.dtype(dtype).itemsize / 1e9
    print(f"{label:>11}: {best*1e3:.3f} ms/step, {gb/best:.0f} GB/s effective",
          flush=True)
    return gb / best


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    table = {"none": None, "16": 16, "64": 64, "128": 128, "256": 256}
    if which == "all":
        for v in (None, 256, 64, 16):
            bench(v)
    else:
        bench(table[which])
