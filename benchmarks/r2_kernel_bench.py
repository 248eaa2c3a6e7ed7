"""Round-2 dev bench: packed-band causal fwd + fused single-pass bwd.

Usage: python benchmarks/r2_kernel_bench.py [fwd|bwd|grad|all] [bq bk]
Run ONE at a time on the chip (compiles are minutes each, cached after).
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

_fetch = jax.jit(lambda r: jnp.sum(r.astype(jnp.float32)))


def bench_fn(fn, *args, iters=20, warmup=2):
    r = None
    for _ in range(warmup):
        r = fn(*args)
    float(_fetch(r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(_fetch(r))
    return (time.perf_counter() - t0) / iters


def make_qkv(b, h, s, d, dtype=jnp.bfloat16):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return tuple(jax.random.normal(k, (b, h, s, d), dtype) for k in ks)


def fwd_causal(bq=None, bk=None):
    from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
    b, h, s, d = 4, 16, 8192, 128
    q, k, v = make_qkv(b, h, s, d)
    fn = jax.jit(lambda q, k, v: flash_attention_fwd(
        q, k, v, causal=True, return_lse=True, block_q=bq, block_k=bk)[0])
    t = bench_fn(fn, q, k, v)
    tf = 4.0 * b * h * s * s * d / 2 / t / 1e12
    print(f"fwd causal seq8k bq={bq} bk={bk}: {tf:.1f} TF/s ({t*1e3:.2f} ms)",
          flush=True)


def fwd_noncausal(bq=None, bk=None):
    from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
    b, h, s, d = 4, 16, 8192, 128
    q, k, v = make_qkv(b, h, s, d)
    fn = jax.jit(lambda q, k, v: flash_attention_fwd(
        q, k, v, causal=False, return_lse=True,
        block_q=bq, block_k=bk)[0])
    t = bench_fn(fn, q, k, v)
    tf = 4.0 * b * h * s * s * d / t / 1e12
    print(f"fwd non-causal seq8k bq={bq} bk={bk}: {tf:.1f} TF/s "
          f"({t*1e3:.2f} ms)", flush=True)


def bwd_fused(bq=None, bk=None, causal=True, s=4096):
    from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
    from flash_attn_tpu.kernels.flash_bwd_fused import (
        flash_attention_bwd_fused)
    b, h, d = 4, 16, 128
    q, k, v = make_qkv(b, h, s, d)
    out, lse = jax.jit(lambda q, k, v: flash_attention_fwd(
        q, k, v, causal=causal, return_lse=True))(q, k, v)
    do = jnp.ones_like(out)
    # fused bwd is bshd-native
    tr = lambda x: jnp.swapaxes(x, 1, 2)
    do, q, k, v, out = tr(do), tr(q), tr(k), tr(v), tr(out)

    # NOTE: keep ALL THREE grads live — indexing [0] inside the jit lets
    # XLA DCE the dk/dv epilogues and flatters the number ~7% (round-3)
    fn = jax.jit(lambda do, q, k, v, out, lse: sum(
        x[0, 0, 0, 0].astype(jnp.float32) for x in flash_attention_bwd_fused(
            do, q, k, v, out, lse, causal=causal, block_q=bq, block_k=bk)))
    t = bench_fn(fn, do, q, k, v, out, lse)
    tf = 2.5 * 4.0 * b * h * s * s * d / (2 if causal else 1) / t / 1e12
    print(f"bwd fused seq{s} causal={causal} bq={bq} bk={bk}: "
          f"{tf:.1f} TF/s-equiv ({t*1e3:.2f} ms)", flush=True)


def grad_program():
    from flash_attn_tpu import flash_attn_func
    b, s, h, d = 4, 4096, 16, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (b, s, h, d), jnp.bfloat16) for kk in ks)
    g = jax.jit(jax.grad(
        lambda q, k, v: flash_attn_func(q, k, v, causal=True)
        .astype(jnp.float32).sum(), argnums=(0, 1, 2)))
    t = bench_fn(lambda q, k, v: g(q, k, v)[0], q, k, v)
    tf = 2.5 * 4.0 * b * h * s * s * d / 2 / t / 1e12
    print(f"grad whole-program seq4k causal: {tf:.1f} TF/s ({t*1e3:.2f} ms)",
          flush=True)


def decode_serving(b=64, ctx=576, s_max=640):
    """Time ONE decode-attention call at the 913M serving shape (slot
    cache, bf16, non-paged) via an on-device fori_loop — isolates the
    attention share of the engine's measured step time."""
    from flash_attn_tpu import flash_attn_with_kvcache
    h = h_k = 16
    d = 128
    q = jax.random.normal(jax.random.PRNGKey(0), (b, 1, h, d), jnp.bfloat16)
    kc = jax.random.normal(jax.random.PRNGKey(1), (b, h_k, s_max, d),
                           jnp.bfloat16)
    vc = jax.random.normal(jax.random.PRNGKey(2), (b, h_k, s_max, d),
                           jnp.bfloat16)
    seqlens = jnp.full((b,), ctx, jnp.int32)
    N = 50

    def steps(q, kc, vc, seqlens):
        def body(i, carry):
            acc, q = carry
            o = flash_attn_with_kvcache(q, kc, vc, cache_seqlens=seqlens,
                                        causal=True)
            return acc + o[0, 0, 0, 0].astype(jnp.float32), q + 1e-6
        acc, _ = jax.lax.fori_loop(0, N, body, (jnp.float32(0), q))
        return acc

    t = bench_fn(jax.jit(steps), q, kc, vc, seqlens, iters=3, warmup=1) / N
    gb = 2 * b * h_k * ctx * d * 2 / 1e9  # K+V bf16 read per step
    print(f"decode-attn serving b={b} ctx={ctx}: {t*1e3:.3f} ms/step, "
          f"{gb/t:.0f} GB/s effective (16-layer extrapolation "
          f"{16*t*1e3:.1f} ms)", flush=True)


def fwd_split(bq=None, bk=None, ebq=None, ebk=None):
    from flash_attn_tpu.kernels.flash_fwd_split import (
        flash_attention_fwd_split)
    b, h, s, d = 4, 16, 8192, 128
    q, k, v = make_qkv(b, h, s, d)
    fn = jax.jit(lambda q, k, v: flash_attention_fwd_split(
        q, k, v, block_q=bq, block_k=bk,
        edge_block_q=ebq, edge_block_k=ebk)[0])
    t = bench_fn(fn, q, k, v)
    tf = 4.0 * b * h * s * s * d / 2 / t / 1e12
    print(f"fwd SPLIT causal seq8k bq={bq} bk={bk} ebq={ebq} ebk={ebk}: "
          f"{tf:.1f} TF/s ({t*1e3:.2f} ms)", flush=True)


def bwd_split(bq=None, bk=None, s=4096):
    from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
    from flash_attn_tpu.kernels.flash_bwd_split import (
        flash_attention_bwd_split)
    b, h, d = 4, 16, 128
    q, k, v = make_qkv(b, h, s, d)
    out, lse = jax.jit(lambda q, k, v: flash_attention_fwd(
        q, k, v, causal=True, return_lse=True))(q, k, v)
    do = jnp.ones_like(out)
    tr = lambda x: jnp.swapaxes(x, 1, 2)
    do, q, k, v, out = tr(do), tr(q), tr(k), tr(v), tr(out)
    # all three grads live — see DCE note in bwd_fused
    fn = jax.jit(lambda do, q, k, v, out, lse: sum(
        x[0, 0, 0, 0].astype(jnp.float32) for x in flash_attention_bwd_split(
            do, q, k, v, out, lse, block_q=bq, block_k=bk)))
    t = bench_fn(fn, do, q, k, v, out, lse)
    tf = 2.5 * 4.0 * b * h * s * s * d / 2 / t / 1e12
    print(f"bwd SPLIT seq{s} "
          f"bq={bq} bk={bk}: {tf:.1f} TF/s ({t*1e3:.2f} ms)", flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    bq = int(sys.argv[2]) if len(sys.argv) > 2 else None
    bk = int(sys.argv[3]) if len(sys.argv) > 3 else None
    t00 = time.time()
    if what in ("fwd", "all"):
        fwd_causal(bq, bk)
    if what == "fwdnc":
        fwd_noncausal(bq, bk)
    if what == "dec":
        decode_serving(b=bq or 64, ctx=bk or 576)
    if what == "fwds":
        ebq = int(sys.argv[4]) if len(sys.argv) > 4 else None
        ebk = int(sys.argv[5]) if len(sys.argv) > 5 else None
        fwd_split(bq, bk, ebq, ebk)
    if what == "bwds":
        bwd_split(bq, bk)
    if what in ("bwd", "all"):
        bwd_fused(bq, bk)
    if what == "bwdnc":
        bwd_fused(bq, bk, causal=False)
    if what in ("grad", "all"):
        grad_program()
    print(f"total {time.time()-t00:.0f}s", flush=True)
