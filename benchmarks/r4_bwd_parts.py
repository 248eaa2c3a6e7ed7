"""Round-4 bwd breakdown at seq4k: time the split path's three components
(delta precompute, maskless bulk launch, diag-merge launch) separately to
locate the gap to the >=100 TF/s target (VERDICT r3 #1).

Usage: python benchmarks/r4_bwd_parts.py [bq] [bk] [s]
"""
import math
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
    jax.tree.map(lambda x: float(_fetch(x)), r[0] if isinstance(r, tuple)
                 else r)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        float(_fetch(r[0] if isinstance(r, tuple) else r))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    bq = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    bk = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    b, h, d = 4, 16, 128

    from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
    from flash_attn_tpu.kernels.flash_bwd_fused import (
        flash_attention_bwd_fused)
    from flash_attn_tpu.kernels.flash_bwd_split import _bwd_diag_merge
    from flash_attn_tpu.kernels.flash_fwd_split import split_bands

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, s, h, d), jnp.bfloat16) for kk in ks)
    tr = lambda x: jnp.swapaxes(x, 1, 2)
    out_t, lse = jax.jit(lambda q, k, v: flash_attention_fwd(
        tr(q), tr(k), tr(v), causal=True, return_lse=True))(q, k, v)
    out = tr(out_t)
    do = jnp.ones_like(out)
    scale = 1.0 / math.sqrt(d)

    nq, nk = s // bq, s // bk
    bulk, edge, n_empty = split_bands(nq, nk, bq, bk, 0)

    # Compositional timing: the axon relay costs ~0.5-1 ms of host-side
    # dispatch per jitted call, so separately-launched parts overstate.
    # Measure nested prefixes under ONE jit each and difference them.
    def _delta(do, out):
        return jnp.sum(
            do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
        ).transpose(0, 2, 1)

    def _bulk(do, q, k, v, out, lse):
        return flash_attention_bwd_fused(
            do, q, k, v, out, lse, softmax_scale=scale, causal=False,
            block_q=bq, block_k=bk, band_override=bulk)

    f_c = jax.jit(lambda do, out: _delta(do, out))
    f_b = jax.jit(lambda do, q, k, v, out, lse:
                  (_delta(do, out), _bulk(do, q, k, v, out, lse)))

    def full(do, q, k, v, out, lse):
        delta = _delta(do, out)
        dq_b, dk_b, dv_b = _bulk(do, q, k, v, out, lse)
        return _bwd_diag_merge(do, q, k, v, lse, delta, dq_b, dk_b, dv_b,
                               softmax_scale=scale, block_q=bq, shift=0,
                               interpret=False)

    f_a = jax.jit(full)

    t_c = bench_fn(f_c, do, out)
    t_b = bench_fn(f_b, do, q, k, v, out, lse)
    t_a = bench_fn(f_a, do, q, k, v, out, lse)
    t_bulk = t_b - t_c
    t_diag = t_a - t_b

    useful = 2.5 * 4.0 * b * h * s * s * d / 2
    bulk_flops = sum(5 * 2 * bq * (mx - mn + 1) * bk * d
                     for mn, mx in zip(*bulk) if mx >= mn) * b * h
    diag_flops = nq * 5 * 2 * bq * bq * d * b * h
    print(f"cfg bq={bq} bk={bk} s={s}: delta(+floor) {t_c*1e3:.3f} ms | "
          f"bulk {t_bulk*1e3:.3f} ms ({bulk_flops/t_bulk/1e12:.1f} TF/s "
          f"computed) | diag {t_diag*1e3:.3f} ms "
          f"({diag_flops/t_diag/1e12:.1f} TF/s computed) | full {t_a*1e3:.3f} "
          f"ms = {useful/t_a/1e12:.1f} TF/s-useful-equiv", flush=True)


if __name__ == "__main__":
    main()
