"""Does Mosaic overlap independent MXU and VPU chains in one grid step?

Premise test for a software-pipelined fused backward (stage A(t) = QK/dP
matmuls, stage B(t-1) = softmax/ds VPU): if Mosaic list-schedules the two
units concurrently, per-step time ~= max(MXU, VPU); if it serializes,
~= sum. Three kernels, same grid, measured by trip-count slope:

  mxu:  matmul only
  vpu:  exp2-heavy elementwise only (on scratch, no matmul)
  both: the two, with NO data dependence between them

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/mxu_vpu_overlap_probe.py
"""

import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_fetch = jax.jit(lambda r: jnp.sum(r.astype(jnp.float32)))
N, M, K = 512, 512, 128  # (N,K)x(K,M) matmul; (N,M) VPU tile


def _kernel(a_ref, b_ref, x_ref, o_ref, acc, vac, *, mode, reps):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        vac[...] = jnp.zeros_like(vac)

    if mode in ("mxu", "both"):
        m = jnp.float32(0)
        for r in range(reps):
            m = m + jax.lax.dot_general(
                a_ref[...] + jnp.bfloat16(r), b_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[0, 0]
        acc[0, 0] += m
    if mode in ("vpu", "both"):
        v = x_ref[...].astype(jnp.float32)
        for r in range(reps):
            v = jnp.exp2(v * 0.03125) - 1.0  # transcendental + mul + sub
        vac[...] += v
    o_ref[0, 0] = acc[0, 0] + vac[0, 0]


def build(mode, steps, reps=4):
    a = jnp.ones((N, K), jnp.bfloat16)
    b = jnp.ones((K, M), jnp.bfloat16)
    x = jnp.ones((N, M), jnp.bfloat16)
    fn = pl.pallas_call(
        functools.partial(_kernel, mode=mode, reps=reps),
        grid=(steps,),
        in_specs=[pl.BlockSpec((N, K), lambda t: (0, 0)),
                  pl.BlockSpec((K, M), lambda t: (0, 0)),
                  pl.BlockSpec((N, M), lambda t: (0, 0))],
        out_specs=pl.BlockSpec((1, 1), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 1), jnp.float32),
                        pltpu.VMEM((N, M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    return jax.jit(lambda: fn(a, b, x))


def timed(fn, iters=4):
    r = fn(); float(_fetch(r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    float(_fetch(r))
    return (time.perf_counter() - t0) / iters


def slope(mode):
    t1 = timed(build(mode, 64))
    t2 = timed(build(mode, 512))
    return (t2 - t1) / (512 - 64)


if __name__ == "__main__":
    sm = slope("mxu")
    sv = slope("vpu")
    sb = slope("both")
    print(f"mxu  {sm*1e6:8.2f} us/step")
    print(f"vpu  {sv*1e6:8.2f} us/step")
    print(f"both {sb*1e6:8.2f} us/step "
          f"(serial={(sm+sv)*1e6:.2f}, overlap={max(sm,sv)*1e6:.2f})")
