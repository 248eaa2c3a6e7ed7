"""Probe usable VMEM by compiling kernels with growing scratch buffers.

Run on the real chip; binary-searches the largest VMEM scratch Mosaic
accepts. Informs the fused-backward accumulator budget (DESIGN.md).
"""
import os
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_scratch(mib: int) -> bool:
    n_rows = mib * 1024 * 1024 // (128 * 4)

    def kernel(x_ref, o_ref, big):
        big[0, :] = x_ref[0, :]
        o_ref[...] = x_ref[...] + big[0, 0]

    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((n_rows, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=(mib + 8) * 1024 * 1024),
        )
        out = jax.jit(fn)(jnp.ones((8, 128), jnp.float32))
        jnp.sum(out).block_until_ready()
        return True
    except Exception as e:
        print(f"  {mib} MiB failed: {type(e).__name__}: {str(e)[:200]}",
              file=sys.stderr)
        return False


if __name__ == "__main__":
    for mib in (8, 16, 24, 32, 48, 64, 96, 110, 120):
        ok = try_scratch(mib)
        print(f"scratch {mib} MiB: {'OK' if ok else 'FAIL'}", flush=True)
        if not ok:
            break
