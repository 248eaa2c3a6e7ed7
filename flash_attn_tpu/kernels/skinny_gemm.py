"""Weight-streaming skinny matmul (Pallas TPU) — the decode GEMM.

Decode-time GEMMs are (batch, K) @ (K, N) with batch <= ~256 rows: pure
weight streaming (the weight is read once per token step; arithmetic
intensity ~= batch).

MEASURED CORRECTION (v5e, slope-calibrated fori-loop timing): XLA's own
skinny dot is NOT the decode bottleneck — an initial ~64 GB/s reading was
an instrumentation artifact (the axon relay's one result-fetch, ~10 ms,
amortized over too few timed dispatches). Calibrated, XLA streams
64x2048 @ 2048x50304 at ~400 GB/s and loop-resident weights even faster;
this kernel measures ~same-or-slightly-better (883 GB/s apparent with a
VMEM-cached weight). It is therefore NOT wired into the models — kept as
a standalone op (and a record of the measurement methodology) for shapes
where a future profile shows XLA's emitter falling off. The real decode
bottlenecks were the non-128-divisible cache allocation (32 KB decode
DMAs) and undonated cache buffers (full cache copies per step); see
modules/mha.py and serving/engine.py.

Design (weight-streaming Pallas matmul):

    grid  = (N / bn [, K / bk])
    x     (m_pad, K)  resident (constant index map)
    w     (K, bn)     streamed HBM->VMEM by the pipeline (the hot stream)
    out   (m_pad, bn) written per step

Per step the DMA is bk*bn*2 bytes against ~2*m*bk*bn flops — DMA-bound for
m < ~150, i.e. the pipeline runs at HBM speed and the MXU tags along.

Used by ``ops.skinny.dense_fast`` / the modules' decode paths; training
shapes (m large) keep XLA's dot.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, o_ref, *scratch, nk_steps, out_dtype):
    def compute():
        return jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if nk_steps == 1:
        o_ref[...] = compute().astype(out_dtype)
    else:
        (acc_ref,) = scratch
        kk = pl.program_id(1)

        @pl.when(kk == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += compute()

        @pl.when(kk == nk_steps - 1)
        def _flush():
            o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_k", "interpret"))
def skinny_matmul(
    x,                    # (m, K), m small (decode batch)
    w,                    # (K, N)
    block_n: int = 512,
    block_k: int = 0,     # 0 = whole K per step
    interpret: bool = False,
):
    """x @ w in f32 accumulation, out in x.dtype. Weight-streaming Pallas
    kernel for small m; the caller guards shape eligibility (ops.skinny)."""
    m, K = x.shape
    K2, N = w.shape
    assert K == K2, (x.shape, w.shape)
    out_dtype = x.dtype

    # sublane pad m (bf16 tile = (16, 128))
    m_pad = max(16, -(-m // 16) * 16)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))

    bn = min(block_n, N)
    bk = block_k or K
    bk = min(bk, K)
    nn_steps = pl.cdiv(N, bn)
    nk_steps = pl.cdiv(K, bk)

    grid = (nn_steps,) if nk_steps == 1 else (nn_steps, nk_steps)
    if nk_steps == 1:
        x_spec = pl.BlockSpec((m_pad, K), lambda n: (0, 0))
        w_spec = pl.BlockSpec((K, bn), lambda n: (0, n))
        o_spec = pl.BlockSpec((m_pad, bn), lambda n: (0, n))
        scratch = []
    else:
        x_spec = pl.BlockSpec((m_pad, bk), lambda n, k: (0, k))
        w_spec = pl.BlockSpec((bk, bn), lambda n, k: (k, n))
        o_spec = pl.BlockSpec((m_pad, bn), lambda n, k: (0, n))
        scratch = [pltpu.VMEM((m_pad, bn), jnp.float32)]

    out = pl.pallas_call(
        functools.partial(_kernel, nk_steps=nk_steps, out_dtype=out_dtype),
        grid=grid,
        in_specs=[x_spec, w_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, N), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(("parallel",) if nk_steps == 1
                                 else ("parallel", "arbitrary")),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * K * N,
            bytes_accessed=(K * N * w.dtype.itemsize
                            + m_pad * K * x.dtype.itemsize
                            + m_pad * N * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w)
    return out[:m] if m_pad != m else out
