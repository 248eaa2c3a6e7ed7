"""Block-sparse flash attention (FlexAttention-style).

Parity surface for the reference block sparsity
(flash_attn/cute/block_sparsity.py:17 ``BlockSparseTensors`` —
kv_num_blocks/kv_indices per q tile — and the FA1-era
flash_blocksparse_attention.py). The kernel walks only the KV tiles listed
for each q tile: indices live in SMEM (scalar prefetch) and drive a manual
double-buffered HBM->VMEM DMA pipeline (index-map scalar reads are compile
poison on Mosaic; body reads are cheap — same design as the decode kernel).

The mask semantics: a listed tile is computed fully (optionally intersected
with the causal mask); unlisted tiles contribute nothing. ``blockmask_to_kv_indices``
converts a dense (num_q_tiles, num_kv_tiles) bool mask — the analogue of the
reference's ``convert_blockmask`` / ``fast_sampling`` mask_mod conversion.
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = math.log2(math.e)
LN2 = math.log(2.0)
NEG_INF = float("-inf")

__all__ = ["flash_attention_blocksparse_fwd", "blockmask_to_kv_indices"]


def blockmask_to_kv_indices(blockmask):
    """(nq, nk) bool -> (kv_num (nq,), kv_indices (nq, nk) int32).

    Listed tiles are front-packed per row in ascending order (deterministic,
    like compute_dq_write_order's fixed ordering)."""
    nq, nk = blockmask.shape
    order = jnp.argsort(~blockmask, axis=1, stable=True)
    kv_num = blockmask.sum(axis=1).astype(jnp.int32)
    return kv_num, order.astype(jnp.int32)


def _bs_kernel(
    kv_num_ref, kv_idx_ref,   # scalar prefetch: (nq,), (nq, nk)
    *refs,
    block_q, block_k, seqlen_q, seqlen_k, causal, scale_log2, out_dtype,
):
    (q_ref, kc_ref, vc_ref, out_ref, lse_ref,
     kbuf, vbuf, sems, acc, m_s, l_s) = refs

    h_idx = pl.program_id(0)
    i = pl.program_id(1)
    n_tiles = kv_num_ref[i]

    acc[...] = jnp.zeros_like(acc)
    m_s[...] = jnp.full_like(m_s, NEG_INF)
    l_s[...] = jnp.zeros_like(l_s)

    def dma(slot, t):
        tile = kv_idx_ref[i, t]
        ck = pltpu.make_async_copy(
            kc_ref.at[h_idx, pl.ds(tile * block_k, block_k)],
            kbuf.at[slot], sems.at[slot, 0])
        cv = pltpu.make_async_copy(
            vc_ref.at[h_idx, pl.ds(tile * block_k, block_k)],
            vbuf.at[slot], sems.at[slot, 1])
        return ck, cv

    @pl.when(n_tiles > 0)
    def _prologue():
        ck, cv = dma(0, 0)
        ck.start()
        cv.start()

    q = q_ref[0]
    qs = (q.astype(jnp.float32) * scale_log2).astype(q.dtype)
    rows = i * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    shift = seqlen_k - seqlen_q

    def tile_compute(t, slot):
        # static slots only: dynamic semaphore indexing is a measured ~4s
        # per wait runtime slow path (see flash_decode.py)
        ck, cv = dma(slot, t)
        ck.wait()
        cv.wait()
        k = kbuf[slot]
        v = vbuf[slot]

        tile = kv_idx_ref[i, t]
        cols = tile * block_k + cols_i
        valid = cols < seqlen_k
        if causal:
            valid = jnp.logical_and(valid, cols <= rows + shift)
        vmask = (jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
                 + tile * block_k) < seqlen_k
        v = jnp.where(vmask, v, 0)

        s2 = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s2 = jnp.where(valid, s2, NEG_INF)

        m_prev = m_s[...]
        l_prev = l_s[...]
        row_max = jnp.max(s2, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(row_max, m_prev.shape))
        m_safe = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp2(s2 - m_safe[:, :1])
        corr = jnp.exp2(m_prev - m_safe)
        l_s[...] = l_prev * corr + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_prev.shape)
        m_s[...] = m_new
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc[...] = acc[...] * corr[:, :1] + pv

    def pair_body(p2, _):
        t0 = 2 * p2

        @pl.when(t0 + 1 < n_tiles)
        def _pf1():
            ck, cv = dma(1, t0 + 1)
            ck.start()
            cv.start()

        tile_compute(t0, 0)

        @pl.when(t0 + 2 < n_tiles)
        def _pf0():
            ck, cv = dma(0, t0 + 2)
            ck.start()
            cv.start()

        @pl.when(t0 + 1 < n_tiles)
        def _second():
            tile_compute(t0 + 1, 1)

        return 0

    jax.lax.fori_loop(0, (n_tiles + 1) // 2, pair_body, 0)

    m = m_s[:, :1]
    l = l_s[:, :1]
    inv_l = jnp.where(l == 0.0, 0.0, 1.0 / l)
    out_ref[0] = (acc[...] * inv_l).astype(out_dtype)
    lse_ref[0, 0] = (m * LN2 + jnp.log(l))[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=("softmax_scale", "causal", "block_q", "block_k",
                     "interpret"),
)
def flash_attention_blocksparse_fwd(
    q,  # (h, sq, d) — single batch entry (vmap for batch)
    k,  # (h, sk, d)
    v,  # (h, sk, dv)
    kv_num,      # (nq,) int32
    kv_indices,  # (nq, nk) int32
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
):
    """Returns (out (h, sq, dv), lse (h, sq))."""
    h, sq, d = q.shape
    _, sk, dv = v.shape
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    bq = min(block_q, _next_pow2(sq))
    bk = block_k
    while bk > 128 and sk % bk != 0:
        bk //= 2
    assert sk % bk == 0, (sk, bk)
    nq = pl.cdiv(sq, bq)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(h, nq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h_, i, *_: (h_, i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, dv), lambda h_, i, *_: (h_, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda h_, i, *_: (h_, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, bk, d), k.dtype),
            pltpu.VMEM((2, bk, dv), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((bq, dv), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        functools.partial(
            _bs_kernel, block_q=bq, block_k=bk, seqlen_q=sq, seqlen_k=sk,
            causal=causal, scale_log2=softmax_scale * LOG2E, out_dtype=q.dtype,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((h, sq, dv), q.dtype),
            jax.ShapeDtypeStruct((h, 1, sq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(kv_num, kv_indices, q, k, v)
    return out, lse[:, 0]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p
