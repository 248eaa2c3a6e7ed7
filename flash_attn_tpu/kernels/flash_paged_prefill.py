"""Pallas TPU paged-KV prefill attention (varlen chunked prefill).

Reference parity: paged KV in the *main forward* path — the reference routes
``flash_attn_varlen_func(..., block_table=)`` through its fwd kernels with
page-table indirection (hopper/flash_api.cpp:672 + hopper/paged_kv.h:18
``PagedKVManager``; FA4 flash_attn/cute/interface.py:3419). Round 1 only had
paged decode, so serving chunk-prefill ran slot-by-slot through the decode
kernel; this kernel closes that gap batched.

TPU-native design:
 - Q/O ride the normal grid pipeline in a *dense padded per-sequence*
   layout (b, h_k, group, sq_max, d): every block fetch is aligned and
   static. The varlen wrapper pads/unpacks outside (utils/padding.py) —
   prefill attention is compute-bound, so the one extra Q/O pass is noise,
   and the scheduler can align chunks anyway.
 - ALL kv heads are processed per grid step, batched (the decode kernel's
   structure): one page DMA fetches (h_k, page, d) and every tile op is a
   single batched Mosaic op. This also keeps every DMA slice full-extent in
   the trailing dims — Mosaic cannot slice a sub-128 lane dim (head_dim 64),
   so per-head page slices would not even compile.
 - GQA row packing (the reference's PackGQA / seqlenq_ngroups_swapped): the
   ``group`` query heads of one KV head are flattened into rows of a single
   (group*block_q) GEMM panel — large MXU ops per KV tile.
 - K/V stay in HBM (memory_space=ANY); the kernel runs its own pair-unrolled
   double-buffered DMA over the page table (pages read from SMEM in the
   body, never in index maps — DESIGN.md compile rule). Trip count is the
   per-sequence dynamic KV length: no wasted fetches.
 - Causal alignment is bottom-right: q token r of sequence s sits at global
   position cache_seqlens[s] - seqused_q[s] + r, matching the reference's
   kvcache/varlen semantics.
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.dispatch.config import normalize_window
from flash_attn_tpu.kernels.fp8_cast import fp8e4m3_to_bf16

LOG2E = math.log2(math.e)
LN2 = math.log(2.0)
NEG_INF = float("-inf")


def _kv_to_bf16(x):
    """Quantized-cache load cast: fast bit-twiddle for fp8 (v5e has no
    native fp8 datapath — the stock astype is VPU-emulated and 4.4x
    slower than bf16 reads, DESIGN.md); native astype otherwise."""
    if x.dtype == jnp.float8_e4m3fn:
        return fp8e4m3_to_bf16(x)
    return x.astype(jnp.bfloat16)



def _paged_prefill_kernel(
    # scalar prefetch
    seqq_ref,      # (b,) new-chunk q length per sequence
    seqk_ref,      # (b,) total kv length per sequence (incl. the chunk)
    page_tab_ref,  # (b, table_width) page ids (a KV tile spans pages_per_tile)
    *refs,
    block_q, block_k, h_k, group, num_pages, max_tiles,
    scale_log2, softcap, causal, window_left, window_right,
    has_descale, out_dtype, pages_per_tile, table_width,
    has_qv, has_sink,
):
    refs = list(refs)
    # (2, 1, h_k, 128) VMEM: [0]=q_descale*k_descale, [1]=v_descale,
    # lane-replicated for the batched-head path.
    descale_ref = refs.pop(0) if has_descale else None
    # (1, h_k, group, 128) f32 learnable-sink logits, lane-replicated
    sink_ref = refs.pop(0) if has_sink else None
    q_ref = refs.pop(0)
    # (1, h_k, group, block_q, dv) MLA qv extra query (absorbed DeepSeek
    # paged prefill — reference cute/interface.py:3419-3478: score adds
    # qv . v^T on top of q . k^T)
    qv_ref = refs.pop(0) if has_qv else None
    (kc_ref, vc_ref, out_ref, lse_ref,
     kbuf, vbuf, sems, acc, m_s, l_s) = refs

    b_idx = pl.program_id(0)
    i = pl.program_id(1)
    rows = group * block_q

    sq = seqq_ref[b_idx]
    sk = seqk_ref[b_idx]
    shift = sk - sq
    # Tile band for this q block (dynamic: depends on per-seq lengths).
    row_hi = i * block_q + (block_q - 1)
    t_hi_all = (sk + block_k - 1) // block_k
    wr = 0 if causal else window_right
    if causal or wr is not None:
        t_hi = jnp.minimum(t_hi_all, (row_hi + shift + wr) // block_k + 1)
    else:
        t_hi = t_hi_all
    t_lo = jnp.int32(0)
    if window_left is not None:
        t_lo = jnp.maximum(0, (i * block_q + shift - window_left) // block_k)
    # Skip entirely when this q block is beyond the sequence's chunk.
    live = jnp.logical_and(i * block_q < sq, t_lo < t_hi)
    t_hi = jnp.where(live, t_hi, t_lo)

    acc[...] = jnp.zeros_like(acc)
    m_s[...] = jnp.full_like(m_s, NEG_INF)
    l_s[...] = jnp.zeros_like(l_s)

    def k_dma(slot, t):
        """Async copies filling buffer `slot` for tile `t`: one unrolled
        DMA per page (pages_per_tile of them, all in flight) into adjacent
        sub-slabs — the reference's PagedKVManager staggering
        (hopper/paged_kv.h:19-22), decoupling tile size from page size so
        small pages (16/64) keep MXU-sized tiles and full bandwidth.
        Whole page, all kv heads per DMA: (h_k, page_size, d); full-extent
        trailing dims keep the DMA lane-aligned at every head_dim."""
        ps = block_k // pages_per_tile
        copies = []
        for p in range(pages_per_tile):
            ent = jnp.minimum(t * pages_per_tile + p, table_width - 1)
            page = jnp.clip(page_tab_ref[b_idx, ent], 0, num_pages - 1)
            copies.append(pltpu.make_async_copy(
                kc_ref.at[page], kbuf.at[slot, :, p * ps:(p + 1) * ps],
                sems.at[slot, 0, p]))
            copies.append(pltpu.make_async_copy(
                vc_ref.at[page], vbuf.at[slot, :, p * ps:(p + 1) * ps],
                sems.at[slot, 1, p]))
        return copies

    @pl.when(live)
    def _prologue():
        for c in k_dma(0, t_lo):
            c.start()

    # GQA-packed queries for ALL kv heads: (h_k, group*block_q, d).
    q = q_ref[0].reshape(h_k, rows, -1)
    qs = (q.astype(jnp.float32) * scale_log2).astype(q.dtype)
    if has_qv:
        qv = qv_ref[0].reshape(h_k, rows, -1)
        qvs = (qv.astype(jnp.float32) * scale_log2).astype(qv.dtype)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 1)
    pos_q = i * block_q + rows_i % block_q  # local q position (chunk-relative)
    if has_descale:
        qkd = descale_ref[0, 0][:, :1].reshape(h_k, 1, 1)
        vd = descale_ref[1, 0][:, :1].reshape(h_k, 1, 1)

    def tile_compute(t, slot):
        for c in k_dma(slot, t):
            c.wait()
        k = kbuf[slot]  # (h_k, block_k, d)
        v = vbuf[slot]
        if has_descale:
            k = _kv_to_bf16(k)
            v = _kv_to_bf16(v)
        cols = t * block_k + cols_i
        vrow = jax.lax.broadcasted_iota(jnp.int32, (1, block_k, 1), 1)
        v = jnp.where(vrow + t * block_k < sk, v, 0)

        # Batched over heads: (h_k, rows, d) x (h_k, block_k, d)
        # -> (h_k, rows, block_k)
        s2 = jax.lax.dot_general(
            qs, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if has_qv:
            s2qv = jax.lax.dot_general(
                qvs, v, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if has_descale and softcap <= 0.0:
                s2qv = s2qv * vd
            s2 = (s2 * qkd if has_descale and softcap <= 0.0 else s2) + s2qv
        if softcap > 0.0:
            tt = jnp.tanh(s2 * (1.0 / LOG2E) / softcap)
            s2 = tt * softcap * LOG2E
        elif has_descale and not has_qv:
            s2 = s2 * qkd

        valid = jnp.logical_and(pos_q < sq, cols < sk)
        if causal or wr is not None:
            valid = jnp.logical_and(valid, cols <= pos_q + shift + wr)
        if window_left is not None:
            valid = jnp.logical_and(valid, cols >= pos_q + shift - window_left)
        s2 = jnp.where(valid[None], s2, NEG_INF)

        m_prev = m_s[...]  # (h_k, rows, 128)
        l_prev = l_s[...]
        row_max = jnp.max(s2, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(row_max, m_prev.shape))
        m_safe = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp2(s2 - m_safe[:, :, :1])
        corr = jnp.exp2(m_prev - m_safe)
        row_sum = jnp.sum(p, axis=-1, keepdims=True)
        l_s[...] = l_prev * corr + jnp.broadcast_to(row_sum, l_prev.shape)
        m_s[...] = m_new
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc[...] = acc[...] * corr[:, :, :1] + pv

    def pair_body(p2, _):
        t0 = t_lo + 2 * p2

        @pl.when(t0 + 1 < t_hi)
        def _pf1():
            for c in k_dma(1, t0 + 1):
                c.start()

        tile_compute(t0, 0)

        @pl.when(t0 + 2 < t_hi)
        def _pf0():
            for c in k_dma(0, t0 + 2):
                c.start()

        @pl.when(t0 + 1 < t_hi)
        def _second():
            tile_compute(t0 + 1, 1)

        return 0

    num_pairs = (t_hi - t_lo + 1) // 2
    jax.lax.fori_loop(0, num_pairs, pair_body, 0)

    m = m_s[:, :, :1]  # (h_k, rows, 1)
    l = l_s[:, :, :1]
    if has_sink:
        # learnable attention sink (dense-kernel epilogue semantics,
        # flash_fwd.py _epilogue): an extra phantom logit per head in
        # natural-log domain; fully-masked rows get out=0, lse=sink
        sinkr = jnp.broadcast_to(
            sink_ref[0][:, :, :1], (h_k, group, block_q)
        ).reshape(h_k, rows, 1)
        m_nat = m * LN2
        m_tot = jnp.maximum(m_nat, sinkr)
        l = l * jnp.exp(m_nat - m_tot) + jnp.exp(sinkr - m_tot)
        o = acc[...] * jnp.exp(m_nat - m_tot)
        lse = m_tot + jnp.log(l)
    else:
        o = acc[...]
        lse = m * LN2 + jnp.log(l)
    inv_l = jnp.where(l == 0.0, 0.0, 1.0 / l)
    if has_descale:
        inv_l = inv_l * vd
    out_ref[0] = (o * inv_l).reshape(out_ref.shape[1:]).astype(out_dtype)
    lse_ref[0] = lse.reshape(lse_ref.shape[1:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "softmax_scale", "causal", "window_size", "softcap",
        "block_q", "interpret",
    ),
)
def flash_attention_paged_prefill(
    q,            # (b, sq_max, h, d) dense padded chunk queries
    k_cache,      # (num_pages, h_k, page_size, d)
    v_cache,      # (num_pages, h_k, page_size, dv)
    seqused_q,    # (b,) valid q tokens per sequence
    cache_seqlens,  # (b,) total kv length per sequence (incl. the chunk)
    block_table,  # (b, max_pages) int32
    qv=None,      # (b, sq_max, h, dv) MLA extra query (DeepSeek absorbed
    # paged prefill — reference cute/interface.py:3419-3478)
    learnable_sink=None,  # (h,) f32 sink logits
    q_descale=None,  # (b, h_k) f32 — FP8 descale (hopper/flash.h:54-62)
    k_descale=None,
    v_descale=None,
    softmax_scale: Optional[float] = None,
    causal: bool = True,
    window_size: Tuple[Optional[int], Optional[int]] = (None, None),
    softcap: float = 0.0,
    block_q: Optional[int] = None,
    interpret: bool = False,
):
    """Batched chunked prefill against a paged KV cache.

    Returns (out (b, sq_max, h, dv), lse (b, h, sq_max) fp32). Rows at or
    beyond seqused_q[b] are zero / -inf.

    NOTE: descale is per-(b, h_k) in the reference; the batched-head kernel
    reads it per-h_k with the batch dim riding the grid, matching that.
    """
    b, sq_max, h, d = q.shape
    num_pages, h_k, page_size, _ = k_cache.shape
    dv = v_cache.shape[-1]
    group = h // h_k
    max_tiles = block_table.shape[1]
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d if qv is None else d + dv)
    window_left, window_right = normalize_window(window_size)

    # Manual HBM->VMEM page DMA requires 128-lane-aligned head dims (same
    # rule as flash_decode): zero-pad d/dv to 128 multiples, slice dv back.
    d_pad = _round_up(d, 128)
    dv_pad = _round_up(dv, 128)
    if d_pad != d:
        q = jnp.pad(q, ((0, 0),) * 3 + ((0, d_pad - d),))
        k_cache = jnp.pad(k_cache, ((0, 0),) * 3 + ((0, d_pad - d),))
        d = d_pad
    if dv_pad != dv:
        v_cache = jnp.pad(v_cache, ((0, 0),) * 3 + ((0, dv_pad - dv),))
        if qv is not None:
            qv = jnp.pad(qv, ((0, 0),) * 3 + ((0, dv_pad - dv),))
        out, lse = flash_attention_paged_prefill(
            q, k_cache, v_cache, seqused_q, cache_seqlens, block_table,
            qv=qv, learnable_sink=learnable_sink,
            q_descale=q_descale, k_descale=k_descale, v_descale=v_descale,
            softmax_scale=softmax_scale, causal=causal,
            window_size=window_size, softcap=softcap, block_q=block_q,
            interpret=interpret)
        return out[..., :dv], lse

    # Batch-chunk to bound the SMEM page table (Mosaic compile blows up
    # superlinearly past ~128 entries — DESIGN.md).
    max_tab = 128
    if b * max_tiles > max_tab and b > 1:
        chunk = 1
        for c in range(1, b):
            if b % c == 0 and c * max_tiles <= max_tab:
                chunk = c
        nc = b // chunk
        split = lambda x: (None if x is None
                           else x.reshape((nc, chunk) + x.shape[1:]))

        def piece(args):
            qc, qvc, squ, slc, btc, qd, kd, vd_ = args
            return flash_attention_paged_prefill(
                qc, k_cache, v_cache, squ, slc, btc,
                qv=qvc, learnable_sink=learnable_sink,
                q_descale=qd, k_descale=kd, v_descale=vd_,
                softmax_scale=softmax_scale,
                causal=causal, window_size=window_size, softcap=softcap,
                block_q=block_q, interpret=interpret,
            )

        outs, lses = jax.lax.map(
            piece, (split(q), split(qv), split(seqused_q),
                    split(cache_seqlens),
                    split(block_table), split(q_descale), split(k_descale),
                    split(v_descale)))
        return (outs.reshape((b,) + outs.shape[2:]),
                lses.reshape((b,) + lses.shape[2:]))

    bq = block_q or max(128, min(512, _next_pow2(sq_max)))
    bq = min(bq, _next_pow2(sq_max))
    nq = pl.cdiv(sq_max, bq)
    sq_pad = nq * bq
    if sq_pad != sq_max:
        q = jnp.pad(q, ((0, 0), (0, sq_pad - sq_max), (0, 0), (0, 0)))
        if qv is not None:
            qv = jnp.pad(qv, ((0, 0), (0, sq_pad - sq_max), (0, 0), (0, 0)))
    # Tile spans pages_per_tile pages (concurrent unrolled DMAs in the
    # kernel); target ~512 rows like the decode kernel.
    table_width = max_tiles
    ppt = max(1, min(512 // page_size, table_width))
    while ppt > 1 and table_width % ppt != 0:
        ppt -= 1
    bk = ppt * page_size

    # (b, h_k, group, sq_pad, d) so one block is all heads' GQA row panels.
    q_r = q.reshape(b, sq_pad, h_k, group, d).transpose(0, 2, 3, 1, 4)

    has_descale = (q_descale is not None or k_descale is not None
                   or v_descale is not None)

    in_specs = []
    inputs = []
    if has_descale:
        ones = jnp.ones((b, h_k), jnp.float32)
        def full(x):
            if x is None:
                return ones
            return jnp.broadcast_to(jnp.asarray(x, jnp.float32), (b, h_k))
        # (2, b, h_k, 128): [0]=qd*kd, [1]=vd, lane-replicated.
        descale = jnp.broadcast_to(
            jnp.stack([full(q_descale) * full(k_descale),
                       full(v_descale)])[..., None], (2, b, h_k, 128))
        in_specs.append(pl.BlockSpec(
            (2, 1, h_k, 128), lambda b_, i, *_: (0, b_, 0, 0)))
        inputs.append(descale)
    if learnable_sink is not None:
        sink_in = jnp.broadcast_to(
            jnp.asarray(learnable_sink, jnp.float32).reshape(
                1, h_k, group, 1), (1, h_k, group, 128))
        in_specs.append(pl.BlockSpec(
            (1, h_k, group, 128), lambda b_, i, *_: (0, 0, 0, 0)))
        inputs.append(sink_in)
    in_specs += [
        pl.BlockSpec((1, h_k, group, bq, d),
                     lambda b_, i, *_: (b_, 0, 0, i, 0)),
    ]
    inputs += [q_r]
    if qv is not None:
        qv_r = qv.reshape(b, sq_pad, h_k, group, dv).transpose(0, 2, 3, 1, 4)
        in_specs.append(pl.BlockSpec(
            (1, h_k, group, bq, dv), lambda b_, i, *_: (b_, 0, 0, i, 0)))
        inputs.append(qv_r)
    in_specs += [
        # Pin the paged caches to HBM: under ANY the compiler may promote a
        # small cache to VMEM, where head_dim<128 pages are not sliceable
        # (lane padding); HBM-side DMA has no such constraint.
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
    ]
    inputs += [k_cache, v_cache]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, nq),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, h_k, group, bq, dv),
                         lambda b_, i, *_: (b_, 0, 0, i, 0)),
            pl.BlockSpec((1, h_k, group, bq, 1),
                         lambda b_, i, *_: (b_, 0, 0, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, h_k, bk, d), k_cache.dtype),
            pltpu.VMEM((2, h_k, bk, dv), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2, ppt)),
            pltpu.VMEM((h_k, group * bq, dv), jnp.float32),
            pltpu.VMEM((h_k, group * bq, 128), jnp.float32),
            pltpu.VMEM((h_k, group * bq, 128), jnp.float32),
        ],
    )

    out_dtype = jnp.bfloat16 if has_descale else q.dtype
    kernel = functools.partial(
        _paged_prefill_kernel,
        block_q=bq, block_k=bk, h_k=h_k, group=group, num_pages=num_pages,
        max_tiles=table_width // ppt, scale_log2=softmax_scale * LOG2E,
        softcap=softcap, causal=causal, window_left=window_left,
        window_right=window_right, has_descale=has_descale,
        out_dtype=out_dtype, pages_per_tile=ppt, table_width=table_width,
        has_qv=qv is not None, has_sink=learnable_sink is not None,
    )

    out_r, lse_r = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, h_k, group, sq_pad, dv), out_dtype),
            jax.ShapeDtypeStruct((b, h_k, group, sq_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # large KV tiles put the fp8->bf16 cast copies + score temps on
            # the kernel stack past the default 16 MiB scoped limit
            # (measured 21.49M at block_k=1024 fp8) — v5e has ~128 MiB
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seqused_q.astype(jnp.int32), cache_seqlens.astype(jnp.int32),
      block_table.astype(jnp.int32), *inputs)

    out = out_r.transpose(0, 3, 1, 2, 4).reshape(b, sq_pad, h, dv)
    lse = lse_r[..., 0].reshape(b, h, sq_pad)
    if sq_pad != sq_max:
        out = out[:, :sq_max]
        lse = lse[:, :, :sq_max]
    return out, lse


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m
