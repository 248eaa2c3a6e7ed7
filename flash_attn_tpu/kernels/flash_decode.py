"""Pallas TPU decode (KV-cache) attention: split-KV + GQA packing + paging.

TPU-native redesign of the reference decode path
(csrc/flash_attn/flash_api.cpp:1244 ``mha_fwd_kvcache``,
csrc/flash_attn/src/flash_fwd_kernel.h:506 ``compute_attn_1rowblock_splitkv``,
hopper/paged_kv.h:18 ``PagedKVManager``, hopper/pack_gqa.h:15
``PackGQAManager``). Key mappings:

 - GQA packing ("seqlenq_ngroups_swapped", flash_api.cpp:431-437): the
   (seqlen_q x group) query rows of one KV head are packed into a single
   row-block so the MXU sees a tall GEMM instead of `group` skinny ones.
 - The KV cache stays in HBM (memory_space=ANY); the kernel streams tiles
   through a double-buffered VMEM window with explicit async DMA — the
   reference's cp.async/TMA pipeline, including the page-table indirection
   (page ids read from SMEM in the kernel body, the PagedKVManager
   equivalent). This also means zero wasted fetches beyond each sequence's
   dynamic length — the trip count is data-dependent, unlike a grid.
 - Split-KV: each split covers a contiguous chunk of the (dynamic) KV range
   and emits fp32 partial output + partial LSE, merged by ``combine_splits``
   (the reference's flash_fwd_combine — a trivially-fused XLA reduction on
   TPU; also the public ``flash_attn_combine`` for cross-chip merges).

Cache layout is TPU-native (batch, kv_heads, seqlen, head_dim) / pages
(num_pages, kv_heads, page_size, head_dim) so seq rides the sublane axis.
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



def _decode_kernel(
    # scalar prefetch (SMEM)
    seqlens_ref,   # (b,) effective kv length per batch entry (incl leftpad)
    leftpad_ref,   # (b,)
    batch_idx_ref,  # (b,) cache row per batch entry
    page_tab_ref,  # (b, table_width) page table (a KV tile spans pages_per_tile)
    *refs,
    block_k, rows_pad, seqlen_q, group, num_splits, max_tiles, num_heads_kv,
    scale_log2, softcap, causal, window_left, window_right, attention_chunk,
    has_alibi, paged, num_pages, has_descale, pages_per_tile, table_width,
    seqs_per_step, has_qv=False,
):
    """All KV heads AND a group of `seqs_per_step` sequences are processed
    per grid step, flattened into ONE (seqs*kv_heads) leading axis (Mosaic
    matmuls take at most one batch dim): the per-tile softmax/matmul ops
    run as single dispatches over (g*h_k*rows_pad, block_k)-sized tensors,
    so small-batch decode stops being per-op-dispatch bound (round-3
    measured: b=8 fp8 4k-ctx decode was ~64 sequential tile bodies x
    ~17us = 1.1 ms against a 0.10 ms HBM floor). Each sequence keeps its
    own KV DMAs (unrolled, all in flight) and its own length/window masks,
    built from per-seq scalars expanded head-wise once per grid step.

    NOTE an in-kernel cache append (new K/V rows DMA'd into aliased cache
    outputs at the dynamic position, replacing the XLA scatter) was built
    and REMOVED: the dynamic-destination VMEM->HBM copy into an aliased
    ANY output sent the Mosaic compile past 20 minutes (same pathology
    family as scalar-prefetch reads in index maps, DESIGN.md). The append
    is an unrolled in-place DUS chain in cache/kvcache.py."""
    refs = list(refs)
    # (2, g*h_k, 128) int32 VMEM: [0]=seqlens, [1]=leftpad, head-expanded
    # and lane-replicated (vector reads; building vectors from SMEM scalar
    # stacks lowers to an unsupported gather)
    meta_ref = refs.pop(0)
    qv_ref = refs.pop(0) if has_qv else None
    slopes_ref = refs.pop(0) if has_alibi else None
    # (3, g*h_k, 128) VMEM: [0]=qd*kd, [1]=vd, [2]=qd*vd,
    # lane-replicated so the batched path reads them as vectors.
    descale_ref = refs.pop(0) if has_descale else None
    (q_ref, kc_ref, vc_ref, outp_ref, lsep_ref,
     kbuf, vbuf, sems, acc, m_s, l_s) = refs

    g_idx = pl.program_id(0)
    split = pl.program_id(1)
    G = seqs_per_step
    H = num_heads_kv
    GH = G * H

    if G == 1:
        # single sequence per step: SCALAR lengths, masks computed once in
        # (rows_pad, block_k) and broadcast across heads — per-head mask
        # vectors cost 9% of the whole decode step (measured)
        sk_v = seqlens_ref[g_idx]
        leftpad_v = leftpad_ref[g_idx]
        sk_eff_v = sk_v - leftpad_v
        sk_grp = sk_v
    else:
        sk_v = meta_ref[0][:, :1].reshape(GH, 1, 1)
        leftpad_v = meta_ref[1][:, :1].reshape(GH, 1, 1)
        sk_eff_v = sk_v - leftpad_v
        # group tile range = the max over the group's lengths (shorter
        # seqs are masked per tile); splits partition that range — a
        # chain of SCALAR maxima over SMEM reads
        sk_grp = seqlens_ref[g_idx * G]
        for _i in range(1, G):
            sk_grp = jnp.maximum(sk_grp, seqlens_ref[g_idx * G + _i])
    tiles_total = (sk_grp + block_k - 1) // block_k
    kps = (tiles_total + num_splits - 1) // num_splits  # tiles per split
    t_lo = split * kps
    t_hi = jnp.minimum(tiles_total, t_lo + kps)

    acc[...] = jnp.zeros_like(acc)
    m_s[...] = jnp.full_like(m_s, NEG_INF)
    l_s[...] = jnp.zeros_like(l_s)

    def k_dma(slot, t):
        """Async copies filling (k, v) buffer `slot` for KV tile `t` of
        every sequence in the group. Paged tiles span `pages_per_tile`
        pages: one unrolled DMA per (seq, page) into adjacent sub-slabs,
        all in flight concurrently — the reference's PagedKVManager
        staggering (hopper/paged_kv.h:19-22), which is what lets small
        pages (16/64) serve at full bandwidth."""
        copies = []
        if paged:
            ps = block_k // pages_per_tile
            for i in range(G):
                for p in range(pages_per_tile):
                    ent = jnp.minimum(t * pages_per_tile + p, table_width - 1)
                    page = jnp.clip(page_tab_ref[g_idx * G + i, ent],
                                    0, num_pages - 1)
                    copies.append(pltpu.make_async_copy(
                        kc_ref.at[page],
                        kbuf.at[slot, i * H:(i + 1) * H,
                                p * ps:(p + 1) * ps],
                        sems.at[slot, 0, i, p]))
                    copies.append(pltpu.make_async_copy(
                        vc_ref.at[page],
                        vbuf.at[slot, i * H:(i + 1) * H,
                                p * ps:(p + 1) * ps],
                        sems.at[slot, 1, i, p]))
            return copies
        off = pl.multiple_of(t * block_k, block_k)
        for i in range(G):
            row = batch_idx_ref[g_idx * G + i]
            copies.append(pltpu.make_async_copy(
                kc_ref.at[row, :, pl.ds(off, block_k)],
                kbuf.at[slot, i * H:(i + 1) * H], sems.at[slot, 0, i, 0]))
            copies.append(pltpu.make_async_copy(
                vc_ref.at[row, :, pl.ds(off, block_k)],
                vbuf.at[slot, i * H:(i + 1) * H], sems.at[slot, 1, i, 0]))
        return copies

    @pl.when(t_lo < t_hi)
    def _prologue():
        for c in k_dma(0, t_lo):
            c.start()

    qs = q_ref[...]  # (GH, rows_pad, d)
    if has_descale:
        qs = qs.astype(jnp.bfloat16)
    qs = (qs.astype(jnp.float32) * scale_log2).astype(qs.dtype)
    if has_qv:
        # MLA qv extra-query term (reference hopper kvcache qv=):
        # scores += scale * qv . v, a second batched matmul per tile
        qvs = qv_ref[...]
        if has_descale:
            qvs = qvs.astype(jnp.bfloat16)
        qvs = (qvs.astype(jnp.float32) * scale_log2).astype(qvs.dtype)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (rows_pad, block_k), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (rows_pad, block_k), 1)
    tok_2d = rows_i // group                    # (rows_pad, block_k)
    tok = tok_2d if G == 1 else tok_2d[None]
    shift_v = sk_eff_v - seqlen_q               # scalar | (GH, 1, 1)
    if has_descale:
        qkd = descale_ref[0][:, :1].reshape(GH, 1, 1)

    def tile_compute(t, slot):
        # NOTE: buffer/semaphore slots are STATIC python ints — dynamic
        # slot indexing hits a catastrophic runtime slow path.
        for c in k_dma(slot, t):
            c.wait()

        cols2 = t * block_k + cols_i            # (rows_pad, block_k)
        cols = cols2 if G == 1 else cols2[None]
        pos_k = cols - leftpad_v
        col_ok = jnp.logical_and(cols < sk_v, cols >= leftpad_v)
        col1 = jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k, 1), 1) + t * block_k
        vmask = jnp.logical_and(col1 < sk_v, col1 >= leftpad_v)
        wr = 0 if causal else window_right
        valid = col_ok
        if causal or wr is not None:
            valid = jnp.logical_and(valid, pos_k <= tok + shift_v + wr)
        if window_left is not None:
            valid = jnp.logical_and(
                valid, pos_k >= tok + shift_v - window_left)
        if attention_chunk > 0:
            # chunked-causal (llama4-style; reference hopper kvcache
            # attention_chunk): the query attends only within its chunk
            rs = tok + shift_v
            lo = rs - rs % attention_chunk
            valid = jnp.logical_and(valid, pos_k >= lo)
        if G == 1:
            valid = valid[None]                 # shared across heads

        k = kbuf[slot]  # (GH, block_k, d)
        v = vbuf[slot]
        if has_descale:
            k = _kv_to_bf16(k)
            v = _kv_to_bf16(v)
        v = jnp.where(vmask, v, 0)

        # ONE batched matmul for the whole group x heads:
        # (GH, rows_pad, d) x (GH, block_k, d) -> (GH, rows_pad, block_k)
        s2 = jax.lax.dot_general(
            qs, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if has_qv:
            # scores += scale * qv . v. Joins BEFORE softcap (the cap
            # applies to the full score); on the fp8 path (softcap
            # excluded by the driver assert) it carries qd*vd — V's
            # descale applies wherever V enters the scores.
            qv_term = jax.lax.dot_general(
                qvs, v, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if has_descale:
                qv_term = qv_term * descale_ref[2][:, :1].reshape(GH, 1, 1)
                s2 = s2 * qkd + qv_term
            else:
                s2 = s2 + qv_term
        if softcap > 0.0:
            tt = jnp.tanh(s2 * (1.0 / LOG2E) / softcap)
            s2 = tt * softcap * LOG2E
        elif has_descale and not has_qv:
            s2 = s2 * qkd

        if has_alibi:
            slope = slopes_ref[...]  # (GH, rows_pad, 1)
            if causal:
                bias = (pos_k - (sk_eff_v - 1)).astype(jnp.float32)
            else:
                bias = -jnp.abs(tok + shift_v - pos_k).astype(jnp.float32)
            s2 = s2 + slope * LOG2E * (bias if G > 1 else bias[None])

        s2 = jnp.where(valid, s2, NEG_INF)

        m_prev = m_s[...]  # (GH, rows_pad, 128)
        l_prev = l_s[...]
        row_max = jnp.max(s2, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(row_max, m_prev.shape))
        m_safe = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp2(s2 - m_safe[:, :, :1])
        corr = jnp.exp2(m_prev - m_safe)
        row_sum = jnp.sum(p, axis=-1, keepdims=True)
        l_s[...] = l_prev * corr + jnp.broadcast_to(row_sum, l_prev.shape)
        m_s[...] = m_new
        # (GH, rows_pad, block_k) x (GH, block_k, dv) -> (GH, rows_pad, dv)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc[...] = acc[...] * corr[:, :, :1] + pv

    # Unroll-by-2 pipeline with static slots.
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

    m = m_s[:, :, :1]  # (GH, rows_pad, 1)
    l = l_s[:, :, :1]
    lse = m * LN2 + jnp.log(l)  # -inf when the split saw nothing
    inv_l = jnp.where(l == 0.0, 0.0, 1.0 / l)
    if has_descale:
        inv_l = inv_l * descale_ref[1][:, :1].reshape(GH, 1, 1)
    outp_ref[0] = acc[...] * inv_l
    lsep_ref[0] = lse


@functools.partial(
    jax.jit,
    static_argnames=(
        "softmax_scale", "causal", "window_size", "softcap",
        "attention_chunk", "num_splits", "block_k", "interpret", "out_fp32",
    ),
)
def flash_attention_decode(
    q,         # (b, sq, h, d)
    k_cache,   # (b_c, h_k, s_max, d) or paged (pages, h_k, page_size, d)
    v_cache,   # same with dv
    cache_seqlens,      # (b,) int32 effective kv lengths (incl k_new rows)
    block_table=None,   # (b, max_pages) int32 — paged iff not None
    cache_batch_idx=None,  # (b,) int32
    cache_leftpad=None,    # (b,) int32
    k_new=None,  # (b, s_new, h_k, d): append in-kernel at cache_seqlens-s_new
    v_new=None,
    qv=None,     # (b, sq, h, dv) MLA extra query against V
    alibi_slopes=None,     # (b, h)
    q_descale=None,        # (b, h_k) f32: FP8/INT8 dequant scales
    k_descale=None,
    v_descale=None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[Optional[int], Optional[int]] = (None, None),
    softcap: float = 0.0,
    attention_chunk: int = 0,
    num_splits: int = 1,
    block_k: Optional[int] = None,
    interpret: bool = False,
    out_fp32: bool = False,
):
    """Returns (out (b, sq, h, dv), lse (b, h, sq) fp32); with k_new given
    the new rows are scattered into the caches first (kv_cache_update) and
    the updated (k_cache, v_cache) are also returned."""
    b, sq, h, d = q.shape
    append = k_new is not None
    if append:
        from flash_attn_tpu.cache.kvcache import kv_cache_update
        k_cache, v_cache = kv_cache_update(
            k_cache, v_cache, k_new, v_new,
            cache_seqlens - k_new.shape[1],
            block_table=block_table, cache_batch_idx=cache_batch_idx)
        out, lse = flash_attention_decode(
            q, k_cache, v_cache, cache_seqlens, block_table=block_table,
            cache_batch_idx=cache_batch_idx, cache_leftpad=cache_leftpad,
            qv=qv, alibi_slopes=alibi_slopes, q_descale=q_descale,
            k_descale=k_descale, v_descale=v_descale,
            softmax_scale=softmax_scale, causal=causal,
            window_size=window_size, softcap=softcap,
            attention_chunk=attention_chunk,
            num_splits=num_splits, block_k=block_k, interpret=interpret,
            out_fp32=out_fp32)
        return out, lse, k_cache, v_cache
    # Manual HBM->VMEM DMA requires 128-lane-aligned head dims (MLA absorbed
    # 576 is not); pad here. Serving stacks should allocate caches padded to
    # avoid this per-call copy.
    dv_in = v_cache.shape[-1]
    d_pad = _round_up(d, 128)
    dv_pad = _round_up(dv_in, 128)
    if d_pad != d or dv_pad != dv_in:
        q = jnp.pad(q, ((0, 0),) * 3 + ((0, d_pad - d),))
        k_cache = jnp.pad(k_cache, ((0, 0),) * 3 + ((0, d_pad - d),))
        if dv_pad != dv_in:
            v_cache = jnp.pad(v_cache, ((0, 0),) * 3 + ((0, dv_pad - dv_in),))
            if qv is not None:  # qv multiplies V: zero-pad alongside
                qv = jnp.pad(qv, ((0, 0),) * 3 + ((0, dv_pad - dv_in),))
        if softmax_scale is None:
            softmax_scale = 1.0 / math.sqrt(d)
        out, lse = flash_attention_decode(
            q, k_cache, v_cache, cache_seqlens, block_table=block_table,
            cache_batch_idx=cache_batch_idx, cache_leftpad=cache_leftpad,
            qv=qv, alibi_slopes=alibi_slopes, q_descale=q_descale,
            k_descale=k_descale, v_descale=v_descale,
            softmax_scale=softmax_scale, causal=causal,
            window_size=window_size, softcap=softcap,
            attention_chunk=attention_chunk, num_splits=num_splits,
            block_k=block_k, interpret=interpret, out_fp32=out_fp32,
        )
        return out[..., :dv_in], lse
    # Mosaic compile blows up with wide page tables (>16 pages/seq measured
    # >20min); for single-token decode, chop the context into <=16-page
    # chunks treated as extra split-KV partials (exact: combine merges by
    # the LSE algebra).
    max_tiles_per_kernel = 16
    if (block_table is not None and sq == 1
            and block_table.shape[1] > max_tiles_per_kernel
            and block_table.shape[1] % max_tiles_per_kernel == 0
            # position-dependent features don't survive per-chunk
            # re-basing; fall through to the direct path for those
            and window_size == (None, None) and attention_chunk == 0
            and cache_leftpad is None
            and alibi_slopes is None):
        page_size = k_cache.shape[2]
        ns = block_table.shape[1] // max_tiles_per_kernel
        chunk_tok = max_tiles_per_kernel * page_size
        bt = block_table.reshape(b * ns, max_tiles_per_kernel)
        # per-chunk effective lengths
        base = jnp.arange(ns, dtype=jnp.int32) * chunk_tok
        sl = jnp.clip(cache_seqlens[:, None] - base[None, :], 0, chunk_tok)
        sl = sl.reshape(b * ns)
        rep = lambda x: (None if x is None
                         else jnp.repeat(x, ns, axis=0))
        qrep = jnp.repeat(q, ns, axis=0)
        out_p, lse_p = flash_attention_decode(
            qrep, k_cache, v_cache, sl, block_table=bt,
            qv=rep(qv),
            cache_batch_idx=None, cache_leftpad=rep(cache_leftpad),
            alibi_slopes=rep(alibi_slopes), q_descale=rep(q_descale),
            k_descale=rep(k_descale), v_descale=rep(v_descale),
            softmax_scale=softmax_scale, causal=False,  # sq=1: length bound
            window_size=window_size, softcap=softcap, num_splits=num_splits,
            block_k=block_k, interpret=interpret, out_fp32=True,
        )
        # (b*ns, 1, h, dv) fp32 partials -> combine over ns, round once.
        # lse axes must mirror out's leading axes exactly: (ns, b, 1, h).
        out_c = out_p.reshape(b, ns, 1, h, -1).transpose(1, 0, 2, 3, 4)
        lse_c = lse_p.reshape(b, ns, h, 1).transpose(1, 0, 3, 2)
        out, lse = combine_splits(out_c, lse_c)
        lse = jnp.swapaxes(lse, 1, 2)  # (b, 1, h) -> (b, h, sq=1)
        final_dtype = jnp.float32 if out_fp32 else (
            jnp.bfloat16 if (q_descale is not None or k_descale is not None
                             or v_descale is not None) else q.dtype)
        return out.astype(final_dtype), lse

    # Bound per-call SMEM: page tables + per-batch scalars live in SMEM and
    # large (batch x pages) tables blow up the Mosaic compile superlinearly
    # (128 entries ~40s, 256 entries 6+ min measured); chunk the batch with
    # lax.map so the kernel is instantiated (and compiled) ONCE.
    max_tab = 128
    per_b = block_table.shape[1] if block_table is not None else 1
    if b * per_b > max_tab and b > 1:
        chunk = 1
        for c in range(1, b):
            if b % c == 0 and c * per_b <= max_tab:
                chunk = c
        nc = b // chunk

        def piece(args):
            (qc, slc, btc, bic, lpc, asc, qdc, kdc, vdc, qvc) = args
            return flash_attention_decode(
                qc, k_cache, v_cache, slc,
                block_table=btc, cache_batch_idx=bic, cache_leftpad=lpc,
                qv=qvc,
                alibi_slopes=asc, q_descale=qdc, k_descale=kdc, v_descale=vdc,
                softmax_scale=softmax_scale, causal=causal,
                window_size=window_size, softcap=softcap,
                attention_chunk=attention_chunk,
                num_splits=num_splits, block_k=block_k, interpret=interpret,
                out_fp32=out_fp32,
            )

        def split(x):
            return (None if x is None
                    else x.reshape((nc, chunk) + x.shape[1:]))

        outs, lses = jax.lax.map(piece, (
            split(q), split(cache_seqlens), split(block_table),
            split(cache_batch_idx), split(cache_leftpad),
            split(alibi_slopes), split(q_descale), split(k_descale),
            split(v_descale), split(qv),
        ))
        return (outs.reshape((b,) + outs.shape[2:]),
                lses.reshape((b,) + lses.shape[2:]))
    paged = block_table is not None
    if paged:
        num_pages, h_k, page_size, _ = k_cache.shape
        # Decouple the KV tile from the page: a tile spans pages_per_tile
        # pages fetched by concurrent unrolled DMAs (k_dma above), so small
        # pages keep full-size MXU tiles and enough DMAs in flight. Target
        # tile ~512 rows (the non-paged sweet spot), bounded by the table.
        table_width = block_table.shape[1]
        target = block_k or 512
        ppt = max(1, min(target // page_size, table_width))
        while ppt > 1 and table_width % ppt != 0:
            ppt -= 1
        bk = ppt * page_size
        max_tiles = table_width // ppt
    else:
        b_c, h_k, s_max, _ = k_cache.shape
        # tile must divide s_max exactly: the HBM->VMEM DMA slices may not
        # overrun the cache allocation
        # Largest 128-multiple divisor of s_max up to the cap: big slab DMAs
        # are the whole game here (s_max=640 with the old pow2-only probe
        # fell to bk=128 -> 5x the DMA issues; worse, non-128-divisible
        # s_max fell to bk=8 -> 32 KB DMAs at 143 GB/s measured).
        # VMEM guard: double-buffered K+V slabs must leave room for the
        # accumulators (per slot: h_k * bk * (d + dv) * itemsize).
        itemsize = jnp.dtype(k_cache.dtype).itemsize
        dv_tmp = v_cache.shape[-1]
        vmem_cap = 48 * 1024 * 1024
        bk_vmem = vmem_cap // (2 * h_k * (d + dv_tmp) * itemsize)
        cap = block_k or min(1024, max(128, bk_vmem // 128 * 128))
        bk = 0
        for cand in range(128, min(cap, s_max) + 1, 128):
            if s_max % cand == 0:
                bk = cand
        if bk == 0:
            bk = block_k or 512
            while bk > 128 and s_max % bk != 0:
                bk //= 2
            if s_max % bk != 0:
                bk = math.gcd(s_max, bk * 128) if s_max >= 128 else s_max
                while s_max % bk != 0:
                    bk //= 2
        if bk < 128 and s_max >= 128:
            from flash_attn_tpu.utils.fa_logging import logger
            logger.warning(
                "flash_decode: cache seqlen %d is not 128-divisible; KV "
                "tile degrades to %d rows (measured ~4x bandwidth loss). "
                "Allocate caches with seqlen a multiple of 512 "
                "(modules/mha.py rounds its allocations).", s_max, bk)
        max_tiles = s_max // bk
        num_pages = 1
        ppt = 1
        table_width = 1
    dv = v_cache.shape[-1]
    group = h // h_k
    # Sequences per grid step. MEASURED NEGATIVE on v5e (round 3): batching
    # the per-tile ops over g>1 sequences made fp8 4k-ctx decode SLOWER
    # (g=4: 1.254 ms vs g=1: 1.106) — the per-tile body cost is data-
    # proportional (VPU/MXU throughput on the masks and 8-row matmuls),
    # not fixed dispatch latency, so widening tensors buys nothing and
    # costs scoped VMEM (Mosaic stacks ~14 live bf16-sized copies of the
    # (g*h_k, block_k, d) tile tensors; 118.68M at g=8 fp8). Kept as an
    # env knob for other TPU generations; the kernel is written in the
    # flat (g*h_k) form either way.
    import os
    g = 1
    g_env = int(os.environ.get("FA_DECODE_SEQS", "1"))
    if g_env > 1:
        for cand in (g_env, 8, 4, 2):
            scoped_est = 14 * cand * h_k * bk * max(d, dv) * 2
            slab = 2 * 2 * cand * h_k * bk * (d + dv) * max(
                2, jnp.dtype(k_cache.dtype).itemsize)
            if (cand <= g_env and b % cand == 0
                    and scoped_est <= 88 * 1024 * 1024
                    and slab <= 40 * 1024 * 1024
                    and cand * (ppt if paged else 1) <= 32):
                g = cand
                break
    assert not ((q_descale is not None or k_descale is not None)
                and softcap > 0.0), "softcap + FP8 descale unsupported"
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    window_left, window_right = normalize_window(window_size)

    rows = sq * group
    rows_pad = max(8, _round_up(rows, 8))
    qp = q.reshape(b, sq, h_k, group, d).transpose(0, 2, 1, 3, 4).reshape(
        b, h_k, rows, d
    )
    if rows_pad != rows:
        qp = jnp.pad(qp, ((0, 0), (0, 0), (0, rows_pad - rows), (0, 0)))
    qvp = None
    if qv is not None:
        qvp = qv.reshape(b, sq, h_k, group, dv).transpose(
            0, 2, 1, 3, 4).reshape(b, h_k, rows, dv)
        if rows_pad != rows:
            qvp = jnp.pad(qvp,
                          ((0, 0), (0, 0), (0, rows_pad - rows), (0, 0)))

    num_splits = max(1, min(num_splits, max_tiles))

    seqlens = cache_seqlens.astype(jnp.int32)
    leftpad = (jnp.zeros((b,), jnp.int32) if cache_leftpad is None
               else cache_leftpad.astype(jnp.int32))
    bidx = (jnp.arange(b, dtype=jnp.int32) if cache_batch_idx is None
            else cache_batch_idx.astype(jnp.int32))
    ptab = (block_table.astype(jnp.int32) if paged
            else jnp.zeros((b, 1), jnp.int32))

    in_specs = []
    inputs = []
    # per-(seq, head) int32 metadata vectors (see kernel meta_ref note)
    meta = jnp.broadcast_to(
        jnp.stack([
            jnp.repeat(seqlens, h_k),
            jnp.repeat(leftpad, h_k),
        ])[..., None], (2, b * h_k, 128))
    in_specs.append(pl.BlockSpec(
        (2, g * h_k, 128), lambda b_, s, *_: (0, b_, 0)))
    inputs.append(meta)
    if qv is not None:
        in_specs.append(pl.BlockSpec(
            (g * h_k, rows_pad, dv), lambda b_, s, *_: (b_, 0, 0)))
        inputs.append(qvp.reshape(b * h_k, rows_pad, dv))
    if alibi_slopes is not None:
        r = jnp.arange(rows_pad) % group
        heads = (jnp.arange(h_k)[:, None] * group
                 + jnp.minimum(r, group - 1)[None, :])
        slopes_packed = alibi_slopes.astype(jnp.float32)[:, heads]
        in_specs.append(pl.BlockSpec(
            (g * h_k, rows_pad, 1), lambda b_, s, *_: (b_, 0, 0)))
        inputs.append(slopes_packed.reshape(b * h_k, rows_pad)[..., None])
    has_descale = (q_descale is not None or k_descale is not None
                   or v_descale is not None)
    if has_descale:
        ones = jnp.ones((b, h_k), jnp.float32)
        qd = ones if q_descale is None else q_descale.astype(jnp.float32)
        kd = ones if k_descale is None else k_descale.astype(jnp.float32)
        vd = ones if v_descale is None else v_descale.astype(jnp.float32)
        # (2, b, h_k, 128): [0]=qd*kd, [1]=vd, lane-replicated for vector
        # reads in the batched-head kernel.
        # [0]=qd*kd (qk scores), [1]=vd (output), [2]=qd*vd (qv scores)
        descale = jnp.broadcast_to(
            jnp.stack([qd * kd, vd, qd * vd])[..., None],
            (3, b, h_k, 128)).reshape(3, b * h_k, 128)
        in_specs.append(pl.BlockSpec(
            (3, g * h_k, 128), lambda b_, s, *_: (0, b_, 0)))
        inputs.append(descale)
    in_specs += [
        pl.BlockSpec((g * h_k, rows_pad, d), lambda b_, s, *_: (b_, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),      # k cache stays in HBM
        pl.BlockSpec(memory_space=pl.ANY),      # v cache stays in HBM
    ]
    inputs += [qp.reshape(b * h_k, rows_pad, d), k_cache, v_cache]

    out_specs = [
        pl.BlockSpec((1, g * h_k, rows_pad, dv),
                     lambda b_, s, *_: (s, b_, 0, 0)),
        pl.BlockSpec((1, g * h_k, rows_pad, 1),
                     lambda b_, s, *_: (s, b_, 0, 0)),
    ]
    out_shapes = [
        jax.ShapeDtypeStruct((num_splits, b * h_k, rows_pad, dv),
                             jnp.float32),
        jax.ShapeDtypeStruct((num_splits, b * h_k, rows_pad, 1),
                             jnp.float32),
    ]
    scratch_shapes = [
        pltpu.VMEM((2, g * h_k, bk, d), k_cache.dtype),   # K double buffer
        pltpu.VMEM((2, g * h_k, bk, dv), v_cache.dtype),  # V double buffer
        pltpu.SemaphoreType.DMA((2, 2, g, ppt)),
        pltpu.VMEM((g * h_k, rows_pad, dv), jnp.float32),
        pltpu.VMEM((g * h_k, rows_pad, 128), jnp.float32),
        pltpu.VMEM((g * h_k, rows_pad, 128), jnp.float32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b // g, num_splits),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    kernel = functools.partial(
        _decode_kernel,
        block_k=bk, rows_pad=rows_pad, seqlen_q=sq, group=group,
        num_splits=num_splits, max_tiles=max_tiles, num_heads_kv=h_k,
        scale_log2=softmax_scale * LOG2E, softcap=softcap, causal=causal,
        window_left=window_left, window_right=window_right,
        attention_chunk=attention_chunk,
        has_alibi=alibi_slopes is not None, paged=paged, num_pages=num_pages,
        has_descale=has_descale, pages_per_tile=ppt, table_width=table_width,
        seqs_per_step=g, has_qv=qv is not None,
    )

    from flash_attn_tpu.utils.fa_logging import log_kernel_launch
    log_kernel_launch(
        "flash_decode", blocks={"kv": (bk,)},
        num_splits=num_splits, paged=paged, rows_pad=rows_pad,
        heads_kv=h_k, max_tiles=max_tiles, pages_per_tile=ppt,
        seqs_per_step=g)

    outp, lsep = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # large KV tiles put the fp8->bf16 cast copies + score temps on
            # the kernel stack past the default 16 MiB scoped limit
            # (measured 21.49M at block_k=1024 fp8) — v5e has ~128 MiB
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(seqlens, leftpad, bidx, ptab, *inputs)
    outp = outp.reshape(num_splits, b, h_k, rows_pad, dv)
    lsep = lsep.reshape(num_splits, b, h_k, rows_pad, 1)

    out_p, lse_p = combine_splits(outp, lsep[..., 0])
    out_p = out_p[:, :, :rows]
    lse_p = lse_p[:, :, :rows]
    out_dtype = jnp.float32 if out_fp32 else (
        jnp.bfloat16 if has_descale else q.dtype)
    out = out_p.reshape(b, h_k, sq, group, dv).transpose(0, 2, 1, 3, 4).reshape(
        b, sq, h, dv
    ).astype(out_dtype)
    lse = lse_p.reshape(b, h_k, sq, group).transpose(0, 1, 3, 2).reshape(
        b, h, sq
    )
    return out, lse


def combine_splits(out_partial, lse_partial):
    """LSE-weighted merge of split-KV partials.

    out_partial: (num_splits, ..., dv) fp32 — already normalized per split
    lse_partial: (num_splits, ...) fp32 (-inf for empty splits)
    Returns (out, lse) without the leading splits axis.

    This is the reference's combine algebra
    (hopper/flash_fwd_combine_kernel.h:17): m = max_i lse_i,
    w_i = exp(lse_i - m), out = sum w_i out_i / sum w_i,
    lse = m + log(sum w_i).
    """
    m = jnp.max(lse_partial, axis=0)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    w = jnp.exp(lse_partial - m_safe)  # exp(-inf)=0 for empty splits
    denom = jnp.sum(w, axis=0)
    out = jnp.sum(out_partial * w[..., None], axis=0)
    out = out / jnp.where(denom == 0.0, 1.0, denom)[..., None]
    lse = m + jnp.log(jnp.where(denom == 0.0, 1.0, denom))
    lse = jnp.where(jnp.isneginf(m), NEG_INF, lse)
    return out, lse


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m
