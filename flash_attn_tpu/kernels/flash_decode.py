"""Pallas TPU decode (KV-cache) attention: split-KV + GQA packing + paging.

TPU-native redesign of the reference decode path
(csrc/flash_attn/flash_api.cpp:1244 ``mha_fwd_kvcache``,
csrc/flash_attn/src/flash_fwd_kernel.h:506 ``compute_attn_1rowblock_splitkv``,
hopper/paged_kv.h:18 ``PagedKVManager``, hopper/pack_gqa.h:15
``PackGQAManager``). Key mappings:

 - GQA packing ("seqlenq_ngroups_swapped", flash_api.cpp:431-437): the
   (seqlen_q x group) query rows of one KV head are packed into a single
   row-block so the MXU sees a tall GEMM instead of `group` skinny ones.
 - Split-KV: the KV range is chopped into ``num_splits`` contiguous chunks;
   each split emits fp32 partial output + partial LSE, merged by
   ``combine_splits`` (the reference's flash_fwd_combine kernel — on TPU a
   trivially-fused XLA reduction; it is also exposed as the public
   ``flash_attn_combine`` for cross-chip merges). On a 1-2 core TPU chip
   splits buy nothing locally; they are the primitive for sharding the cache
   across chips/hosts.
 - Paged KV: the KV tile index map reads the page table from SMEM (scalar
   prefetch) — the TPU version of the reference's in-kernel page-pointer
   arithmetic. Requires kv tile size == page size.

Cache layout is TPU-native (batch, kv_heads, seqlen, head_dim) / pages
(num_pages, kv_heads, page_size, head_dim) so seq rides the sublane axis; the
compat interface transposes reference-layout caches once.
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.dispatch.config import normalize_window

LOG2E = math.log2(math.e)
LN2 = math.log(2.0)
NEG_INF = float("-inf")


def _decode_kernel(
    # scalar prefetch
    seqlens_ref,        # (b,) effective kv length per batch entry
    leftpad_ref,        # (b,)
    batch_idx_ref,      # (b,) cache row per batch entry
    page_tab_ref,       # (b, max_tiles) page table in kv-tile units (or dummy)
    *refs,
    block_k, rows_pad, seqlen_q, group, kv_tiles_per_split, num_kv_tiles,
    scale_log2, softcap, causal, window_left, window_right,
    has_alibi, paged,
):
    if has_alibi:
        slopes_ref, q_ref, k_ref, v_ref, outp_ref, lsep_ref, acc, m_s, l_s = refs
    else:
        q_ref, k_ref, v_ref, outp_ref, lsep_ref, acc, m_s, l_s = refs
        slopes_ref = None

    b_idx = pl.program_id(0)
    split = pl.program_id(2)
    jj = pl.program_id(3)
    j = split * kv_tiles_per_split + jj  # global kv tile

    @pl.when(jj == 0)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc[...] = jnp.zeros_like(acc)

    sk = seqlens_ref[b_idx]
    leftpad = leftpad_ref[b_idx]
    sk_eff = sk - leftpad
    num_valid_tiles = (sk + block_k - 1) // block_k
    should_run = jnp.logical_and(j < num_valid_tiles, j < num_kv_tiles)

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]  # (rows_pad, d)
        k = k_ref[0, 0]  # (block_k, d)
        v = v_ref[0, 0]

        cols = j * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (rows_pad, block_k), 1
        )
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_pad, block_k), 0)
        tok = rows // group  # query token of the packed row
        pos_k = cols - leftpad

        # Zero cache garbage beyond sk (and pre-leftpad region) in V.
        col_ok = jnp.logical_and(cols < sk, cols >= leftpad)
        vmask = jnp.logical_and(
            jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0) + j * block_k < sk,
            jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0) + j * block_k >= leftpad,
        )
        v = jnp.where(vmask, v, 0)

        if softcap > 0.0:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (scale_log2 / LOG2E)
            t = jnp.tanh(s / softcap)
            s2 = t * softcap * LOG2E
        else:
            qs = (q.astype(jnp.float32) * scale_log2).astype(q.dtype)
            s2 = jax.lax.dot_general(
                qs, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        shift = sk_eff - seqlen_q
        if has_alibi:
            slope = slopes_ref[0, 0]  # (rows_pad, 1)
            if causal:
                bias = (pos_k - (sk_eff - 1)).astype(jnp.float32)
            else:
                bias = -jnp.abs(tok + shift - pos_k).astype(jnp.float32)
            s2 = s2 + slope * LOG2E * bias

        valid = col_ok
        wr = 0 if causal else window_right
        if causal or wr is not None:
            valid = jnp.logical_and(valid, pos_k <= tok + shift + wr)
        if window_left is not None:
            valid = jnp.logical_and(valid, pos_k >= tok + shift - window_left)
        s2 = jnp.where(valid, s2, NEG_INF)

        m_prev = m_s[...]
        l_prev = l_s[...]
        row_max = jnp.max(s2, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(row_max, m_prev.shape))
        m_safe = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp2(s2 - m_safe[:, :1])
        corr = jnp.exp2(m_prev - m_safe)
        row_sum = jnp.sum(p, axis=-1, keepdims=True)
        l_s[...] = l_prev * corr + jnp.broadcast_to(row_sum, l_prev.shape)
        m_s[...] = m_new
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc[...] = acc[...] * corr[:, :1] + pv

    @pl.when(jj == kv_tiles_per_split - 1)
    def _epilogue():
        # fp32 partials; the combine normalizes, so emit unnormalized
        # acc plus lse (lse = -inf when the split saw nothing).
        m = m_s[:, :1]
        l = l_s[:, :1]
        lse = m * LN2 + jnp.log(l)  # -inf when l == 0
        inv_l = jnp.where(l == 0.0, 0.0, 1.0 / l)
        outp_ref[0, 0, 0] = acc[...] * inv_l
        lsep_ref[0, 0, 0] = lse


@functools.partial(
    jax.jit,
    static_argnames=(
        "softmax_scale", "causal", "window_size", "softcap", "num_splits",
        "block_k", "interpret",
    ),
)
def flash_attention_decode(
    q,         # (b, sq, h, d)
    k_cache,   # (b_c, h_k, s_max, d) or paged (pages, h_k, page_size, d)
    v_cache,   # same with dv
    cache_seqlens,      # (b,) int32 effective kv lengths (incl leftpad)
    block_table=None,   # (b, max_pages) int32 — paged iff not None
    cache_batch_idx=None,  # (b,) int32
    cache_leftpad=None,    # (b,) int32
    alibi_slopes=None,     # (b, h)
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[Optional[int], Optional[int]] = (None, None),
    softcap: float = 0.0,
    num_splits: int = 1,
    block_k: Optional[int] = None,
    interpret: bool = False,
):
    """Returns (out (b, sq, h, dv), lse (b, h, sq) fp32)."""
    b, sq, h, d = q.shape
    paged = block_table is not None
    if paged:
        _, h_k, page_size, _ = k_cache.shape
        bk = page_size
        max_tiles = block_table.shape[1]
        s_max = max_tiles * page_size
    else:
        b_c, h_k, s_max, _ = k_cache.shape
        bk = block_k or min(512, _next_pow2(s_max))
        max_tiles = pl.cdiv(s_max, bk)
    dv = v_cache.shape[-1]
    group = h // h_k
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    window_left, window_right = normalize_window(window_size)

    rows = sq * group
    rows_pad = max(8, _round_up(rows, 8))
    # Pack q: (b, sq, h_k, group, d) -> (b, h_k, sq*group, d), row = tok*group+g
    qp = q.reshape(b, sq, h_k, group, d).transpose(0, 2, 1, 3, 4).reshape(
        b, h_k, rows, d
    )
    if rows_pad != rows:
        qp = jnp.pad(qp, ((0, 0), (0, 0), (0, rows_pad - rows), (0, 0)))

    num_kv_tiles = max_tiles
    num_splits = max(1, min(num_splits, num_kv_tiles))
    kps = pl.cdiv(num_kv_tiles, num_splits)

    seqlens = cache_seqlens.astype(jnp.int32)
    leftpad = (jnp.zeros((b,), jnp.int32) if cache_leftpad is None
               else cache_leftpad.astype(jnp.int32))
    bidx = (jnp.arange(b, dtype=jnp.int32) if cache_batch_idx is None
            else cache_batch_idx.astype(jnp.int32))
    ptab = (block_table.astype(jnp.int32) if paged
            else jnp.zeros((b, 1), jnp.int32))

    in_specs = []
    inputs = []
    if alibi_slopes is not None:
        # packed-row slopes: row r of kv-head kh -> head kh*group + r%group
        r = jnp.arange(rows_pad) % group
        heads = jnp.arange(h_k)[:, None] * group + jnp.minimum(r, group - 1)[None, :]
        slopes_packed = alibi_slopes.astype(jnp.float32)[:, heads]  # (b,h_k,rows_pad)
        in_specs.append(pl.BlockSpec(
            (1, 1, rows_pad, 1), lambda b_, kh, s, j, *_: (b_, kh, 0, 0)))
        inputs.append(slopes_packed[..., None])

    q_spec = pl.BlockSpec((1, 1, rows_pad, d),
                          lambda b_, kh, s, j, *_: (b_, kh, 0, 0))
    if paged:
        num_pages = k_cache.shape[0]

        def k_map(b_, kh, s, j, seqlens_r, leftpad_r, bidx_r, ptab_r):
            tile = jnp.minimum(s * kps + j, max_tiles - 1)
            # Bounds guard (reference paged block_table guard,
            # csrc/flash_attn/flash_api.cpp:1440): clamp rogue page ids.
            return (jnp.clip(ptab_r[b_, tile], 0, num_pages - 1), kh, 0, 0)
        k_spec = pl.BlockSpec((1, 1, bk, d), k_map)
        v_spec = pl.BlockSpec((1, 1, bk, dv), k_map)
    else:
        def k_map(b_, kh, s, j, seqlens_r, leftpad_r, bidx_r, ptab_r):
            sk = seqlens_r[b_]
            nvt = (sk + bk - 1) // bk
            tile = jnp.clip(s * kps + j, 0, jnp.maximum(nvt - 1, 0))
            return (bidx_r[b_], kh, tile, 0)
        k_spec = pl.BlockSpec((1, 1, bk, d), k_map)
        v_spec = pl.BlockSpec((1, 1, bk, dv), k_map)
    in_specs += [q_spec, k_spec, v_spec]
    inputs += [qp, k_cache, v_cache]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, h_k, num_splits, kps),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, 1, rows_pad, dv),
                         lambda b_, kh, s, j, *_: (s, b_, kh, 0, 0)),
            pl.BlockSpec((1, 1, 1, rows_pad, 1),
                         lambda b_, kh, s, j, *_: (s, b_, kh, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows_pad, dv), jnp.float32),
            pltpu.VMEM((rows_pad, 128), jnp.float32),
            pltpu.VMEM((rows_pad, 128), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _decode_kernel,
        block_k=bk, rows_pad=rows_pad, seqlen_q=sq, group=group,
        kv_tiles_per_split=kps, num_kv_tiles=num_kv_tiles,
        scale_log2=softmax_scale * LOG2E, softcap=softcap, causal=causal,
        window_left=window_left, window_right=window_right,
        has_alibi=alibi_slopes is not None, paged=paged,
    )

    outp, lsep = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_splits, b, h_k, rows_pad, dv), jnp.float32),
            jax.ShapeDtypeStruct((num_splits, b, h_k, rows_pad, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(seqlens, leftpad, bidx, ptab, *inputs)

    out_p, lse_p = combine_splits(outp, lsep[..., 0])  # (b,h_k,rows_pad,dv),(b,h_k,rows_pad)
    out_p = out_p[:, :, :rows]
    lse_p = lse_p[:, :, :rows]
    # Unpack rows -> (b, sq, h, dv); row = tok*group + g, head = kh*group + g
    out = out_p.reshape(b, h_k, sq, group, dv).transpose(0, 2, 1, 3, 4).reshape(
        b, sq, h, dv
    ).astype(q.dtype)
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
