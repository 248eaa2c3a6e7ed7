"""KV-cache decode attention: ``flash_attn_with_kvcache`` parity.

Reference: flash_attn/flash_attn_interface.py:1485 ``flash_attn_with_kvcache``
and csrc/flash_attn/flash_api.cpp:1244 ``mha_fwd_kvcache`` (in-kernel cache
append + rotary + split-KV attention). JAX is functional, so instead of
mutating the cache in place this returns the updated cache arrays; under
``jax.jit`` with buffer donation the update is in-place at the XLA level.

Cache layouts:
 - TPU-native: (batch_cache, kv_heads, seqlen_max, head_dim), pages
   (num_pages, kv_heads, page_size, head_dim) — seq on the sublane axis.
 - The reference layout (batch, seqlen, kv_heads, head_dim) is auto-detected
   via ``cache_layout='bshd'`` and transposed (prefer allocating native).
"""

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.dispatch.config import normalize_window
from flash_attn_tpu.kernels.flash_decode import flash_attention_decode
from flash_attn_tpu.ops.rotary import apply_rotary_emb

__all__ = ["flash_attn_with_kvcache", "kv_cache_update"]


def kv_cache_update(
    k_cache,  # (b_c, h_k, s_max, d) or (pages, h_k, page_size, d)
    v_cache,
    k_new,    # (b, s_new, h_k, d)
    v_new,
    cache_seqlens,  # (b,) int32 append offsets (old lengths, incl leftpad)
    block_table=None,     # (b, max_pages)
    cache_batch_idx=None,  # (b,)
    new_lengths=None,     # (b,) int32: only the first new_lengths[i] of the
    # s_new tokens are real (padded batched prefill); the padding tail's
    # writes are DROPPED in the paged path, so a slot never writes past its
    # allocated pages into table entries it doesn't own (a row padded to the
    # batch max would otherwise index table columns beyond its allocation —
    # which default to page 0, i.e. another sequence's memory).
):
    """Write new K/V into the cache at per-batch offsets.

    Implementation note (round-3 measured, v5e): an XLA scatter
    (``cache.at[rows, :, pos].set``) lowers on TPU to a whole-cache
    rewrite — 32 ms/step for 16 layers of (64, 16, 608, 128) bf16 caches
    (~7.4 GB of copies), which was 2/3 of the 913M decode step. A
    ``fori_loop`` of per-row ``dynamic_update_slice`` stays in-place but
    pays ~25 us of while-loop sync per iteration (26 ms total at b=64 x
    16 layers). The winner is the UNROLLED per-row DUS chain: no loop
    machinery, in-place on the donated buffer, ~2.9 ms for the same 16
    layers. Unrolling is capped at b <= 256 (compile-size guard; larger
    batches fall back to the fori form). The paged multi-token append
    keeps the scatter (runtime-varying per-page piece lengths can't be
    static-size DUS slices); it is off the decode hot path.
    """
    b, s_new = k_new.shape[0], k_new.shape[1]
    offs = cache_seqlens.astype(jnp.int32)
    k_src = jnp.swapaxes(k_new.astype(k_cache.dtype), 1, 2)  # (b,h_k,s_new,d)
    v_src = jnp.swapaxes(v_new.astype(v_cache.dtype), 1, 2)
    h_k, d = k_src.shape[1], k_src.shape[3]
    dv = v_src.shape[3]
    dus = jax.lax.dynamic_update_slice
    dsl = jax.lax.dynamic_slice

    def _rows(fn_at):
        """Apply per-row DUS appends; unrolled for small static batches
        on TPU (the in-place no-loop-sync fast path); the CPU/test backend
        keeps the fori form — the unrolled chain doubles interpret-mode
        trace+compile time for zero benefit there."""
        kc, vc = k_cache, v_cache
        if b <= 256 and jax.default_backend() != "cpu":
            for i in range(b):
                at = fn_at(i)
                kc = dus(kc, dsl(k_src, (i, 0, 0, 0), (1, h_k, s_new, d)), at)
                vc = dus(vc, dsl(v_src, (i, 0, 0, 0), (1, h_k, s_new, dv)), at)
            return kc, vc

        def body(i, caches):
            kc, vc = caches
            at = fn_at(i)
            kc = dus(kc, dsl(k_src, (i, 0, 0, 0), (1, h_k, s_new, d)), at)
            vc = dus(vc, dsl(v_src, (i, 0, 0, 0), (1, h_k, s_new, dv)), at)
            return kc, vc

        return jax.lax.fori_loop(0, b, body, (kc, vc))

    if block_table is not None:
        page_size = k_cache.shape[2]
        btab = block_table.astype(jnp.int32)
        if s_new == 1:
            return _rows(lambda i: (btab[i, offs[i] // page_size], 0,
                                    offs[i] % page_size, 0))
        pos = offs[:, None] + jnp.arange(s_new, dtype=jnp.int32)[None, :]
        col = pos // page_size
        if new_lengths is not None:
            valid = (jnp.arange(s_new, dtype=jnp.int32)[None, :]
                     < new_lengths.astype(jnp.int32)[:, None])
            # out-of-range column -> take clamps, but the page index is
            # poisoned below so the write drops
            col = jnp.minimum(col, btab.shape[1] - 1)
        page = jnp.take_along_axis(btab, col, axis=1)  # (b, s_new)
        if new_lengths is not None:
            page = jnp.where(valid, page, k_cache.shape[0])  # OOB -> dropped
        inpage = pos % page_size
        k_sc = jnp.swapaxes(k_src, 1, 2)  # (b, s_new, h_k, d) for scatter
        v_sc = jnp.swapaxes(v_src, 1, 2)
        # unique_indices skips XLA's scatter dedup machinery (every
        # (page, inpage) target is distinct by construction — padding rows
        # are dropped via the OOB page index, mode="drop"); bounds on real
        # rows stay guarded by the capacity check upstream.
        k_cache = k_cache.at[page, :, inpage].set(
            k_sc, unique_indices=True, mode="drop")
        v_cache = v_cache.at[page, :, inpage].set(
            v_sc, unique_indices=True, mode="drop")
        return k_cache, v_cache
    bidx = (jnp.arange(b, dtype=jnp.int32) if cache_batch_idx is None
            else cache_batch_idx.astype(jnp.int32))
    return _rows(lambda i: (bidx[i], 0, offs[i], 0))


def flash_attn_with_kvcache(
    q,  # (b, sq, h, d)
    k_cache,  # (b_c, h_k, s_max, d) native or (b_c, s_max, h_k, d) bshd
    v_cache,
    k=None,  # (b, s_new, h_k, d) new keys to append
    v=None,
    qv=None,  # (b, sq, h, head_dim_v) MLA extra query (reference hopper
    # flash_attn_with_kvcache qv=)
    rotary_cos=None,  # (s_max_rot, rot_dim/2)
    rotary_sin=None,
    cache_seqlens: Optional[jax.Array] = None,  # (b,) or int
    rotary_seqlens=None,  # (b,): rotary position offsets for the appended
    # keys/queries (reference hopper kvcache rotary_seqlens; default =
    # cache_seqlens - cache_leftpad)
    cache_batch_idx=None,
    cache_leftpad=None,
    block_table=None,
    softmax_scale=None,
    causal: bool = False,
    window_size: Tuple[int, int] = (-1, -1),
    softcap: float = 0.0,
    attention_chunk: int = 0,
    rotary_interleaved: bool = False,
    alibi_slopes=None,
    q_descale=None,  # (b, h_k): FP8/INT8 quantized-cache descales
    k_descale=None,
    v_descale=None,
    num_splits: int = 0,
    pack_gqa: Optional[bool] = None,  # accepted for drop-in parity; GQA
    # row packing is always on here (the kernel packs query heads of one
    # kv head into MXU rows automatically)
    return_softmax_lse: bool = False,
    cache_layout: str = "native",  # "native" (b,h,s,d) | "bshd" reference
):
    """Decode-path attention over a KV cache — parity with the reference
    ``flash_attn_with_kvcache`` (flash_attn/flash_attn_interface.py:1485).

    JAX-functional deviation: when ``k``/``v`` are given, the updated caches
    are part of the return value:
        out [, lse] = ... (k is None)
        (out, k_cache, v_cache) [, lse] = ... (k is not None)
    Caches use the TPU-native (batch, heads, seq, dim) layout by default.
    """
    b, sq, h, d = q.shape
    if block_table is not None and cache_batch_idx is not None:
        # reference contract: csrc/flash_attn/flash_api.cpp:1288
        raise ValueError("Paged KVcache does not support cache_batch_idx")
    if cache_layout == "bshd":
        k_cache = jnp.swapaxes(k_cache, 1, 2)
        v_cache = jnp.swapaxes(v_cache, 1, 2)
    if cache_seqlens is None:
        cache_seqlens = jnp.full((b,), k_cache.shape[2], jnp.int32)
    elif isinstance(cache_seqlens, int):
        cache_seqlens = jnp.full((b,), cache_seqlens, jnp.int32)
    cache_seqlens = cache_seqlens.astype(jnp.int32)
    leftpad = (jnp.zeros((b,), jnp.int32) if cache_leftpad is None
               else cache_leftpad.astype(jnp.int32))
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(
            d if qv is None else d + v_cache.shape[-1])
    window_size = normalize_window(tuple(window_size))

    s_new = 0
    k_new = v_new = None
    if k is not None:
        s_new = k.shape[1]
        if rotary_cos is not None:
            pos_k = (rotary_seqlens if rotary_seqlens is not None
                     else cache_seqlens - leftpad)
            k = apply_rotary_emb(
                k, rotary_cos, rotary_sin, interleaved=rotary_interleaved,
                seqlen_offsets=pos_k,
            )
        # append happens in flash_attention_decode via kv_cache_update
        # (unrolled in-place DUS chain — see kv_cache_update's note; an
        # in-kernel DMA append was tried and removed, kernels/flash_decode).
        k_new, v_new = k, v
    if rotary_cos is not None:
        # q tokens sit at positions old_len-leftpad .. +sq (causal decode
        # alignment; non-causal q position = old_len like the reference).
        pos_q = (rotary_seqlens if rotary_seqlens is not None
                 else cache_seqlens - leftpad)
        q = apply_rotary_emb(
            q, rotary_cos, rotary_sin, interleaved=rotary_interleaved,
            seqlen_offsets=pos_q,
        )

    sk_eff = cache_seqlens + s_new
    oob_rows = None
    if block_table is not None:
        # Paged bounds guard (reference mha_fwd_kvcache raises when
        # cache_seqlens + appended keys exceed block_table capacity —
        # tests/test_flash_attn.py:2589, issue #2709). With concrete
        # lengths (eager) raise exactly like the reference; under jit the
        # lengths are traced, so overflowing rows are NaN-poisoned instead:
        # out-of-capacity reads must be loud, never silently clamped.
        capacity = block_table.shape[1] * k_cache.shape[2]
        try:
            need = np.asarray(sk_eff)
            if (need > capacity).any():
                raise ValueError(
                    f"cache_seqlens + seqlen_new (max {int(need.max())}) "
                    f"exceeds block_table capacity {capacity} "
                    f"({block_table.shape[1]} pages x {k_cache.shape[2]} "
                    "tokens); the paged kernel would index past the table")
        except jax.errors.TracerArrayConversionError:
            oob_rows = sk_eff > capacity
    if num_splits <= 0:
        # reference heuristic analogue (flash_api.cpp:281): fill the chip's
        # TensorCores. v5e has one core per chip so this resolves to 1; on
        # Megacore parts (v4/v5p) the decode grid doubles via splits.
        from flash_attn_tpu.dispatch.config import num_splits_heuristic
        num_cores = 2 if "v4" in str(
            jax.devices()[0].device_kind).lower() or "v5p" in str(
            jax.devices()[0].device_kind).lower() else 1
        s_max_tiles = max(1, k_cache.shape[2] // 512)
        num_splits = num_splits_heuristic(b, num_cores, s_max_tiles)

    interpret = jax.default_backend() == "cpu"
    res = flash_attention_decode(
        q, k_cache, v_cache, sk_eff,
        block_table=block_table, cache_batch_idx=cache_batch_idx,
        cache_leftpad=cache_leftpad, k_new=k_new, v_new=v_new, qv=qv,
        alibi_slopes=_norm_slopes(alibi_slopes, b),
        q_descale=q_descale, k_descale=k_descale, v_descale=v_descale,
        softmax_scale=softmax_scale, causal=causal, window_size=window_size,
        softcap=softcap, attention_chunk=attention_chunk,
        num_splits=num_splits, interpret=interpret,
    )
    if k_new is not None:
        out, lse, k_cache, v_cache = res
    else:
        out, lse = res
    if oob_rows is not None:
        out = jnp.where(oob_rows[:, None, None, None],
                        jnp.asarray(float("nan"), out.dtype), out)
    if cache_layout == "bshd":
        k_cache = jnp.swapaxes(k_cache, 1, 2)
        v_cache = jnp.swapaxes(v_cache, 1, 2)

    if k is not None:
        result = (out, k_cache, v_cache)
        return result + (lse,) if return_softmax_lse else result
    return (out, lse) if return_softmax_lse else out


def _norm_slopes(alibi_slopes, b):
    if alibi_slopes is None:
        return None
    if alibi_slopes.ndim == 1:
        return jnp.broadcast_to(alibi_slopes[None], (b, alibi_slopes.shape[0]))
    return alibi_slopes
