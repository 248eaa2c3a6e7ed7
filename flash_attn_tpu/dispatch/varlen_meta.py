"""Varlen scheduler metadata — device-computed, host-sync-free.

TPU-native analogue of the reference's varlen scheduling machinery
(hopper/flash_prepare_scheduler.cu:36 ``prepare_varlen_num_blocks_kernel``,
flash_attn/cute/tile_scheduler.py:867 ``VarlenDecoder``,
hopper/flash_api.cpp:521 ``mha_fwd_get_scheduler_metadata``).

The packed (total_tokens,) layout is attacked with dense aligned tiles over
the *flat* token axis (no per-sequence tile origins), so the only per-tile
state the kernel needs is:

  - per-token vectors: segment id, in-sequence position, per-sequence
    seqlen_k/seqlen_q (for bottom-right causal alignment), all padded to the
    tile grid with sentinel segments that never match;
  - per-q-tile KV-tile bands [j_min, j_max] (and per-kv-tile q bands for the
    backward), computed here with jnp and fed to the kernel via scalar
    prefetch -- exactly the reference's metadata-tensor design, but computed
    by XLA on device instead of a CUDA prep kernel.

Everything here is O(total_tokens) elementwise + segment reductions; it jits
and fuses into the surrounding step.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

Q_PAD_SEG = -1  # padding sentinel on the q side (rows -> fully masked)
K_PAD_SEG = -2  # padding sentinel on the k side (never equals any q seg)


class VarlenMeta(NamedTuple):
    # per-token flat vectors (padded to NQ*bq / NK*bk), int32
    seg_q: jax.Array
    pos_q: jax.Array
    seg_k: jax.Array
    pos_k: jax.Array
    sq_of_q: jax.Array   # seqlen_q of the token's sequence
    sk_of_q: jax.Array   # seqlen_k of the token's sequence
    # per-tile bands, int32, shape (NQ,) / (NK,)
    jband_min: jax.Array
    jband_max: jax.Array
    iband_min: jax.Array
    iband_max: jax.Array
    # per-q-tile interior (fully unmasked) KV sub-band, (NQ,): empty when
    # jfull_min > jfull_max (normalized to [jband_max+1, jband_max])
    jfull_min: jax.Array
    jfull_max: jax.Array
    # backward mirror: per-kv-tile interior q sub-band, (NK,)
    ifull_min: jax.Array
    ifull_max: jax.Array


def _token_meta(cu_seqlens, seqused, total_pad, num_seqs, pad_seg):
    """seg/pos/used vectors for one side, padded to total_pad."""
    idx = jnp.arange(total_pad, dtype=jnp.int32)
    seg = jnp.searchsorted(cu_seqlens, idx, side="right").astype(jnp.int32) - 1
    seg = jnp.clip(seg, 0, num_seqs - 1)
    pos = idx - cu_seqlens[seg]
    used = jnp.logical_and(idx < cu_seqlens[num_seqs], pos < seqused[seg])
    seg = jnp.where(used, seg, pad_seg)
    return seg, pos, used


def compute_varlen_meta(
    cu_seqlens_q,  # (b+1,) int32
    cu_seqlens_k,  # (b+1,) int32
    block_q: int,
    block_k: int,
    num_q_tiles: int,
    num_k_tiles: int,
    *,
    causal: bool,
    window_left: Optional[int],
    window_right: Optional[int],
    seqused_q=None,  # (b,) int32, overrides cu diff (reference seqused_q/k)
    seqused_k=None,
    attention_chunk: int = 0,  # narrows the interior (jfull) sub-band only
) -> VarlenMeta:
    b = cu_seqlens_q.shape[0] - 1
    cu_q = cu_seqlens_q.astype(jnp.int32)
    cu_k = cu_seqlens_k.astype(jnp.int32)
    len_q = cu_q[1:] - cu_q[:-1]
    len_k = cu_k[1:] - cu_k[:-1]
    used_q_len = len_q if seqused_q is None else seqused_q.astype(jnp.int32)
    used_k_len = len_k if seqused_k is None else seqused_k.astype(jnp.int32)

    total_q_pad = num_q_tiles * block_q
    total_k_pad = num_k_tiles * block_k
    seg_q, pos_q, q_used = _token_meta(cu_q, used_q_len, total_q_pad, b, Q_PAD_SEG)
    seg_k, pos_k, _ = _token_meta(cu_k, used_k_len, total_k_pad, b, K_PAD_SEG)

    sq_of_q = used_q_len[jnp.clip(seg_q, 0, b - 1)]
    sk_of_q = used_k_len[jnp.clip(seg_q, 0, b - 1)]

    # ---- per-q-tile KV bands ----
    # For q token t in segment s: its kv columns live in
    # [cu_k[s] + lo(t), cu_k[s] + hi(t)] where (with shift = sk - sq):
    #   hi(t) = min(sk, pos + shift + wr + 1) - 1   (causal => wr = 0)
    #   lo(t) = max(0, pos + shift - wl)            (no window_left => 0)
    shift_q = sk_of_q - sq_of_q
    wr = 0 if causal else window_right
    if causal or wr is not None:
        hi_tok = jnp.minimum(sk_of_q, pos_q + shift_q + wr + 1) - 1
    else:
        hi_tok = sk_of_q - 1
    if window_left is not None:
        lo_tok = jnp.maximum(0, pos_q + shift_q - window_left)
    else:
        lo_tok = jnp.zeros_like(pos_q)
    col_hi = cu_k[jnp.clip(seg_q, 0, b - 1)] + hi_tok  # global col index
    col_lo = cu_k[jnp.clip(seg_q, 0, b - 1)] + lo_tok
    big = jnp.int32(2**30)
    col_hi = jnp.where(q_used, col_hi, -1)
    col_lo = jnp.where(q_used, col_lo, big)
    col_hi_t = jnp.max(col_hi.reshape(num_q_tiles, block_q), axis=1)
    col_lo_t = jnp.min(col_lo.reshape(num_q_tiles, block_q), axis=1)
    jband_min = jnp.clip(col_lo_t // block_k, 0, num_k_tiles - 1).astype(jnp.int32)
    jband_max = jnp.where(
        col_hi_t < col_lo_t, jnp.int32(-1), col_hi_t // block_k
    ).astype(jnp.int32)  # empty band -> max < min -> tile fully skipped

    # ---- per-q-tile INTERIOR (maskless) KV sub-bands ----
    # KV tile j is interior for q tile i when every (row, col) pair in the
    # (i, j) tile is unmasked: all rows of i real and in ONE segment, and
    # tile j's columns all real, in that segment, within every row's
    # causal/window/chunk range. The kernel then skips the whole mask
    # chain on [jfull_min, jfull_max] — the varlen analogue of the dense
    # split-edge decomposition, with DYNAMIC (data-dependent) bounds.
    seg_tile = seg_q.reshape(num_q_tiles, block_q)
    seg_t_min = jnp.min(seg_tile, axis=1)
    seg_t_max = jnp.max(seg_tile, axis=1)
    uniform = jnp.logical_and(seg_t_min == seg_t_max, seg_t_min >= 0)
    # tightest per-row ranges across the tile (pad rows excluded above)
    f_lo_tok = lo_tok
    f_hi_tok = hi_tok
    if attention_chunk > 0:
        rs = pos_q + shift_q
        limit = rs - rs % attention_chunk
        f_lo_tok = jnp.maximum(f_lo_tok, limit)
        f_hi_tok = jnp.minimum(f_hi_tok, limit + attention_chunk - 1)
        lim_t = limit.reshape(num_q_tiles, block_q)
        uniform = jnp.logical_and(uniform, lim_t[:, 0] == lim_t[:, -1])
    f_col_hi = cu_k[jnp.clip(seg_q, 0, b - 1)] + f_hi_tok
    f_col_lo = cu_k[jnp.clip(seg_q, 0, b - 1)] + f_lo_tok
    f_hi_t = jnp.min(jnp.where(q_used, f_col_hi, big).reshape(
        num_q_tiles, block_q), axis=1)
    f_lo_t = jnp.max(jnp.where(q_used, f_col_lo, -1).reshape(
        num_q_tiles, block_q), axis=1)
    jf_lo = jnp.maximum((f_lo_t + block_k - 1) // block_k, jband_min)
    jf_hi = jnp.minimum((f_hi_t + 1) // block_k - 1, jband_max)
    ok = jnp.logical_and(uniform, jf_lo <= jf_hi)
    jfull_min = jnp.where(ok, jf_lo, jband_max + 1).astype(jnp.int32)
    jfull_max = jnp.where(ok, jf_hi, jband_max).astype(jnp.int32)

    # ---- per-kv-tile q bands (for backward) ----
    # For k token u in segment s: its q rows live where lo<=u_pos<=hi inverted:
    #   causal/wr: pos_k <= pos_q + shift + wr  => pos_q >= pos_k - shift - wr
    #   window_left: pos_q <= pos_k - shift + wl
    k_used = seg_k != K_PAD_SEG
    sq_of_k = used_q_len[jnp.clip(seg_k, 0, b - 1)]
    sk_of_k = used_k_len[jnp.clip(seg_k, 0, b - 1)]
    shift_k = sk_of_k - sq_of_k
    if causal or wr is not None:
        row_lo_tok = jnp.maximum(0, pos_k - shift_k - wr)
    else:
        row_lo_tok = jnp.zeros_like(pos_k)
    if window_left is not None:
        row_hi_tok = jnp.minimum(sq_of_k - 1, pos_k - shift_k + window_left)
    else:
        row_hi_tok = sq_of_k - 1
    row_lo = cu_q[jnp.clip(seg_k, 0, b - 1)] + row_lo_tok
    row_hi = cu_q[jnp.clip(seg_k, 0, b - 1)] + row_hi_tok
    row_lo = jnp.where(k_used, row_lo, big)
    row_hi = jnp.where(k_used, row_hi, -1)
    row_lo_t = jnp.min(row_lo.reshape(num_k_tiles, block_k), axis=1)
    row_hi_t = jnp.max(row_hi.reshape(num_k_tiles, block_k), axis=1)
    iband_min = jnp.clip(row_lo_t // block_q, 0, num_q_tiles - 1).astype(jnp.int32)
    iband_max = jnp.where(
        row_hi_t < row_lo_t, jnp.int32(-1), row_hi_t // block_q
    ).astype(jnp.int32)

    # ---- per-kv-tile INTERIOR (maskless) q sub-bands (backward mirror of
    # jfull: q tiles where no (row, col) pair of this kv tile is masked) ----
    segk_tile = seg_k.reshape(num_k_tiles, block_k)
    k_uniform = jnp.logical_and(
        jnp.min(segk_tile, axis=1) == jnp.max(segk_tile, axis=1),
        jnp.min(segk_tile, axis=1) >= 0)
    f_row_lo_tok = row_lo_tok
    f_row_hi_tok = row_hi_tok
    if attention_chunk > 0:
        base_k = pos_k - pos_k % attention_chunk
        f_row_lo_tok = jnp.maximum(f_row_lo_tok, base_k - shift_k)
        f_row_hi_tok = jnp.minimum(
            f_row_hi_tok, base_k + attention_chunk - 1 - shift_k)
        base_t = base_k.reshape(num_k_tiles, block_k)
        k_uniform = jnp.logical_and(k_uniform, base_t[:, 0] == base_t[:, -1])
    f_row_hi = cu_q[jnp.clip(seg_k, 0, b - 1)] + f_row_hi_tok
    f_row_lo = cu_q[jnp.clip(seg_k, 0, b - 1)] + f_row_lo_tok
    f_rhi_t = jnp.min(jnp.where(k_used, f_row_hi, big).reshape(
        num_k_tiles, block_k), axis=1)
    f_rlo_t = jnp.max(jnp.where(k_used, f_row_lo, -1).reshape(
        num_k_tiles, block_k), axis=1)
    if_lo = jnp.maximum((f_rlo_t + block_q - 1) // block_q, iband_min)
    if_hi = jnp.minimum((f_rhi_t + 1) // block_q - 1, iband_max)
    k_ok = jnp.logical_and(k_uniform, if_lo <= if_hi)
    ifull_min = jnp.where(k_ok, if_lo, iband_max + 1).astype(jnp.int32)
    ifull_max = jnp.where(k_ok, if_hi, iband_max).astype(jnp.int32)

    i32 = lambda x: x.astype(jnp.int32)
    return VarlenMeta(
        seg_q=i32(seg_q), pos_q=i32(pos_q),
        seg_k=i32(seg_k), pos_k=i32(pos_k),
        sq_of_q=i32(jnp.where(q_used, sq_of_q, 0)),
        sk_of_q=i32(jnp.where(q_used, sk_of_q, 0)),
        jband_min=jband_min, jband_max=jband_max,
        iband_min=iband_min, iband_max=iband_max,
        jfull_min=jfull_min, jfull_max=jfull_max,
        ifull_min=ifull_min, ifull_max=ifull_max,
    )
