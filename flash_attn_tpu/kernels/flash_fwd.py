"""Pallas TPU flash-attention forward mainloop.

TPU-native redesign of the reference forward kernels
(csrc/flash_attn/src/flash_fwd_kernel.h:55 ``compute_attn_1rowblock``,
hopper/mainloop_fwd_sm90_tma_gmma_ws.hpp). The CUDA producer/consumer
warp-specialized TMA pipeline maps onto the Pallas grid pipeline: blocks of
K/V are streamed HBM->VMEM by the automatic double-buffered pipeline while the
MXU consumes the previous block; the online-softmax state (row max / row sum /
output accumulator) lives in VMEM scratch that persists across the innermost
(KV) grid dimension.

Design notes:
 - Layout inside the kernel is (batch, heads, seq, head_dim) so the trailing
   two dims tile onto the (sublane, lane) = (8/16, 128) hardware tiles.
 - exp2-based online softmax (the reference's exp2 rescale trick,
   csrc/flash_attn/src/softmax.h:76-89): log2(e) is folded into the softmax
   scale before the QK matmul when possible.
 - Masking writes -inf into the score matrix; fully-masked rows are handled by
   clamping the running max before exponentiation (no NaNs, zero output,
   lse = -inf), which matches the golden reference's safe-softmax.
 - Causal / local-window block skipping: the K/V index maps clamp the KV block
   index to the valid band so skipped iterations re-use the resident block
   (no DMA), and ``pl.when`` skips the compute.
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.dispatch.band import PackedBand, kv_band_static
from flash_attn_tpu.dispatch.config import (
    get_fwd_config,
    normalize_window,
    scoped_vmem_limit,
)
from flash_attn_tpu.kernels.dropout_rng import dropout_keep
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



def _fwd_kernel(
    # Optional scalar-prefetch style refs come first when enabled.
    *refs,
    block_q: int,
    block_k: int,
    seqlen_q: int,
    seqlen_k: int,
    num_kv_blocks: int,
    scale_log2: float,
    softcap: float,
    causal: bool,
    window_left: Optional[int],
    window_right: Optional[int],
    attention_chunk: int,
    sink_token_length: int,
    has_alibi: bool,
    has_sink: bool,
    dropout_p: float,
    num_heads: int,
    group: int,
    has_descale: bool,
    has_qv: bool,
    score_mod,
    mask_mod,
    out_dtype,
    band: Optional[PackedBand] = None,
    num_aux: int = 0,
    init_partial: bool = False,
):
    refs = list(refs)
    seed_ref = refs.pop(0) if dropout_p > 0.0 else None
    slopes_ref = refs.pop(0) if has_alibi else None
    sink_ref = refs.pop(0) if has_sink else None
    descale_ref = refs.pop(0) if has_descale else None  # (3, b, h_k) SMEM
    qv_ref = refs.pop(0) if has_qv else None  # (1,1,bq,dv) extra query
    # flex-attention aux tensors (reference cute/interface.py aux_tensors):
    # whole arrays in VMEM, handed to score_mod/mask_mod as jnp values.
    aux = tuple(refs.pop(0)[...] for _ in range(num_aux))
    # init-from-partial (split-edge causal driver): a normalized partial
    # (out_d, lse_d) seeds the online-softmax state on each row's FIRST
    # tile — (m, l, acc) = (lse_d, 1, out_d) is a valid carry, so the
    # diagonal pass merges for free, amortized once per ROW instead of a
    # separate per-tile merge kernel reading bulk partials per step.
    od_ref = refs.pop(0) if init_partial else None    # (1,1,bq,dv) f32
    lsed_ref = refs.pop(0) if init_partial else None  # (1,1,1,bq) f32
    q_ref, k_ref, v_ref, out_ref, lse_ref, acc, m_s, l_s = refs

    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    shift = seqlen_k - seqlen_q  # bottom-right alignment offset

    if band is None:
        i = pl.program_id(2)
        j = pl.program_id(3)
        is_first = j == 0
        is_last = j == num_kv_blocks - 1
        # ---- dynamic block-band bounds (same math as the index-map clamp) --
        j_min, j_max = _kv_block_bounds(
            i, block_q, block_k, shift, num_kv_blocks, causal,
            window_left, window_right, sink_token_length, attention_chunk,
        )
        should_run = jnp.logical_and(j >= j_min, j <= j_max)
    else:
        # Packed band grid (dispatch/band.py): every iteration is in-band,
        # so there is no predicated-off work at all — the TPU answer to the
        # reference's causal LPT scheduling (cute/tile_scheduler.py:458).
        t = pl.program_id(2)
        i, j, t_first, t_last = band.decode(t)
        is_first = t == t_first
        is_last = t == t_last
        should_run = None

    @pl.when(is_first)
    def _init():
        if init_partial:
            lse_d = lsed_ref[0, 0, 0].reshape(block_q, 1)  # natural log
            m_s[...] = jnp.broadcast_to(lse_d * LOG2E, m_s.shape)
            l_s[...] = jnp.ones_like(l_s)
            acc[...] = od_ref[0, 0].astype(jnp.float32)
        else:
            m_s[...] = jnp.full_like(m_s, NEG_INF)
            l_s[...] = jnp.zeros_like(l_s)
            acc[...] = jnp.zeros_like(acc)

    needs_col_mask = (
        causal
        or window_right is not None
        or window_left is not None
        or attention_chunk > 0
        or (seqlen_k % block_k != 0)
        or mask_mod is not None
    )

    def _guard(fn):
        return fn() if should_run is None else pl.when(should_run)(fn)

    @_guard
    def _compute():
        q = q_ref[0, 0]  # (block_q, d)
        k = k_ref[0, 0]  # (block_k, d)
        v = v_ref[0, 0]  # (block_k, dv)
        if has_descale:
            # FP8 path (reference hopper/flash.h:54-62 q/k/v_descale): MXU
            # computes in bf16; the per-(batch, kv-head) descale scalars fold
            # into the softmax scale (qd*kd) and the output (vd).
            kh = h_idx // group
            qd = descale_ref[0, b_idx, kh]
            kd = descale_ref[1, b_idx, kh]
            q = _kv_to_bf16(q)
            k = _kv_to_bf16(k)
            v = _kv_to_bf16(v)
        if seqlen_k % block_k != 0:
            # Zero padded V rows: the pipeline pads partial boundary blocks
            # with garbage, and 0 (from masked p) * garbage = NaN in the PV
            # matmul. K needs no fix — its garbage columns are overwritten by
            # the -inf mask below.
            kv_rows = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, v.shape, 0
            )
            v = jnp.where(kv_rows < seqlen_k, v, 0)

        if softcap > 0.0:
            # Need natural-scale scores for tanh capping; the qv term
            # joins BEFORE the cap (softcap applies to the full score,
            # reference cute/interface.py semantics).
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (scale_log2 / LOG2E)
            if has_qv:
                s = s + jax.lax.dot_general(
                    qv_ref[0, 0].astype(v.dtype), v,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * (scale_log2 / LOG2E)
            s = jnp.tanh(s / softcap) * softcap
            s2 = s * LOG2E
        elif has_descale:
            s2 = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (scale_log2 * qd * kd)
        else:
            qs = (q.astype(jnp.float32) * scale_log2).astype(q.dtype)
            s2 = jax.lax.dot_general(
                qs, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if has_qv and softcap == 0.0:
            # MLA qv term (reference flash_attn/cute/interface.py:3471):
            # scores += scale * qv . v (descaled by qd*vd on the fp8 path —
            # v's descale applies wherever V enters the scores; under
            # softcap the term is folded pre-tanh above)
            qvs = (qv_ref[0, 0].astype(jnp.float32) * scale_log2
                   ).astype(v.dtype)
            qv_term = jax.lax.dot_general(
                qvs, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if has_descale:
                vd_s = descale_ref[2, b_idx, h_idx // group]
                qv_term = qv_term * (qd * vd_s)
            s2 = s2 + qv_term
        if score_mod is not None:
            # flex-attention-style user score modification on natural-scale
            # scores (reference flash_attn/cute/interface.py score_mod +
            # softmax.py:20 call_score_mod); traced & inlined into the kernel
            srows = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            scols = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s_nat = s2 * (1.0 / LOG2E)
            if num_aux:
                s2 = score_mod(s_nat, b_idx, h_idx, srows, scols,
                               aux) * LOG2E
            else:
                s2 = score_mod(s_nat, b_idx, h_idx, srows, scols) * LOG2E

        if has_alibi:
            slope = slopes_ref[b_idx, h_idx]
            rows = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0
            )
            cols = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1
            )
            if causal:
                bias = jnp.broadcast_to(
                    (cols - (seqlen_k - 1)).astype(jnp.float32),
                    (block_q, block_k))
            else:
                bias = -jnp.abs(rows + shift - cols).astype(jnp.float32)
            s2 = s2 + slope * LOG2E * bias

        if needs_col_mask:
            def _apply_mask(s2):
                # Vector iotas, (bq,1) rows / (1,bk) cols: each mask term is
                # ONE broadcast compare on the (bq,bk) tile instead of the
                # round-1 matrix-iota build (2 wide iotas + wide adds) — the
                # mask cost was ~1/3 of causal VPU time on v5e.
                rows = i * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, 1), 0
                )
                cols = j * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (1, block_k), 1
                )
                valid = None

                def _and(a, b):
                    return b if a is None else jnp.logical_and(a, b)

                wr = 0 if causal else window_right
                if causal or wr is not None:
                    valid = _and(valid, cols <= rows + (shift + wr))
                if window_left is not None:
                    in_window = cols >= rows + (shift - window_left)
                    if sink_token_length > 0:
                        in_window = jnp.logical_or(
                            in_window, cols < sink_token_length)
                    valid = _and(valid, in_window)
                if attention_chunk > 0:
                    rs = rows + shift
                    limit = rs - rs % attention_chunk
                    valid = _and(
                        valid,
                        jnp.logical_and(cols >= limit,
                                        cols < limit + attention_chunk),
                    )
                if seqlen_k % block_k != 0:
                    valid = _and(valid, jnp.broadcast_to(
                        cols < seqlen_k, (block_q, block_k)))
                if mask_mod is not None:
                    # user mask: True = keep (reference mask_mod composition,
                    # flash_attn/cute/mask.py:159); mask_mod gets full
                    # matrices per its (b, h, rows, cols) contract
                    rows_m = i * block_q + jax.lax.broadcasted_iota(
                        jnp.int32, (block_q, block_k), 0)
                    cols_m = j * block_k + jax.lax.broadcasted_iota(
                        jnp.int32, (block_q, block_k), 1)
                    valid = _and(valid, mask_mod(b_idx, h_idx, rows_m, cols_m)
                                 if not num_aux else
                                 mask_mod(b_idx, h_idx, rows_m, cols_m, aux))
                return jnp.where(valid, s2, NEG_INF)

            # NOTE: an lax.cond diagonal-block fast path was tried here and
            # REGRESSED causal throughput 85 -> 54 TF/s on v5e (the cond
            # breaks Mosaic's software pipelining); unconditional masking is
            # faster.
            s2 = _apply_mask(s2)

        m_prev = m_s[...]  # (block_q, 128), lane-replicated
        l_prev = l_s[...]
        row_max = jnp.max(s2, axis=-1, keepdims=True)  # (block_q, 1)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(row_max, m_prev.shape))
        # Clamp so fully-masked rows (m == -inf) exponentiate to 0, not NaN.
        m_safe = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp2(s2 - m_safe[:, :1])  # (block_q, block_k)
        corr = jnp.exp2(m_prev - m_safe)  # (block_q, 128); exp2(-inf)=0
        row_sum = jnp.sum(p, axis=-1, keepdims=True)
        l_s[...] = l_prev * corr + jnp.broadcast_to(row_sum, l_prev.shape)
        m_s[...] = m_new
        if dropout_p > 0.0:
            # normalizer l uses undropped p (reference semantics: lse is
            # dropout-free); only the PV operand is masked
            drows = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            dcols = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            keep = dropout_keep(seed_ref[0, 0], b_idx * num_heads + h_idx,
                                drows, dcols, dropout_p)
            p = jnp.where(keep, p, 0.0)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc[...] = acc[...] * corr[:, :1] + pv

    @pl.when(is_last)
    def _epilogue():
        m = m_s[:, :1]  # (block_q, 1) base-2 running max
        l = l_s[:, :1]
        if has_sink:
            sink = sink_ref[0, h_idx].astype(jnp.float32)
            m_nat = m * LN2
            m_tot = jnp.maximum(m_nat, sink)
            l = l * jnp.exp(m_nat - m_tot) + jnp.exp(sink - m_tot)
            scale_acc = jnp.exp(m_nat - m_tot)
            o = acc[...] * scale_acc
            lse = m_tot + jnp.log(l)
        else:
            o = acc[...]
            lse = m * LN2 + jnp.log(l)
        inv_l = jnp.where(l == 0.0, 0.0, 1.0 / l)
        if dropout_p > 0.0:
            inv_l = inv_l / (1.0 - dropout_p)
        if has_descale:
            inv_l = inv_l * descale_ref[2, b_idx, h_idx // group]
        out_ref[0, 0] = (o * inv_l).astype(out_dtype)
        lse_ref[0, 0, 0] = lse[:, 0]


def _kv_block_bounds(
    i, block_q, block_k, shift, num_kv_blocks, causal,
    window_left, window_right, sink_token_length, attention_chunk,
):
    """Dynamic [j_min, j_max] KV-block band for query block i (traced ints)."""
    j_max = num_kv_blocks - 1
    wr = 0 if causal else window_right
    if causal or wr is not None:
        col_hi = i * block_q + (block_q - 1) + shift + wr
        j_max = jnp.minimum(j_max, col_hi // block_k)
    j_min = 0
    if window_left is not None and sink_token_length == 0:
        col_lo = i * block_q + shift - window_left
        j_min = jnp.maximum(0, col_lo // block_k)
    if attention_chunk > 0 and sink_token_length == 0 and window_left is None:
        rs = i * block_q + shift
        col_lo = rs - rs % attention_chunk
        j_min = jnp.maximum(0, col_lo // block_k)
    return j_min, j_max


@functools.partial(
    jax.jit,
    static_argnames=(
        "softmax_scale", "causal", "window_size", "softcap",
        "attention_chunk", "sink_token_length", "block_q", "block_k",
        "interpret", "return_lse", "dropout_p", "score_mod", "mask_mod",
        "strict_causal", "band_override",
    ),
)
def flash_attention_fwd(
    q,  # (b, h, sq, d)
    k,  # (b, h_k, sk, d)
    v,  # (b, h_k, sk, dv)
    alibi_slopes=None,  # (b, h) f32
    learnable_sink=None,  # (h,) logits
    qv=None,  # (b, h, sq, dv) MLA extra query against V
    dropout_p: float = 0.0,
    dropout_seed=None,  # uint32 scalar array
    q_descale=None,  # (b, h_k) f32 — FP8 descale
    k_descale=None,
    v_descale=None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[Optional[int], Optional[int]] = (None, None),
    softcap: float = 0.0,
    attention_chunk: int = 0,
    sink_token_length: int = 0,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    score_mod=None,  # fn(scores, b, h, rows, cols[, aux]) -> scores (natural)
    mask_mod=None,   # fn(b, h, rows, cols[, aux]) -> bool keep
    aux_tensors=None,  # tuple of arrays handed to score_mod/mask_mod
    interpret: bool = False,
    return_lse: bool = True,
    strict_causal: bool = False,  # col < row (striped ring attention)
    band_override=None,  # ((j_min,...), (j_max,...)) custom KV band per
    # q block; rows with j_max < j_min are EMPTY (their out/lse blocks are
    # never written — callers must overwrite or mask them). Used by the
    # split-edge causal driver (flash_fwd_split.py) to run a maskless bulk
    # pass over full tiles only.
    init_partial=None,  # (out_d (b,h,sq,dv) f32, lse_d (b,h,sq) f32):
    # normalized partial seeding each row's online-softmax state on its
    # first tile (split-edge driver: the diagonal pass merges for free,
    # read once per ROW). Plain path only; requires band_override.
):
    """Core fwd dispatch; layout (b, h, s, d). Returns (out, lse).

    lse is the natural-log row logsumexp of the scaled scores, shape
    (b, h, sq) fp32 (-inf for fully-masked rows).
    """
    b, h, sq, d = q.shape
    _, h_k, sk, _ = k.shape
    dv = v.shape[-1]
    assert h % h_k == 0, (h, h_k)
    assert not (q_descale is not None and softcap > 0.0), \
        "softcap + FP8 descale unsupported (reference constraint)"

    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d if qv is None else d + dv)
    window_left, window_right = normalize_window(window_size)
    if strict_causal:
        # col <= row - 1 (bottom-right aligned): the off-diagonal mask of
        # striped/zigzag ring attention (parallel/attention.py). Reuses the
        # window machinery with a genuinely negative right bound (the public
        # window_size maps -1 -> unlimited, so this needs its own flag).
        assert not causal and window_right is None, (causal, window_right)
        window_right = -1

    cfg = get_fwd_config(d, dv, sq, sk, causal)
    bq = block_q or cfg.block_q
    bk = block_k or cfg.block_k
    bq = min(bq, _next_pow2(sq))
    bk = min(bk, _next_pow2(sk))
    nq = pl.cdiv(sq, bq)
    nk = pl.cdiv(sk, bk)
    shift = sk - sq

    import os
    if (band_override is None and causal and sk >= sq
            and os.environ.get("FA_FWD_SPLIT", "1") == "1"
            and alibi_slopes is None and learnable_sink is None
            and qv is None and dropout_p == 0.0 and q_descale is None
            and softcap == 0.0 and window_left is None
            and window_right is None and attention_chunk == 0
            and sink_token_length == 0 and score_mod is None
            and mask_mod is None and not strict_causal):
        # Split-edge causal (flash_fwd_split.py): maskless bulk over full
        # tiles + masked diagonal edge, merged by the combine algebra.
        # DEFAULT-ON since round 3: measured 105.5 vs 100.4 TF/s on v5e
        # (benchmarks/r2_session.log); FA_FWD_SPLIT=0 restores the
        # single-launch causal kernel. Eligibility mirrors the split
        # driver's fallback tests, so the recursive calls it makes
        # (band_override set, or ineligible-plain) cannot re-enter this
        # gate.
        from flash_attn_tpu.kernels.flash_fwd_split import (
            flash_attention_fwd_split, fwd_split_eligible)

        if fwd_split_eligible(sq, sk, bq, bk):
            out, lse = flash_attention_fwd_split(
                q, k, v, softmax_scale=softmax_scale,
                block_q=bq, block_k=bk, interpret=interpret)
            return (out, lse) if return_lse else out

    group = h // h_k

    # Static packed band (dispatch/band.py): when the mask leaves the tile
    # space non-rectangular (causal/local/chunked), enumerate only the
    # in-band (i, j) pairs in one flat grid dimension.
    band = None
    if band_override is not None:
        jmin_s, jmax_s = band_override
        assert len(jmin_s) == nq and len(jmax_s) == nq, (nq, band_override)
        band = PackedBand(jmin_s, jmax_s)
    else:
        jmin_s, jmax_s = kv_band_static(
            nq, nk, bq, bk, shift, causal, window_left, window_right,
            sink_token_length, attention_chunk,
        )
        cand = PackedBand(jmin_s, jmax_s)
        if cand.num_tiles < nq * nk:
            band = cand

    if band is None:
        def i_of(i, j):
            return i

        def j_of(i, j):
            j_min, j_max = _kv_block_bounds(
                i, bq, bk, shift, nk, causal,
                window_left, window_right, sink_token_length, attention_chunk,
            )
            return jnp.clip(jnp.clip(j, j_min, j_max), 0, nk - 1)

        grid = (b, h, nq, nk)
    else:
        i_of = lambda t: band.i_of(t)
        j_of = lambda t: band.j_of(t)
        grid = (b, h, band.num_tiles)

    def amap(fn):
        """Wrap an (b, h, i, j)->block index fn for either grid arity."""
        if band is None:
            return lambda b_, h_, i, j: fn(b_, h_, i, j_of(i, j))
        return lambda b_, h_, t: fn(b_, h_, i_of(t), j_of(t))

    q_spec = pl.BlockSpec((1, 1, bq, d), amap(lambda b_, h_, i, j: (b_, h_, i, 0)))
    k_spec = pl.BlockSpec(
        (1, 1, bk, d), amap(lambda b_, h_, i, j: (b_, h_ // group, j, 0))
    )
    v_spec = pl.BlockSpec(
        (1, 1, bk, dv), amap(lambda b_, h_, i, j: (b_, h_ // group, j, 0))
    )
    out_spec = pl.BlockSpec(
        (1, 1, bq, dv), amap(lambda b_, h_, i, j: (b_, h_, i, 0)))
    # lse is laid out (b, h, 1, sq) inside the kernel so the seq dim rides the
    # 128-lane axis; squeezed to (b, h, sq) on return.
    lse_spec = pl.BlockSpec(
        (1, 1, 1, bq), amap(lambda b_, h_, i, j: (b_, h_, 0, i)))

    in_specs = []
    inputs = []
    # Scalars ride whole in SMEM (Mosaic requires full-array blocks there);
    # kernels index them with program_id.
    zero_map2 = amap(lambda b_, h_, i, j: (0, 0))
    zero_map3 = amap(lambda b_, h_, i, j: (0, 0, 0))
    if dropout_p > 0.0:
        assert dropout_seed is not None, "dropout needs a seed"
        in_specs.append(
            pl.BlockSpec((1, 1), zero_map2, memory_space=pltpu.SMEM)
        )
        inputs.append(jnp.asarray(dropout_seed, jnp.uint32).reshape(1, 1))
    if alibi_slopes is not None:
        in_specs.append(
            pl.BlockSpec((b, h), zero_map2, memory_space=pltpu.SMEM)
        )
        inputs.append(alibi_slopes.astype(jnp.float32))
    if learnable_sink is not None:
        in_specs.append(
            pl.BlockSpec((1, h), zero_map2, memory_space=pltpu.SMEM)
        )
        inputs.append(learnable_sink.reshape(1, h).astype(jnp.float32))
    has_descale = q_descale is not None
    if has_descale:
        ones = jnp.ones((b, h_k), jnp.float32)
        descale = jnp.stack([
            ones if q_descale is None else q_descale.astype(jnp.float32),
            ones if k_descale is None else k_descale.astype(jnp.float32),
            ones if v_descale is None else v_descale.astype(jnp.float32),
        ])
        in_specs.append(
            pl.BlockSpec((3, b, h_k), zero_map3, memory_space=pltpu.SMEM)
        )
        inputs.append(descale)
    if qv is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, bq, dv),
                         amap(lambda b_, h_, i, j: (b_, h_, i, 0))))
        inputs.append(qv)
    aux_tensors = tuple(aux_tensors) if aux_tensors else ()
    for ax in aux_tensors:
        # Whole aux array resident in VMEM for every grid step (flex
        # aux_tensors are small lookup tables — learnable biases etc.).
        nd = ax.ndim
        in_specs.append(pl.BlockSpec(
            ax.shape, amap(lambda b_, h_, i, j, nd=nd: (0,) * nd)))
        inputs.append(ax)
    if init_partial is not None:
        assert band_override is not None and dropout_p == 0.0 \
            and learnable_sink is None and q_descale is None, \
            "init_partial: split-edge driver path only"
        out_d, lse_d = init_partial
        in_specs.append(pl.BlockSpec(
            (1, 1, bq, dv), amap(lambda b_, h_, i, j: (b_, h_, i, 0))))
        inputs.append(out_d)  # any float dtype; kernel upcasts at init
        in_specs.append(pl.BlockSpec(
            (1, 1, 1, bq), amap(lambda b_, h_, i, j: (b_, h_, 0, i))))
        inputs.append(lse_d.astype(jnp.float32).reshape(b, h, 1, sq))
    in_specs += [q_spec, k_spec, v_spec]
    inputs += [q, k, v]

    kernel = functools.partial(
        _fwd_kernel,
        block_q=bq,
        block_k=bk,
        seqlen_q=sq,
        seqlen_k=sk,
        num_kv_blocks=nk,
        scale_log2=softmax_scale * LOG2E,
        softcap=softcap,
        causal=causal,
        window_left=window_left,
        window_right=window_right,
        attention_chunk=attention_chunk,
        sink_token_length=sink_token_length,
        has_alibi=alibi_slopes is not None,
        has_sink=learnable_sink is not None,
        dropout_p=dropout_p,
        num_heads=h,
        group=group,
        has_descale=has_descale,
        has_qv=qv is not None,
        score_mod=score_mod,
        mask_mod=mask_mod,
        out_dtype=jnp.bfloat16 if has_descale else q.dtype,
        band=band,
        num_aux=len(aux_tensors),
        init_partial=init_partial is not None,
    )

    from flash_attn_tpu.utils.fa_logging import log_kernel_launch
    log_kernel_launch(
        "flash_fwd", grid=grid,
        blocks={"q": (bq, d), "kv": (bk, d)},
        causal=causal, seqlen_q=sq, seqlen_k=sk, heads=h, dtype=q.dtype)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, dv),
                                 jnp.bfloat16 if has_descale else q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, sq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, dv), jnp.float32),   # output accumulator
            pltpu.VMEM((bq, 128), jnp.float32),  # running max (base-2)
            pltpu.VMEM((bq, 128), jnp.float32),  # running denom
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("parallel", "parallel", "arbitrary") if band is not None
                else ("parallel", "parallel", "parallel", "arbitrary")),
            # 2 concurrently-live (bq, bk) fp32 temps (scores + exp),
            # measured 16.64M at (2048, 1024) — r2_session.log
            vmem_limit_bytes=scoped_vmem_limit(bq, bk, 2),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * sq * sk * (d + dv) // (2 if causal else 1),
            bytes_accessed=(
                q.size * q.dtype.itemsize
                + k.size * k.dtype.itemsize * group
                + v.size * v.dtype.itemsize * group
                + b * h * sq * dv * q.dtype.itemsize
            ),
            transcendentals=b * h * sq * sk // (2 if causal else 1),
        ),
        interpret=interpret,
    )(*inputs)
    lse = lse[:, :, 0, :]
    if return_lse:
        return out, lse
    return out


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p
