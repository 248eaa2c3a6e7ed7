"""Software-pipelined (paired-tile) flash-attention forward.

The forward mainloop (flash_fwd.py) serializes, per KV tile, the S = QK^T
matmul, the online-softmax VPU chain, and the PV matmul — a straight
dataflow line Mosaic cannot overlap. Processing TWO consecutive KV tiles
per grid step opens static scheduling slack: tile B's S matmul is
independent of tile A's softmax, and tile A's PV is independent of tile
B's softmax, so the MXU can stay busy while the VPU works (the
static-scheduling analogue of FA3's pingpong softmax overlap,
hopper/mainloop_fwd_sm90_tma_gmma_ws.hpp).

Layout is bshd-native (public layout, d % 128 == 0): q/k/v stream from
(b, s, h*d) views with the head picked by the index map — no transposes on
the public flash_attn_func path.

Row pairing uses PackedBandEven (dispatch/band.py): each q-row's tile
count is padded to even, so a pair never straddles a row — the pair shares
one q block and the out/lse epilogue stays block-spec'd. Pad slots re-read
the row's last KV block and are gated out of the softmax state with three
narrow selects (m, l, acc) — garbage from the dead tile is *selected*
away, never multiplied.

Feature scope: causal/local/chunked/sink masks, softcap, ALiBi, dropout,
band-mask fast path. FP8 descale, MLA qv, and flex score_mod/mask_mod stay
on the unpaired kernel (interface dispatch falls back).
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.dispatch.band import PackedBandEven, kv_band_static
from flash_attn_tpu.dispatch.bandmask import BandMaskCfg, band_mask_config
from flash_attn_tpu.dispatch.config import get_fwd_config, normalize_window
from flash_attn_tpu.kernels.dropout_rng import dropout_keep

LOG2E = math.log2(math.e)
LN2 = math.log(2.0)
NEG_INF = float("-inf")


def _fwd_paired_kernel(*refs, band: PackedBandEven, block_q, block_k,
                       seqlen_q, seqlen_k, scale_log2, softcap, causal,
                       window_left, window_right, attention_chunk,
                       sink_token_length, has_alibi, has_sink, dropout_p,
                       num_heads, group, out_dtype, has_descale, has_qv,
                       bmask: Optional[BandMaskCfg]):
    refs = list(refs)
    seed_ref = refs.pop(0) if dropout_p > 0.0 else None
    slopes_ref = refs.pop(0) if has_alibi else None
    sink_ref = refs.pop(0) if has_sink else None
    descale_ref = refs.pop(0) if has_descale else None  # (3, b, h_k) SMEM
    qv_ref = refs.pop(0) if has_qv else None  # (1, bq, dv), shared per row
    bmask_ref = refs.pop(0) if bmask is not None else None
    (q_ref, k0_ref, v0_ref, k1_ref, v1_ref,
     out_ref, lse_ref, acc, m_s, l_s) = refs

    b_idx = pl.program_id(0)
    h_idx = pl.program_id(1)
    u = pl.program_id(2)
    shift = seqlen_k - seqlen_q
    kh_idx = h_idx // group

    t0 = 2 * u
    i, j0_raw, jmax_i, row_first, row_last = band.decode(t0)
    j0 = jnp.minimum(j0_raw, jmax_i)
    j1_raw = j0_raw + 1
    j1 = jnp.minimum(j1_raw, jmax_i)
    live1 = j1_raw <= jmax_i  # pad slots only ever land on the odd slot

    @pl.when(t0 == row_first)
    def _init():
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)
        acc[...] = jnp.zeros_like(acc)

    q = q_ref[0]  # (bq, d)
    if has_descale:
        q = q.astype(jnp.bfloat16)

    def scores(k_ref_t, v, j):
        """Masked base-2 scores for KV block j (mirrors _fwd_kernel)."""
        k = k_ref_t[0]  # (bk, d)
        if has_descale:
            k = k.astype(jnp.bfloat16)
        if softcap > 0.0:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (scale_log2 / LOG2E)
            s = jnp.tanh(s / softcap) * softcap
            s2 = s * LOG2E
        elif has_descale:
            # FP8 path: per-(batch, kv-head) q/k descales fold into the
            # softmax scale (reference hopper/flash.h:54-62).
            qd = descale_ref[0, b_idx, kh_idx]
            kd = descale_ref[1, b_idx, kh_idx]
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
        if has_qv:
            # MLA qv term (reference cute/interface.py:3471):
            # scores += scale * qv . v
            qvs = (qv_ref[0].astype(jnp.float32) * scale_log2
                   ).astype(v.dtype)
            s2 = s2 + jax.lax.dot_general(
                qvs, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if has_alibi:
            slope = slopes_ref[b_idx, h_idx]
            rows = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0)
            cols = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1)
            if causal:
                bias = jnp.broadcast_to(
                    (cols - (seqlen_k - 1)).astype(jnp.float32),
                    (block_q, block_k))
            else:
                bias = -jnp.abs(rows + shift - cols).astype(jnp.float32)
            s2 = s2 + slope * LOG2E * bias

        if bmask is not None:
            o = pl.multiple_of(bmask.offset(i, j), 128)
            s2 = s2 + bmask_ref[:, pl.ds(o, block_k)]
        else:
            rows = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0)
            cols = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1)
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
                valid = _and(valid, jnp.logical_and(
                    cols >= limit, cols < limit + attention_chunk))
            if seqlen_k % block_k != 0:
                valid = _and(valid, jnp.broadcast_to(
                    cols < seqlen_k, (block_q, block_k)))
            if valid is not None:
                s2 = jnp.where(valid, s2, NEG_INF)
        return s2

    def tile(k_ref_t, v_ref_t, j, live):
        """Online-softmax update for one KV tile; ``live`` gates the state
        update (False only on the odd-count pad slot). Dead-tile garbage is
        removed by SELECTS on the narrow state arrays — never multiplied."""
        v = v_ref_t[0]  # (bk, dv)
        if has_descale:
            v = v.astype(jnp.bfloat16)
        if seqlen_k % block_k != 0:
            kv_rows = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, v.shape, 0)
            v = jnp.where(kv_rows < seqlen_k, v, 0)
        s2 = scores(k_ref_t, v, j)
        m_prev = m_s[...]
        l_prev = l_s[...]
        row_max = jnp.max(s2, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, jnp.broadcast_to(row_max, m_prev.shape))
        m_safe = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp2(s2 - m_safe[:, :1])
        corr = jnp.exp2(m_prev - m_safe)
        row_sum = jnp.sum(p, axis=-1, keepdims=True)
        l_new = l_prev * corr + jnp.broadcast_to(row_sum, l_prev.shape)
        if dropout_p > 0.0:
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
        acc_new = acc[...] * corr[:, :1] + pv
        if isinstance(live, bool):
            m_s[...] = m_new
            l_s[...] = l_new
            acc[...] = acc_new
        else:
            m_s[...] = jnp.where(live, m_new, m_prev)
            l_s[...] = jnp.where(live, l_new, l_prev)
            acc[...] = jnp.where(live, acc_new, acc[...])

    tile(k0_ref, v0_ref, j0, True)
    tile(k1_ref, v1_ref, j1, live1)

    @pl.when(t0 + 1 == row_last)
    def _epilogue():
        m = m_s[:, :1]
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
            inv_l = inv_l * descale_ref[2, b_idx, kh_idx]
        out_ref[0] = (o * inv_l).astype(out_dtype)
        lse_ref[0, 0, 0] = lse[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "softmax_scale", "causal", "window_size", "softcap",
        "attention_chunk", "sink_token_length", "block_q", "block_k",
        "interpret", "dropout_p", "strict_causal", "band_override",
    ),
)
def flash_attention_fwd_paired(
    q,  # (b, sq, h, d)    — bshd public layout
    k,  # (b, sk, h_k, d)
    v,  # (b, sk, h_k, dv)
    alibi_slopes=None,
    learnable_sink=None,
    qv=None,  # (b, sq, h, dv) MLA extra query against V
    dropout_p: float = 0.0,
    dropout_seed=None,
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
    interpret: bool = False,
    strict_causal: bool = False,
    band_override=None,  # ((j_min,...), (j_max,...)) custom per-q-block KV
    # band; rows with j_max < j_min are EMPTY (out/lse never written —
    # callers must overwrite/mask them). Used by the split-edge driver.
):
    """Paired-tile forward; bshd in/out. Returns (out, lse) with lse
    (b, h, sq) fp32 natural-log — same contract as flash_attention_fwd
    modulo layout."""
    b, sq, h, d = q.shape
    _, sk, h_k, _ = k.shape
    dv = v.shape[-1]
    group = h // h_k
    assert d % 128 == 0 and dv % 128 == 0, (d, dv)
    has_descale = (q_descale is not None or k_descale is not None
                   or v_descale is not None)
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d if qv is None else d + dv)
    window_left, window_right = normalize_window(window_size)
    if strict_causal:
        assert not causal and window_right is None, (causal, window_right)
        window_right = -1

    cfg = get_fwd_config(d, dv, sq, sk, causal)
    bq = min(block_q or cfg.block_q, _next_pow2(sq))
    bk = min(block_k or cfg.block_k, _next_pow2(sk))
    nq = pl.cdiv(sq, bq)
    nk = pl.cdiv(sk, bk)
    shift = sk - sq

    if band_override is not None:
        jmin_s, jmax_s = band_override
        assert len(jmin_s) == nq and len(jmax_s) == nq, (nq, band_override)
    else:
        jmin_s, jmax_s = kv_band_static(
            nq, nk, bq, bk, shift, causal, window_left, window_right,
            sink_token_length, attention_chunk,
        )
    band = PackedBandEven(jmin_s, jmax_s)
    bmask = band_mask_config(
        causal=causal, window_left=window_left, window_right=window_right,
        attention_chunk=attention_chunk, mask_mod=None, shift=shift,
        seqlen_k=sk, block_q=bq, block_k=bk, j_min=jmin_s, j_max=jmax_s,
    )

    grid = (b, h, band.num_pairs)

    def amap(which, fn):
        def m(b_, h_, u):
            t = 2 * u + which
            i, j_raw, jmax_i, _, _ = band.decode(t)
            return fn(b_, h_, i, jnp.minimum(j_raw, jmax_i))
        return m

    q_in = q.reshape(b, sq, h * d)
    k_in = k.reshape(b, sk, h_k * d)
    v_in = v.reshape(b, sk, h_k * dv)

    in_specs = []
    inputs = []
    if dropout_p > 0.0:
        assert dropout_seed is not None, "dropout needs a seed"
        in_specs.append(pl.BlockSpec(
            (1, 1), lambda b_, h_, u: (0, 0), memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(dropout_seed, jnp.uint32).reshape(1, 1))
    if alibi_slopes is not None:
        in_specs.append(pl.BlockSpec(
            (b, h), lambda b_, h_, u: (0, 0), memory_space=pltpu.SMEM))
        inputs.append(alibi_slopes.astype(jnp.float32))
    if learnable_sink is not None:
        in_specs.append(pl.BlockSpec(
            (1, h), lambda b_, h_, u: (0, 0), memory_space=pltpu.SMEM))
        inputs.append(learnable_sink.reshape(1, h).astype(jnp.float32))
    if has_descale:
        ones = jnp.ones((b, h_k), jnp.float32)
        descale = jnp.stack([
            ones if q_descale is None else q_descale.astype(jnp.float32),
            ones if k_descale is None else k_descale.astype(jnp.float32),
            ones if v_descale is None else v_descale.astype(jnp.float32),
        ])
        in_specs.append(pl.BlockSpec(
            (3, b, h_k), lambda b_, h_, u: (0, 0, 0),
            memory_space=pltpu.SMEM))
        inputs.append(descale)
    if qv is not None:
        in_specs.append(pl.BlockSpec(
            (1, bq, dv), amap(0, lambda b_, h_, i, j: (b_, i, h_))))
        inputs.append(qv.reshape(b, sq, h * dv))
    if bmask is not None:
        in_specs.append(pl.BlockSpec(
            (bq, bmask.width), lambda b_, h_, u: (0, 0)))
        inputs.append(bmask.build())

    in_specs += [
        pl.BlockSpec((1, bq, d), amap(0, lambda b_, h_, i, j: (b_, i, h_))),
        pl.BlockSpec((1, bk, d),
                     amap(0, lambda b_, h_, i, j: (b_, j, h_ // group))),
        pl.BlockSpec((1, bk, dv),
                     amap(0, lambda b_, h_, i, j: (b_, j, h_ // group))),
        pl.BlockSpec((1, bk, d),
                     amap(1, lambda b_, h_, i, j: (b_, j, h_ // group))),
        pl.BlockSpec((1, bk, dv),
                     amap(1, lambda b_, h_, i, j: (b_, j, h_ // group))),
    ]
    inputs += [q_in, k_in, v_in, k_in, v_in]

    out_spec = pl.BlockSpec(
        (1, bq, dv), amap(0, lambda b_, h_, i, j: (b_, i, h_)))
    lse_spec = pl.BlockSpec(
        (1, 1, 1, bq), amap(0, lambda b_, h_, i, j: (b_, h_, 0, i)))

    kernel = functools.partial(
        _fwd_paired_kernel,
        band=band, block_q=bq, block_k=bk, seqlen_q=sq, seqlen_k=sk,
        scale_log2=softmax_scale * LOG2E, softcap=softcap, causal=causal,
        window_left=window_left, window_right=window_right,
        attention_chunk=attention_chunk,
        sink_token_length=sink_token_length,
        has_alibi=alibi_slopes is not None,
        has_sink=learnable_sink is not None,
        dropout_p=dropout_p, num_heads=h, group=group,
        out_dtype=jnp.bfloat16 if has_descale else q.dtype,
        has_descale=has_descale, has_qv=qv is not None, bmask=bmask,
    )

    from flash_attn_tpu.utils.fa_logging import log_kernel_launch
    log_kernel_launch(
        "flash_fwd_paired", grid=grid,
        blocks={"q": (bq, d), "kv": (bk, d)},
        causal=causal, seqlen_q=sq, seqlen_k=sk, heads=h, dtype=q.dtype,
        bandmask=bmask is not None)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, h * dv),
                                 jnp.bfloat16 if has_descale else q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, sq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, dv), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # paired tiles double the live intermediates; the 16 MiB scoped
            # default rejects the large-tile configs (v5e has ~128 MiB)
            vmem_limit_bytes=100 * 1024 * 1024,
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
    return out.reshape(b, sq, h, dv), lse[:, :, 0, :]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p
