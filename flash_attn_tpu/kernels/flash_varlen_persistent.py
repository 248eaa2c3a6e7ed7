"""Persistent streaming varlen flash attention forward (round 5).

The round-4 banded kernel (flash_varlen.py) walks each q tile's KV band
with an in-kernel double-buffered DMA loop, but the walk restarts at every
grid step: at mixed lengths the bands are 2-6 tiles, so each of the
h x NQ grid steps exposes a full DMA prologue (~3-6 us) — measured ~59% of
the dense bar (DESIGN.md round-4 honest note).

This kernel is the TPU answer to the reference's *persistent* varlen
scheduler (flash_attn/cute/tile_scheduler.py:1398
DynamicPersistentVarlenScheduler; hopper/tile_scheduler.hpp:368): ONE grid
step per head walks a flat work list of (q tile, kv tile) items covering
every band back-to-back, with a 4-deep statically-slotted KV DMA pipeline
that streams ACROSS band boundaries — the pipeline never drains between q
tiles, so the per-band prologue disappears and DMA latency is hidden 4
tiles deep (vs 2 in the banded kernel).

Work items are derived in-kernel from two small per-q-tile arrays
(scalar-prefetch SMEM):

  cumlens[i] = number of items before q tile i  (cumlens[NQ] = total T)
  jstart[i]  = first KV tile of q tile i's band

Item t belongs to group i with cumlens[i] <= t < cumlens[i+1] and walks
KV tile jstart[i] + (t - cumlens[i]). Every group has >= 1 item (empty
bands walk one fully-masked tile, which the segment mask zeroes), so the
group pointer advances by at most one per item — a single carried int with
one SMEM compare replaces the reference's per-tile work-stealing atomic
(no global atomics on TPU; the schedule is precomputed, which also makes
it deterministic for free).

Q-side tiles (q, packed sideband, optional ALiBi slopes) are prefetched
one group ahead into a next-slot and copied to a current-slot at group
start (static slots; the copy is folded into the per-group q scaling
pass). Outputs are written by manual DMA from a 2-slot ping-pong, waited
two groups later, with a static drain at kernel end.
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.dispatch.config import (
    get_fwd_config,
    normalize_window,
    scoped_vmem_limit,
)
from flash_attn_tpu.dispatch.varlen_meta import (
    K_PAD_SEG,
    compute_varlen_meta,
)
from flash_attn_tpu.kernels.dropout_rng import dropout_keep
from flash_attn_tpu.kernels.flash_varlen import _varlen_mask_and_bias

LOG2E = math.log2(math.e)
LN2 = math.log(2.0)
NEG_INF = float("-inf")

NBUF = 4  # KV pipeline depth (static slots, loop unrolled by NBUF)

# Perf-probe knob (round-5 floor characterization, wrong numerics when set):
# 1 = skip the mask chain, 2 = skip mask + online softmax (matmuls only)
import os as _os
_PROBE = int(_os.environ.get("FA_VARLEN_PROBE", "0"))


def _varlen_fwd_persistent_kernel(
    cumlens_ref,  # (NQ+1,) int32 scalar prefetch
    jstart_ref,   # (NQ,) int32
    *refs,
    block_q, block_k, num_q_tiles, num_k_tiles, num_seqs, group,
    scale_log2, softcap, causal, window_left, window_right, attention_chunk,
    has_alibi, dropout_p, out_dtype, has_sink,
):
    refs = list(refs)
    seed_ref = refs.pop(0) if dropout_p > 0.0 else None
    sink_ref = refs.pop(0) if has_sink else None
    slope_ref = refs.pop(0) if has_alibi else None  # (b, h) f32 SMEM
    (q_hbm, sbq_ref, sbk_hbm, k_hbm, v_hbm, out_hbm, lse_hbm,
     acc, m_s, l_s, qcur, qnext, slbuf,
     kbuf, vbuf, sbuf, obuf, lsebuf, qsems, kvsems, osems) = refs

    h_idx = pl.program_id(0)
    hk = h_idx // group
    NQ = num_q_tiles
    T = cumlens_ref[NQ]

    # ---------------- DMA builders (all slots static) ----------------
    def q_dmas(i):
        off = i * block_q
        return [
            pltpu.make_async_copy(
                q_hbm.at[h_idx, pl.ds(off, block_q), :], qnext,
                qsems.at[0]),
        ]

    def kv_dmas(slot, j):
        off = j * block_k
        return [
            pltpu.make_async_copy(
                k_hbm.at[hk, pl.ds(off, block_k), :], kbuf.at[slot],
                kvsems.at[slot, 0]),
            pltpu.make_async_copy(
                v_hbm.at[hk, pl.ds(off, block_k), :], vbuf.at[slot],
                kvsems.at[slot, 1]),
            pltpu.make_async_copy(
                sbk_hbm.at[:, pl.ds(off, block_k)], sbuf.at[slot],
                kvsems.at[slot, 2]),
        ]

    def out_dmas(p, i):
        off = i * block_q
        return [
            pltpu.make_async_copy(
                obuf.at[p], out_hbm.at[h_idx, pl.ds(off, block_q), :],
                osems.at[p, 0]),
            pltpu.make_async_copy(
                lsebuf.at[p], lse_hbm.at[h_idx, :, pl.ds(off, block_q)],
                osems.at[p, 1]),
        ]

    def advance(ptr, t):
        """Group pointer for item t given the pointer for item t-1 (bands
        are never empty, so one compare suffices)."""
        nxt = jnp.minimum(ptr + 1, NQ - 1)
        return jnp.where(t >= cumlens_ref[jnp.minimum(ptr + 1, NQ)],
                         nxt, ptr)

    # ---------------- prologue ----------------
    for c in q_dmas(0):
        c.start()
    ipf = jnp.int32(0)
    for t in range(NBUF):
        if t > 0:
            ipf = advance(ipf, t)
        jpf = jstart_ref[ipf] + (t - cumlens_ref[ipf])

        @pl.when(t < T)
        def _(jpf=jpf, t=t):
            for c in kv_dmas(t, jpf):
                c.start()

    # ---------------- group start / end helpers ----------------
    def group_start(i):
        """Stage the (already-waited) next q tile into the current slot,
        issue group i+1's q prefetch, reset accumulators. No scaling pass:
        the softmax scale is folded into K on the host, so q stays raw and
        a fresh group costs one scaled VMEM copy."""
        for c in q_dmas(i):  # reconstructed: wait on the same sems/sizes
            c.wait()
        qv = qnext[...]
        if softcap > 0.0:
            qcur[...] = qv  # softcap needs natural-scale scores
        else:
            qcur[...] = (qv.astype(jnp.float32) * scale_log2).astype(qv.dtype)
        if has_alibi:
            # per-row slope from the SMEM (b, h) table via segment select
            # (no per-token slope stream: Mosaic rejects lane<128 DMAs)
            seg = sbq_ref[i, :, 0:1]
            sl = jnp.zeros((block_q, 1), jnp.float32)
            for s in range(num_seqs):
                sl = jnp.where(seg == s, slope_ref[s, h_idx], sl)
            slbuf[...] = sl

        @pl.when(i + 1 < NQ)
        def _():
            for c in q_dmas(i + 1):
                c.start()

        acc[...] = jnp.zeros_like(acc)
        m_s[...] = jnp.full_like(m_s, NEG_INF)
        l_s[...] = jnp.zeros_like(l_s)

    def epilogue_slot(p, i):
        """Finalize the online softmax and write group i's outputs through
        ping-pong slot p (static)."""
        # the slot's previous DMA (group i-2) must have landed
        @pl.when(i >= 2)
        def _():
            for c in out_dmas(p, i - 2):
                c.wait()
        m = m_s[:, :1]
        l = l_s[:, :1]
        if has_sink:
            sink = sink_ref[0, h_idx].astype(jnp.float32)
            m_nat = m * LN2
            m_tot = jnp.maximum(m_nat, sink)
            l_tot = l * jnp.exp(m_nat - m_tot) + jnp.exp(sink - m_tot)
            o = acc[...] * jnp.exp(m_nat - m_tot)
            lse = m_tot + jnp.log(l_tot)
            l = l_tot
        else:
            o = acc[...]
            lse = m * LN2 + jnp.log(l)
        inv_l = jnp.where(l == 0.0, 0.0, 1.0 / l)
        if dropout_p > 0.0:
            inv_l = inv_l / (1.0 - dropout_p)
        obuf[p] = (o * inv_l).astype(out_dtype)
        lsebuf[p] = jnp.swapaxes(lse, 0, 1)  # lane-major for the DMA
        for c in out_dmas(p, i):
            c.start()

    # ---------------- main walk ----------------
    def score_tile(q, slot):
        """QK^T for one item (q pre-scaled at group start; base-2 space)."""
        k = kbuf[slot]        # (bk, d)
        if softcap > 0.0:
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (scale_log2 / LOG2E)
            tt = jnp.tanh(s / softcap)
            return tt * softcap * LOG2E
        return jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def tile_compute(slot, i, j):
        for c in kv_dmas(slot, j):
            c.wait()
        s2 = score_tile(qcur[...], slot)
        v = vbuf[slot]        # (bk, dv)
        sb = sbuf[slot]       # (4, bk) int32

        if _PROBE == 2:  # matmuls only: no mask, no online softmax
            pv = jax.lax.dot_general(
                s2.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc[...] = acc[...] + pv
            return
        if _PROBE != 1:
            seg_k = sb[0:1]           # (1, bk)
            pos_k = sb[1:2]
            v = jnp.where(sb[2:3].reshape(block_k, 1) > 0, v, 0)
            slope = slbuf[...] if has_alibi else None  # (bq, 1)
            s2, _ = _varlen_mask_and_bias(
                s2, sbq_ref[i, :, 0:1], sbq_ref[i, :, 1:2],
                sbq_ref[i, :, 2:3],
                sbq_ref[i, :, 3:4], seg_k, pos_k, slope,
                causal=causal, window_left=window_left,
                window_right=window_right,
                attention_chunk=attention_chunk, softcap_dtanh=None,
            )

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
        if dropout_p > 0.0:
            drows = i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            dcols = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            keep = dropout_keep(seed_ref[0, 0], h_idx, drows, dcols,
                                dropout_p)
            p = jnp.where(keep, p, 0.0)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc[...] = acc[...] * corr[:, :1] + pv

    def loop_body(mm, carry):
        i, ipf = carry
        for u in range(NBUF):
            t = NBUF * mm + u
            i = advance(i, t)
            valid = t < T
            first = jnp.logical_and(valid, t == cumlens_ref[i])
            last = jnp.logical_and(valid, t == cumlens_ref[i + 1] - 1)
            j = jstart_ref[i] + (t - cumlens_ref[i])

            @pl.when(first)
            def _(i=i):
                group_start(i)

            @pl.when(valid)
            def _(u=u, i=i, j=j):
                tile_compute(u, i, j)

            # prefetch item t+NBUF into this slot (now free)
            tpf = t + NBUF
            ipf = jnp.where(tpf < T, advance(ipf, tpf), ipf)
            jpf = jstart_ref[ipf] + (tpf - cumlens_ref[ipf])

            @pl.when(tpf < T)
            def _(u=u, jpf=jpf):
                for c in kv_dmas(u, jpf):
                    c.start()

            @pl.when(jnp.logical_and(last, i % 2 == 0))
            def _(i=i):
                epilogue_slot(0, i)

            @pl.when(jnp.logical_and(last, i % 2 == 1))
            def _(i=i):
                epilogue_slot(1, i)

        return (i, ipf)

    # ipf enters the loop pointing at item NBUF-1's group (the prologue's
    # last issued item); the first in-loop prefetch advances it to t+NBUF.
    jax.lax.fori_loop(0, (T + NBUF - 1) // NBUF, loop_body,
                      (jnp.int32(0), ipf))

    # static drain: the last two groups' output DMAs are still in flight
    for c in out_dmas((NQ - 1) % 2, NQ - 1):
        c.wait()
    if NQ >= 2:
        for c in out_dmas((NQ - 2) % 2, NQ - 2):
            c.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_seqlen_q", "max_seqlen_k", "softmax_scale", "causal",
        "window_size", "softcap", "attention_chunk", "block_q", "block_k",
        "interpret", "dropout_p",
    ),
)
def flash_attention_varlen_fwd_persistent(
    q,  # (total_q, h, d)
    k,  # (total_k, h_k, d)
    v,  # (total_k, h_k, dv)
    cu_seqlens_q,
    cu_seqlens_k,
    max_seqlen_q: int,
    max_seqlen_k: int,
    seqused_q=None,
    seqused_k=None,
    alibi_slopes=None,
    learnable_sink=None,
    dropout_p: float = 0.0,
    dropout_seed=None,
    softmax_scale: Optional[float] = None,
    causal: bool = False,
    window_size: Tuple[Optional[int], Optional[int]] = (None, None),
    softcap: float = 0.0,
    attention_chunk: int = 0,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    meta=None,
    interpret: bool = False,
):
    """Returns (out (total_q, h, dv), lse (h, total_q) fp32)."""
    total_q, h, d = q.shape
    total_k, h_k, _ = k.shape
    dv = v.shape[-1]
    group = h // h_k
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)
    window_left, window_right = normalize_window(window_size)

    cfg = get_fwd_config(d, dv, max_seqlen_q, max_seqlen_k, causal)
    bq = min(block_q or cfg.block_q, _next_pow2(total_q))
    bk = min(block_k or cfg.block_k, _next_pow2(total_k))
    nq = pl.cdiv(total_q, bq)
    nk = pl.cdiv(total_k, bk)

    if meta is None:
        meta = compute_varlen_meta(
            cu_seqlens_q, cu_seqlens_k, bq, bk, nq, nk,
            causal=causal, window_left=window_left, window_right=window_right,
            seqused_q=seqused_q, seqused_k=seqused_k,
            attention_chunk=attention_chunk,
        )
    # flat work list: every q tile walks >= 1 item (empty bands walk one
    # fully-masked tile so the group pointer always advances)
    nonempty = meta.jband_max >= meta.jband_min
    blen = jnp.where(nonempty, meta.jband_max - meta.jband_min + 1, 1)
    jstart = jnp.where(nonempty, meta.jband_min, 0).astype(jnp.int32)
    cumlens = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(blen).astype(jnp.int32)])

    shift_q = meta.sk_of_q - meta.sq_of_q
    kvalid = (meta.seg_k != K_PAD_SEG).astype(jnp.int32)

    total_q_pad = nq * bq
    total_k_pad = nk * bk
    qt = jnp.swapaxes(q, 0, 1)
    kt = jnp.swapaxes(k, 0, 1)
    vt = jnp.swapaxes(v, 0, 1)
    if total_q_pad != total_q:
        qt = jnp.pad(qt, ((0, 0), (0, total_q_pad - total_q), (0, 0)))
    if total_k_pad != total_k:
        pad = ((0, 0), (0, total_k_pad - total_k), (0, 0))
        kt = jnp.pad(kt, pad)
        vt = jnp.pad(vt, pad)
    # q sideband pre-tiled (NQ, bq, 4): one contiguous leading-dim DMA per
    # group (a flat (total, 4) array lane-pads to 128 in VMEM and Mosaic
    # rejects lane-dim-4 slices); columns = seg / pos / shift / sk
    sbq = jnp.stack(
        [meta.seg_q, meta.pos_q, shift_q, meta.sk_of_q], axis=1
    ).astype(jnp.int32).reshape(nq, bq, 4)
    # kv sideband LANE-major (4, total_k_pad) as in the banded kernel
    sbk = jnp.stack([
        meta.seg_k, meta.pos_k, kvalid,
        jnp.zeros_like(kvalid)]).astype(jnp.int32)

    in_specs = []
    inputs = []
    if dropout_p > 0.0:
        assert dropout_seed is not None
        in_specs.append(pl.BlockSpec((1, 1), lambda h_, *_: (0, 0),
                                     memory_space=pltpu.SMEM))
        inputs.append(jnp.asarray(dropout_seed, jnp.uint32).reshape(1, 1))
    if learnable_sink is not None:
        in_specs.append(pl.BlockSpec(
            (1, h), lambda h_, *_: (0, 0), memory_space=pltpu.SMEM))
        inputs.append(learnable_sink.reshape(1, h).astype(jnp.float32))
    b = cu_seqlens_q.shape[0] - 1
    if alibi_slopes is not None:
        in_specs.append(pl.BlockSpec(
            (b, h), lambda h_, *_: (0, 0), memory_space=pltpu.SMEM))
        inputs.append(alibi_slopes.astype(jnp.float32).reshape(b, h))
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    # q sideband is a whole-array VMEM-resident input: tiny, read directly
    # per tile (a streamed lane-4 slice is rejected by Mosaic tiling rules)
    in_specs += [any_spec, pl.BlockSpec(memory_space=pltpu.VMEM),
                 any_spec, any_spec, any_spec]
    inputs += [qt, sbq, sbk, kt, vt]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(h,),
        in_specs=in_specs,
        out_specs=[any_spec, any_spec],
        scratch_shapes=[
            pltpu.VMEM((bq, dv), jnp.float32),        # acc
            pltpu.VMEM((bq, 128), jnp.float32),       # m
            pltpu.VMEM((bq, 128), jnp.float32),       # l
            pltpu.VMEM((bq, d), q.dtype),             # qcur
            pltpu.VMEM((bq, d), q.dtype),             # qnext
            pltpu.VMEM((bq, 1), jnp.float32),         # slbuf (alibi)
            pltpu.VMEM((NBUF, bk, d), k.dtype),       # K stream
            pltpu.VMEM((NBUF, bk, dv), v.dtype),      # V stream
            pltpu.VMEM((NBUF, 4, bk), jnp.int32),     # kv sideband stream
            pltpu.VMEM((2, bq, dv), q.dtype),         # out ping-pong
            pltpu.VMEM((2, 1, bq), jnp.float32),      # lse ping-pong
            pltpu.SemaphoreType.DMA((1,)),            # q-side sem
            pltpu.SemaphoreType.DMA((NBUF, 3)),       # kv sems
            pltpu.SemaphoreType.DMA((2, 2)),          # out sems
        ],
    )

    kernel = functools.partial(
        _varlen_fwd_persistent_kernel,
        block_q=bq, block_k=bk, num_q_tiles=nq, num_k_tiles=nk,
        num_seqs=b, group=group,
        scale_log2=softmax_scale * LOG2E, softcap=softcap, causal=causal,
        window_left=window_left, window_right=window_right,
        attention_chunk=attention_chunk,
        has_alibi=alibi_slopes is not None, dropout_p=dropout_p,
        out_dtype=q.dtype, has_sink=learnable_sink is not None,
    )

    from flash_attn_tpu.utils.fa_logging import log_kernel_launch
    log_kernel_launch(
        "flash_varlen_fwd_persistent", blocks={"q": (bq, d), "kv": (bk, d)},
        total_q=total_q, heads=h, causal=causal, streaming=True)

    out_t, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((h, total_q_pad, dv), q.dtype),
            jax.ShapeDtypeStruct((h, 1, total_q_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            # the VMEM-resident q sideband lane-pads 4 -> 128
            vmem_limit_bytes=(scoped_vmem_limit(bq, bk, 5) or 16 * 2**20)
            + nq * bq * 128 * 4,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * h * total_q * (total_k // max(1, nq)) * d,
            bytes_accessed=2 * (h * total_q * (d + dv)
                                + h * total_k_pad * (d + dv)),
            transcendentals=h * total_q * total_k // max(1, nq),
        ),
        interpret=interpret,
    )(cumlens, jstart, *inputs)
    return jnp.swapaxes(out_t[:, :total_q], 0, 1), lse[:, 0, :total_q]


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p
