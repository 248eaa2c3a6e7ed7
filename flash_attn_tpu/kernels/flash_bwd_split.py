"""Split-edge causal backward: maskless bulk + masked diagonal edge.

Same decomposition as the forward split (flash_fwd_split.py) applied to the
fused single-pass backward: the causal tile band is partitioned into the
tiles FULLY below the diagonal (run with causal=False over a band override,
so no mask code traces in) and the 1..ceil(bq/bk)+1 diagonal-straddling
tiles per q block (run with the standard masked causal kernel). Gradients
over disjoint tile sets are ADDITIVE — dQ/dK/dV partials merge with one
elementwise add, no LSE algebra (unlike the forward's combine). Both passes
share the same forward lse/delta, because p_ij = exp2(s_ij - lse_i) is
defined per tile independently of which pass computes it.

Reference analogue: the CUDA backward splits each column block's iteration
range into masking/non-masking phases in-kernel
(csrc/flash_attn/src/flash_bwd_kernel.h:81 compute_dq_dk_dv_1colblock);
Mosaic loses software pipelining across such branches (measured 86.5 ->
72.7 TF/s, DESIGN.md), so on TPU the phases become two launches.
"""

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flash_attn_tpu.dispatch.config import (
    get_bwd_config,
    scoped_vmem_limit,
    scoped_vmem_ok,
)
from flash_attn_tpu.kernels.flash_bwd import _next_pow2
from flash_attn_tpu.kernels.flash_bwd_fused import (
    fits_vmem,
    flash_attention_bwd_fused,
)
from flash_attn_tpu.kernels.flash_fwd_split import split_bands

LOG2E = math.log2(math.e)


def flash_attention_bwd_split(
    do,   # (b, sq, h, dv) — bshd like flash_attention_bwd_fused
    q,    # (b, sq, h, d)
    k,    # (b, sk, h_k, d)
    v,    # (b, sk, h_k, dv)
    out,  # (b, sq, h, dv)
    lse,  # (b, h, sq)
    softmax_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
):
    """Causal-only split-edge fused backward. Returns (dq, dk, dv) like
    flash_attention_bwd_fused(causal=True). Plain hot path only."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    dv_dim = v.shape[-1]
    shift = sk - sq
    assert shift >= 0, (sq, sk)
    if softmax_scale is None:
        softmax_scale = 1.0 / math.sqrt(d)

    # Split-specific default tiles, re-measured round 4 WITH head folding
    # (flash_bwd_fused hf) and device-loop timing (benchmarks/r4_bwd_s4k.log):
    # seq4k causal d128: (512,512)@hf8 115.4 gold > (1024,512)@hf8 109.4;
    # seq8k: (1024,512) 127.9 > (512,512) 125.7 > (1024,1024) 125.9.
    # Shorter seqs have shorter bulk rows — the ~18us/row block-switch cost
    # favors the smaller q tile; at 8k+ row length amortizes it and the
    # taller tile's K/V reuse wins.
    cfg = get_bwd_config(d, dv_dim, sq, sk, True)
    bq_default = 1024 if sq >= 8192 else max(cfg.block_q, 512)
    bq = min(block_q or bq_default, _next_pow2(sq))
    bk = min(block_k or cfg.block_k, _next_pow2(sk))

    def fallback():
        return flash_attention_bwd_fused(
            do, q, k, v, out, lse, softmax_scale=softmax_scale,
            causal=True, block_q=block_q, block_k=block_k,
            interpret=interpret)

    if sq % bq != 0 or sk % bk != 0:
        return fallback()  # boundary masks break the maskless-bulk premise
    if not (scoped_vmem_ok(bq, bk) and scoped_vmem_ok(bq, bq, 2)):
        return fallback()  # score temporaries past the scoped-VMEM cap
    nq, nk = sq // bq, sk // bk
    bulk, edge, n_empty = split_bands(nq, nk, bq, bk, shift)
    if bulk[1][-1] < 0:  # no full tiles at all
        return fallback()

    dq_b, dk_b, dv_b = flash_attention_bwd_fused(
        do, q, k, v, out, lse, softmax_scale=softmax_scale,
        causal=False, block_q=bq, block_k=bk, band_override=bulk,
        interpret=interpret)

    if (bq % bk == 0 and shift % bq == 0 and d % 128 == 0
            and dv_dim % 128 == 0):
        # Fused diagonal-merge backward: one parallel launch computes the
        # diagonal tiles and folds in the bulk partials (including the
        # uninitialized-empty-row select) — no edge partial
        # materialization, no separate add pass.
        delta = jnp.sum(
            do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
        ).transpose(0, 2, 1)  # (b, h, sq)
        return _bwd_diag_merge(
            do, q, k, v, lse, delta, dq_b, dk_b, dv_b,
            softmax_scale=softmax_scale, block_q=bq, shift=shift,
            interpret=interpret)

    dq_e, dk_e, dv_e = flash_attention_bwd_fused(
        do, q, k, v, out, lse, softmax_scale=softmax_scale, causal=True,
        block_q=bq, block_k=bk, band_override=edge, interpret=interpret)

    if n_empty:
        # The bulk pass never visits the first n_empty q blocks; their dQ
        # blocks are uninitialized memory (dK/dV are segment-zero-inited
        # and thus already correct).
        dq_b = dq_b.at[:, :n_empty * bq].set(0)

    dq = (dq_b.astype(jnp.float32) + dq_e.astype(jnp.float32)).astype(
        dq_e.dtype)
    dk = (dk_b.astype(jnp.float32) + dk_e.astype(jnp.float32)).astype(
        dk_e.dtype)
    dv = (dv_b.astype(jnp.float32) + dv_e.astype(jnp.float32)).astype(
        dv_e.dtype)
    return dq, dk, dv


def _bwd_diag_merge_kernel(q_ref, do_ref, lse_ref, delta_ref, k_ref, v_ref,
                           dqb_ref, dkb_ref, dvb_ref, dq_ref, dk_ref, dv_ref,
                           *, block_q, scale, group, n_empty, dq_dtype,
                           dkv_dtype):
    """Diagonal-tile backward + additive merge with the bulk partials.

    One grid step per (b, kv_head, group, q block): the KV window is the
    block_q columns ending at the block's diagonal (constant triangular
    mask), so a single tile yields the complete dq contribution for its
    rows and the complete dk/dv contribution for its columns. The bulk
    pass's partials ride in as inputs and are folded into the outputs —
    the split's gradient merge is pure addition over disjoint tile sets.
    dk/dv accumulate across the GQA group in a revisited output block —
    g is the FASTEST grid dim so the revisits are consecutive (Pallas
    keeps an output block resident only across consecutive steps mapping
    to the same block); dq blocks are distinct per g.
    """
    i = pl.program_id(2)
    g = pl.program_id(3)
    q = q_ref[0]    # (bq, d)
    do = do_ref[0]  # (bq, dv)
    k = k_ref[0]    # (bq, d)
    v = v_ref[0]    # (bq, dv)
    lse2 = lse_ref[0, 0, 0].reshape(block_q, 1) * LOG2E
    delta = delta_ref[0, 0, 0].reshape(block_q, 1)

    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    s2 = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, block_q), 1)
    s2 = jnp.where(cols <= rows, s2, float("-inf"))
    lse2_safe = jnp.where(lse2 == float("-inf"), 0.0, lse2)
    p = jnp.exp2(s2 - lse2_safe)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta)
    p_lo = p.astype(do.dtype)
    ds_lo = ds.astype(q.dtype)

    dq_c = jax.lax.dot_general(
        ds_lo, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    dv_c = jax.lax.dot_general(
        p_lo, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_c = jax.lax.dot_general(
        ds_lo, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    # dq: bulk partial rows of the first n_empty q blocks were never
    # written (uninitialized) — select before adding.
    dqb = jnp.where(i >= n_empty, dqb_ref[0].astype(jnp.float32), 0.0)
    dq_ref[0] = (dqb + dq_c).astype(dq_dtype)

    @pl.when(g == 0)
    def _kv_init():
        dk_ref[0] = (dkb_ref[0].astype(jnp.float32) + dk_c).astype(dkv_dtype)
        dv_ref[0] = (dvb_ref[0].astype(jnp.float32) + dv_c).astype(dkv_dtype)

    if group > 1:
        @pl.when(g > 0)
        def _kv_acc():
            dk_ref[0] = (dk_ref[0].astype(jnp.float32) + dk_c).astype(
                dkv_dtype)
            dv_ref[0] = (dv_ref[0].astype(jnp.float32) + dv_c).astype(
                dkv_dtype)


def _bwd_diag_merge(do, q, k, v, lse, delta, dq_b, dk_b, dv_b, *,
                    softmax_scale, block_q, shift, interpret):
    """Launch the backward diagonal-merge kernel (bshd, d % 128 == 0,
    block_q | shift)."""
    b, sq, h, d = q.shape
    _, sk, h_k, _ = k.shape
    dv_dim = v.shape[-1]
    group = h // h_k
    bq = block_q
    nq = sq // bq
    n_empty = 1 if shift == 0 else 0
    koff = shift // bq

    q_in = q.reshape(b, sq, h * d)
    do_in = do.reshape(b, sq, h * dv_dim)
    k_in = k.reshape(b, sk, h_k * d)
    v_in = v.reshape(b, sk, h_k * dv_dim)
    dqb_in = dq_b.reshape(b, sq, h * d)
    dkb_in = dk_b.reshape(b, sk, h_k * d)
    dvb_in = dv_b.reshape(b, sk, h_k * dv_dim)
    lse_in = lse.astype(jnp.float32)[:, :, None, :]
    delta_in = delta[:, :, None, :]

    grid = (b, h_k, nq, group)
    qmap = lambda b_, hk, i, g: (b_, i, hk * group + g)
    kvmap = lambda b_, hk, i, g: (b_, i + koff, hk)
    lmap = lambda b_, hk, i, g: (b_, hk * group + g, 0, i)
    in_specs = [
        pl.BlockSpec((1, bq, d), qmap),
        pl.BlockSpec((1, bq, dv_dim), qmap),
        pl.BlockSpec((1, 1, 1, bq), lmap),
        pl.BlockSpec((1, 1, 1, bq), lmap),
        pl.BlockSpec((1, bq, d), kvmap),
        pl.BlockSpec((1, bq, dv_dim), kvmap),
        pl.BlockSpec((1, bq, d), qmap),        # dq bulk
        pl.BlockSpec((1, bq, d), kvmap),       # dk bulk
        pl.BlockSpec((1, bq, dv_dim), kvmap),  # dv bulk
    ]
    out_specs = [
        pl.BlockSpec((1, bq, d), qmap),
        pl.BlockSpec((1, bq, d), kvmap),
        pl.BlockSpec((1, bq, dv_dim), kvmap),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, sq, h * d), dq_b.dtype),
        jax.ShapeDtypeStruct((b, sk, h_k * d), dk_b.dtype),
        jax.ShapeDtypeStruct((b, sk, h_k * dv_dim), dv_b.dtype),
    ]
    kernel = functools.partial(
        _bwd_diag_merge_kernel, block_q=bq, scale=softmax_scale,
        group=group, n_empty=n_empty, dq_dtype=dq_b.dtype,
        dkv_dtype=dk_b.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
            # ~2 live (bq, bq) fp32 temporaries (s2/p + dp/ds) on the
            # kernel stack — 31.64M measured at bq=2048 (r2_session.log)
            vmem_limit_bytes=scoped_vmem_limit(bq, bq, 2),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * sq * bq * d // 2,
            bytes_accessed=2 * b * (sq * h * (d + dv_dim) * 2
                                    + sk * h_k * (d + dv_dim)),
            transcendentals=b * h * sq * bq // 2,
        ),
        interpret=interpret,
    )(q_in, do_in, lse_in, delta_in, k_in, v_in, dqb_in, dkb_in, dvb_in)
    dq = dq.reshape(b, sq, h, d)
    dk = dk.reshape(b, sk, h_k, d)
    dv = dv.reshape(b, sk, h_k, dv_dim)
    if shift > 0:
        # KV cols [0, shift) have no diagonal tile: bulk covers them fully.
        dk = jnp.concatenate([dk_b[:, :shift], dk[:, shift:]], axis=1)
        dv = jnp.concatenate([dv_b[:, :shift], dv[:, shift:]], axis=1)
    return dq, dk, dv


def split_eligible(sq: int, sk: int, d: int, dv_dim: int, bq: int,
                   bk: int) -> bool:
    """The split path applies on the plain causal hot path with whole
    tiles, VMEM-resident accumulators (same bound as the fused path), and
    score temporaries under the raised scoped-VMEM cap."""
    return (sq % bq == 0 and sk % bk == 0
            and fits_vmem((sk // bk) * bk, d, dv_dim, bq)
            and scoped_vmem_ok(bq, bk) and scoped_vmem_ok(bq, bq, 2))
