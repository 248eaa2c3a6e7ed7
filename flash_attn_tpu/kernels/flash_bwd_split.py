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

import math
from typing import Optional

import jax.numpy as jnp

from flash_attn_tpu.dispatch.config import get_bwd_config
from flash_attn_tpu.kernels.flash_bwd import _next_pow2
from flash_attn_tpu.kernels.flash_bwd_fused import (
    fits_vmem,
    flash_attention_bwd_fused,
)
from flash_attn_tpu.kernels.flash_fwd_split import split_bands


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

    cfg = get_bwd_config(d, dv_dim, sq, sk, True)
    bq = min(block_q or cfg.block_q, _next_pow2(sq))
    bk = min(block_k or cfg.block_k, _next_pow2(sk))

    def fallback():
        return flash_attention_bwd_fused(
            do, q, k, v, out, lse, softmax_scale=softmax_scale,
            causal=True, block_q=block_q, block_k=block_k,
            interpret=interpret)

    if sq % bq != 0 or sk % bk != 0:
        return fallback()  # boundary masks break the maskless-bulk premise
    nq, nk = sq // bq, sk // bk
    bulk, edge, n_empty = split_bands(nq, nk, bq, bk, shift)
    if bulk[1][-1] < 0:  # no full tiles at all
        return fallback()

    dq_b, dk_b, dv_b = flash_attention_bwd_fused(
        do, q, k, v, out, lse, softmax_scale=softmax_scale, causal=False,
        block_q=bq, block_k=bk, band_override=bulk, interpret=interpret)
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


def split_eligible(sq: int, sk: int, d: int, dv_dim: int, bq: int,
                   bk: int) -> bool:
    """The split path applies on the plain causal hot path with whole
    tiles and VMEM-resident accumulators (same bound as the fused path)."""
    return (sq % bq == 0 and sk % bk == 0
            and fits_vmem((sk // bk) * bk, d, dv_dim, bq))
