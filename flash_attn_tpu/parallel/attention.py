"""Sharded attention: head-parallel (TP) and ring / context-parallel (CP).

This is where the build deliberately goes beyond the reference (SURVEY.md
§2.5): the reference exports the LSE + combine primitives that external ring
attention libraries consume; here ring attention over the mesh's ICI links is
built in, using the same (out, lse) merge algebra as
kernels/flash_decode.combine_splits.

 - ``head_parallel_attention``: shard_map over the model axis — heads are
   split, each device runs the local Pallas kernel; no collectives inside
   (the surrounding TP linears produce/consume head-sharded activations).
 - ``ring_attention``: KV shards rotate around the seq axis with
   jax.lax.ppermute; each step merges a partial (out, lse) pair online.
   Causal load-balance uses the striped ("zigzag") assignment later; v1
   computes the full band and masks.
"""

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from flash_attn_tpu.kernels.flash_bwd import flash_attention_bwd
from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
from flash_attn_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS

__all__ = ["head_parallel_attention", "ring_attention",
           "ring_attention_trainable"]


def head_parallel_attention(
    mesh: Mesh,
    causal: bool = True,
    softmax_scale: Optional[float] = None,
    window_size=(None, None),
    softcap: float = 0.0,
    interpret: bool = False,
):
    """Returns a jitted fn(q, k, v) with q/k/v (b, h, s, d) sharded
    batch->data, heads->model (the reference's ParallelMHA head split,
    modules/mha.py:754-760)."""
    spec = P(DATA_AXIS, MODEL_AXIS, None, None)

    def local(q, k, v):
        out, _ = flash_attention_fwd(
            q, k, v, causal=causal, softmax_scale=softmax_scale,
            window_size=window_size, softcap=softcap, interpret=interpret,
        )
        return out

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    ))


def _merge_partials(o1, lse1, o2, lse2):
    """Online merge of two attention partials — the combine algebra
    (hopper/flash_fwd_combine_kernel.h:17) in streaming form."""
    m = jnp.maximum(lse1, lse2)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    w1 = jnp.exp(lse1 - m_safe)
    w2 = jnp.exp(lse2 - m_safe)
    denom = w1 + w2
    dsafe = jnp.where(denom == 0.0, 1.0, denom)
    o = (o1 * w1[..., None] + o2 * w2[..., None]) / dsafe[..., None]
    lse = m + jnp.log(dsafe)
    lse = jnp.where(jnp.isneginf(m), -jnp.inf, lse)
    return o, lse


def ring_attention(
    mesh: Mesh,
    causal: bool = True,
    softmax_scale: Optional[float] = None,
    interpret: bool = False,
    axis_name: str = SEQ_AXIS,
):
    """Context-parallel attention: q/k/v sharded on seq axis
    (b, h, s/P, d per device); KV rotates around the ring.

    Sequence order = axis order (device r holds tokens [r*s/P, (r+1)*s/P)).
    Causal masking between chunks: a full chunk if kv_rank < q_rank, the
    diagonal chunk causally, skip if kv_rank > q_rank (computed & discarded
    via -inf lse in v1).
    """
    spec = P(DATA_AXIS, MODEL_AXIS, SEQ_AXIS, None)

    def local(q, k, v):
        P_ = jax.lax.axis_size(axis_name)
        my = jax.lax.axis_index(axis_name)
        sq = q.shape[2]
        if softmax_scale is None:
            scale = 1.0 / math.sqrt(q.shape[-1])
        else:
            scale = softmax_scale

        def step(carry, t):
            o, lse, k_cur, v_cur = carry
            src_rank = (my - t) % P_  # whose KV chunk we hold this step
            # local partial against this chunk
            if causal:
                # chunk fully before ours: no mask; ours: causal; after: skip
                is_diag = src_rank == my
                is_before = src_rank < my
                o_c, lse_c = flash_attention_fwd(
                    q, k_cur, v_cur, causal=True, softmax_scale=scale,
                    interpret=interpret,
                )
                o_f, lse_f = flash_attention_fwd(
                    q, k_cur, v_cur, causal=False, softmax_scale=scale,
                    interpret=interpret,
                )
                neg = jnp.full_like(lse_f, -jnp.inf)
                lse_p = jnp.where(is_diag, lse_c,
                                  jnp.where(is_before, lse_f, neg))
                o_p = jnp.where(is_diag, o_c.astype(jnp.float32),
                                jnp.where(is_before,
                                          o_f.astype(jnp.float32), 0.0))
            else:
                o_p, lse_p = flash_attention_fwd(
                    q, k_cur, v_cur, causal=False, softmax_scale=scale,
                    interpret=interpret,
                )
                o_p = o_p.astype(jnp.float32)
            o, lse = _merge_partials(o, lse, o_p, lse_p)
            # rotate KV to the next device (overlappable with next compute)
            perm = [(i, (i + 1) % P_) for i in range(P_)]
            k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
            return (o, lse, k_nxt, v_nxt), None

        b, h, s_local, d = q.shape
        o0 = jnp.zeros((b, h, s_local, v.shape[-1]), jnp.float32)
        lse0 = jnp.full((b, h, s_local), -jnp.inf, jnp.float32)
        (o, lse, _, _), _ = jax.lax.scan(
            step, (o0, lse0, k, v), jnp.arange(P_))
        return o.astype(q.dtype)

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    ))


def ring_attention_trainable(
    mesh: Mesh,
    causal: bool = True,
    softmax_scale: Optional[float] = None,
    interpret: bool = False,
    axis_name: str = SEQ_AXIS,
):
    """Differentiable ring attention (context-parallel training).

    Forward as in ``ring_attention``; the backward rotates the KV shards
    around the ring again, accumulating dK/dV alongside the traveling chunk
    (so each device's dK/dV arrive home after P steps) while dQ accumulates
    locally. Per-chunk gradients come from the standard two-kernel bwd with
    the *global* lse — p = exp(s - lse_global) makes each chunk's
    contribution exact.
    """
    spec = P(DATA_AXIS, MODEL_AXIS, SEQ_AXIS, None)

    def local(q, k, v):
        P_ = jax.lax.axis_size(axis_name)
        my = jax.lax.axis_index(axis_name)
        scale = softmax_scale or 1.0 / math.sqrt(q.shape[-1])
        perm = [(i, (i + 1) % P_) for i in range(P_)]

        @jax.custom_vjp
        def _ring(q, k, v, my_f):
            o, _ = _ring_fwd_res(q, k, v, my_f)
            return o

        def _partial(q, k_cur, v_cur, src_rank, my_i):
            o_c, lse_c = flash_attention_fwd(
                q, k_cur, v_cur, causal=True, softmax_scale=scale,
                interpret=interpret)
            o_f, lse_f = flash_attention_fwd(
                q, k_cur, v_cur, causal=False, softmax_scale=scale,
                interpret=interpret)
            if causal:
                neg = jnp.full_like(lse_f, -jnp.inf)
                is_diag = src_rank == my_i
                is_before = src_rank < my_i
                lse_p = jnp.where(is_diag, lse_c,
                                  jnp.where(is_before, lse_f, neg))
                o_p = jnp.where(is_diag, o_c.astype(jnp.float32),
                                jnp.where(is_before,
                                          o_f.astype(jnp.float32), 0.0))
            else:
                lse_p = lse_f
                o_p = o_f.astype(jnp.float32)
            return o_p, lse_p

        def _ring_fwd_res(q, k, v, my_f):
            my_i = my_f.astype(jnp.int32)

            def step(carry, t):
                o, lse, k_cur, v_cur = carry
                src_rank = (my_i - t) % P_
                o_p, lse_p = _partial(q, k_cur, v_cur, src_rank, my_i)
                o, lse = _merge_partials(o, lse, o_p, lse_p)
                k_n = jax.lax.ppermute(k_cur, axis_name, perm)
                v_n = jax.lax.ppermute(v_cur, axis_name, perm)
                return (o, lse, k_n, v_n), None

            b, h, s_l, _ = q.shape
            o0 = jnp.zeros((b, h, s_l, v.shape[-1]), jnp.float32)
            lse0 = jnp.full((b, h, s_l), -jnp.inf, jnp.float32)
            (o, lse, _, _), _ = jax.lax.scan(
                step, (o0, lse0, k, v), jnp.arange(P_))
            # `my` rides through the signature: the bwd closure must not
            # capture tracers from the surrounding shard_map trace
            return o.astype(q.dtype), (q, k, v, o.astype(q.dtype), lse,
                                       my_i)

        def _ring_bwd(res, g):
            q, k, v, out, lse, my_r = res

            def step(carry, t):
                dq_acc, k_cur, v_cur, dk_acc, dv_acc = carry
                src_rank = (my_r - t) % P_

                def grads(flag_causal):
                    return flash_attention_bwd(
                        g, q, k_cur, v_cur, out, lse, causal=flag_causal,
                        softmax_scale=scale, interpret=interpret)

                dq_c, dk_c, dv_c = grads(True)
                dq_f, dk_f, dv_f = grads(False)
                if causal:
                    is_diag = src_rank == my_r
                    is_before = src_rank < my_r
                    pick = lambda c, f: jnp.where(
                        is_diag, c, jnp.where(is_before, f, 0.0))
                    dq_p = pick(dq_c, dq_f)
                    dk_p = pick(dk_c, dk_f)
                    dv_p = pick(dv_c, dv_f)
                else:
                    dq_p, dk_p, dv_p = dq_f, dk_f, dv_f
                dq_acc = dq_acc + dq_p
                dk_acc = dk_acc + dk_p
                dv_acc = dv_acc + dv_p
                # rotate kv and their gradient accumulators together
                k_n = jax.lax.ppermute(k_cur, axis_name, perm)
                v_n = jax.lax.ppermute(v_cur, axis_name, perm)
                dk_n = jax.lax.ppermute(dk_acc, axis_name, perm)
                dv_n = jax.lax.ppermute(dv_acc, axis_name, perm)
                return (dq_acc, k_n, v_n, dk_n, dv_n), None

            dq0 = jnp.zeros(q.shape, jnp.float32)
            dk0 = jnp.zeros(k.shape, jnp.float32)
            dv0 = jnp.zeros(v.shape, jnp.float32)
            (dq, _, _, dk, dv), _ = jax.lax.scan(
                step, (dq0, k, v, dk0, dv0), jnp.arange(P_))
            # after P steps the accumulators have cycled all the way home
            return (dq.astype(q.dtype), dk.astype(k.dtype),
                    dv.astype(v.dtype), jnp.zeros(()))

        _ring.defvjp(_ring_fwd_res, _ring_bwd)
        return _ring(q, k, v, jnp.asarray(my, jnp.float32))

    return jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    ))
