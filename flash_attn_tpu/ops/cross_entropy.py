"""Cross-entropy loss with label smoothing, z-loss, and tensor-parallel
vocab splitting.

Parity surface for the reference's Triton CE
(flash_attn/losses/cross_entropy.py:9 ``CrossEntropyLoss``,
flash_attn/ops/triton/cross_entropy.py): label smoothing, lse-square z-loss
(``lse_square_scale``), ignore_index, logit_scale, and — the TP-critical
piece — a vocab-sharded mode where each device holds a slice of the vocab and
the loss is assembled with one psum over the mesh axis
(the reference's all-reduce-inside-loss, cross_entropy.py process_group arg).
"""

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["cross_entropy_loss", "cross_entropy_loss_vocab_parallel"]


def cross_entropy_loss(
    logits,          # (..., vocab)
    labels,          # (...,) int32
    label_smoothing: float = 0.0,
    logit_scale: float = 1.0,
    lse_square_scale: float = 0.0,
    ignore_index: int = -100,
    reduction: str = "mean",
):
    """Returns loss (reduced) and z_loss contribution folded in.

    Matches reference semantics: loss = -logp[label] smoothed, plus
    lse_square_scale * lse^2; ignored positions contribute 0.
    """
    logits = logits.astype(jnp.float32) * logit_scale
    lse = jax.nn.logsumexp(logits, axis=-1)
    label_clipped = jnp.clip(labels, 0, logits.shape[-1] - 1)
    logit_label = jnp.take_along_axis(
        logits, label_clipped[..., None], axis=-1
    )[..., 0]
    if label_smoothing > 0.0:
        smooth = label_smoothing * logits.mean(-1)
        losses = lse - (1 - label_smoothing) * logit_label - smooth
    else:
        losses = lse - logit_label
    losses = losses + lse_square_scale * jnp.square(lse)
    mask = labels != ignore_index
    losses = jnp.where(mask, losses, 0.0)
    if reduction == "none":
        return losses
    if reduction == "sum":
        return losses.sum()
    denom = jnp.maximum(mask.sum(), 1)
    return losses.sum() / denom


def cross_entropy_loss_vocab_parallel(
    logits_shard,    # (..., vocab/tp) — this device's vocab slice
    labels,          # (...,) global label ids
    axis_name: str,
    vocab_start: int,
    label_smoothing: float = 0.0,
    logit_scale: float = 1.0,
    lse_square_scale: float = 0.0,
    ignore_index: int = -100,
    reduction: str = "mean",
):
    """TP cross-entropy: per-shard partial max/sum-exp and label logit, one
    psum to assemble (use inside shard_map over the TP axis).

    Reference: flash_attn/losses/cross_entropy.py TP path (partial-vocab loss
    + all_reduce, SPLIT=True in the Triton kernel).
    """
    logits_shard = logits_shard.astype(jnp.float32) * logit_scale
    vocab_shard = logits_shard.shape[-1]
    # stable global lse: local max -> global max via psum-of-exp trick
    local_max = logits_shard.max(-1)
    global_max = jax.lax.pmax(local_max, axis_name)
    sum_exp = jnp.sum(jnp.exp(logits_shard - global_max[..., None]), -1)
    sum_exp = jax.lax.psum(sum_exp, axis_name)
    lse = global_max + jnp.log(sum_exp)

    local_label = labels - vocab_start
    in_shard = jnp.logical_and(local_label >= 0, local_label < vocab_shard)
    label_clipped = jnp.clip(local_label, 0, vocab_shard - 1)
    logit_label = jnp.take_along_axis(
        logits_shard, label_clipped[..., None], axis=-1
    )[..., 0]
    logit_label = jnp.where(in_shard, logit_label, 0.0)
    logit_label = jax.lax.psum(logit_label, axis_name)

    if label_smoothing > 0.0:
        local_sum = logits_shard.sum(-1)
        global_sum = jax.lax.psum(local_sum, axis_name)
        vocab_total = jax.lax.psum(jnp.asarray(vocab_shard), axis_name)
        smooth = label_smoothing * global_sum / vocab_total
        losses = lse - (1 - label_smoothing) * logit_label - smooth
    else:
        losses = lse - logit_label
    losses = losses + lse_square_scale * jnp.square(lse)
    mask = labels != ignore_index
    losses = jnp.where(mask, losses, 0.0)
    if reduction == "none":
        return losses
    if reduction == "sum":
        return losses.sum()
    denom = jnp.maximum(mask.sum(), 1)
    return losses.sum() / denom
