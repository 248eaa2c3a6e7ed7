"""Padded <-> packed (varlen) conversion utilities.

Parity surface for the reference's bert_padding.py (``unpad_input``:98,
``pad_input``:204), in JAX. Note: because JAX needs static shapes, the packed
total length equals batch*seqlen with valid tokens front-packed; callers pass
``cu_seqlens`` + ``max_seqlen`` to the varlen kernels and ignore the tail.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["unpad_input", "pad_input",
           "unpad_input_for_concatenated_sequences", "index_first_axis"]


def unpad_input(
    hidden_states,  # (b, s, ...)
    attention_mask,  # (b, s) bool, True = keep
    unused_mask=None,  # (b, s) bool, True = allocated-but-unused (seqused)
):
    """Returns (packed (b*s, ...), indices, cu_seqlens, max_seqlen, seqused).

    Valid (+unused) tokens are front-packed into the flat axis; the tail is
    zero. ``indices`` are flat (b*s) gather indices of the kept tokens,
    padded with b*s-1 (harmless duplicates) to keep the shape static.
    """
    b, s = attention_mask.shape[:2]
    all_mask = (
        attention_mask
        if unused_mask is None
        else jnp.logical_or(attention_mask, unused_mask)
    )
    seqlens = all_mask.sum(-1).astype(jnp.int32)
    seqused = attention_mask.sum(-1).astype(jnp.int32)
    cu_seqlens = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(seqlens)]
    ).astype(jnp.int32)

    flat_mask = all_mask.reshape(-1)
    # Stable front-pack permutation: order by (not kept, original index).
    order = jnp.argsort(~flat_mask, stable=True)
    indices = order  # (b*s,): first sum(seqlens) entries are kept tokens
    flat = hidden_states.reshape((b * s,) + hidden_states.shape[2:])
    packed = flat[indices]
    # Zero the tail so downstream reductions are clean.
    valid = jnp.arange(b * s) < seqlens.sum()
    packed = jnp.where(
        valid.reshape((-1,) + (1,) * (packed.ndim - 1)), packed, 0
    )
    max_seqlen = int(s)
    return packed, indices, cu_seqlens, max_seqlen, seqused


def pad_input(packed, indices, batch: int, seqlen: int):
    """Inverse of unpad_input: scatter packed rows back to (b, s, ...)."""
    flat = jnp.zeros((batch * seqlen,) + packed.shape[1:], packed.dtype)
    n_valid = packed.shape[0]
    flat = flat.at[indices[:n_valid]].set(packed)
    return flat.reshape((batch, seqlen) + packed.shape[1:])


def unpad_input_for_concatenated_sequences(
    hidden_states,              # (b, s, ...)
    attention_mask_in_length,   # (b, s) int: nonzero entries are lengths of
                                # the sequences concatenated into that row
    max_segments: Optional[int] = None,
):
    """Packed-sample unpadding (reference bert_padding.py:131): each batch
    row holds several short samples back-to-back; returns flat hidden states
    plus per-SAMPLE cu_seqlens so the varlen kernels mask samples from each
    other.

    Returns (packed, indices, cu_seqlens, max_seqlen). With
    ``max_segments=None`` the segment count is read eagerly (host-side, like
    the reference's ``nonzero``); pass a static bound to stay jittable —
    cu_seqlens is then (max_segments+1,) padded with repeated totals
    (zero-length segments, which the kernels accept).
    """
    b, s = attention_mask_in_length.shape
    lengths = attention_mask_in_length.reshape(-1).astype(jnp.int32)
    if max_segments is None:
        import numpy as np
        nz = np.asarray(lengths)
        nz = nz[nz > 0]
        seqlens = jnp.asarray(nz, jnp.int32)
        max_seqlen = int(nz.max()) if nz.size else 0
    else:
        order = jnp.argsort(lengths == 0, stable=True)
        seqlens = lengths[order][:max_segments]
        max_seqlen = int(s)
    cu_seqlens = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(seqlens)]).astype(jnp.int32)

    row_total = attention_mask_in_length.sum(-1)
    token_mask = jnp.arange(s)[None, :] < row_total[:, None]
    indices = jnp.argsort(~token_mask.reshape(-1), stable=True)
    flat = hidden_states.reshape((b * s,) + hidden_states.shape[2:])
    packed = flat[indices]
    valid = jnp.arange(b * s) < row_total.sum()
    packed = jnp.where(
        valid.reshape((-1,) + (1,) * (packed.ndim - 1)), packed, 0)
    return packed, indices, cu_seqlens, max_seqlen


def index_first_axis(x, indices):
    """Gather rows of a flattened (b*s, ...) tensor (reference
    bert_padding.py:8 custom autograd Function — in JAX a plain take with
    autodiff for free)."""
    return jnp.take(x, indices, axis=0)
