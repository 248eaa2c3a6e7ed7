"""Activation helpers (reference flash_attn/ops/activations.py:16-135).

XLA fuses these into surrounding matmuls; no custom bwd needed (autodiff
produces the same fused chains the reference hand-writes)."""

import jax
import jax.numpy as jnp

__all__ = ["bias_gelu", "sqrelu", "swiglu", "gelu_approx"]


def gelu_approx(x):
    """tanh-approximated GELU (the reference's default for fused MLP)."""
    return jax.nn.gelu(x, approximate=True)


def bias_gelu(y, bias):
    return gelu_approx(y + bias)


def sqrelu(x):
    r = jnp.maximum(x, 0.0)
    return r * r


def swiglu(gate, y):
    return jax.nn.silu(gate) * y
