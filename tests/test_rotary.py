"""Rotary embedding tests (reference: tests/layers/test_rotary.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.ops.rotary import apply_rotary_emb


def _rotate_ref(x, cos, sin, interleaved, pos):
    """Literal rotation in numpy for validation."""
    x = np.asarray(x, np.float32)
    cos = np.asarray(cos, np.float32)[pos]  # (b, s, r/2) or (s, r/2)
    sin = np.asarray(sin, np.float32)[pos]
    r2 = cos.shape[-1]
    rot = x[..., : 2 * r2].copy()
    rest = x[..., 2 * r2:]
    if cos.ndim == 2:
        cos = cos[None]
        sin = sin[None]
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    if not interleaved:
        x1, x2 = rot[..., :r2], rot[..., r2:]
        out = np.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1)
    else:
        x1, x2 = rot[..., ::2], rot[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x1 * sin + x2 * cos
        out = np.stack([o1, o2], -1).reshape(rot.shape)
    return np.concatenate([out, rest], -1) if rest.shape[-1] else out


@pytest.mark.parametrize("interleaved", [False, True])
@pytest.mark.parametrize("rotary_fraction", [1.0, 0.5])
def test_rotary_basic(interleaved, rotary_fraction):
    b, s, h, d = 2, 64, 4, 64
    rot_dim = int(d * rotary_fraction)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, h, d))
    ang = jnp.arange(s)[:, None] * (1.0 / 10000 ** (jnp.arange(rot_dim // 2) / (rot_dim // 2)))
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    out = apply_rotary_emb(x, cos, sin, interleaved=interleaved)
    ref = _rotate_ref(x, cos, sin, interleaved, np.arange(s))
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, atol=1e-5)


def test_rotary_offsets():
    b, s, h, d = 2, 8, 4, 64
    s_max = 128
    x = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d))
    ang = jnp.arange(s_max)[:, None] * (1.0 / 10000 ** (jnp.arange(d // 2) / (d // 2)))
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    offs = jnp.array([10, 77], jnp.int32)

    out = apply_rotary_emb(x, cos, sin, seqlen_offsets=offs)
    pos = np.asarray(offs)[:, None] + np.arange(s)[None, :]
    ref = _rotate_ref(x, cos, sin, False, pos)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, atol=1e-5)


def test_rotary_grad_is_conjugate():
    """d/dx of rotary is the conjugate rotation (reference ApplyRotaryEmb
    backward)."""
    b, s, h, d = 1, 16, 2, 32
    x = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d))
    g = jax.random.normal(jax.random.PRNGKey(3), (b, s, h, d))
    ang = jnp.arange(s)[:, None] * 0.1
    cos, sin = jnp.cos(ang), jnp.sin(jnp.broadcast_to(ang, (s, d // 2)))
    cos = jnp.broadcast_to(cos, (s, d // 2))

    _, vjp = jax.vjp(lambda x: apply_rotary_emb(x, cos, sin), x)
    (dx,) = vjp(g)
    expect = apply_rotary_emb(g, cos, sin, conjugate=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(expect), atol=1e-5)
