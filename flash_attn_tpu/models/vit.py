"""Vision Transformer.

Parity surface for the reference ViT (flash_attn/models/vit.py, timm-style):
patch embed + cls token + pre-norm blocks with flash attention + head.
"""

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from flash_attn_tpu import flash_attn_func
from flash_attn_tpu.ops.norm import layer_norm

__all__ = ["ViTConfig", "VisionTransformer"]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    use_cls_token: bool = True
    dtype: jnp.dtype = jnp.float32


class _ViTBlock(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = cfg.num_heads
        d = cfg.embed_dim // h
        b, s, _ = x.shape
        w1 = self.param("norm1_weight", nn.initializers.ones,
                        (cfg.embed_dim,), jnp.float32)
        b1 = self.param("norm1_bias", nn.initializers.zeros,
                        (cfg.embed_dim,), jnp.float32)
        y = layer_norm(x, w1, b1)
        qkv = nn.Dense(3 * cfg.embed_dim, dtype=cfg.dtype, name="Wqkv")(y)
        q, k, v = jnp.split(qkv.reshape(b, s, 3, h, d), 3, axis=2)
        attn = flash_attn_func(q[:, :, 0], k[:, :, 0], v[:, :, 0],
                               causal=False)
        attn = nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name="out_proj")(
            attn.reshape(b, s, h * d))
        x = x + attn
        w2 = self.param("norm2_weight", nn.initializers.ones,
                        (cfg.embed_dim,), jnp.float32)
        b2 = self.param("norm2_bias", nn.initializers.zeros,
                        (cfg.embed_dim,), jnp.float32)
        y = layer_norm(x, w2, b2)
        y = nn.Dense(int(cfg.embed_dim * cfg.mlp_ratio), dtype=cfg.dtype,
                     name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(cfg.embed_dim, dtype=cfg.dtype, name="fc2")(y)
        return x + y


class VisionTransformer(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, images):  # (b, H, W, C)
        cfg = self.config
        b = images.shape[0]
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    dtype=cfg.dtype, name="patch_embed")(images)
        x = x.reshape(b, -1, cfg.embed_dim)
        n = x.shape[1]
        if cfg.use_cls_token:
            cls = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, cfg.embed_dim), jnp.float32)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls, (b, 1, cfg.embed_dim)).astype(x.dtype),
                 x], axis=1)
            n += 1
        pos = self.param("pos_embed",
                         nn.initializers.normal(0.02),
                         (1, n, cfg.embed_dim), jnp.float32)
        x = x + pos.astype(x.dtype)
        for i in range(cfg.depth):
            x = _ViTBlock(cfg, name=f"blocks_{i}")(x)
        w = self.param("norm_weight", nn.initializers.ones,
                       (cfg.embed_dim,), jnp.float32)
        bb = self.param("norm_bias", nn.initializers.zeros,
                        (cfg.embed_dim,), jnp.float32)
        x = layer_norm(x, w, bb)
        feat = x[:, 0] if cfg.use_cls_token else x.mean(axis=1)
        return nn.Dense(cfg.num_classes, dtype=jnp.float32, name="head")(feat)
