"""BERT encoder family.

Parity surface for the reference BERT (flash_attn/models/bert.py: padded and
unpadded/varlen dual path, post-norm blocks, pooler, MLM head). Non-causal
attention through the same flash kernels; the unpadded path packs valid
tokens and runs the varlen kernel (reference's ``unpad_input`` wrapping).
"""

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from flash_attn_tpu import flash_attn_func, flash_attn_varlen_func
from flash_attn_tpu.ops.norm import layer_norm
from flash_attn_tpu.utils.padding import pad_input, unpad_input

__all__ = ["BertConfig", "BertModel", "BertForMaskedLM"]


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    use_unpadded: bool = False   # pack valid tokens + varlen kernel
    dtype: jnp.dtype = jnp.float32


class _BertSelfAttention(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, x, attention_mask=None, cu_seqlens=None,
                 max_seqlen=None):
        cfg = self.config
        h = cfg.num_attention_heads
        d = cfg.hidden_size // h
        qkv = nn.Dense(3 * cfg.hidden_size, dtype=cfg.dtype, name="Wqkv")(x)
        if cu_seqlens is not None:
            total = x.shape[0]
            q, k, v = jnp.split(qkv.reshape(total, 3, h, d), 3, axis=1)
            out = flash_attn_varlen_func(
                q[:, 0], k[:, 0], v[:, 0], cu_seqlens, cu_seqlens,
                max_seqlen, max_seqlen, causal=False,
            )
            ctx = out.reshape(total, h * d)
        else:
            b, s = x.shape[:2]
            q, k, v = jnp.split(qkv.reshape(b, s, 3, h, d), 3, axis=2)
            out = flash_attn_func(q[:, :, 0], k[:, :, 0], v[:, :, 0],
                                  causal=False)
            if attention_mask is not None:
                out = jnp.where(attention_mask[:, :, None, None], out, 0.0)
            ctx = out.reshape(b, s, h * d)
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="out_proj")(ctx)


class _BertLayer(nn.Module):
    """Post-norm residual block (BERT style)."""
    config: BertConfig

    @nn.compact
    def __call__(self, x, attention_mask=None, cu_seqlens=None,
                 max_seqlen=None):
        cfg = self.config
        attn = _BertSelfAttention(cfg, name="attention")(
            x, attention_mask, cu_seqlens, max_seqlen)
        w1 = self.param("norm1_weight", nn.initializers.ones,
                        (cfg.hidden_size,), jnp.float32)
        b1 = self.param("norm1_bias", nn.initializers.zeros,
                        (cfg.hidden_size,), jnp.float32)
        x = layer_norm(x + attn, w1, b1, cfg.layer_norm_eps)
        y = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="fc1")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fc2")(y)
        w2 = self.param("norm2_weight", nn.initializers.ones,
                        (cfg.hidden_size,), jnp.float32)
        b2 = self.param("norm2_bias", nn.initializers.zeros,
                        (cfg.hidden_size,), jnp.float32)
        return layer_norm(x + y, w2, b2, cfg.layer_norm_eps)


class BertModel(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        cfg = self.config
        b, s = input_ids.shape
        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                     name="word_embeddings")(input_ids)
        pos = jnp.arange(s)[None, :]
        x = x + nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                         dtype=cfg.dtype, name="position_embeddings")(pos)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = x + nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                         dtype=cfg.dtype, name="token_type_embeddings")(
            token_type_ids)
        w = self.param("emb_norm_weight", nn.initializers.ones,
                       (cfg.hidden_size,), jnp.float32)
        bb = self.param("emb_norm_bias", nn.initializers.zeros,
                        (cfg.hidden_size,), jnp.float32)
        x = layer_norm(x, w, bb, cfg.layer_norm_eps)

        if cfg.use_unpadded and attention_mask is not None:
            # pack valid tokens; run every layer on the packed stream
            x_un, idx, cu, msl, _ = unpad_input(x, attention_mask)
            for i in range(cfg.num_hidden_layers):
                x_un = _BertLayer(cfg, name=f"layers_{i}")(
                    x_un, cu_seqlens=cu, max_seqlen=msl)
            x = pad_input(x_un, idx, b, s)
        else:
            for i in range(cfg.num_hidden_layers):
                x = _BertLayer(cfg, name=f"layers_{i}")(x, attention_mask)
        return x


class BertForMaskedLM(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None):
        cfg = self.config
        hidden = BertModel(cfg, name="bert")(input_ids, attention_mask,
                                             token_type_ids)
        x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="transform")(hidden)
        x = jax.nn.gelu(x, approximate=False)
        w = self.param("transform_norm_weight", nn.initializers.ones,
                       (cfg.hidden_size,), jnp.float32)
        b = self.param("transform_norm_bias", nn.initializers.zeros,
                       (cfg.hidden_size,), jnp.float32)
        x = layer_norm(x, w, b, cfg.layer_norm_eps)
        return nn.Dense(cfg.vocab_size, dtype=cfg.dtype, name="decoder")(
            x).astype(jnp.float32)
