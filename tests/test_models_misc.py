"""BERT (padded==unpadded parity, vs HF) and ViT smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models.bert import BertConfig, BertForMaskedLM, BertModel
from flash_attn_tpu.models.vit import ViTConfig, VisionTransformer


def test_bert_padded_vs_unpadded():
    """The packed/varlen path must produce identical hidden states to the
    padded path on valid tokens (reference bert.py dual-path contract)."""
    cfg_pad = BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                         num_attention_heads=4, intermediate_size=128,
                         max_position_embeddings=64, use_unpadded=False)
    cfg_un = BertConfig(**{**cfg_pad.__dict__, "use_unpadded": True})
    model_pad = BertModel(cfg_pad)
    model_un = BertModel(cfg_un)
    ids = jax.random.randint(jax.random.PRNGKey(0), (3, 48), 0, 128)
    lengths = jnp.array([48, 17, 33])
    mask = jnp.arange(48)[None, :] < lengths[:, None]
    params = model_pad.init(jax.random.PRNGKey(1), ids, mask)["params"]

    # padded path masks invalid keys via the mask
    out_un = model_un.apply({"params": params}, ids, mask)
    # reference: per-sequence truncated forward
    for i, L in enumerate([48, 17, 33]):
        ref = model_pad.apply({"params": params}, ids[i:i+1, :L])
        np.testing.assert_allclose(
            np.asarray(out_un[i, :L]), np.asarray(ref[0]),
            atol=1e-4, rtol=1e-4,
        )
    # invalid positions zeroed by the pack/unpack roundtrip
    np.testing.assert_allclose(np.asarray(out_un[1, 17:]), 0.0, atol=1e-6)


def test_bert_mlm_shapes():
    cfg = BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=1,
                     num_attention_heads=4, intermediate_size=128,
                     max_position_embeddings=64)
    model = BertForMaskedLM(cfg)
    ids = jnp.zeros((2, 32), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    logits = model.apply({"params": params}, ids)
    assert logits.shape == (2, 32, 128)
    assert bool(jnp.isfinite(logits).all())


def test_vit_forward():
    cfg = ViTConfig(img_size=32, patch_size=8, embed_dim=64, depth=2,
                    num_heads=4, num_classes=10)
    model = VisionTransformer(cfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(1), imgs)["params"]
    out = model.apply({"params": params}, imgs)
    assert out.shape == (2, 10)
    assert bool(jnp.isfinite(out).all())
