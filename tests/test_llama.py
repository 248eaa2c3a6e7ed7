"""Llama adapter test: our model's logits vs HuggingFace torch llama
(reference analogue: tests/models/test_llama.py comparing vs HF)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_llama_logits_match_hf():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=344,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_bias=False,
    )
    torch.manual_seed(0)
    hf_model = LlamaForCausalLM(hf_cfg).eval()

    ids = torch.randint(0, 256, (2, 48))
    with torch.no_grad():
        hf_logits = hf_model(ids).logits.float().numpy()

    from flash_attn_tpu.models.gpt import GPTLMHeadModel
    from flash_attn_tpu.models.llama import (
        llama_config_to_gpt_config,
        remap_state_dict_hf_llama,
    )

    cfg = llama_config_to_gpt_config(hf_cfg, dtype=jnp.float32,
                                     max_decode_seqlen=64)
    params = remap_state_dict_hf_llama(hf_model.state_dict(), cfg)
    model = GPTLMHeadModel(cfg)
    logits = model.apply({"params": params}, jnp.asarray(ids.numpy()))

    np.testing.assert_allclose(
        np.asarray(logits), hf_logits, atol=5e-4, rtol=5e-3,
    )
