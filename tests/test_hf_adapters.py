"""HF adapter parity tests: our logits vs HF torch for neox / gptj / falcon /
opt (reference tests/models/test_{gpt_neox,gptj,falcon,opt}.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from flash_attn_tpu.models.gpt import GPTLMHeadModel
from flash_attn_tpu.models import hf_adapters as A


def _compare(hf_model, cfg, params, ids, atol=1e-3, rtol=1e-2):
    with torch.no_grad():
        hf_logits = hf_model(ids).logits.float().numpy()
    model = GPTLMHeadModel(cfg)
    logits = model.apply({"params": params}, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               atol=atol, rtol=rtol)


def test_gpt_neox():
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM
    hf_cfg = GPTNeoXConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=256, rotary_pct=0.25,
        use_parallel_residual=True, layer_norm_eps=1e-5,
        tie_word_embeddings=False, max_position_embeddings=128,
    )
    torch.manual_seed(0)
    hf = GPTNeoXForCausalLM(hf_cfg).eval()
    cfg = A.gpt_neox_config_to_gpt_config(hf_cfg, max_decode_seqlen=64)
    params = A.remap_state_dict_hf_gpt_neox(hf.state_dict(), cfg)
    ids = torch.randint(0, 128, (2, 32))
    _compare(hf, cfg, params, ids)


def test_gptj():
    from transformers import GPTJConfig, GPTJForCausalLM
    hf_cfg = GPTJConfig(
        vocab_size=128, n_embd=64, n_layer=2, n_head=4, rotary_dim=8,
        n_inner=None, n_positions=128,
    )
    torch.manual_seed(0)
    hf = GPTJForCausalLM(hf_cfg).eval()
    cfg = A.gptj_config_to_gpt_config(hf_cfg, max_decode_seqlen=64)
    params = A.remap_state_dict_hf_gptj(hf.state_dict(), cfg)
    ids = torch.randint(0, 128, (2, 24))
    _compare(hf, cfg, params, ids)


def test_falcon():
    from transformers import FalconConfig, FalconForCausalLM
    hf_cfg = FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        bias=False, new_decoder_architecture=False,
        max_position_embeddings=128,
    )
    torch.manual_seed(0)
    hf = FalconForCausalLM(hf_cfg).eval()
    cfg = A.falcon_config_to_gpt_config(hf_cfg, max_decode_seqlen=64)
    params = A.remap_state_dict_hf_falcon(hf.state_dict(), cfg)
    ids = torch.randint(0, 128, (2, 24))
    _compare(hf, cfg, params, ids)


def test_opt():
    from transformers import OPTConfig, OPTForCausalLM
    hf_cfg = OPTConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, ffn_dim=256, max_position_embeddings=128,
        do_layer_norm_before=True, word_embed_proj_dim=64,
    )
    torch.manual_seed(0)
    hf = OPTForCausalLM(hf_cfg).eval()
    cfg = A.opt_config_to_gpt_config(hf_cfg, max_decode_seqlen=64)
    params = A.remap_state_dict_hf_opt(hf.state_dict(), cfg)
    ids = torch.randint(0, 128, (2, 24))
    _compare(hf, cfg, params, ids)
