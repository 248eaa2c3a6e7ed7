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


def test_bigcode():
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM
    hf_cfg = GPTBigCodeConfig(
        vocab_size=128, n_embd=64, n_layer=2, n_head=4, n_inner=256,
        n_positions=128, multi_query=True,
        activation_function="gelu_pytorch_tanh",
    )
    torch.manual_seed(0)
    hf = GPTBigCodeForCausalLM(hf_cfg).eval()
    cfg = A.bigcode_config_to_gpt_config(hf_cfg, max_decode_seqlen=64)
    assert cfg.n_head_kv == 1  # native MQA, no reference-style k/v tiling
    params = A.remap_state_dict_hf_bigcode(hf.state_dict(), cfg)
    ids = torch.randint(0, 128, (2, 24))
    _compare(hf, cfg, params, ids)


def test_baichuan_rotary():
    """Baichuan-7B == llama body with fused W_pack: fabricate a baichuan
    checkpoint from a tiny HF llama and check logits parity against it."""
    from transformers import LlamaConfig, LlamaForCausalLM
    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4, intermediate_size=128,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
        max_position_embeddings=128, attention_bias=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v for k, v in hf.state_dict().items()}
    bsd = {}
    for k, v in sd.items():
        if "self_attn.q_proj" in k or "self_attn.k_proj" in k \
                or "self_attn.v_proj" in k:
            continue
        bsd[k] = v
    for i in range(hf_cfg.num_hidden_layers):
        pre = f"model.layers.{i}.self_attn."
        bsd[pre + "W_pack.weight"] = torch.cat(
            [sd[pre + "q_proj.weight"], sd[pre + "k_proj.weight"],
             sd[pre + "v_proj.weight"]], dim=0)
    cfg = A.baichuan_config_to_gpt_config(hf_cfg, max_decode_seqlen=64)
    assert cfg.rotary_emb_fraction == 1.0 and not cfg.use_alibi  # 7B path
    assert not cfg.norm_head  # vocab < 70k -> v1, plain head
    params = A.remap_state_dict_hf_baichuan(bsd, cfg)
    ids = torch.randint(0, 128, (2, 24))
    _compare(hf, cfg, params, ids)


def test_baichuan_13b_config_inference():
    from types import SimpleNamespace
    hf = SimpleNamespace(vocab_size=125696, hidden_size=5120,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=128, rms_norm_eps=1e-6,
                         tie_word_embeddings=False)
    cfg = A.baichuan_config_to_gpt_config(hf)
    assert cfg.use_alibi and cfg.rotary_emb_fraction == 0.0  # 13B -> alibi
    assert cfg.norm_head  # vocab > 70k -> v2 NormHead


def _btlm_ref_logits(sd, ids, hf):
    """fp32 jnp forward with HF BTLM semantics: GPT-2 skeleton, ALiBi,
    SwiGLU (c_fc2 gated), muP scalars, Conv1D (in,out) weights."""
    import math
    from flash_attn_tpu.modules.mha import MHA
    from flash_attn_tpu.utils.testing import attn_bias_from_alibi_slopes

    E, H = hf.hidden_size, hf.num_attention_heads
    d = E // H
    b, s = ids.shape
    eps = hf.layer_norm_epsilon
    a = {k: jnp.asarray(v) for k, v in sd.items()}

    def ln(x, w, bb):
        mu = x.mean(-1, keepdims=True)
        var = x.var(-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + eps) * w + bb

    x = a["transformer.wte.weight"][ids] * hf.mup_embeddings_scale
    slopes = MHA(embed_dim=E, num_heads=H, use_alibi=True)._alibi_slopes()
    bias = attn_bias_from_alibi_slopes(slopes, s, s, causal=True)
    scale = 1.0 / d if hf.mup_scale_qk_dot_by_d else 1.0 / math.sqrt(d)
    causal = jnp.tril(jnp.ones((s, s), bool))
    for i in range(hf.num_hidden_layers):
        p = f"transformer.h.{i}."
        h1 = ln(x, a[p + "ln_1.weight"], a[p + "ln_1.bias"])
        qkv = h1 @ a[p + "attn.c_attn.weight"] + a[p + "attn.c_attn.bias"]
        q, k, v = [t.reshape(b, s, H, d) for t in jnp.split(qkv, 3, -1)]
        scores = jnp.einsum("bshd,bthd->bhst", q, k) * scale + bias
        scores = jnp.where(causal, scores, -jnp.inf)
        o = jnp.einsum("bhst,bthd->bshd", jax.nn.softmax(scores, -1), v)
        x = x + (o.reshape(b, s, E) @ a[p + "attn.c_proj.weight"]
                 + a[p + "attn.c_proj.bias"])
        h2 = ln(x, a[p + "ln_2.weight"], a[p + "ln_2.bias"])
        gate = h2 @ a[p + "mlp.c_fc2.weight"] + a[p + "mlp.c_fc2.bias"]
        y = h2 @ a[p + "mlp.c_fc.weight"] + a[p + "mlp.c_fc.bias"]
        x = x + ((jax.nn.silu(gate) * y) @ a[p + "mlp.c_proj.weight"]
                 + a[p + "mlp.c_proj.bias"])
    x = ln(x, a["transformer.ln_f.weight"], a["transformer.ln_f.bias"])
    logits = x @ a["transformer.wte.weight"].T
    return logits * hf.mup_output_alpha * hf.mup_width_scale


def test_btlm():
    """No HF BTLM class ships with transformers (trust_remote_code model),
    so parity is checked against an inline jnp reference implementing the
    documented BTLM semantics."""
    from types import SimpleNamespace
    hf = SimpleNamespace(
        vocab_size=128, n_positions=0, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, n_inner=96, position_embedding_type="alibi",
        activation_function="swiglu", layer_norm_epsilon=1e-5,
        mup_width_scale=0.5, mup_embeddings_scale=3.0, mup_output_alpha=2.0,
        mup_scale_qk_dot_by_d=True,
    )
    rng = np.random.RandomState(0)
    E, inner = hf.hidden_size, hf.n_inner

    def w(*shape, s=0.05):
        return rng.randn(*shape).astype(np.float32) * s

    sd = {"transformer.wte.weight": w(hf.vocab_size, E),
          "transformer.ln_f.weight": 1 + w(E), "transformer.ln_f.bias": w(E),
          "transformer.relative_pe.slopes": w(hf.num_attention_heads)}
    for i in range(hf.num_hidden_layers):
        p = f"transformer.h.{i}."
        sd.update({
            p + "ln_1.weight": 1 + w(E), p + "ln_1.bias": w(E),
            p + "ln_2.weight": 1 + w(E), p + "ln_2.bias": w(E),
            p + "attn.c_attn.weight": w(E, 3 * E),
            p + "attn.c_attn.bias": w(3 * E),
            p + "attn.c_proj.weight": w(E, E), p + "attn.c_proj.bias": w(E),
            p + "mlp.c_fc.weight": w(E, inner), p + "mlp.c_fc.bias": w(inner),
            p + "mlp.c_fc2.weight": w(E, inner),
            p + "mlp.c_fc2.bias": w(inner),
            p + "mlp.c_proj.weight": w(inner, E),
            p + "mlp.c_proj.bias": w(E),
        })
    cfg = A.btlm_config_to_gpt_config(hf, dtype=jnp.float32,
                                      max_decode_seqlen=64)
    params = A.remap_state_dict_hf_btlm(sd, cfg)
    ids = np.asarray(rng.randint(0, hf.vocab_size, (2, 16)))
    ref = _btlm_ref_logits(sd, jnp.asarray(ids), hf)
    model = GPTLMHeadModel(cfg)
    logits = model.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               atol=2e-3, rtol=1e-2)


def test_norm_head():
    """Baichuan-v2 NormHead: logits use L2-column-normalized lm_head."""
    from flash_attn_tpu.models.gpt import GPTConfig
    cfg = GPTConfig(vocab_size=64, n_positions=0, n_embd=32, n_layer=1,
                    n_head=4, rotary_emb_fraction=1.0, use_rms_norm=True,
                    glu_act=True, n_inner=64, tie_word_embeddings=False,
                    norm_head=True, qkv_proj_bias=False, out_proj_bias=False,
                    mlp_bias=False, max_decode_seqlen=32, dtype=jnp.float32)
    model = GPTLMHeadModel(cfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 64, (2, 8)))
    params = model.init(jax.random.PRNGKey(0), ids)["params"]
    logits = model.apply({"params": params}, ids)
    kernel = params["lm_head"]["kernel"]
    norm = np.linalg.norm(np.asarray(kernel), axis=0, keepdims=True)
    params2 = dict(params)
    params2["lm_head"] = {"kernel": np.asarray(kernel) / norm}
    cfg2 = GPTConfig(**{**cfg.__dict__, "norm_head": False})
    logits2 = GPTLMHeadModel(cfg2).apply({"params": params2}, ids)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2),
                               atol=1e-5, rtol=1e-5)
