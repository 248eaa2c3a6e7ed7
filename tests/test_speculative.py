"""Speculative decoding: greedy equivalence with the target model's own
decode, and acceptance accounting (reference decode_speculative contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from flash_attn_tpu.serving.generation import GenerationConfig, decode
from flash_attn_tpu.serving.speculative import decode_speculative


def _make(vocab, layers, embd, heads, key):
    cfg = GPTConfig(
        vocab_size=vocab, n_positions=0, n_embd=embd, n_layer=layers,
        n_head=heads, rotary_emb_fraction=1.0, use_rms_norm=True,
        glu_act=True, max_decode_seqlen=64, dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    params = model.init(key, jnp.zeros((1, 8), jnp.int32))["params"]
    return model, params


@pytest.mark.parametrize("spec_k", [1, 3])
def test_speculative_greedy_equivalence(spec_k):
    target_model, target_params = _make(96, 2, 64, 4, jax.random.PRNGKey(0))
    draft_model, draft_params = _make(96, 1, 32, 2, jax.random.PRNGKey(1))

    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 6), 0, 96)
    cfg = GenerationConfig(max_length=24, top_k=1)

    ref_seqs, _ = decode(ids, target_model, target_params, cfg)
    spec_seqs, n_calls = decode_speculative(
        ids, target_model, target_params, draft_model, draft_params, cfg,
        speculative_k=spec_k,
    )
    np.testing.assert_array_equal(np.asarray(spec_seqs), np.asarray(ref_seqs))
    assert n_calls <= cfg.max_length - 6  # never worse than 1 call/token


def test_speculative_perfect_draft_accepts_everything():
    """Draft == target: every proposal accepted, so target calls ~ len/(k+1)."""
    model, params = _make(96, 2, 64, 4, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 4), 0, 96)
    k = 4
    cfg = GenerationConfig(max_length=32, top_k=1)
    seqs, n_calls = decode_speculative(
        ids, model, params, model, params, cfg, speculative_k=k)
    new_tokens = 32 - 4
    max_calls = -(-new_tokens // (k + 1)) + 2
    assert n_calls <= max_calls, (n_calls, max_calls)
    ref_seqs, _ = decode(ids, model, params, cfg)
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(ref_seqs))
