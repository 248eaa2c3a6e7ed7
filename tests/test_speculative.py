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


def test_speculative_batched_greedy_equivalence():
    """batch > 1 (beyond the reference's batch-1 assert, generation.py:302):
    every row must equal the target's own greedy decode."""
    target_model, target_params = _make(96, 2, 64, 4, jax.random.PRNGKey(0))
    draft_model, draft_params = _make(96, 1, 32, 2, jax.random.PRNGKey(1))
    ids = jax.random.randint(jax.random.PRNGKey(5), (3, 6), 0, 96)
    cfg = GenerationConfig(max_length=20, top_k=1)
    ref_seqs, _ = decode(ids, target_model, target_params, cfg)
    spec_seqs, _ = decode_speculative(
        ids, target_model, target_params, draft_model, draft_params, cfg,
        speculative_k=3)
    np.testing.assert_array_equal(np.asarray(spec_seqs), np.asarray(ref_seqs))


def test_sample_speculative_distribution():
    """Probability-ratio acceptance must reproduce the target distribution
    exactly (Leviathan et al. Alg. 1; reference sample_speculative:209):
    check the marginal of the FIRST emitted token against p_target."""
    from flash_attn_tpu.serving.speculative import sample_speculative

    rng = np.random.RandomState(0)
    vocab, k = 8, 3
    lt = jnp.asarray(rng.randn(1, k + 1, vocab), jnp.float32)
    ld = jnp.asarray(rng.randn(1, k, vocab), jnp.float32)
    p_t = np.asarray(jax.nn.softmax(lt[0, 0]))
    p_d = np.asarray(jax.nn.softmax(ld[0, 0]))

    n = 20000
    counts = np.zeros(vocab)
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    dkeys = jax.random.split(jax.random.PRNGKey(1), n)

    @jax.jit
    def one(key, dkey):
        toks = jax.random.categorical(dkey, jnp.broadcast_to(ld[:, :, :],
                                                             (1, k, vocab)),
                                      axis=-1).astype(jnp.int32)
        tokens, num = sample_speculative(lt, ld, toks, key,
                                         top_k=0, top_p=0.0)
        return tokens[0, 0]

    firsts = np.asarray(jax.vmap(one)(keys, dkeys))
    for v in range(vocab):
        counts[v] = (firsts == v).sum()
    emp = counts / n
    np.testing.assert_allclose(emp, p_t, atol=0.015)


def test_speculative_sampling_runs_and_terminates():
    """Non-greedy config end-to-end smoke: finishes, right shapes, tokens in
    vocab."""
    target_model, target_params = _make(64, 2, 64, 4, jax.random.PRNGKey(0))
    draft_model, draft_params = _make(64, 1, 32, 2, jax.random.PRNGKey(1))
    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 5), 0, 64)
    cfg = GenerationConfig(max_length=18, top_k=8, temperature=0.9)
    seqs, n_calls = decode_speculative(
        ids, target_model, target_params, draft_model, draft_params, cfg,
        speculative_k=3, rng=jax.random.PRNGKey(11))
    assert seqs.shape == (2, 18)
    assert int(seqs.max()) < 64 and int(seqs.min()) >= 0
    assert n_calls >= 2


def test_speculative_min_p_runs_and_terminates():
    """min_p filtering composes with speculative decoding (round-3: the
    filter applies to both target and draft distributions, preserving the
    probability-ratio acceptance's target-equivalence)."""
    tm, tp = _make(96, 2, 64, 4, jax.random.PRNGKey(0))
    dm, dp = _make(96, 1, 32, 2, jax.random.PRNGKey(1))
    cfg = GenerationConfig(max_length=16, top_k=0, top_p=0.0,
                           min_p=0.1, temperature=0.9)
    ids = jax.random.randint(jax.random.PRNGKey(4), (2, 6), 0, 96)
    seqs, calls = decode_speculative(ids, tm, tp, dm, dp, cfg,
                                     speculative_k=3,
                                     rng=jax.random.PRNGKey(7))
    assert seqs.shape[1] == 16
    assert (np.asarray(seqs) >= 0).all() and (np.asarray(seqs) < 96).all()
