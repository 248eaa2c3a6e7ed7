"""Continuous-batching engine tests: per-request outputs must equal the
standalone greedy decode, across staggered admissions and slot reuse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel
from flash_attn_tpu.serving.engine import InferenceEngine
from flash_attn_tpu.serving.generation import GenerationConfig, decode


@pytest.fixture(scope="module")
def model_and_params():
    cfg = GPTConfig(
        vocab_size=96, n_positions=0, n_embd=64, n_layer=2, n_head=4,
        rotary_emb_fraction=1.0, use_rms_norm=True, glu_act=True,
        max_decode_seqlen=64, dtype=jnp.float32,
    )
    model = GPTLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    return model, params


def _reference_generation(model, params, prompt, n_new):
    """Standalone greedy decode for one prompt."""
    ids = jnp.asarray([prompt], jnp.int32)
    cfg = GenerationConfig(max_length=len(prompt) + n_new, top_k=1)
    seqs, _ = decode(ids, model, params, cfg)
    return [int(x) for x in np.asarray(seqs)[0][len(prompt):]]


def test_engine_matches_standalone_decode(model_and_params):
    model, params = model_and_params
    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, 96, size=n).tolist() for n in (5, 9, 3, 7)]
    n_new = 10

    engine = InferenceEngine(model, params, max_batch=2,
                             gen_cfg=GenerationConfig(top_k=1))
    ids = [engine.submit(p, max_new_tokens=n_new) for p in prompts]
    results = engine.run()

    for rid, prompt in zip(ids, prompts):
        expect = _reference_generation(model, params, prompt, n_new)
        assert results[rid] == expect, (rid, results[rid], expect)


def test_engine_slot_reuse_and_mixed_lengths(model_and_params):
    """More requests than slots with different max_new_tokens: all complete
    with exact per-request outputs; slots recycled."""
    model, params = model_and_params
    rng = np.random.default_rng(1)
    jobs = [(rng.integers(0, 96, size=n).tolist(), m)
            for n, m in [(4, 3), (6, 12), (2, 5), (8, 8), (5, 2)]]
    engine = InferenceEngine(model, params, max_batch=2,
                             gen_cfg=GenerationConfig(top_k=1))
    ids = [engine.submit(p, max_new_tokens=m) for p, m in jobs]
    results = engine.run()
    for rid, (prompt, m) in zip(ids, jobs):
        assert len(results[rid]) == m
        expect = _reference_generation(model, params, prompt, m)
        assert results[rid] == expect


def test_engine_paged_matches_linear(model_and_params):
    """Paged-cache engine (page pool, dynamic allocation, page recycling)
    produces exactly the same outputs as the linear-cache engine."""
    import dataclasses
    from flash_attn_tpu.serving.engine import PagePool

    model_lin, params = model_and_params
    cfg_lin = model_lin.config
    page_size = 16
    max_pages_per_seq = (cfg_lin.max_decode_seqlen + page_size - 1) // page_size
    num_pages = 2 * max_pages_per_seq + 2  # tight pool: forces recycling
    cfg_paged = dataclasses.replace(
        cfg_lin, paged_kv_num_pages=num_pages,
        paged_kv_page_size=page_size)
    from flash_attn_tpu.models.gpt import GPTLMHeadModel
    model_paged = GPTLMHeadModel(cfg_paged)

    rng = np.random.default_rng(3)
    jobs = [(rng.integers(0, 96, size=n).tolist(), m)
            for n, m in [(5, 8), (7, 6), (3, 10), (6, 4)]]

    eng_lin = InferenceEngine(model_lin, params, max_batch=2,
                              gen_cfg=GenerationConfig(top_k=1))
    ids1 = [eng_lin.submit(p, max_new_tokens=m) for p, m in jobs]
    res_lin = eng_lin.run()

    pool = PagePool(num_pages, page_size, max_pages_per_seq, max_batch=2)
    eng_paged = InferenceEngine(model_paged, params, max_batch=2,
                                gen_cfg=GenerationConfig(top_k=1),
                                page_pool=pool)
    ids2 = [eng_paged.submit(p, max_new_tokens=m) for p, m in jobs]
    res_paged = eng_paged.run()

    for r1, r2 in zip(ids1, ids2):
        assert res_lin[r1] == res_paged[r2], (res_lin[r1], res_paged[r2])
    # pages were recycled back to the pool
    assert len(pool.free) == num_pages


def test_engine_token_budgeted_admission(model_and_params):
    """max_admit_tokens chunks admission across steps (bounded prefill
    activation memory) without changing greedy outputs."""
    model, params = model_and_params
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, 96, size=n).tolist() for n in (9, 8, 7, 6)]
    n_new = 6

    eng = InferenceEngine(model, params, max_batch=4,
                          gen_cfg=GenerationConfig(top_k=1),
                          max_admit_tokens=10)  # 1 row of 9 > 10/2 -> chunks
    ids = [eng.submit(p, max_new_tokens=n_new) for p in prompts]
    results = eng.run()
    for rid, prompt in zip(ids, prompts):
        expect = _reference_generation(model, params, prompt, n_new)
        assert results[rid] == expect, (rid, results[rid], expect)


def test_chunked_slot_prefill_matches_full(model_and_params):
    """Slot-mapped prefill in row chunks against one shared cache produces
    the same next tokens and decode state as whole-batch prefill (the
    serving bench's batch-chunked prefill path)."""
    model, params = model_and_params
    b, plen = 4, 24
    ids = jax.random.randint(jax.random.PRNGKey(3), (b, plen), 0, 96)

    last = jnp.full((b,), plen - 1, jnp.int32)
    lg_full, st_full = model.apply(
        {"params": params}, ids, mode="prefill", mutable=["cache"],
        logits_positions=last)
    tok_full = np.asarray(jnp.argmax(lg_full[:, -1], -1))

    _, st0 = model.apply(
        {"params": params}, jnp.zeros((b, 8), jnp.int32), mode="prefill",
        mutable=["cache"], slot_ids=jnp.arange(b),
        prefill_lengths=jnp.zeros((b,), jnp.int32))
    cache = st0["cache"]
    toks = []
    for lo in range(0, b, 2):
        lengths = jnp.full((2,), plen, jnp.int32)
        lg, st = model.apply(
            {"params": params, "cache": cache}, ids[lo:lo + 2],
            mode="prefill", mutable=["cache"],
            slot_ids=jnp.arange(lo, lo + 2), prefill_lengths=lengths,
            logits_positions=lengths - 1)
        cache = st["cache"]
        toks.append(np.asarray(jnp.argmax(lg[:, 0], -1)))
    np.testing.assert_array_equal(tok_full, np.concatenate(toks))

    # one decode step from each cache agrees too
    lg1, _ = model.apply({"params": params, "cache": st_full["cache"]},
                         jnp.asarray(tok_full)[:, None], mode="decode",
                         mutable=["cache"])
    lg2, _ = model.apply({"params": params, "cache": cache},
                         jnp.asarray(tok_full)[:, None], mode="decode",
                         mutable=["cache"])
    np.testing.assert_array_equal(
        np.asarray(jnp.argmax(lg1[:, -1], -1)),
        np.asarray(jnp.argmax(lg2[:, -1], -1)))


def test_engine_fp8_paged_crossing(model_and_params):
    """FP8 KV cache x paged pool x continuous batching: the quantized
    paged engine decodes greedily to the same tokens as the bf16 linear
    engine on a low-entropy model (round-3 crossing; fp8 quantization can
    flip near-ties, so the model here is the shared tiny fixture whose
    logits gaps are large)."""
    import dataclasses
    from flash_attn_tpu.serving.engine import PagePool
    from flash_attn_tpu.models.gpt import GPTLMHeadModel

    model_lin, params = model_and_params
    cfg_lin = model_lin.config
    page_size = 64
    max_pages_per_seq = (cfg_lin.max_decode_seqlen + page_size - 1) // page_size
    num_pages = 2 * max_pages_per_seq + 2
    cfg_q = dataclasses.replace(
        cfg_lin, paged_kv_num_pages=num_pages,
        paged_kv_page_size=page_size,
        kv_cache_dtype=jnp.float8_e4m3fn, kv_cache_scale=1.0)
    model_q = GPTLMHeadModel(cfg_q)

    rng = np.random.default_rng(7)
    jobs = [(rng.integers(0, 96, size=n).tolist(), m)
            for n, m in [(5, 6), (4, 8)]]

    eng_lin = InferenceEngine(model_lin, params, max_batch=2,
                              gen_cfg=GenerationConfig(top_k=1))
    ids1 = [eng_lin.submit(p, max_new_tokens=m) for p, m in jobs]
    res_lin = eng_lin.run()

    pool = PagePool(num_pages, page_size, max_pages_per_seq, max_batch=2)
    eng_q = InferenceEngine(model_q, params, max_batch=2,
                            gen_cfg=GenerationConfig(top_k=1),
                            page_pool=pool)
    ids2 = [eng_q.submit(p, max_new_tokens=m) for p, m in jobs]
    res_q = eng_q.run()
    # fp8 cache quantization: allow a small number of token divergences
    total = mismatches = 0
    for r1, r2 in zip(ids1, ids2):
        a, b = res_lin[r1], res_q[r2]
        total += len(a)
        mismatches += sum(x != y for x, y in zip(a, b))
    assert mismatches <= max(1, total // 4), (mismatches, total)


def test_engine_eos_early_release(model_and_params):
    """eos_token_id finishes a request early and frees its slot for the
    next admission (continuous batching semantics)."""
    model, params = model_and_params
    # find the model's greedy first-token for a prompt, use it as EOS so
    # the request finishes immediately after one decode step
    probe = InferenceEngine(model, params, max_batch=2,
                            gen_cfg=GenerationConfig(top_k=1))
    rid = probe.submit([1, 2, 3], max_new_tokens=4)
    toks = probe.run()[rid]
    eos = toks[0]

    eng = InferenceEngine(model, params, max_batch=1,
                          gen_cfg=GenerationConfig(top_k=1,
                                                   eos_token_id=int(eos)))
    r1 = eng.submit([1, 2, 3], max_new_tokens=32)
    r2 = eng.submit([5, 6, 7, 8], max_new_tokens=2)
    out = eng.run(max_steps=40)
    # r1 ended at the eos token (far before 32 new tokens)
    assert len(out[r1]) <= 2, out[r1]
    # r2 still ran (slot was released and re-admitted)
    assert len(out[r2]) >= 1
