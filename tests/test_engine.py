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
    # pages were recycled back to the pool (page 0 is the reserved null page)
    assert len(pool.free) == num_pages - 1
    assert 0 not in pool.free


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


# ---------------------------------------------------------------------------
# Round 4: bucketed admission (bounded compile shapes) + multi-step decode
# blocks + padded-prefill page-safety (VERDICT r3 #5)
# ---------------------------------------------------------------------------

def test_bucketed_admission_bounds_prefill_shapes(model_and_params):
    """A mixed arrival trace with many distinct (rows, prompt-length)
    combinations must compile only a handful of bucketed prefill shapes —
    the reference's per-batch-size CUDA-graph bucketing
    (utils/generation.py:618) applied to the jitted prefill — and still
    produce exact per-request outputs."""
    model, params = model_and_params
    rng = np.random.default_rng(7)
    lengths = [3, 5, 6, 7, 9, 11, 13, 4, 10, 8, 12, 2]
    prompts = [rng.integers(0, 96, size=n).tolist() for n in lengths]

    eng = InferenceEngine(model, params, max_batch=4,
                          gen_cfg=GenerationConfig(top_k=1))
    # staggered arrivals: 1-3 requests become visible per engine step
    it = iter(prompts)
    ids, pending = [], list(prompts)
    k = 0
    while pending or eng.queue or any(s is not None for s in eng.slots):
        arrive = min(len(pending), 1 + (k % 3))
        for _ in range(arrive):
            ids.append(eng.submit(pending.pop(0), max_new_tokens=4))
        eng.step()
        k += 1
        assert k < 200
    results = {rid: eng.requests[rid].generated for rid in ids}
    # every distinct (rows, len) would be ~12 shapes unbucketed; the bucket
    # grid is pow2-rows x pow2-len >= 16 -> at most 3 x 1 here
    assert len(eng.prefill_shapes) <= 4, eng.prefill_shapes
    for shape in eng.prefill_shapes:
        assert shape[0] in (1, 2, 4) and shape[1] == 16, shape
    for rid, prompt in zip(ids, prompts):
        expect = _reference_generation(model, params, prompt, 4)
        assert results[rid] == expect, (rid, results[rid], expect)


@pytest.mark.parametrize("block", [2, 4])
def test_decode_block_matches_single_step(model_and_params, block):
    """decode_block_size=n (n tokens sampled per host round-trip via one
    jitted scan) produces exactly the single-step engine's outputs, incl.
    mid-block request completion (max_new not divisible by n)."""
    model, params = model_and_params
    rng = np.random.default_rng(3)
    jobs = [(rng.integers(0, 96, size=n).tolist(), m)
            for n, m in [(4, 5), (6, 7), (3, 3), (7, 9)]]

    def run(block_size):
        eng = InferenceEngine(model, params, max_batch=2,
                              gen_cfg=GenerationConfig(top_k=1),
                              decode_block_size=block_size)
        ids = [eng.submit(p, max_new_tokens=m) for p, m in jobs]
        return ids, eng.run()

    ids1, res1 = run(1)
    idsn, resn = run(block)
    for r1, rn in zip(ids1, idsn):
        assert res1[r1] == resn[rn], (res1[r1], resn[rn])


def test_stray_page_writes_cannot_clobber_sequences(model_and_params):
    """Regression (round-4): two stray-writer classes used to alias
    whichever sequence held page 0 — (a) the jitted decode step appends a
    token for EVERY slot, active or not, through table entries that default
    to 0; (b) a short prompt co-admitted with a long one is padded to the
    batch max and its scatter indexed table columns beyond its allocation
    (also 0). Fixes: page 0 is the PagePool null page (never allocated) and
    padded prefill writes are length-masked (kv_cache_update new_lengths).
    Pin the victim to the LOWEST allocatable page with inactive slots
    decoding alongside, co-admit a padded short+long pair, and require
    exact generation parity with the linear reference."""
    import dataclasses

    from flash_attn_tpu.serving.engine import PagePool

    model_lin, params = model_and_params
    page_size, num_pages = 16, 8
    cfg = dataclasses.replace(model_lin.config, paged_kv_num_pages=num_pages,
                              paged_kv_page_size=page_size)
    model = GPTLMHeadModel(cfg)

    rng = np.random.default_rng(5)
    victim = rng.integers(0, 96, size=9).tolist()   # 9 + 16 new -> 2 pages
    long_p = rng.integers(0, 96, size=20).tolist()  # pads the batch to 32
    short_p = rng.integers(0, 96, size=2).tolist()  # 1 page; padded writes
    # index table col 1 (unallocated) without the new_lengths mask

    pool = PagePool(num_pages, page_size, max_pages_per_seq=2, max_batch=3)
    pool.free.sort(reverse=True)  # pop() hands out the LOWEST page first
    eng = InferenceEngine(model, params, max_batch=3,
                          gen_cfg=GenerationConfig(top_k=1), page_pool=pool)
    vid = eng.submit(victim, max_new_tokens=16)
    eng.step()          # victim admitted alone; 2 inactive slots decode too
    assert pool.pages_of[0][0] == 1      # victim owns the lowest real page
    assert all(0 not in pgs for pgs in pool.pages_of.values())
    lid = eng.submit(long_p, max_new_tokens=2)
    sid = eng.submit(short_p, max_new_tokens=2)
    res = eng.run()
    assert res[vid] == _reference_generation(model_lin, params, victim, 16)
    assert res[lid] == _reference_generation(model_lin, params, long_p, 2)
    assert res[sid] == _reference_generation(model_lin, params, short_p, 2)


def test_engine_warmup_then_traffic_unchanged(model_and_params):
    """warmup() pre-executes the bucketed prefill + decode programs on
    dummy inputs and must leave engine state untouched: outputs after
    warmup equal outputs without it (the reference pre-captures decode
    graphs the same way, utils/generation.py:618)."""
    model, params = model_and_params
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, 96, size=n).tolist() for n in (5, 9)]

    cold = InferenceEngine(model, params, max_batch=2,
                           gen_cfg=GenerationConfig(top_k=1))
    ids_c = [cold.submit(p, max_new_tokens=6) for p in prompts]
    res_c = cold.run()

    warm = InferenceEngine(model, params, max_batch=2,
                           gen_cfg=GenerationConfig(top_k=1))
    warm.warmup(prefill_shapes=[(2, 16)])
    assert (2, 16) in warm.prefill_shapes
    offs = warm._offsets()
    assert int(np.max(np.abs(np.asarray(offs)))) == 0, "warmup moved offsets"
    ids_w = [warm.submit(p, max_new_tokens=6) for p in prompts]
    res_w = warm.run()
    for rc, rw in zip(ids_c, ids_w):
        assert res_c[rc] == res_w[rw]


def test_engine_reset_reuses_cache(model_and_params):
    """reset() clears requests/slots but keeps cache + compiled programs;
    a second trace on the same engine produces correct outputs."""
    model, params = model_and_params
    rng = np.random.default_rng(4)
    p1 = rng.integers(0, 96, size=7).tolist()
    p2 = rng.integers(0, 96, size=4).tolist()
    eng = InferenceEngine(model, params, max_batch=2,
                          gen_cfg=GenerationConfig(top_k=1))
    r1 = eng.submit(p1, max_new_tokens=5)
    first = eng.run()[r1]
    kv_before = max(jax.tree.leaves(eng.cache), key=lambda x: x.nbytes)
    eng.reset()
    kv_after = max(jax.tree.leaves(eng.cache), key=lambda x: x.nbytes)
    assert kv_after is kv_before  # KV arrays kept, no realloc
    r2 = eng.submit(p2, max_new_tokens=5)
    second = eng.run()[r2]
    assert second == _reference_generation(model, params, p2, 5)
    assert first == _reference_generation(model, params, p1, 5)


def test_engine_freed_by_refcount(model_and_params):
    """The engine must hold NO self-referential cycle through its jitted
    closures: dropping the last reference frees the engine (and its
    multi-GB cache) immediately, without the cycle GC. Round-4 regression:
    closures over `self` kept a 6 GB cache alive into the next engine's
    allocation and OOM'd the chip."""
    import weakref

    model, params = model_and_params
    eng = InferenceEngine(model, params, max_batch=2,
                          gen_cfg=GenerationConfig(top_k=1))
    eng.submit([1, 2, 3], max_new_tokens=2)
    eng.run()
    ref = weakref.ref(eng)
    del eng
    assert ref() is None, "engine survived refcount release (cycle)"


def _paged_engine(model_and_params, prefix_cache, num_pages=None,
                  page_size=16, max_batch=2):
    import dataclasses
    from flash_attn_tpu.models.gpt import GPTLMHeadModel
    from flash_attn_tpu.serving.engine import PagePool

    model_lin, params = model_and_params
    cfg_lin = model_lin.config
    mpps = (cfg_lin.max_decode_seqlen + page_size - 1) // page_size
    if num_pages is None:
        num_pages = max_batch * mpps + 8
    cfg = dataclasses.replace(cfg_lin, paged_kv_num_pages=num_pages,
                              paged_kv_page_size=page_size)
    model = GPTLMHeadModel(cfg)
    pool = PagePool(num_pages, page_size, mpps, max_batch=max_batch)
    eng = InferenceEngine(model, params, max_batch=max_batch,
                          gen_cfg=GenerationConfig(top_k=1),
                          page_pool=pool, prefix_cache=prefix_cache)
    return eng, pool


def test_engine_prefix_cache_matches_plain(model_and_params):
    """Prefix-cached engine (round 5, vLLM-style automatic prefix caching:
    chain-hashed full pages shared + suffix-only chunked prefill through
    the packed paged-varlen kernel) decodes greedily to the same tokens as
    the plain paged engine, and actually HITS the cache."""
    rng = np.random.default_rng(11)
    common = rng.integers(0, 96, size=37).tolist()  # >2 full 16-tok pages
    jobs = [(common + rng.integers(0, 96, size=k).tolist(), 6)
            for k in (5, 9, 2, 7)]

    eng_plain, _ = _paged_engine(model_and_params, prefix_cache=False)
    ids1 = [eng_plain.submit(p, max_new_tokens=m) for p, m in jobs]
    res_plain = eng_plain.run()

    eng_px, pool = _paged_engine(model_and_params, prefix_cache=True)
    ids2 = [eng_px.submit(p, max_new_tokens=m) for p, m in jobs]
    res_px = eng_px.run()

    for r1, r2 in zip(ids1, ids2):
        assert res_plain[r1] == res_px[r2], (res_plain[r1], res_px[r2])
    # the shared 2 full pages were reused by later requests. Requests
    # admitted in the SAME batch cannot share (pages register after the
    # batch's prefill), so with max_batch=2 the first two jobs prefill
    # fresh and the last two hit 2 pages each.
    assert eng_px.prefix_hit_pages >= 2 * (len(jobs) - 2), \
        eng_px.prefix_hit_pages
    # all non-retained pages returned; retained pages stay warm
    assert not pool.rc, pool.rc
    assert len(pool.retained) > 0


def test_engine_prefix_cache_retention_and_eviction(model_and_params):
    """Retained prefix pages are reused after their owner completes, and
    reclaimed (with index purge) under pool pressure."""
    rng = np.random.default_rng(13)
    common = rng.integers(0, 96, size=33).tolist()

    # pool sized so retention must be evicted for unrelated prompts
    eng, pool = _paged_engine(model_and_params, prefix_cache=True,
                              num_pages=10, page_size=16, max_batch=1)
    r1 = eng.submit(common + [1, 2], max_new_tokens=4)
    out1 = eng.run()[r1]
    assert eng.prefix_hit_pages == 0
    hits0 = eng.prefix_hit_pages
    # same prefix again: hits the retained pages
    r2 = eng.submit(common + [3], max_new_tokens=4)
    eng.run()
    assert eng.prefix_hit_pages > hits0
    # unrelated prompts large enough to force eviction of the retained run
    for _ in range(3):
        rid = eng.submit(rng.integers(0, 96, size=40), max_new_tokens=4)
        eng.run()
    # the index was purged for evicted pages (no stale entries pointing at
    # recycled pages) — re-submitting the common prefix still decodes the
    # same tokens as the first time
    r3 = eng.submit(common + [1, 2], max_new_tokens=4)
    out3 = eng.run()[r3]
    assert out3 == out1


def test_engine_prefix_cache_in_batch_sharing(model_and_params):
    """Parallel sampling: same-prompt requests admitted in ONE batch share
    the prefix pages of the first row (safe: every row's KV write
    completes before any row's attention in the same prefill call)."""
    rng = np.random.default_rng(17)
    common = rng.integers(0, 96, size=37).tolist()
    jobs = [(common + rng.integers(0, 96, size=k).tolist(), 5)
            for k in (4, 6, 3, 8)]

    eng_plain, _ = _paged_engine(model_and_params, prefix_cache=False,
                                 max_batch=4)
    ids1 = [eng_plain.submit(p, max_new_tokens=m) for p, m in jobs]
    res_plain = eng_plain.run()

    eng_px, pool = _paged_engine(model_and_params, prefix_cache=True,
                                 max_batch=4)
    ids2 = [eng_px.submit(p, max_new_tokens=m) for p, m in jobs]
    res_px = eng_px.run()
    for r1, r2 in zip(ids1, ids2):
        assert res_plain[r1] == res_px[r2], (res_plain[r1], res_px[r2])
    # all 4 admitted together; rows 2-4 share row 1's two full pages
    assert eng_px.prefix_hit_pages >= 2 * 3, eng_px.prefix_hit_pages


def test_engine_stats(model_and_params):
    eng, pool = _paged_engine(model_and_params, prefix_cache=True)
    eng.submit([1, 2, 3, 4, 5] * 8, max_new_tokens=3)
    eng.step()
    st = eng.stats()
    assert st["active_slots"] == 1 and st["max_batch"] == 2
    assert st["pool_active_pages"] > 0
    assert "prefix_hit_pages" in st
    eng.run()
    st = eng.stats()
    assert st["active_slots"] == 0 and not st["pending_block"]


def test_engine_cancel(model_and_params):
    """cancel() drops queued requests and releases active slots; other
    requests' outputs are unaffected (greedy equality with a plain run)."""
    model, params = model_and_params
    rng = np.random.default_rng(23)
    p1 = rng.integers(0, 96, size=7).tolist()
    p2 = rng.integers(0, 96, size=5).tolist()
    p3 = rng.integers(0, 96, size=6).tolist()

    eng = InferenceEngine(model, params, max_batch=2,
                          gen_cfg=GenerationConfig(top_k=1))
    r1 = eng.submit(p1, max_new_tokens=8)
    r2 = eng.submit(p2, max_new_tokens=8)
    r3 = eng.submit(p3, max_new_tokens=8)  # queued (2 slots)
    eng.step()  # admits r1, r2
    assert eng.cancel(r3) is True      # cancel while queued
    assert eng.cancel(r2) is True      # cancel while active
    assert eng.cancel(999) is False
    res = eng.run()
    assert res[r1] == _reference_generation(model, params, p1, 8)
    assert len(res[r3]) == 0
    assert eng.cancel(r1) is False     # already finished
    assert eng.stats()["active_slots"] == 0


def test_engine_randomized_stress_invariants(model_and_params):
    """Randomized submit/cancel/step trace over the prefix-cached paged
    engine: page accounting must stay exact (every page is free, retained,
    or refcounted — no leaks, no double-frees) and every non-cancelled
    request completes with <= max_new_tokens."""
    rng = np.random.default_rng(31)
    eng, pool = _paged_engine(model_and_params, prefix_cache=True,
                              num_pages=14, page_size=16, max_batch=2)
    total_pages = 14 - 1  # page 0 = null
    common = rng.integers(0, 96, size=20).tolist()
    live = []
    for it in range(40):
        op = rng.random()
        if op < 0.4 and len(live) < 6:
            base = common if rng.random() < 0.5 else []
            p = base + rng.integers(0, 96,
                                    size=int(rng.integers(1, 30))).tolist()
            live.append(eng.submit(p, max_new_tokens=int(
                rng.integers(1, 6))))
        elif op < 0.5 and live:
            eng.cancel(live.pop(int(rng.integers(0, len(live)))))
        else:
            eng.step()
        # page accounting invariant after every operation: every page is
        # exactly one of {free, retained, refcounted}, and the refcounted
        # set equals the union of slot holdings
        held = {pg for pages in pool.pages_of.values() for pg in pages}
        assert set(pool.rc) == held, (pool.rc, held)
        assert len(pool.free) + len(pool.retained) + len(pool.rc) \
            == total_pages, (len(pool.free), len(pool.retained),
                             len(pool.rc))
        assert not (set(pool.free) & set(pool.retained))
        assert not (set(pool.free) & set(pool.rc))
    eng.run()
    for rid, req in eng.requests.items():
        assert req.done, rid
        assert len(req.generated) <= req.max_new_tokens, \
            (rid, len(req.generated))
    # drained: everything back to free or retained
    assert len(pool.free) + len(pool.retained) == total_pages


@pytest.mark.parametrize("perfect_draft", [False, True])
def test_engine_speculative_matches_plain(model_and_params, perfect_draft):
    """Speculative continuous batching (round 5): per-round draft-propose /
    target-verify with per-slot acceptance + cache rewinds must decode
    greedily to EXACTLY the plain engine's outputs (the probability-ratio
    test is lossless; greedy is exact), across staggered admissions and
    slot reuse — with both a disagreeing draft (low acceptance) and the
    target itself as draft (full acceptance)."""
    model, params = model_and_params
    if perfect_draft:
        draft_model, draft_params = model, params
    else:
        from flash_attn_tpu.models.gpt import GPTLMHeadModel
        draft_model = GPTLMHeadModel(model.config)
        draft_params = draft_model.init(
            jax.random.PRNGKey(42), jnp.zeros((1, 8), jnp.int32))["params"]

    rng = np.random.default_rng(29)
    jobs = [(rng.integers(0, 96, size=n).tolist(), m)
            for n, m in [(6, 9), (4, 5), (8, 12), (3, 7), (5, 3)]]

    plain = InferenceEngine(model, params, max_batch=2,
                            gen_cfg=GenerationConfig(top_k=1))
    ids1 = [plain.submit(p, max_new_tokens=m) for p, m in jobs]
    res_plain = plain.run()

    spec = InferenceEngine(model, params, max_batch=2,
                           gen_cfg=GenerationConfig(top_k=1),
                           draft_model=draft_model,
                           draft_params=draft_params, speculative_k=3)
    ids2 = [spec.submit(p, max_new_tokens=m) for p, m in jobs]
    res_spec = spec.run()
    for r1, r2 in zip(ids1, ids2):
        assert res_plain[r1] == res_spec[r2], (res_plain[r1], res_spec[r2])


def test_engine_speculative_paged(model_and_params):
    """Speculative rounds against a PAGED target cache (rewind margin in
    the page allocation) still match the plain engine exactly."""
    model, params = model_and_params
    from flash_attn_tpu.models.gpt import GPTLMHeadModel
    draft_model = GPTLMHeadModel(model.config)
    draft_params = draft_model.init(
        jax.random.PRNGKey(43), jnp.zeros((1, 8), jnp.int32))["params"]

    rng = np.random.default_rng(37)
    jobs = [(rng.integers(0, 96, size=n).tolist(), m)
            for n, m in [(7, 8), (5, 6), (4, 10)]]

    plain, _ = _paged_engine(model_and_params, prefix_cache=False)
    ids1 = [plain.submit(p, max_new_tokens=m) for p, m in jobs]
    res_plain = plain.run()

    import dataclasses
    from flash_attn_tpu.serving.engine import PagePool
    cfg_lin = model.config
    page_size = 16
    mpps = (cfg_lin.max_decode_seqlen + page_size - 1) // page_size
    num_pages = 2 * mpps + 8
    cfg_paged = dataclasses.replace(cfg_lin, paged_kv_num_pages=num_pages,
                                    paged_kv_page_size=page_size)
    model_paged = GPTLMHeadModel(cfg_paged)
    pool = PagePool(num_pages, page_size, mpps, max_batch=2)
    spec = InferenceEngine(model_paged, params, max_batch=2,
                           gen_cfg=GenerationConfig(top_k=1),
                           page_pool=pool, draft_model=draft_model,
                           draft_params=draft_params, speculative_k=3)
    ids2 = [spec.submit(p, max_new_tokens=m) for p, m in jobs]
    res_spec = spec.run()
    for r1, r2 in zip(ids1, ids2):
        assert res_plain[r1] == res_spec[r2], (res_plain[r1], res_spec[r2])
