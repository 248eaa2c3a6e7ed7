"""Speculative decoding: draft proposes, target verifies in one forward.

Parity surface for the reference ``decode_speculative``
(flash_attn/utils/generation.py:269) and ``sample_speculative`` (:209 —
Algorithm 1 of Leviathan et al., arXiv:2211.17192: accept draft token t_i
with probability min(1, p_target(t_i)/p_draft(t_i)); on first rejection,
resample from clamp(p_target - p_draft, 0)). Beyond the reference (which
asserts batch_size == 1 at generation.py:302), this implementation batches:
the KV caches keep *per-row* offsets (modules/mha.py stores ``offset`` as a
(b,) vector for continuous batching), so each sequence's accept count
rewinds its own cache row independently.

The target scores the k proposed tokens in a single kvcache forward
(seqlen_q = k+1 through the decode kernel's GQA-packed path); rejected
suffixes are rolled back by rewinding per-row cache offsets — entries past
the offset are dead and get overwritten, so rollback is O(1).

Greedy guarantee (top_k=1): output equals the target model's own greedy
decode. Sampling guarantee: each emitted token is distributed exactly as a
sample from the (filtered) target distribution.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from flash_attn_tpu.serving.generation import GenerationConfig, sample_token

__all__ = ["decode_speculative", "sample_speculative"]


def _filter_logits(logits, top_k: int, top_p: float, temperature: float,
                   min_p: float = 0.0):
    logits = logits.astype(jnp.float32)
    if temperature != 1.0:
        logits = logits / temperature
    if top_k > 0:
        kth = jax.lax.top_k(logits, min(top_k, logits.shape[-1]))[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p > 0.0 and top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    if min_p > 0.0:
        # drop tokens with p < min_p * p_max (generation.py sample_token
        # semantics); applied to BOTH target and draft distributions so
        # the probability-ratio acceptance keeps target-equivalence
        probs = jax.nn.softmax(logits, axis=-1)
        pmax = jnp.max(probs, axis=-1, keepdims=True)
        logits = jnp.where(probs < min_p * pmax, -jnp.inf, logits)
    return logits


def sample_speculative(logits, logits_draft, tokens_draft, key,
                       top_k: int = 1, top_p: float = 0.0,
                       temperature: float = 1.0, min_p: float = 0.0):
    """Vectorized speculative acceptance (reference generation.py:209).

    Arguments:
        logits: (b, k+1, vocab) target logits after each of [cur, p_1..p_k]
        logits_draft: (b, k, vocab) draft logits after each of [cur, p_1..p_{k-1}]
        tokens_draft: (b, k) the draft's proposals p_1..p_k
    Returns:
        tokens: (b, k+1) — first ``num`` entries valid per row
        num: (b,) in [1, k+1] accepted+resampled token count per row
    """
    b, k1, vocab = logits.shape
    k = k1 - 1
    lt = _filter_logits(logits, top_k, top_p, temperature, min_p)
    ld = _filter_logits(logits_draft, top_k, top_p, temperature, min_p)
    pt = jax.nn.softmax(lt, axis=-1)          # (b, k+1, v)
    pd = jax.nn.softmax(ld, axis=-1)          # (b, k, v)

    ukey, rkey = jax.random.split(key)
    u = jax.random.uniform(ukey, (b, k))
    take = lambda p, t: jnp.take_along_axis(p, t[..., None], axis=-1)[..., 0]
    accepted = u * take(pd, tokens_draft) <= take(pt[:, :-1], tokens_draft)
    all_acc = jnp.all(accepted, axis=-1)
    first_rej = jnp.where(all_acc, k, jnp.argmin(accepted.astype(jnp.int32),
                                                 axis=-1))
    # Resample distribution at the first rejected position; if everything was
    # accepted, sample the bonus token from the target's last distribution.
    probs_diff = jnp.clip(pt[:, :-1] - pd, 0.0, None)
    resample_probs = jnp.concatenate([probs_diff, pt[:, -1:]], axis=1)
    at_rej = jnp.take_along_axis(
        resample_probs, first_rej[:, None, None], axis=1)[:, 0]  # (b, v)
    # Degenerate guard: p_t - p_d can be all-zero (identical dists); fall
    # back to the target distribution at that position.
    z = jnp.sum(at_rej, axis=-1, keepdims=True)
    pt_at = jnp.take_along_axis(pt, first_rej[:, None, None], axis=1)[:, 0]
    at_rej = jnp.where(z > 0, at_rej, pt_at)
    resample = jax.random.categorical(
        rkey, jnp.log(jnp.clip(at_rej, 1e-30, None)), axis=-1).astype(jnp.int32)

    tokens = jnp.concatenate(
        [tokens_draft.astype(jnp.int32),
         jnp.zeros((b, 1), jnp.int32)], axis=1)
    tokens = jnp.where(
        jnp.arange(k + 1)[None, :] == first_rej[:, None],
        resample[:, None], tokens)
    return tokens, first_rej + 1


def _rewind_cache(cache, delta):
    """Subtract (b,)-vector or scalar delta from every layer's offset."""
    def fix(path, leaf):
        if getattr(path[-1], "key", None) == "offset":
            return leaf - delta
        return leaf

    return jax.tree_util.tree_map_with_path(fix, cache)


def decode_speculative(
    input_ids,        # (b, prompt_len)
    target_model, target_params,
    draft_model, draft_params,
    cfg: GenerationConfig,
    speculative_k: int = 4,
    rng: Optional[jax.Array] = None,
):
    """Speculative decoding, greedy or sampled, batch >= 1.

    Returns (sequences (b, max_length), num_target_calls)."""
    b, prompt_len = input_ids.shape
    max_len = cfg.max_length
    k = speculative_k
    rng = jax.random.PRNGKey(0) if rng is None else rng

    def _prefill(model):
        def f(params, ids):
            logits, state = model.apply(
                {"params": params}, ids, mode="prefill", mutable=["cache"])
            return logits[:, -1], state["cache"]
        return jax.jit(f)

    def _decode(model):
        def f(params, cache, toks):  # toks (b, L) -> logits per position
            logits, state = model.apply(
                {"params": params, "cache": cache}, toks,
                mode="decode", mutable=["cache"])
            return logits, state["cache"]
        return jax.jit(f)

    t_prefill = _prefill(target_model)
    d_prefill = _prefill(draft_model)
    t_decode = _decode(target_model)
    d_decode = _decode(draft_model)

    sample_fn = jax.jit(lambda lt, ld, td, key: sample_speculative(
        lt, ld, td, key, top_k=cfg.top_k, top_p=cfg.top_p,
        temperature=cfg.temperature, min_p=cfg.min_p))

    logits_last, t_cache = t_prefill(target_params, input_ids)
    # Draft-cache convention: at every round start it holds KV for
    # committed[:-2]; the round feeds the last TWO committed tokens first.
    # This keeps every rewind non-negative even when all k proposals are
    # accepted (the draft never saw p_k). Prefill accordingly drops the
    # prompt's last token.
    _, d_cache = d_prefill(draft_params, input_ids[:, :-1])
    rng, key0 = jax.random.split(rng)
    if cfg.top_k == 1 and cfg.top_p == 0.0:
        first_tok = jnp.argmax(logits_last, -1).astype(jnp.int32)
    else:
        first_tok = jax.random.categorical(
            key0, _filter_logits(logits_last, cfg.top_k, cfg.top_p,
                                 cfg.temperature, cfg.min_p),
            axis=-1).astype(jnp.int32)
    num_target_calls = 1

    # Host-side sequence assembly (per-row ragged commits).
    seqs = [list(map(int, row)) + [int(first_tok[i])]
            for i, row in enumerate(np.asarray(input_ids))]
    done = [False] * b
    cur = first_tok.astype(jnp.int32)            # (b,) last committed token
    prev2 = input_ids[:, -1].astype(jnp.int32)   # (b,) second-to-last

    while not all(done) and min(len(s) for s in seqs) < max_len:
        # ---- draft proposes k tokens, sampled from the SAME filtered
        # distribution the acceptance test uses (otherwise the probability-
        # ratio test loses the target-equivalence guarantee)
        proposals = []
        d_logits_list = []
        feed = jnp.stack([prev2, cur], axis=1)   # (b, 2): see convention
        for step in range(k):
            d_logits, d_cache = d_decode(draft_params, d_cache, feed)
            d_logits_list.append(d_logits[:, -1])
            rng, dkey = jax.random.split(rng)
            nxt = sample_token(d_logits[:, -1], dkey, cfg)
            proposals.append(nxt)
            feed = nxt[:, None]
        tokens_draft = jnp.stack(proposals, axis=1)        # (b, k)
        logits_draft = jnp.stack(d_logits_list, axis=1)    # (b, k, v)

        # ---- target verifies [cur] + proposals in one forward ----
        toks = jnp.concatenate([cur[:, None], tokens_draft], axis=1)
        t_logits, t_cache = t_decode(target_params, t_cache, toks)
        num_target_calls += 1

        rng, key = jax.random.split(rng)
        tokens, num = sample_fn(t_logits, logits_draft, tokens_draft, key)
        tokens_np = np.asarray(tokens)
        num_np = np.asarray(num)

        # ---- per-row commit + cache rewinds ----
        n_acc = num_np - 1                       # accepted draft tokens
        was_done = np.asarray(done)
        # target appended k+1 entries, keep n_acc+1 of them; the draft
        # appended k+1 ([prev2, cur, p_1..p_{k-1}]), and the convention
        # wants it back at committed'[:-2] -> rewind by k - n_acc. Rows
        # that were already done rewind everything they appended so their
        # cache rows never grow.
        t_delta = np.where(was_done, k + 1, k - n_acc).astype(np.int32)
        d_delta = np.where(was_done, k + 1, k - n_acc).astype(np.int32)
        t_cache = _rewind_cache(t_cache, jnp.asarray(t_delta))
        d_cache = _rewind_cache(d_cache, jnp.asarray(d_delta))
        new_cur = np.zeros((b,), np.int32)
        new_prev2 = np.zeros((b,), np.int32)
        for i in range(b):
            if done[i]:
                new_cur[i] = seqs[i][-1]
                new_prev2[i] = seqs[i][-2]
                continue
            commit = [int(x) for x in tokens_np[i, : int(num_np[i])]]
            room = max_len - len(seqs[i])
            commit = commit[:room]
            seqs[i].extend(commit)
            new_cur[i] = seqs[i][-1]
            new_prev2[i] = seqs[i][-2]
            if cfg.eos_token_id is not None and cfg.eos_token_id in commit:
                done[i] = True
            if len(seqs[i]) >= max_len:
                done[i] = True
        cur = jnp.asarray(new_cur, jnp.int32)
        prev2 = jnp.asarray(new_prev2, jnp.int32)

    out = np.full((b, max_len), cfg.eos_token_id or 0, np.int32)
    for i in range(b):
        row = seqs[i][:max_len]
        out[i, : len(row)] = row
    return jnp.asarray(out), num_target_calls
