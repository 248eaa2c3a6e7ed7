"""Speculative decoding: draft proposes, target verifies in one forward.

Parity surface for the reference ``decode_speculative``
(flash_attn/utils/generation.py:269) and ``sample_speculative`` (:209).
The target scores the k proposed tokens in a single kvcache forward
(seqlen_q = k+1 through the decode kernel's GQA-packed path); rejected
suffixes are rolled back by rewinding the cache offsets — entries past the
offset are dead and get overwritten, so rollback is O(1).

Greedy guarantee: output equals the target model's own greedy decode.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from flash_attn_tpu.serving.generation import GenerationConfig

__all__ = ["decode_speculative"]


def _rewind_cache(cache, delta: int):
    """Subtract delta from every layer's cache offset."""
    def fix(path, leaf):
        if getattr(path[-1], "key", None) == "offset":
            return leaf - delta
        return leaf

    return jax.tree_util.tree_map_with_path(fix, cache)


def decode_speculative(
    input_ids,        # (1, prompt_len)
    target_model, target_params,
    draft_model, draft_params,
    cfg: GenerationConfig,
    speculative_k: int = 4,
    rng: Optional[jax.Array] = None,
):
    """Greedy speculative decoding. Returns (sequences (1, max_length),
    num_target_calls)."""
    assert cfg.top_k == 1, "speculative: greedy only for now"
    b, prompt_len = input_ids.shape
    assert b == 1, "speculative decode: batch 1 (like the reference)"
    max_len = cfg.max_length
    k = speculative_k

    def _prefill(model):
        def f(params, ids):
            logits, state = model.apply(
                {"params": params}, ids, mode="prefill", mutable=["cache"])
            return (jnp.argmax(logits[:, -1], -1).astype(jnp.int32),
                    state["cache"])
        return jax.jit(f)

    def _decode(model):
        def f(params, cache, toks):  # toks (1, L) -> argmax per position
            logits, state = model.apply(
                {"params": params, "cache": cache}, toks,
                mode="decode", mutable=["cache"])
            return jnp.argmax(logits, -1).astype(jnp.int32), state["cache"]
        return jax.jit(f)

    t_prefill = _prefill(target_model)
    d_prefill = _prefill(draft_model)
    t_decode = _decode(target_model)
    d_decode = _decode(draft_model)

    first_tok, t_cache = t_prefill(target_params, input_ids)
    _, d_cache = d_prefill(draft_params, input_ids)

    seqs = [int(x) for x in input_ids[0]] + [int(first_tok[0])]
    num_target_calls = 1
    # tokens appended to the sequence that the draft has not consumed yet;
    # the last one is the "current" token the target continues from
    pending = [int(first_tok[0])]

    while len(seqs) < max_len:
        # ---- draft proposes k tokens ----
        preds, d_cache = d_decode(
            draft_params, d_cache, jnp.asarray([pending], jnp.int32))
        proposals = [int(preds[0, -1])]
        while len(proposals) < k:
            preds, d_cache = d_decode(
                draft_params, d_cache,
                jnp.asarray([[proposals[-1]]], jnp.int32))
            proposals.append(int(preds[0, -1]))
        # draft has now consumed: pending + proposals[:-1]

        # ---- target verifies [cur] + proposals in one forward ----
        cur = pending[-1]
        toks = jnp.asarray([[cur] + proposals], jnp.int32)
        t_preds, t_cache = t_decode(target_params, t_cache, toks)
        num_target_calls += 1
        tp = [int(x) for x in t_preds[0]]  # target argmax after each token

        n_accept = 0
        for i in range(k):
            if tp[i] == proposals[i]:
                n_accept += 1
            else:
                break
        accepted = proposals[:n_accept]
        next_tok = tp[n_accept]  # correction / continuation
        seqs.extend(accepted + [next_tok])

        # ---- cache bookkeeping ----
        # target consumed k+1, keeps n_accept+1
        t_cache = _rewind_cache(t_cache, k - n_accept)
        if n_accept < k:
            # draft consumed pending + p1..p_{k-1}; keep through p_{n_accept}
            d_cache = _rewind_cache(d_cache, k - 1 - n_accept)
            pending = [next_tok]
        else:
            # all accepted: draft has not seen p_k yet
            pending = [proposals[-1], next_tok]

        if cfg.eos_token_id is not None and next_tok == cfg.eos_token_id:
            break

    seqs = seqs[:max_len]
    return jnp.asarray([seqs], jnp.int32), num_target_calls
