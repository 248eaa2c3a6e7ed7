"""End-to-end serving benchmark: prefill TTFT + decode tokens/s.

BASELINE.md tracks p50 TTFT for the serving path; this measures a GPT-style
model (sized via args) on the current backend:
 - TTFT: jitted prefill (prompt -> first token) wall time
 - decode: tokens/s across the batch with the continuous-batching engine's
   jitted decode step

Run: PYTHONPATH=. python benchmarks/serving_bench.py [tiny|1b]
"""

import functools
import statistics
import sys
import time

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp

from flash_attn_tpu.models.gpt import GPTConfig, GPTLMHeadModel

_fetch = jax.jit(lambda r: jnp.sum(r.astype(jnp.float32)))


def config(size: str, max_decode: int, kv_dtype=None) -> GPTConfig:
    if size == "1b":
        return GPTConfig(
            vocab_size=50304, n_positions=0, n_embd=2048, n_layer=16,
            n_head=16, n_head_kv=16, rotary_emb_fraction=1.0,
            use_rms_norm=True, glu_act=True, tie_word_embeddings=True,
            max_decode_seqlen=max_decode, kv_cache_dtype=kv_dtype,
            dtype=jnp.bfloat16,
        )
    return GPTConfig(
        vocab_size=1024, n_positions=0, n_embd=256, n_layer=4, n_head=8,
        rotary_emb_fraction=1.0, use_rms_norm=True, glu_act=True,
        max_decode_seqlen=max_decode, dtype=jnp.bfloat16,
    )


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    # Batch-chunked prefill: rows per prefill dispatch (0 = whole batch in
    # one program). Large batches OOM on prefill activations without it;
    # chunks write disjoint slot ranges of one shared B-slot cache
    # (slot-mapped prefill, same path the continuous-batching engine uses).
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    # arg 4 = "fp8": store the decode KV cache in float8_e4m3fn (halves the
    # per-step cache read traffic, the decode throughput bound)
    kv_dtype = None
    if len(sys.argv) > 4 and sys.argv[4] == "fp8":
        kv_dtype = jnp.float8_e4m3fn
    elif len(sys.argv) > 4 and sys.argv[4] == "int8":
        kv_dtype = jnp.int8
    prompt_len, gen_len = 512, 64
    cfg = config(size, prompt_len + gen_len + 8, kv_dtype)
    model = GPTLMHeadModel(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (b, prompt_len), 0,
                             cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), ids[:, :8])["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"model={size} params={n_params/1e6:.1f}M batch={b} "
          f"prompt={prompt_len} prefill_chunk={chunk or b} "
          f"kv_cache={jnp.dtype(kv_dtype).name if kv_dtype else 'bf16'}",
          flush=True)

    @jax.jit
    def prefill(params, ids):
        last = jnp.full((ids.shape[0],), ids.shape[1] - 1, jnp.int32)
        logits, state = model.apply(
            {"params": params}, ids, mode="prefill", mutable=["cache"],
            logits_positions=last)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), state["cache"]

    @jax.jit
    def alloc_cache(params):
        # Trace a tiny B-row prefill just to allocate the cache collection.
        _, state = model.apply(
            {"params": params}, jnp.zeros((b, 8), jnp.int32), mode="prefill",
            mutable=["cache"], slot_ids=jnp.arange(b),
            prefill_lengths=jnp.zeros((b,), jnp.int32))
        return state["cache"]

    @functools.partial(jax.jit, donate_argnums=(1,))
    def prefill_chunk(params, cache, ids, slot_ids):
        lengths = jnp.full((ids.shape[0],), ids.shape[1], jnp.int32)
        logits, state = model.apply(
            {"params": params, "cache": cache}, ids, mode="prefill",
            mutable=["cache"], slot_ids=slot_ids, prefill_lengths=lengths,
            logits_positions=lengths - 1)
        return jnp.argmax(logits[:, 0], -1).astype(jnp.int32), state["cache"]

    def prefill_chunked(params, ids):
        cache = alloc_cache(params)
        toks = []
        for lo in range(0, b, chunk):
            tok, cache = prefill_chunk(
                params, cache, ids[lo:lo + chunk],
                jnp.arange(lo, lo + chunk, dtype=jnp.int32))
            toks.append(tok)
        return jnp.concatenate(toks), cache

    if chunk:
        assert b % chunk == 0, (b, chunk)
        prefill = prefill_chunked

    @functools.partial(jax.jit, donate_argnums=(1,))
    def decode_step(params, cache, tok):
        logits, state = model.apply(
            {"params": params, "cache": cache}, tok[:, None], mode="decode",
            mutable=["cache"])
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), state["cache"]

    # warm up compiles
    tok, cache = prefill(params, ids)
    float(_fetch(tok))
    tok, cache = decode_step(params, cache, tok)
    float(_fetch(tok))

    # TTFT: prefill + first-token sample
    ttfts = []
    for _ in range(5):
        t0 = time.perf_counter()
        tok, cache = prefill(params, ids)
        float(_fetch(tok))
        ttfts.append(time.perf_counter() - t0)
    ttft = statistics.median(ttfts)

    # decode throughput
    t0 = time.perf_counter()
    for _ in range(gen_len):
        tok, cache = decode_step(params, cache, tok)
    float(_fetch(tok))
    dt = (time.perf_counter() - t0) / gen_len
    print(f"p50 TTFT: {ttft*1e3:.1f} ms (batch {b}, prompt {prompt_len})",
          flush=True)
    print(f"decode: {dt*1e3:.2f} ms/step -> {b/dt:.0f} tokens/s", flush=True)


if __name__ == "__main__":
    main()
