"""Benchmark entry point — run by the driver on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md north star): forward attention TFLOPs/s at
BF16, head_dim 128, seqlen 8k, as a fraction of the chip's speed-of-light
(peak MXU bf16 throughput). vs_baseline is that fraction divided by the 0.70
target, so vs_baseline >= 1.0 means the north-star target is met.
"""

import functools
import json
import math
import os
import statistics
import sys
import time

import jax

# Persistent compilation cache: the (1024,2048)-tile fwd kernel costs ~4min
# of local Mosaic compile; cache it across bench invocations.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

# Peak dense bf16 TFLOPs per chip by TPU generation.
PEAK_TFLOPS = {
    "v4": 275.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,
}


def detect_peak_tflops() -> float:
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "").lower()
    if gen in PEAK_TFLOPS:
        return PEAK_TFLOPS[gen]
    kind = jax.devices()[0].device_kind.lower()
    for key, val in PEAK_TFLOPS.items():
        if key in kind.replace(" ", "").replace("tpu", ""):
            return val
    if "lite" in kind:
        return PEAK_TFLOPS["v5e"]
    return PEAK_TFLOPS["v5e"]


_fetch = jax.jit(lambda r: jnp.sum(r.astype(jnp.float32)))


def bench_fn(fn, *args, iters=20, warmup=3, repeats=2):
    """Time fn by queueing `iters` dispatches and fetching one scalar at the
    end. (On the axon remote platform block_until_ready does not block, and
    any *new* fetch computation triggers a slow remote compile, so both the
    fn and the scalar-reduce fetch are pre-compiled in warmup.) Best of
    `repeats` runs: the shared-tunnel chip jitters ~5%.

    NOTE: the final fetch costs a ~40 ms tunnel roundtrip amortized over
    `iters` — at iters=20 that deflates a 6 ms kernel by ~25%. Kernel
    metrics use bench_device_loop below; this stays for coarse/e2e paths.
    """
    r = None
    for _ in range(warmup):
        r = fn(*args)
    float(_fetch(r))  # drain the queue
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        float(_fetch(r))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_device_loop(fn, *args, perturb=0, N=50, repeats=2):
    """Time fn with N back-to-back iterations inside ONE jitted fori_loop,
    with a data dependence (iteration i's perturbed input depends on
    i-1's outputs) so XLA cannot hoist or elide the body. Host dispatch
    and the ~40 ms axon fetch roundtrip are excluded entirely — the round-4
    harness correction (DESIGN.md): the queued-dispatch timing above
    amortized the fetch over only 20 iters, deflating every kernel metric
    by ~1.9 ms/iter. One elementwise rewrite of args[perturb] per iter
    (~0.1 ms at headline shapes) is included — a small conservative bias.
    All fn outputs feed the dependence chain, so every gradient stays live
    (the round-3 DCE rule)."""
    pert_dtype = args[perturb].dtype

    def loop(*a):
        def body(i, carry):
            acc, x = carry
            aa = list(a)
            aa[perturb] = x
            r = fn(*aa)
            outs = r if isinstance(r, (tuple, list)) else (r,)
            leaf = jnp.float32(0)
            for o in outs:
                leaf = leaf + o[(0,) * o.ndim].astype(jnp.float32)
            x = (x.astype(jnp.float32) * (1.0 + 1e-12 * leaf)).astype(
                pert_dtype)
            return acc + leaf, x

        acc, _ = jax.lax.fori_loop(0, N, body, (jnp.float32(0), a[perturb]))
        return acc

    g = jax.jit(loop)
    float(g(*args))  # compile + settle
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(g(*args))
        best = min(best, (time.perf_counter() - t0) / N)
    return best


def bench_fwd(peak):
    from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd

    b, h, s, d = 4, 16, 8192, 128
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)

    fn = lambda q, k, v: flash_attention_fwd(
        q, k, v, causal=False, return_lse=True)[0]
    # the headline north-star metric gets best-of-3 (chip jitter ~5%)
    t = bench_device_loop(fn, q, k, v, N=30, repeats=3)
    flops = 4.0 * b * h * s * s * d
    return flops / t / 1e12, t


def bench_fwd_causal(peak):
    from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd

    b, h, s, d = 4, 16, 8192, 128
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)
    fn = lambda q, k, v: flash_attention_fwd(
        q, k, v, causal=True, return_lse=True)[0]
    t = bench_device_loop(fn, q, k, v, N=30)
    flops = 4.0 * b * h * s * s * d / 2
    return flops / t / 1e12, t


def bench_bwd(peak, s=4096, b=4):
    from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd

    h, d = 16, 128
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(3), (b, s, h, d), jnp.bfloat16)

    # Time the BACKWARD ONLY (the reference's out.backward() timing,
    # hopper/benchmark_attn.py:386-398): forward residuals precomputed and
    # passed as ARGUMENTS (a jitted vjp pullback closure would bake the
    # 2 GB of residuals into the program as constants — the axon relay
    # rejects the compile request). This is the same program the interface
    # vjp runs: bwd dispatch + input-dtype casts.
    from flash_attn_tpu.kernels.flash_bwd_fused import flash_attention_bwd_auto

    # kernel-level fwd for the residuals (flash_attn_func with
    # return_attn_probs would also reconstruct the 4.3 GB S_dmask matrix)
    tr = lambda x: jnp.swapaxes(x, 1, 2)
    out_t, lse = jax.jit(lambda q, k, v: flash_attention_fwd(
        q, k, v, causal=True, return_lse=True))(tr(q), tr(k), tr(v))
    out = tr(out_t)
    do = jnp.ones_like(out)

    def bwd_only(do, q, k, v, out, lse):
        dq, dk, dv = flash_attention_bwd_auto(
            do, q, k, v, out, lse, causal=True,
            softmax_scale=1.0 / math.sqrt(d))
        return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))

    t = bench_device_loop(bwd_only, do, q, k, v, out, lse, N=40)
    # reference convention: bwd flops = 2.5x fwd (hopper/benchmark_attn.py)
    flops = 2.5 * 4.0 * b * h * s * s * d / 2
    return flops / t / 1e12, t


def _varlen_setup(lengths, h=16, d=128, seed=0):
    import numpy as np

    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lengths)]), jnp.int32)
    total = int(cu[-1])
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (total, h, d), jnp.bfloat16)
    k = jax.random.normal(ks[1], (total, h, d), jnp.bfloat16)
    v = jax.random.normal(ks[2], (total, h, d), jnp.bfloat16)
    return q, k, v, cu, total


def bench_varlen(peak):
    """Varlen on the scoreboard (VERDICT r3 #3): packed ragged-batch
    attention at (a) constant lengths — equal total tokens as the dense
    headline shape, so the ratio is the varlen kernel's flat-tiling tax —
    and (b) the reference's 'uniform' mixed-length distribution
    (benchmarks/benchmark_varlen_sched.py _make_seqlens: uniform in
    [max/2, max]), causal, fwd and bwd-only (2.5x convention)."""
    from flash_attn_tpu import flash_attn_varlen_func
    from flash_attn_tpu.kernels.flash_varlen import (
        flash_attention_varlen_bwd, flash_attention_varlen_fwd)

    h, d = 16, 128
    # (a) constant 4 x 8192, non-causal (dense headline comparison)
    lengths = [8192] * 4
    q, k, v, cu, total = _varlen_setup(lengths)
    fn = lambda q, k, v, cu: flash_attn_varlen_func(
        q, k, v, cu, cu, 8192, 8192, causal=False)
    t = bench_device_loop(fn, q, k, v, cu, N=30)
    const_tf = sum(4.0 * h * d * L * L for L in lengths) / t / 1e12

    # (b) mixed 16 seqs uniform [2048, 4096], causal
    import numpy as np
    rng = np.random.default_rng(0)
    lengths = [int(x) for x in rng.integers(2048, 4097, size=16)]
    q, k, v, cu, total = _varlen_setup(lengths)
    max_len = max(lengths)
    fn = lambda q, k, v, cu: flash_attn_varlen_func(
        q, k, v, cu, cu, max_len, max_len, causal=True)
    t = bench_device_loop(fn, q, k, v, cu, N=30)
    useful = sum(4.0 * h * d * L * L / 2 for L in lengths)
    mixed_tf = useful / t / 1e12

    # bwd-only at the mixed shape (precomputed residuals, 2.5x convention)
    out, lse = jax.jit(
        lambda q, k, v, cu: flash_attention_varlen_fwd(
            q, k, v, cu, cu, max_len, max_len, causal=True))(q, k, v, cu)
    do = jnp.ones_like(out)

    bwd = lambda do, q, k, v, out, lse, cu: flash_attention_varlen_bwd(
        do, q, k, v, out, lse, cu, cu, max_len, max_len, causal=True)
    t = bench_device_loop(bwd, do, q, k, v, out, lse, cu, N=30)
    mixed_bwd_tf = 2.5 * useful / t / 1e12
    return const_tf, mixed_tf, mixed_bwd_tf


def bench_paged_prefill(peak):
    """Packed mixed-length chunked prefill against the paged cache (the
    serving hot path) via kernels/flash_varlen_paged.py. The round-4
    dense-padded front end VMEM-OOMs at this GQA serving shape (measured:
    151.9M > 128M vmem; benchmarks/paged_prefill_bench.py), so this
    metric exists only because of the packed kernel."""
    import numpy as np

    from flash_attn_tpu.kernels.flash_varlen_paged import (
        flash_attention_varlen_paged_fwd,
    )

    h, h_k, d, page = 32, 8, 128, 256
    rng = np.random.default_rng(0)
    lens_q = [int(x) for x in rng.integers(256, 1025, size=16)]
    lens_k = [lq + int(x) for lq, x in
              zip(lens_q, rng.integers(0, 1024, size=16))]
    b = len(lens_q)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens_q)]), jnp.int32)
    total_q = int(cu[-1])
    maxpg = max(-(-lk // page) for lk in lens_k)
    npages = b * maxpg + 1
    q = jax.random.normal(jax.random.PRNGKey(0), (total_q, h, d),
                          jnp.bfloat16)
    kp = jax.random.normal(jax.random.PRNGKey(1),
                           (npages, h_k, page, d), jnp.bfloat16)
    vp = jax.random.normal(jax.random.PRNGKey(2),
                           (npages, h_k, page, d), jnp.bfloat16)
    table = np.zeros((b, maxpg), np.int32)
    n = 1
    for s_, lk in enumerate(lens_k):
        for j in range(-(-lk // page)):
            table[s_, j] = n
            n += 1
    table = jnp.asarray(table)
    seqk = jnp.asarray(lens_k, jnp.int32)
    mxq = max(lens_q)
    useful = sum(4.0 * h * d * sum(lk - lq + r + 1 for r in range(lq))
                 for lq, lk in zip(lens_q, lens_k))
    fn = lambda q, kp, vp: flash_attention_varlen_paged_fwd(
        q, kp, vp, cu, mxq, seqk, table, causal=True)[0]
    t = bench_device_loop(fn, q, kp, vp, N=30)
    return useful / t / 1e12, t


def bench_decode_fp8_paged(dtype=None):
    from flash_attn_tpu import flash_attn_with_kvcache

    dtype = dtype or jnp.float8_e4m3fn
    # NOTE: larger (b, ctx) combos trigger a pathological Mosaic compile
    # (b=64/ctx=8k never finishes); this config is compile-verified.
    b, h, h_k, d = 8, 32, 8, 128
    page_size, ctx = 256, 4096
    ppseq = ctx // page_size
    num_pages = b * ppseq
    q = jax.random.normal(jax.random.PRNGKey(0), (b, 1, h, d), jnp.bfloat16)
    kp = jax.random.normal(
        jax.random.PRNGKey(1), (num_pages, h_k, page_size, d)).astype(dtype)
    vp = jax.random.normal(
        jax.random.PRNGKey(2), (num_pages, h_k, page_size, d)).astype(dtype)
    table = jnp.arange(num_pages, dtype=jnp.int32).reshape(b, ppseq)
    seqlens = jnp.full((b,), ctx - 1, jnp.int32)
    kd = jnp.ones((b, h_k), jnp.float32)
    vd = jnp.ones((b, h_k), jnp.float32)

    # The axon relay costs ~0.5ms per dispatch and ~30ms per fetch, which
    # swamps sub-ms decode steps; loop N steps ON DEVICE instead.
    N = 50

    def steps(q):
        def body(i, carry):
            acc, q = carry
            out = flash_attn_with_kvcache(
                q, kp, vp, cache_seqlens=seqlens, block_table=table,
                causal=True, k_descale=kd, v_descale=vd)
            # data-dependence so XLA cannot hoist the loop body
            return acc + out[0, 0, 0, 0].astype(jnp.float32), q + 1e-6
        acc, _ = jax.lax.fori_loop(0, N, body, (jnp.float32(0), q))
        return acc

    fn = jax.jit(steps)
    t_total = bench_fn(fn, q, iters=3, warmup=1)
    t = t_total / N
    return b / t, t  # attention-step tokens/s (one token per sequence)


def _gpt_913m(max_decode=0, kv_dtype=None, remat=False):
    from flash_attn_tpu.models.gpt import GPTConfig

    return GPTConfig(
        vocab_size=50304, n_positions=0, n_embd=2048, n_layer=16,
        n_head=16, n_head_kv=16, rotary_emb_fraction=1.0,
        use_rms_norm=True, glu_act=True, tie_word_embeddings=True,
        max_decode_seqlen=max_decode, kv_cache_dtype=kv_dtype,
        remat=remat, dtype=jnp.bfloat16)


def bench_train_mfu(peak):
    """End-to-end training throughput of the 913M GPT (bf16, seq 2k) —
    the reference's identity metric (README.md:527-530: 225 TFLOPs/s/A100
    = 72% MFU on 80 GB parts without activation checkpointing). One jitted
    train step on the production Trainer.

    Round 4: the fused chunked CE (no (b,s,vocab) fp32 logits) freed enough
    HBM that the 913M model trains WITHOUT remat on the 16 GB chip — same
    no-checkpointing convention as the reference's number. Sweep
    (benchmarks/r4_mfu_sweep.py): remat-full b=6 60.7%, b=8 60.5%; dots
    b=2 58.7% (b>=3 OOM); NO-remat b=2 63.5, b=3 64.8, b=4 68.3 (peak),
    b=5 66.5, b=6 66.8."""
    from flash_attn_tpu.training.trainer import (
        TrainConfig, Trainer, model_flops_per_token)

    batch, seqlen = 4, 2048
    # bf16 Adam state (stochastic rounding, trainer.adamw_bf16): halves
    # the optimizer HBM traffic — the VERDICT r4 #3 lever; loss-parity
    # tested in tests/test_training.py
    cfg = TrainConfig(model=_gpt_913m(remat=False), batch_size=batch,
                      seqlen=seqlen, zero1=False, log_every=10**9,
                      opt_state_dtype="bfloat16")
    tr = Trainer(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (batch, seqlen), 0,
                             cfg.model.vocab_size)
    labels = jnp.roll(ids, -1, axis=1)

    def step():
        (tr.params, tr.opt_state, loss, gnorm, tr.ema_params,
         tr.scaler) = tr._step(tr.params, tr.opt_state, ids, labels,
                               tr.ema_params, tr.scaler)
        return loss

    with jax.set_mesh(tr.mesh):
        loss = step()
        float(loss)  # compile + settle
        # best-of-3 windows: the shared-tunnel chip drifts ~5% between
        # builder and driver runs (round-4 headline lesson — the fwd metric
        # already does this; VERDICT r4 weak #5)
        iters, t = 8, float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                loss = step()
            float(loss)
            t = min(t, (time.perf_counter() - t0) / iters)
    tokens_per_s = batch * seqlen / t
    tflops = tokens_per_s * model_flops_per_token(cfg.model, seqlen) / 1e12
    return tflops, tflops / peak, tokens_per_s, t


def bench_serving():
    """p50 TTFT (913M, batch 8, prompt 512 — the BASELINE.md serving
    north star) and decode tokens/s at batch 64, both through the
    production model decode path (jitted whole-model step, donated
    cache)."""
    import statistics as stats

    from flash_attn_tpu.models.gpt import GPTLMHeadModel

    prompt, gen = 512, 32
    cfg = _gpt_913m(max_decode=prompt + gen + 8)
    model = GPTLMHeadModel(cfg)
    ids8 = jax.random.randint(jax.random.PRNGKey(0), (8, prompt), 0,
                              cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(1), ids8[:, :8])["params"]

    @jax.jit
    def prefill(params, ids):
        last = jnp.full((ids.shape[0],), ids.shape[1] - 1, jnp.int32)
        logits, state = model.apply(
            {"params": params}, ids, mode="prefill", mutable=["cache"],
            logits_positions=last)
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), state["cache"]

    @jax.jit
    def alloc_cache64(params):
        _, state = model.apply(
            {"params": params}, jnp.zeros((64, 8), jnp.int32),
            mode="prefill", mutable=["cache"], slot_ids=jnp.arange(64),
            prefill_lengths=jnp.zeros((64,), jnp.int32))
        return state["cache"]

    @functools.partial(jax.jit, donate_argnums=(1,))
    def prefill_chunk(params, cache, ids, slot_ids):
        lengths = jnp.full((ids.shape[0],), ids.shape[1], jnp.int32)
        logits, state = model.apply(
            {"params": params, "cache": cache}, ids, mode="prefill",
            mutable=["cache"], slot_ids=slot_ids, prefill_lengths=lengths,
            logits_positions=lengths - 1)
        return jnp.argmax(logits[:, 0], -1).astype(jnp.int32), state["cache"]

    @functools.partial(jax.jit, donate_argnums=(1,))
    def decode_step(params, cache, tok):
        logits, state = model.apply(
            {"params": params, "cache": cache}, tok[:, None], mode="decode",
            mutable=["cache"])
        return jnp.argmax(logits[:, -1], -1).astype(jnp.int32), state["cache"]

    # TTFT at batch 8
    tok, cache = prefill(params, ids8)
    float(_fetch(tok))
    ttfts = []
    for _ in range(5):
        t0 = time.perf_counter()
        tok, cache = prefill(params, ids8)
        float(_fetch(tok))
        ttfts.append(time.perf_counter() - t0)
    ttft_ms = stats.median(ttfts) * 1e3
    del cache

    # decode throughput at batch 64 (batch-chunked prefill to fill slots)
    cache = alloc_cache64(params)
    ids64 = jax.random.randint(jax.random.PRNGKey(2), (64, prompt), 0,
                               cfg.vocab_size)
    toks = []
    for lo in range(0, 64, 8):
        tok, cache = prefill_chunk(
            params, cache, ids64[lo:lo + 8],
            jnp.arange(lo, lo + 8, dtype=jnp.int32))
        toks.append(tok)
    tok = jnp.concatenate(toks)
    tok, cache = decode_step(params, cache, tok)
    float(_fetch(tok))
    t0 = time.perf_counter()
    for _ in range(gen):
        tok, cache = decode_step(params, cache, tok)
    float(_fetch(tok))
    dt = (time.perf_counter() - t0) / gen
    return ttft_ms, 64.0 / dt, dt


def bench_engine(n_requests=96, kv_dtype=None, sat_only=False):
    """Drive the continuous-batching InferenceEngine itself (admission,
    paging, slot recycling, bucketed prefill, decode blocks) on the 913M
    model with a closed-loop arrival trace — steady-state tokens/s and
    TTFT p50/p99 INCLUDING admission (VERDICT r3 #5: the serving numbers
    must come from the engine, not a hand-rolled model loop).

    ``kv_dtype``: quantized page pool (e.g. jnp.int8 — the platform-right
    cache on v5e); ``sat_only`` skips the TTFT trace and returns only the
    saturated-decode number."""
    import numpy as np

    from flash_attn_tpu.models.gpt import GPTLMHeadModel
    from flash_attn_tpu.serving.engine import InferenceEngine, PagePool
    from flash_attn_tpu.serving.generation import GenerationConfig

    prompt_len, gen = 512, 32
    B, page = 64, 256
    gen_sat = 256  # saturated-decode phase below needs the longer budget
    pages_per_seq = -(-(prompt_len + gen_sat + 16) // page)
    cfg = _gpt_913m(max_decode=prompt_len + gen_sat + 16, kv_dtype=kv_dtype)
    import dataclasses
    cfg = dataclasses.replace(cfg, paged_kv_num_pages=B * pages_per_seq + 1,
                              paged_kv_page_size=page)
    model = GPTLMHeadModel(cfg)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((2, 8), jnp.int32))["params"]
    rng = np.random.default_rng(0)

    # +1: page 0 is the never-allocated null page
    pool = PagePool(num_pages=B * pages_per_seq + 1, page_size=page,
                    max_pages_per_seq=pages_per_seq, max_batch=B)
    eng = InferenceEngine(
        model, params, max_batch=B, gen_cfg=GenerationConfig(top_k=1),
        page_pool=pool, max_admit_tokens=8 * prompt_len,
        decode_block_size=8)
    # pre-traffic compile of the bucketed (8, 512) prefill + decode block
    eng.warmup(prefill_shapes=[(8, 512)])

    def trace(eng, n_requests, timed):
        submit_t, first_t = {}, {}
        remaining = n_requests
        t0 = time.perf_counter()
        total_tokens = 0
        while True:
            if remaining > 0 and len(eng.queue) == 0:
                for _ in range(min(8, remaining)):
                    rid = eng.submit(
                        rng.integers(0, cfg.vocab_size, size=prompt_len),
                        max_new_tokens=gen)
                    submit_t[rid] = time.perf_counter()
                    remaining -= 1
            if remaining == 0 and not eng.queue and all(
                    s is None for s in eng.slots):
                break
            emitted = eng.step()
            now = time.perf_counter()
            total_tokens += len(emitted)
            for rid, _tok in emitted:
                first_t.setdefault(rid, now)
        elapsed = time.perf_counter() - t0
        ttfts = sorted((first_t[r] - submit_t[r]) for r in submit_t)
        return (total_tokens / elapsed,
                ttfts[len(ttfts) // 2] * 1e3,
                ttfts[int(len(ttfts) * 0.99)] * 1e3)

    # short settle pass, then the timed trace on the SAME engine (reset
    # keeps the cache + compiled programs; a second engine instance would
    # hold a second 6 GB cache — the round-4 OOM)
    tok_s = ttft_p50 = ttft_p99 = 0.0
    if not sat_only:
        trace(eng, 16, timed=False)
        eng.reset()
        tok_s, ttft_p50, ttft_p99 = trace(eng, n_requests, timed=True)

    # saturated-decode phase: all 64 slots busy, queue empty — engine
    # throughput through the full step() path (dispatch + async fetch +
    # bookkeeping), the apples-to-apples comparison against the raw
    # decode_tokens_per_s loop (VERDICT r4 #1's ~10% criterion)
    eng.reset()
    for _ in range(B):
        eng.submit(rng.integers(0, cfg.vocab_size, size=prompt_len),
                   max_new_tokens=gen_sat)
    guard = 0
    while (eng.queue or not all(s is not None for s in eng.slots)) \
            and guard < 200:
        eng.step()
        guard += 1
    n_steps = 14
    t0 = time.perf_counter()
    sat_tokens = sum(len(eng.step()) for _ in range(n_steps))
    sat_tok_s = sat_tokens / (time.perf_counter() - t0)
    eng.close()
    return tok_s, ttft_p50, ttft_p99, sat_tok_s


def main():
    dbg = os.environ.get("FA_BENCH_DEBUG") == "1"
    t00 = time.perf_counter()

    def note(msg):
        if dbg:
            print(f"[bench +{time.perf_counter()-t00:.0f}s] {msg}",
                  file=sys.stderr, flush=True)

    peak = detect_peak_tflops()
    note("fwd start")
    fwd_tf, fwd_t = bench_fwd(peak)
    note(f"fwd done {fwd_tf:.1f}")
    frac = fwd_tf / peak
    result = {
        "metric": "attn_fwd_bf16_hdim128_seq8k_tflops",
        "value": round(fwd_tf, 2),
        "unit": "TFLOPs/s",
        "vs_baseline": round(frac / 0.70, 4),
        "sol_fraction": round(frac, 4),
        "peak_tflops": peak,
        "fwd_ms": round(fwd_t * 1e3, 3),
    }
    # Secondary metrics are best-effort: a failure must not lose the
    # headline line (and the decode config is kept conservative until the
    # long-trip-count DMA investigation concludes).
    try:
        cfwd_tf, cfwd_t = bench_fwd_causal(peak)
        result["fwd_causal_tflops"] = round(cfwd_tf, 2)
        note(f"fwd causal done {cfwd_tf:.1f}")
    except Exception as e:  # pragma: no cover
        result["fwd_causal_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    try:
        bwd_tf, bwd_t = bench_bwd(peak)
        result["bwd_tflops"] = round(bwd_tf, 2)
        note(f"bwd done {bwd_tf:.1f}")
    except Exception as e:  # pragma: no cover
        result["bwd_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    try:
        # same-seqlen-as-fwd convention (the reference benches fwd and bwd
        # at one seqlen, hopper/benchmark_attn.py); the seq4k number above
        # stays for round-over-round comparability
        bwd8_tf, _ = bench_bwd(peak, s=8192, b=2)
        result["bwd_seq8k_tflops"] = round(bwd8_tf, 2)
        note(f"bwd seq8k done {bwd8_tf:.1f}")
    except Exception as e:  # pragma: no cover
        result["bwd_seq8k_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    if os.environ.get("FA_TPU_BENCH_VARLEN", "1") == "1":
        try:
            vl_const, vl_mixed, vl_bwd = bench_varlen(peak)
            result["varlen_fwd_tflops"] = round(vl_const, 2)
            result["varlen_vs_dense"] = round(vl_const / fwd_tf, 4)
            result["varlen_mixed_fwd_tflops"] = round(vl_mixed, 2)
            result["varlen_mixed_bwd_tflops"] = round(vl_bwd, 2)
            note(f"varlen done {vl_const:.1f}/{vl_mixed:.1f}/{vl_bwd:.1f}")
        except Exception as e:  # pragma: no cover
            result["varlen_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    if os.environ.get("FA_TPU_BENCH_VARLEN", "1") == "1":
        try:
            pp_tf, _pp_t = bench_paged_prefill(peak)
            result["varlen_paged_prefill_tflops"] = round(pp_tf, 2)
            note(f"paged prefill done {pp_tf:.1f}")
        except Exception as e:  # pragma: no cover
            result["paged_prefill_error"] = \
                f"{type(e).__name__}: {str(e)[:200]}"
    if os.environ.get("FA_TPU_BENCH_DECODE", "1") == "1":
        try:
            dec_tps, dec_t = bench_decode_fp8_paged()
            result["decode_fp8_paged_tokens_per_s_4k_ctx"] = round(dec_tps, 1)
            result["decode_step_ms"] = round(dec_t * 1e3, 3)
            note("decode done")
        except Exception as e:  # pragma: no cover
            result["decode_error"] = f"{type(e).__name__}: {str(e)[:200]}"
        try:
            # the platform-right quantized cache on v5e (fp8 converts are
            # VPU-emulated there — DESIGN.md); fp8 stays for FA3 parity
            i8_tps, i8_t = bench_decode_fp8_paged(dtype=jnp.int8)
            result["decode_int8_paged_tokens_per_s_4k_ctx"] = round(i8_tps, 1)
            note("int8 decode done")
        except Exception as e:  # pragma: no cover
            result["decode_int8_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    if os.environ.get("FA_TPU_BENCH_TRAIN", "1") == "1":
        try:
            tr_tf, tr_mfu, tr_tps, tr_t = bench_train_mfu(peak)
            result["train_tflops"] = round(tr_tf, 2)
            result["train_mfu"] = round(tr_mfu, 4)
            result["train_tokens_per_s"] = round(tr_tps, 1)
            result["train_step_ms"] = round(tr_t * 1e3, 1)
            note(f"train done {tr_tf:.1f} TF/s = {tr_mfu:.1%} MFU")
        except Exception as e:  # pragma: no cover
            result["train_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    if os.environ.get("FA_TPU_BENCH_SERVING", "1") == "1":
        try:
            ttft_ms, dec64_tps, dec64_t = bench_serving()
            result["ttft_ms"] = round(ttft_ms, 1)
            result["decode_tokens_per_s"] = round(dec64_tps, 1)
            result["decode_913m_step_ms"] = round(dec64_t * 1e3, 2)
            note(f"serving done ttft={ttft_ms:.1f}ms dec={dec64_tps:.0f}t/s")
        except Exception as e:  # pragma: no cover
            result["serving_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    if os.environ.get("FA_TPU_BENCH_ENGINE", "1") == "1":
        try:
            eng_tps, eng_p50, eng_p99, eng_sat = bench_engine()
            result["engine_tokens_per_s"] = round(eng_tps, 1)
            result["engine_ttft_p50_ms"] = round(eng_p50, 1)
            result["engine_ttft_p99_ms"] = round(eng_p99, 1)
            result["engine_decode_tokens_per_s"] = round(eng_sat, 1)
            note(f"engine done {eng_tps:.0f} tok/s p50={eng_p50:.0f}ms "
                 f"sat={eng_sat:.0f}")
            # int8 page pool: halves the pool AND beats the bf16 direct
            # loop (builder-measured 3774 vs 3339 tok/s)
            *_unused, eng_i8 = bench_engine(kv_dtype=jnp.int8,
                                            sat_only=True)
            result["engine_int8_decode_tokens_per_s"] = round(eng_i8, 1)
            note(f"engine int8 sat={eng_i8:.0f}")
        except Exception as e:  # pragma: no cover
            result["engine_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
