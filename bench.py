"""Benchmark entry point — run by the driver on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric (BASELINE.md north star): forward attention TFLOPs/s at
BF16, head_dim 128, seqlen 8k, as a fraction of the chip's speed-of-light
(peak MXU bf16 throughput). vs_baseline is that fraction divided by the 0.70
target, so vs_baseline >= 1.0 means the north-star target is met.
"""

import json
import os
import statistics
import sys
import time

import jax
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


def bench_fn(fn, *args, iters=20, warmup=3):
    """Time fn by queueing `iters` dispatches and fetching one scalar at the
    end. (On the axon remote platform block_until_ready does not block, and
    any *new* fetch computation triggers a slow remote compile, so both the
    fn and the scalar-reduce fetch are pre-compiled in warmup.)"""
    r = None
    for _ in range(warmup):
        r = fn(*args)
    float(_fetch(r))  # drain the queue
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(_fetch(r))
    return (time.perf_counter() - t0) / iters


def main():
    from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd

    b, h, s, d = 4, 16, 8192, 128
    causal = False
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, h, s, d), jnp.bfloat16)

    fn = jax.jit(lambda q, k, v: flash_attention_fwd(
        q, k, v, causal=causal, return_lse=True)[0])
    t = bench_fn(fn, q, k, v)

    flops = 4.0 * b * h * s * s * d / (2 if causal else 1)
    tflops = flops / t / 1e12
    peak = detect_peak_tflops()
    frac = tflops / peak
    result = {
        "metric": "attn_fwd_bf16_hdim128_seq8k_tflops",
        "value": round(tflops, 2),
        "unit": "TFLOPs/s",
        "vs_baseline": round(frac / 0.70, 4),
        "sol_fraction": round(frac, 4),
        "peak_tflops": peak,
        "median_ms": round(t * 1e3, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
