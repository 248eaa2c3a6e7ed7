"""Mixed-length chunked prefill against the paged cache: packed persistent
kernel (kernels/flash_varlen_paged.py) vs the round-4 dense-padded front
end (pad-to-max gather + flash_paged_prefill) at equal useful tokens.

Run on the real chip:  python benchmarks/paged_prefill_bench.py
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import bench
from flash_attn_tpu.interface import _varlen_paged_fwd_dense
from flash_attn_tpu.kernels.flash_varlen_paged import (
    flash_attention_varlen_paged_fwd,
)


def run_cfg(lens_q, lens_k, label, skip_dense=False):
    # serving-shaped chunked prefill: GQA 32/8, d128, page 256; a skewed
    # mixed batch (one long chunk + many short) — the dense path's
    # worst case (pads everything to 2048)
    h, h_k, d, page = 32, 8, 128, 256
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
    for s, lk in enumerate(lens_k):
        for j in range(-(-lk // page)):
            table[s, j] = n
            n += 1
    table = jnp.asarray(table)
    seqk = jnp.asarray(lens_k, jnp.int32)
    mxq, mxk = max(lens_q), max(lens_k)

    # useful flops: causal bottom-right band per sequence
    useful = 0.0
    for lq, lk in zip(lens_q, lens_k):
        # each q row r attends lk-lq+r+1 keys
        keys = sum(lk - lq + r + 1 for r in range(lq))
        useful += 4.0 * h * d * keys
    print(f"batch={b} total_q={total_q} useful={useful/1e12:.3f} TFLOP")

    packed = lambda q, kp, vp: flash_attention_varlen_paged_fwd(
        q, kp, vp, cu, mxq, seqk, table, causal=True)[0]
    t = bench.bench_device_loop(packed, q, kp, vp, N=30)
    print(f"[{label}] packed persistent: {useful/t/1e12:.2f} TF/s-useful "
          f"({t*1e3:.3f} ms)", flush=True)

    if skip_dense:
        return
    try:
        dense = lambda q, kp, vp: _varlen_paged_fwd_dense(
            q, kp, vp, cu, mxq, table, seqk, softmax_scale=None, causal=True,
            window_size=(None, None), softcap=0.0, q_descale=None,
            k_descale=None, v_descale=None, return_attn_probs=False)
        t = bench.bench_device_loop(dense, q, kp, vp, N=30)
        print(f"[{label}] dense-padded (r4): {useful/t/1e12:.2f} "
              f"TF/s-useful ({t*1e3:.3f} ms)", flush=True)
    except Exception as e:
        print(f"[{label}] dense-padded (r4): FAILED "
              f"{type(e).__name__}: {str(e)[-180:]}", flush=True)


def main():
    rng = np.random.default_rng(0)
    # skewed: one long chunk + many short, long caches — the dense path's
    # worst case (measured round 5: it VMEM-OOMs here, 151.9M > 128M)
    lens_q = [2048] + [int(x) for x in rng.integers(64, 512, size=15)]
    lens_k = [lq + int(x) for lq, x in
              zip(lens_q, rng.integers(0, 2048, size=16))]
    run_cfg(lens_q, lens_k, "skewed")
    # milder: uniform chunks, both paths run — the direct ratio
    lens_q = [int(x) for x in rng.integers(256, 1025, size=16)]
    lens_k = [lq + int(x) for lq, x in
              zip(lens_q, rng.integers(0, 1024, size=16))]
    run_cfg(lens_q, lens_k, "uniform")


if __name__ == "__main__":
    main()
