"""Persistent flat-walk varlen forward vs the banded kernel.

The two kernels share the mask/softmax math but differ completely in
scheduling (per-band DMA walk vs one persistent walk per head with a
4-deep cross-band pipeline). With a softmax scale whose folded multiplier
is exactly 1.0 (banded folds scale*log2e into q, persistent the same),
their outputs must match bitwise — any scheduling/indexing bug (wrong
tile, wrong group boundary, stale buffer slot) shows up as a mismatch.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.kernels.flash_varlen import flash_attention_varlen_fwd
from flash_attn_tpu.kernels.flash_varlen_persistent import (
    flash_attention_varlen_fwd_persistent,
)

NEUTRAL = 1.0 / math.log2(math.e)
rng = np.random.default_rng(0)


def _run(lengths, h=4, hk=4, d=64, causal=True, window=(None, None),
         softcap=0.0, chunk=0, sink=False, bq=128, bk=128,
         lengths_k=None, seqused_k=None):
    lengths_k = lengths_k or lengths
    cuq = jnp.asarray(np.concatenate([[0], np.cumsum(lengths)]), jnp.int32)
    cuk = jnp.asarray(np.concatenate([[0], np.cumsum(lengths_k)]), jnp.int32)
    tq, tk = int(cuq[-1]), int(cuk[-1])
    q = jnp.asarray(rng.standard_normal((tq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((tk, hk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((tk, hk, d)), jnp.float32)
    snk = jnp.asarray(rng.standard_normal((h,)), jnp.float32) if sink else None
    kw = dict(causal=causal, window_size=window, softcap=softcap,
              attention_chunk=chunk, learnable_sink=snk, block_q=bq,
              block_k=bk, softmax_scale=1.0 if softcap > 0 else NEUTRAL,
              seqused_k=None if seqused_k is None
              else jnp.asarray(seqused_k, jnp.int32),
              interpret=True)
    mxq, mxk = max(lengths), max(lengths_k)
    o1, l1 = flash_attention_varlen_fwd(q, k, v, cuq, cuk, mxq, mxk, **kw)
    o2, l2 = flash_attention_varlen_fwd_persistent(
        q, k, v, cuq, cuk, mxq, mxk, **kw)
    assert jnp.array_equal(o1, o2), float(jnp.max(jnp.abs(o1 - o2)))
    l1m = jnp.where(jnp.isfinite(l1), l1, 0.0)
    l2m = jnp.where(jnp.isfinite(l2), l2, 0.0)
    assert jnp.array_equal(l1m, l2m)


@pytest.mark.parametrize("case", [
    dict(lengths=[200, 300, 100], causal=True),
    dict(lengths=[200, 300, 100], causal=False),
    dict(lengths=[64, 500, 257, 128], causal=True, window=(96, None)),
    dict(lengths=[300, 300], causal=False, window=(64, 32)),
    dict(lengths=[200, 300], causal=True, softcap=30.0),
    dict(lengths=[200, 300], causal=False, chunk=128),
    dict(lengths=[200, 300, 100], causal=True, sink=True),
    dict(lengths=[127, 1, 258], causal=True),
    dict(lengths=[256, 256], causal=True, lengths_k=[300, 200]),
    dict(lengths=[200, 300], causal=True, seqused_k=[150, 250]),
], ids=lambda c: "-".join(f"{k}={v}" for k, v in c.items()
                          if k != "lengths"))
def test_persistent_matches_banded(case):
    _run(**case)


def test_persistent_gqa_and_multi_tile_bands():
    _run(lengths=[500, 700], h=8, hk=2, causal=True, bq=128, bk=128)
