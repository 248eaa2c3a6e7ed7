"""Packed persistent paged-prefill kernel vs the dense-padded path.

Both route the same math (chunked prefill of packed query chunks against
the paged cache, bottom-right causal); the dense path is itself tested
against dense references in test_paged_prefill.py, so agreement here
transfers. float32 agreement is ~1e-6 (same accumulation structure).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flash_attn_tpu.interface import _varlen_paged_fwd_dense
from flash_attn_tpu.kernels.flash_varlen_paged import (
    flash_attention_varlen_paged_fwd,
)

rng = np.random.default_rng(0)


def _setup(lens_q, lens_k, h, hk, d, page, kv_dtype=jnp.float32):
    b = len(lens_q)
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens_q)]), jnp.int32)
    tq = int(cu[-1])
    q = jnp.asarray(rng.standard_normal((tq, h, d)), jnp.float32)
    maxpg = max(-(-lk // page) for lk in lens_k)
    npages = b * maxpg + 1
    kp = jnp.asarray(rng.standard_normal((npages, hk, page, d)),
                     jnp.float32).astype(kv_dtype)
    vp = jnp.asarray(rng.standard_normal((npages, hk, page, d)),
                     jnp.float32).astype(kv_dtype)
    table = np.zeros((b, maxpg), np.int32)
    n = 1
    for s, lk in enumerate(lens_k):
        for j in range(-(-lk // page)):
            table[s, j] = n
            n += 1
    return q, kp, vp, cu, jnp.asarray(table), jnp.asarray(lens_k, jnp.int32)


@pytest.mark.parametrize("case", [
    dict(lens_q=[100, 200], lens_k=[150, 250]),
    dict(lens_q=[100, 200], lens_k=[150, 250], causal=False),
    dict(lens_q=[64, 300, 33], lens_k=[64, 300, 200], window=(96, None)),
    dict(lens_q=[100], lens_k=[300], causal=False, window=(64, 32)),
    dict(lens_q=[100, 200], lens_k=[150, 250], softcap=20.0),
    dict(lens_q=[100, 200], lens_k=[150, 250], sink=True),
    dict(lens_q=[100, 200], lens_k=[150, 250], h=8, hk=2),
    dict(lens_q=[129, 1, 64], lens_k=[200, 5, 64], page=32, bk=64),
    # bf16 cache for the descale case: the dense reference path downcasts
    # K/V to bf16 whenever descale is on (quantized-cache assumption), so
    # an f32 cache would only measure ITS rounding
    dict(lens_q=[100, 200], lens_k=[150, 250], descale=True,
         kv_dtype="bf16", tol=2e-2),
], ids=lambda c: "-".join(f"{k}={v}" for k, v in c.items()
                          if not k.startswith("lens")))
def test_packed_matches_dense(case):
    lens_q = case["lens_q"]
    lens_k = case["lens_k"]
    h, hk, d = case.get("h", 4), case.get("hk", 2), 64
    page = case.get("page", 64)
    causal = case.get("causal", True)
    window = case.get("window", (None, None))
    softcap = case.get("softcap", 0.0)
    kv_dtype = jnp.bfloat16 if case.get("kv_dtype") == "bf16" \
        else jnp.float32
    q, kp, vp, cu, table, seqk = _setup(lens_q, lens_k, h, hk, d, page,
                                        kv_dtype=kv_dtype)
    snk = (jnp.asarray(rng.standard_normal((h,)), jnp.float32)
           if case.get("sink") else None)
    qd = kd = vd = None
    if case.get("descale"):
        b = len(lens_q)
        kd = jnp.asarray(rng.random((b, hk)) + 0.5, jnp.float32)
        vd = jnp.asarray(rng.random((b, hk)) + 0.5, jnp.float32)
    mxq, mxk = max(lens_q), max(lens_k)
    ref = _varlen_paged_fwd_dense(
        q, kp, vp, cu, mxq, table, seqk, softmax_scale=None, causal=causal,
        window_size=window, softcap=softcap, q_descale=qd, k_descale=kd,
        v_descale=vd, return_attn_probs=True, learnable_sink=snk)
    o, l = flash_attention_varlen_paged_fwd(
        q, kp, vp, cu, mxq, seqk, table, q_descale=qd, k_descale=kd,
        v_descale=vd, learnable_sink=snk, causal=causal, window_size=window,
        softcap=softcap, block_q=128, block_k=case.get("bk", 128),
        interpret=True)
    do = float(jnp.max(jnp.abs(o - ref[0])))
    rl = jnp.where(jnp.isfinite(ref[1]), ref[1], 0.0)
    l0 = jnp.where(jnp.isfinite(l), l, 0.0)
    dl = float(jnp.max(jnp.abs(l0 - rl)))
    tol = case.get("tol", 2e-5)
    assert do < tol and dl < tol, (do, dl)


def test_packed_qv_concat_mla():
    """MLA absorbed prefill: q||qv against K||V pages via kv_concat_dim."""
    import math

    lens_q, lens_k = [100, 200], [150, 250]
    h, hk, d, dv, page = 4, 2, 128, 128, 64
    q, kp, vp, cu, table, seqk = _setup(lens_q, lens_k, h, hk, d, page)
    qv = jnp.asarray(rng.standard_normal((q.shape[0], h, dv)), jnp.float32)
    ref = _varlen_paged_fwd_dense(
        q, kp, vp, cu, 200, table, seqk, softmax_scale=None, causal=True,
        window_size=(None, None), softcap=0.0, q_descale=None,
        k_descale=None, v_descale=None, return_attn_probs=False, qv=qv)
    o, _ = flash_attention_varlen_paged_fwd(
        jnp.concatenate([q, qv], -1), kp, vp, cu, 200, seqk, table,
        causal=True, softmax_scale=1.0 / math.sqrt(d + dv),
        kv_concat_dim=d, block_q=128, block_k=128, interpret=True)
    assert float(jnp.max(jnp.abs(o - ref))) < 2e-5
