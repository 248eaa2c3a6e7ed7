"""Tests for fused-op parity: norms, cross-entropy (incl. TP vocab split),
activations. Reference suites: tests/ops/test_dropout_layer_norm.py,
tests/losses/test_cross_entropy.py (+ _parallel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.ops.cross_entropy import (
    cross_entropy_loss,
    cross_entropy_loss_vocab_parallel,
)
from flash_attn_tpu.ops.norm import (
    dropout_add_layer_norm,
    dropout_add_rms_norm,
    layer_norm,
    rms_norm,
)


def test_layer_norm_matches_direct():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 256), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (256,)) * 0.1 + 1
    b = jax.random.normal(jax.random.PRNGKey(2), (256,)) * 0.1
    got = layer_norm(x, w, b)
    xf = np.asarray(x, np.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    ref = (xf - mu) / np.sqrt(var + 1e-5) * np.asarray(w) + np.asarray(b)
    np.testing.assert_allclose(np.asarray(got, np.float32), ref, atol=2e-2)


def test_dropout_add_ln_residual_and_prenorm():
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64))
    res = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 64))
    w = jnp.ones((64,))
    out, pre = dropout_add_layer_norm(x0, res, w, None, prenorm=True)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(x0 + res), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(layer_norm(x0 + res, w)), atol=1e-6)


def test_dropout_statistics():
    x0 = jnp.ones((4, 128, 256))
    w = jnp.ones((256,))
    _, pre = dropout_add_rms_norm(
        x0, None, w, dropout_p=0.3, prenorm=True, key=jax.random.PRNGKey(0))
    kept = np.asarray(pre) != 0
    frac = kept.mean()
    assert abs(frac - 0.7) < 0.02
    # kept values are scaled by 1/(1-p)
    vals = np.asarray(pre)[kept]
    np.testing.assert_allclose(vals, 1 / 0.7, rtol=1e-5)


@pytest.mark.parametrize("smoothing", [0.0, 0.1])
@pytest.mark.parametrize("zloss", [0.0, 1e-4])
def test_cross_entropy_vs_manual(smoothing, zloss):
    vocab, n = 512, 64
    logits = jax.random.normal(jax.random.PRNGKey(0), (n, vocab))
    labels = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, vocab)
    labels = labels.at[3].set(-100)
    got = cross_entropy_loss(logits, labels, label_smoothing=smoothing,
                             lse_square_scale=zloss)
    lf = np.asarray(logits, np.float64)
    lse = np.log(np.exp(lf - lf.max(-1, keepdims=True)).sum(-1)) + lf.max(-1)
    lab = np.asarray(labels)
    mask = lab != -100
    ll = lf[np.arange(n), np.clip(lab, 0, vocab - 1)]
    if smoothing > 0:
        loss = lse - (1 - smoothing) * ll - smoothing * lf.mean(-1)
    else:
        loss = lse - ll
    loss = loss + zloss * lse**2
    ref = (loss * mask).sum() / mask.sum()
    np.testing.assert_allclose(float(got), ref, rtol=1e-5)


def test_cross_entropy_vocab_parallel_matches_single():
    """TP vocab-split CE under shard_map == single-device CE."""
    vocab, n, tp = 256, 32, 4
    logits = jax.random.normal(jax.random.PRNGKey(0), (n, vocab))
    labels = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, vocab)
    ref = cross_entropy_loss(logits, labels, label_smoothing=0.1,
                             lse_square_scale=1e-4, reduction="none")

    from jax.sharding import Mesh, PartitionSpec as P
    import numpy as onp
    mesh = Mesh(onp.array(jax.devices()[:tp]), ("tp",))
    shard = vocab // tp

    def f(logits_shard, labels):
        start = jax.lax.axis_index("tp") * shard
        return cross_entropy_loss_vocab_parallel(
            logits_shard, labels, "tp", start, label_smoothing=0.1,
            lse_square_scale=1e-4, reduction="none")

    out = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P(None, "tp"), P()), out_specs=P(),
        check_vma=False,
    ))(logits, labels)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=1e-5)


def test_dropout_add_layer_norm_subset():
    """Drop-path subset norm (reference ops/layer_norm.py:693 +
    tests/ops/test_dropout_layer_norm.py:435 semantics): packed kept rows
    scatter into the stream with the drop-path scale, LN, packed output
    subset."""
    from flash_attn_tpu.ops.norm import (
        dropout_add_layer_norm_subset,
        layer_norm,
    )

    rng = np.random.default_rng(0)
    b, s, d = 4, 8, 32
    drop_scale = 1.0 / (1 - 0.25)
    keep_in = np.array([True, False, True, True])
    keep_out = np.array([True, True, False, True])

    def subset_of(mask):
        flat = np.repeat(mask, s)
        sub = np.cumsum(flat).astype(np.int32)
        sub[~flat] = 0
        return jnp.asarray(sub.reshape(b, s))

    x0_sub, out_sub = subset_of(keep_in), subset_of(keep_out)
    n_in, n_out = int(keep_in.sum()) * s, int(keep_out.sum()) * s
    x0 = jnp.asarray(rng.normal(size=(n_in, d)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(b, s, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(d,)), jnp.float32)
    ls = jnp.asarray(rng.normal(size=(d,)), jnp.float32)

    out = dropout_add_layer_norm_subset(
        x0, res, w, bias, 0.0, 1e-5, layerscale=ls, x0_subset=x0_sub,
        out_subset=out_sub, rowscale_const=drop_scale, out_numrows=n_out)

    # dense reference
    x_full = np.zeros((b, s, d), np.float32)
    x_full[keep_in] = np.asarray(x0 * ls).reshape(-1, s, d) * drop_scale
    normed = layer_norm(jnp.asarray(x_full) + res, w, bias, 1e-5)
    ref = np.asarray(normed)[keep_out].reshape(n_out, d)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# fused lm_head + chunked cross-entropy (reference: the Triton CE's
# inplace-backward memory play, flash_attn/ops/triton/cross_entropy.py —
# here chunking + jax.checkpoint so (tokens, vocab) logits never materialize)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("transpose_kernel", [False, True])
@pytest.mark.parametrize("smoothing,zloss,scale", [
    (0.0, 0.0, 1.0), (0.1, 1e-4, 2.0)])
def test_fused_linear_ce_matches_naive(transpose_kernel, smoothing, zloss,
                                       scale):
    from flash_attn_tpu.ops.cross_entropy import fused_linear_cross_entropy

    d, vocab, b, s = 64, 517, 3, 37   # odd tokens: exercises chunk padding
    kx, kw, kl = jax.random.split(jax.random.PRNGKey(0), 3)
    hidden = jax.random.normal(kx, (b, s, d), jnp.float32)
    kernel = jax.random.normal(
        kw, (vocab, d) if transpose_kernel else (d, vocab), jnp.float32) * 0.1
    labels = jax.random.randint(kl, (b, s), 0, vocab)
    labels = labels.at[0, :5].set(-100)   # ignore_index positions

    def naive(hidden, kernel):
        logits = hidden @ (kernel.T if transpose_kernel else kernel)
        return cross_entropy_loss(logits, labels, label_smoothing=smoothing,
                                  logit_scale=scale, lse_square_scale=zloss)

    def fused(hidden, kernel):
        return fused_linear_cross_entropy(
            hidden, kernel, labels, transpose_kernel=transpose_kernel,
            chunk_size=32, label_smoothing=smoothing, logit_scale=scale,
            lse_square_scale=zloss)

    ref, (dh_ref, dk_ref) = jax.value_and_grad(naive, (0, 1))(hidden, kernel)
    got, (dh, dk) = jax.value_and_grad(fused, (0, 1))(hidden, kernel)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dh), np.asarray(dh_ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("reduction", ["none", "sum"])
def test_fused_linear_ce_reductions(reduction):
    from flash_attn_tpu.ops.cross_entropy import fused_linear_cross_entropy

    d, vocab, b, s = 32, 101, 2, 24
    kx, kw, kl = jax.random.split(jax.random.PRNGKey(1), 3)
    hidden = jax.random.normal(kx, (b, s, d), jnp.float32)
    kernel = jax.random.normal(kw, (d, vocab), jnp.float32) * 0.1
    labels = jax.random.randint(kl, (b, s), 0, vocab)
    labels = labels.at[1, -3:].set(-100)
    ref = cross_entropy_loss(hidden @ kernel, labels, reduction=reduction)
    got = fused_linear_cross_entropy(hidden, kernel, labels, chunk_size=16,
                                     reduction=reduction)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)
