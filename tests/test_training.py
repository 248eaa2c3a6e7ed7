"""Training harness tests: native loader, fault-tolerant sampler resume,
end-to-end train steps with checkpoint/resume on a DP x TP mesh."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.models.gpt import GPTConfig
from flash_attn_tpu.training.data import (
    FaultTolerantSampler,
    LMDataLoader,
    TokenDataset,
)
from flash_attn_tpu.training.trainer import TrainConfig, Trainer


@pytest.fixture(scope="module")
def token_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "tokens.bin"
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 100, size=50_000, dtype=np.uint16)
    tokens.tofile(path)
    return str(path)


def test_native_loader_matches_numpy(token_file):
    ds = TokenDataset(token_file, seqlen=128)
    idx = np.array([0, 5, 17, 42])
    batch = ds.batch(idx)
    assert batch.shape == (4, 129)
    for i, s in enumerate(idx):
        np.testing.assert_array_equal(
            batch[i], ds.tokens[s * 128:(s + 1) * 128 + 1])
    # the native path must actually be in use on this machine (g++ baked in)
    assert ds._native is not None, "native loader failed to build"


def test_native_loader_bounds_guard(token_file):
    from flash_attn_tpu.csrc import native_loader
    ds = TokenDataset(token_file, seqlen=128)
    if ds._native is None:
        pytest.skip("native loader unavailable")
    with pytest.raises(IndexError):
        native_loader.fill_batch(
            ds._native, np.array([10**9]), 129, np.uint16)


def test_sampler_exact_resume(token_file):
    ds = TokenDataset(token_file, seqlen=128)
    s1 = FaultTolerantSampler(len(ds), seed=3)
    a = s1.next_indices(10)
    state = s1.state_dict()
    b = s1.next_indices(10)

    s2 = FaultTolerantSampler(len(ds), seed=3)
    s2.load_state_dict(state)
    b2 = s2.next_indices(10)
    np.testing.assert_array_equal(b, b2)
    # epoch rollover keeps producing unique permutations
    s1.next_indices(len(ds))
    assert s1.epoch >= 1


def test_train_steps_and_resume(tmp_path, token_file):
    cfg = TrainConfig(
        model=GPTConfig(
            vocab_size=128, n_positions=0, n_embd=64, n_layer=2, n_head=4,
            rotary_emb_fraction=1.0, use_rms_norm=True, glu_act=True,
            max_decode_seqlen=64, dtype=jnp.float32,
        ),
        batch_size=4, seqlen=128, lr=1e-3, warmup_steps=2, total_steps=20,
        data_parallel=2, model_parallel=4, zero1=True,
        ckpt_dir=str(tmp_path), ckpt_every=1000, log_every=5,
    )
    ds = TokenDataset(token_file, seqlen=cfg.seqlen)
    loader = LMDataLoader(ds, cfg.batch_size)
    trainer = Trainer(cfg)

    logs = []
    trainer.fit(loader, steps=10, log_fn=logs.append)
    assert trainer.step_count == 10
    assert len(logs) == 2
    losses = [l["loss"] for l in logs]
    assert all(np.isfinite(losses))

    path = trainer.save_checkpoint(loader)
    # fresh trainer resumes exactly
    trainer2 = Trainer(cfg)
    loader2 = LMDataLoader(ds, cfg.batch_size)
    trainer2.load_checkpoint(path, loader2)
    assert trainer2.step_count == 10
    assert loader2.state_dict() == loader.state_dict()

    # next step produces identical loss from the same data stream
    trainer.fit(loader, steps=5, log_fn=logs.append)
    trainer2.fit(loader2, steps=5, log_fn=logs.append)
    p1 = jax.tree_util.tree_leaves(trainer.params)[0]
    p2 = jax.tree_util.tree_leaves(trainer2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


def test_zero2_matches_baseline(token_file):
    """ZeRO-2 (data-axis-sharded grads, reduce-scatter + all-gather) must be
    numerically equivalent to the replicated-gradient step."""
    def run(zero2):
        cfg = TrainConfig(
            model=GPTConfig(
                vocab_size=128, n_positions=0, n_embd=64, n_layer=2, n_head=4,
                rotary_emb_fraction=1.0, use_rms_norm=True, glu_act=True,
                max_decode_seqlen=64, dtype=jnp.float32,
            ),
            batch_size=4, seqlen=128, lr=1e-3, warmup_steps=2, total_steps=20,
            data_parallel=4, model_parallel=2, zero1=True, zero2=zero2,
            log_every=1, seed=7,
        )
        ds = TokenDataset(token_file, seqlen=cfg.seqlen)
        loader = LMDataLoader(ds, cfg.batch_size)
        trainer = Trainer(cfg)
        logs = []
        trainer.fit(loader, steps=4, log_fn=logs.append)
        return [l["loss"] for l in logs], trainer

    base, _ = run(False)
    z2, trainer = run(True)
    np.testing.assert_allclose(z2, base, rtol=1e-4, atol=1e-5)
    # params stay correctly sharded after the all-gather constraint
    wqkv = trainer.params["transformer"]["layers_0"]["mixer"]["Wqkv"]["kernel"]
    assert "model" in str(wqkv.sharding.spec)


def test_causality_monitor():
    """Trainer.causality_check: zero leakage on the causal model (reference
    callbacks/causality_monitor.py contract)."""
    from flash_attn_tpu.training.trainer import TrainConfig, Trainer
    from flash_attn_tpu.models.gpt import GPTConfig

    cfg = TrainConfig(
        model=GPTConfig(vocab_size=64, n_positions=0, n_embd=64, n_layer=2,
                        n_head=4, rotary_emb_fraction=1.0, use_rms_norm=True,
                        dtype=jnp.float32),
        batch_size=2, seqlen=32, data_parallel=1, model_parallel=1,
        zero1=False)
    tr = Trainer(cfg)
    stats = tr.causality_check(seqlen=32, splits=(1, 8, 16))
    assert set(stats) == {"causality_leak_1", "causality_leak_8",
                          "causality_leak_16"}
    for k, v in stats.items():
        assert v == 0.0, (k, v)


def _scaler_cfg(**kw):
    return TrainConfig(
        model=GPTConfig(
            vocab_size=128, n_positions=0, n_embd=64, n_layer=2, n_head=4,
            rotary_emb_fraction=1.0, use_rms_norm=True, glu_act=True,
            max_decode_seqlen=64, dtype=jnp.float32,
        ),
        batch_size=4, seqlen=128, lr=1e-3, warmup_steps=2, total_steps=20,
        log_every=1, **kw,
    )


def test_loss_scaler_matches_unscaled(token_file):
    """Dynamic loss scaling (reference trains fp16 under torch GradScaler,
    monitored by callbacks/loss_scale_monitor.py): with finite grads the
    scaled/unscaled trajectories match (fp32 model: unscaling is exact up
    to rounding)."""
    ds = TokenDataset(token_file, seqlen=128)
    t_plain = Trainer(_scaler_cfg())
    t_scaled = Trainer(_scaler_cfg(loss_scale_init=1024.0))
    logs = []
    t_plain.fit(LMDataLoader(ds, 4), steps=5, log_fn=logs.append)
    t_scaled.fit(LMDataLoader(ds, 4), steps=5, log_fn=logs.append)
    assert logs[-1]["loss_scale"] == 1024.0
    p1 = jax.tree_util.tree_leaves(t_plain.params)[0]
    p2 = jax.tree_util.tree_leaves(t_scaled.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                               atol=1e-4, rtol=1e-4)


def test_loss_scaler_skips_overflow_and_grows(token_file):
    """Non-finite grads skip the update and halve the scale; after
    growth_interval clean steps the scale doubles (GradScaler contract)."""
    ds = TokenDataset(token_file, seqlen=128)
    tr = Trainer(_scaler_cfg(loss_scale_init=1024.0,
                             loss_scale_growth_interval=3))
    # Poison one param with NaN: every grad touching it goes non-finite
    # (the fp16-overflow failure mode, injected deterministically).
    leaves, treedef = jax.tree_util.tree_flatten(tr.params)
    poisoned = [leaves[0].at[(0,) * leaves[0].ndim].set(jnp.nan)] + leaves[1:]
    clean_rest = [np.asarray(l).copy() for l in leaves[1:]]
    tr.params = jax.tree_util.tree_unflatten(treedef, poisoned)
    logs = []
    tr.fit(LMDataLoader(ds, 4), steps=2, log_fn=logs.append)
    assert logs[-1]["loss_scale"] == 256.0  # halved twice
    after = jax.tree_util.tree_leaves(tr.params)[1:]
    for a, b in zip(after, clean_rest):  # update skipped: params unchanged
        np.testing.assert_array_equal(np.asarray(a), b)

    # growth: moderate scale, 3 clean steps -> doubles
    tr2 = Trainer(_scaler_cfg(loss_scale_init=256.0,
                              loss_scale_growth_interval=3))
    logs2 = []
    tr2.fit(LMDataLoader(ds, 4), steps=3, log_fn=logs2.append)
    assert logs2[-1]["loss_scale"] == 512.0


def test_image_dataloader_resume_and_vit_train_step(tmp_path):
    """Vision data path (reference training/src/datamodules/imagenet.py
    analogue): mmap image+label caches, fault-tolerant sampler with
    exactly-replayable flip augmentation, and an end-to-end ViT train
    step (loss decreases)."""
    import optax

    from flash_attn_tpu.models.vit import ViTConfig, VisionTransformer
    from flash_attn_tpu.training.data import (
        FaultTolerantSampler,
        ImageDataLoader,
        ImageDataset,
    )

    n, H, W, C, classes = 32, 16, 16, 3, 4
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (n, H, W, C), np.uint8)
    labels = (imgs.astype(np.int64).sum((1, 2, 3)) % classes).astype(np.int32)
    ip, lp = tmp_path / "imgs.bin", tmp_path / "labels.bin"
    imgs.tofile(ip)
    labels.tofile(lp)

    ds = ImageDataset(str(ip), str(lp), (H, W, C))
    dl = ImageDataLoader(ds, batch_size=8,
                         sampler=FaultTolerantSampler(n, seed=3))

    # exact-batch resume incl. the flip augmentation
    it = iter(dl)
    b1 = next(it)
    state = dl.state_dict()
    b2 = next(it)
    dl2 = ImageDataLoader(ds, batch_size=8,
                          sampler=FaultTolerantSampler(n, seed=3))
    dl2.load_state_dict(state)
    b2r = next(iter(dl2))
    np.testing.assert_array_equal(b2[0], b2r[0])
    np.testing.assert_array_equal(b2[1], b2r[1])

    cfg = ViTConfig(img_size=H, patch_size=4, embed_dim=32, depth=1,
                    num_heads=2, num_classes=classes, dtype=jnp.float32)
    model = VisionTransformer(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(b1[0]))["params"]
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, imgs, labels):
        def loss_fn(p):
            logits = model.apply({"params": p}, imgs)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    it = iter(dl)
    for _ in range(8):
        imgs_b, labels_b = next(it)
        params, opt, loss = step(params, opt, jnp.asarray(imgs_b),
                                 jnp.asarray(labels_b))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_grad_accumulation_matches_full_batch(token_file):
    """accumulate_steps=2 over the same total batch matches the
    full-batch step (mean-of-micro-grads == grad-of-mean; reference
    Lightning accumulate_grad_batches parity)."""
    import dataclasses

    from flash_attn_tpu.models.gpt import GPTConfig

    base = TrainConfig(
        model=GPTConfig(vocab_size=128, n_positions=0, n_embd=64,
                        n_layer=2, n_head=4, rotary_emb_fraction=1.0,
                        use_rms_norm=True, glu_act=True, dtype=jnp.float32),
        batch_size=4, seqlen=64, lr=1e-3,
        warmup_steps=1, total_steps=6, zero1=False, log_every=10**9)
    tr_full = Trainer(base)
    tr_acc = Trainer(dataclasses.replace(base, accumulate_steps=2))
    # identical init
    tr_acc.params = jax.tree_util.tree_map(jnp.copy, tr_full.params)
    tr_acc.opt_state = jax.tree_util.tree_map(jnp.copy, tr_full.opt_state)

    ds = TokenDataset(token_file, seqlen=64)
    dl1 = LMDataLoader(ds, batch_size=4, sampler=FaultTolerantSampler(
        len(ds), seed=7))
    dl2 = LMDataLoader(ds, batch_size=4, sampler=FaultTolerantSampler(
        len(ds), seed=7))
    it1, it2 = iter(dl1), iter(dl2)
    with jax.set_mesh(tr_full.mesh):
        for _ in range(3):
            inp, lab = next(it1)
            (tr_full.params, tr_full.opt_state, l1, g1, _, _) = tr_full._step(
                tr_full.params, tr_full.opt_state, jnp.asarray(inp),
                jnp.asarray(lab), None, None)
    with jax.set_mesh(tr_acc.mesh):
        for _ in range(3):
            inp, lab = next(it2)
            (tr_acc.params, tr_acc.opt_state, l2, g2, _, _) = tr_acc._step(
                tr_acc.params, tr_acc.opt_state, jnp.asarray(inp),
                jnp.asarray(lab), None, None)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a.astype(jnp.float32)
                                   - b.astype(jnp.float32)).max()),
        tr_full.params, tr_acc.params)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-4


def test_evaluate_loop(token_file):
    """Trainer.evaluate (reference src/eval.py / Lightning validation):
    returns a finite mean loss and decreases after training steps."""
    cfg = TrainConfig(
        model=GPTConfig(vocab_size=128, n_positions=0, n_embd=64,
                        n_layer=2, n_head=4, rotary_emb_fraction=1.0,
                        use_rms_norm=True, glu_act=True, dtype=jnp.float32),
        batch_size=4, seqlen=64, lr=3e-3, warmup_steps=1, total_steps=30,
        zero1=False, log_every=10**9)
    tr = Trainer(cfg)
    ds = TokenDataset(token_file, seqlen=64)
    val = LMDataLoader(ds, batch_size=4,
                       sampler=FaultTolerantSampler(len(ds), seed=9,
                                                    shuffle=False))
    loss0 = tr.evaluate(val, steps=4)
    train = LMDataLoader(ds, batch_size=4,
                         sampler=FaultTolerantSampler(len(ds), seed=1))
    it = iter(train)
    with jax.set_mesh(tr.mesh):
        for _ in range(25):
            inp, lab = next(it)
            (tr.params, tr.opt_state, l, g, tr.ema_params,
             tr.scaler) = tr._step(tr.params, tr.opt_state,
                                   jnp.asarray(inp), jnp.asarray(lab),
                                   tr.ema_params, tr.scaler)
    loss1 = tr.evaluate(val, steps=4)
    assert np.isfinite(loss0) and np.isfinite(loss1)
    assert loss1 < loss0, (loss0, loss1)


def test_lr_schedules_build_and_step(token_file):
    """Every lr_schedule family builds and trains a step (reference Hydra
    scheduler tree parity)."""
    ds = TokenDataset(token_file, seqlen=64)
    for sched in ("cosine", "linear", "constant", "step"):
        cfg = TrainConfig(
            model=GPTConfig(vocab_size=128, n_positions=0, n_embd=32,
                            n_layer=1, n_head=2, rotary_emb_fraction=1.0,
                            use_rms_norm=True, glu_act=True,
                            dtype=jnp.float32),
            batch_size=2, seqlen=64, lr=1e-3, warmup_steps=2,
            total_steps=10, zero1=False, log_every=10**9,
            lr_schedule=sched)
        tr = Trainer(cfg)
        dl = LMDataLoader(ds, batch_size=2,
                          sampler=FaultTolerantSampler(len(ds), seed=2))
        inp, lab = next(iter(dl))
        with jax.set_mesh(tr.mesh):
            (_, _, loss, _, _, _) = tr._step(
                tr.params, tr.opt_state, jnp.asarray(inp), jnp.asarray(lab),
                None, None)
        assert np.isfinite(float(loss)), sched


def test_fused_ce_matches_naive_logits_path(token_file):
    """fused_ce=True (chunked lm_head+CE, no (b,s,vocab) logits) must train
    identically to the naive full-logits path (fp32 model, tight tol)."""
    def run(fused):
        cfg = TrainConfig(
            model=GPTConfig(
                vocab_size=128, n_positions=0, n_embd=64, n_layer=2, n_head=4,
                rotary_emb_fraction=1.0, use_rms_norm=True, glu_act=True,
                max_decode_seqlen=64, dtype=jnp.float32,
            ),
            batch_size=2, seqlen=128, lr=1e-3, warmup_steps=2, total_steps=20,
            zero1=False, log_every=1, seed=3, fused_ce=fused,
            fused_ce_chunk=64,
        )
        ds = TokenDataset(token_file, seqlen=cfg.seqlen)
        loader = LMDataLoader(ds, cfg.batch_size)
        trainer = Trainer(cfg)
        logs = []
        trainer.fit(loader, steps=3, log_fn=logs.append)
        vl = trainer.evaluate(LMDataLoader(ds, cfg.batch_size), steps=2)
        return [l["loss"] for l in logs], vl

    naive_losses, naive_val = run(False)
    fused_losses, fused_val = run(True)
    np.testing.assert_allclose(fused_losses, naive_losses, rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(fused_val, naive_val, rtol=2e-5, atol=2e-5)


def test_fused_ce_untied_normhead(token_file):
    """lm_head_weights resolves the untied NormHead kernel identically to the
    model's own head (baichuan-v2 NormHead, reference models/gpt.py:657)."""
    cfg = TrainConfig(
        model=GPTConfig(
            vocab_size=128, n_positions=0, n_embd=64, n_layer=1, n_head=4,
            rotary_emb_fraction=1.0, use_rms_norm=True,
            tie_word_embeddings=False, norm_head=True,
            max_decode_seqlen=64, dtype=jnp.float32,
            mup_output_multiplier=1.5,
        ),
        batch_size=2, seqlen=64, zero1=False, log_every=1, seed=5,
        fused_ce=True, fused_ce_chunk=32,
    )
    ds = TokenDataset(token_file, seqlen=cfg.seqlen)
    loader = LMDataLoader(ds, cfg.batch_size)
    trainer = Trainer(cfg)
    inp, lab = next(iter(loader))
    ids, labs = jnp.asarray(inp), jnp.asarray(lab)
    with jax.set_mesh(trainer.mesh):
        # naive loss through the model's own lm_head (incl. muP scale)
        from flash_attn_tpu.ops.cross_entropy import cross_entropy_loss
        logits = trainer.model.apply({"params": trainer.params}, ids)
        ref = float(cross_entropy_loss(logits, labs))
        (_, _, loss, *_rest) = trainer._step(
            trainer.params, trainer.opt_state, ids, labs,
            trainer.ema_params, trainer.scaler)
        np.testing.assert_allclose(float(loss), ref, rtol=2e-5)


def test_bf16_optimizer_state_tracks_fp32():
    """adamw_bf16 (stochastic-rounded bf16 moments) must track the fp32
    AdamW loss curve on a small model: same trajectory within a small
    tolerance, and the moment state is actually stored in bfloat16."""
    import numpy as np

    from flash_attn_tpu.models.gpt import GPTConfig
    from flash_attn_tpu.training.trainer import TrainConfig, Trainer

    mcfg = GPTConfig(vocab_size=128, n_positions=0, n_embd=64, n_layer=2,
                     n_head=4, rotary_emb_fraction=1.0, use_rms_norm=True,
                     dtype=jnp.float32)
    ids = jax.random.randint(jax.random.PRNGKey(5), (4, 64), 0, 128)
    labels = jnp.roll(ids, -1, axis=1)

    losses = {}
    for dtype in ("float32", "bfloat16"):
        cfg = TrainConfig(model=mcfg, batch_size=4, seqlen=64, lr=1e-2,
                          warmup_steps=1, total_steps=40, zero1=False,
                          fused_ce=False, log_every=10**9,
                          opt_state_dtype=dtype)
        tr = Trainer(cfg)
        curve = []
        with jax.set_mesh(tr.mesh):
            for _ in range(30):
                (tr.params, tr.opt_state, loss, _g, tr.ema_params,
                 tr.scaler) = tr._step(tr.params, tr.opt_state, ids, labels,
                                       tr.ema_params, tr.scaler)
                curve.append(float(loss))
        losses[dtype] = curve
        if dtype == "bfloat16":
            leaves = jax.tree_util.tree_leaves(tr.opt_state)
            assert any(l.dtype == jnp.bfloat16 for l in leaves
                       if hasattr(l, "dtype")), "moments not bf16"
    # both optimize; curves stay close (overfitting a fixed batch)
    assert losses["bfloat16"][-1] < losses["bfloat16"][0] * 0.7
    rel = abs(losses["bfloat16"][-1] - losses["float32"][-1]) / max(
        1e-6, abs(losses["float32"][-1]))
    assert rel < 0.15, (losses["float32"][-5:], losses["bfloat16"][-5:])


def test_stochastic_round_bf16_unbiased():
    """The SR primitive: exact on bf16-representable values; mean of the
    rounding over many step salts approximates the fp32 value (unbiased),
    unlike round-to-nearest which collapses tiny increments."""
    import numpy as np

    from flash_attn_tpu.training.trainer import _stochastic_round_bf16

    exact = jnp.asarray([1.0, -2.5, 0.0, 0.015625], jnp.float32)
    for s in (1, 7, 123):
        out = _stochastic_round_bf16(exact, jnp.uint32(s))
        assert jnp.all(out.astype(jnp.float32) == exact)

    # value halfway in the bf16 gap: mean over salts ~ true value
    lo = jnp.float32(1.0)
    hi = jnp.float32(float(jnp.nextafter(jnp.bfloat16(1.0),
                                         jnp.bfloat16(2.0))))
    x = jnp.full((4096,), (float(lo) + float(hi)) / 2, jnp.float32)
    outs = [np.asarray(_stochastic_round_bf16(
        x, jnp.uint32(s) * jnp.uint32(0x9E3779B9)).astype(jnp.float32))
        for s in range(1, 9)]
    m = float(np.mean(np.stack(outs)))
    mid = (float(lo) + float(hi)) / 2
    assert abs(m - mid) < (float(hi) - float(lo)) * 0.25, (m, mid)
    # and non-finite passthrough
    bad = jnp.asarray([jnp.inf, -jnp.inf, jnp.nan], jnp.float32)
    ob = _stochastic_round_bf16(bad, jnp.uint32(3)).astype(jnp.float32)
    assert jnp.isinf(ob[0]) and jnp.isinf(ob[1]) and jnp.isnan(ob[2])
