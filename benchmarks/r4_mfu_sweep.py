"""Round-4 MFU sweep: 913M GPT train step over (batch, remat_policy) with
the fused chunked CE (VERDICT r3 task #2 — target >= 65% MFU).

Usage: python benchmarks/r4_mfu_sweep.py <batch> <remat> [fused_ce]
  remat: none | full | dots
Prints one JSON line per run; OOM/compile failures exit nonzero with the
error type so the driver loop can continue the sweep.
"""

import json
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1])
    remat = sys.argv[2]
    fused_ce = (sys.argv[3] != "0") if len(sys.argv) > 3 else True
    seqlen = int(os.environ.get("SEQLEN", "2048"))

    from flash_attn_tpu.models.gpt import GPTConfig
    from flash_attn_tpu.training.trainer import (
        TrainConfig, Trainer, model_flops_per_token)

    mcfg = GPTConfig(
        vocab_size=50304, n_positions=0, n_embd=2048, n_layer=16,
        n_head=16, n_head_kv=16, rotary_emb_fraction=1.0,
        use_rms_norm=True, glu_act=True, tie_word_embeddings=True,
        max_decode_seqlen=0,
        remat=(remat != "none"), remat_policy=remat if remat != "none" else "full",
        dtype=jnp.bfloat16)
    accum = int(os.environ.get("ACCUM", "1"))
    cfg = TrainConfig(model=mcfg, batch_size=batch, seqlen=seqlen,
                      zero1=False, log_every=10**9, fused_ce=fused_ce,
                      accumulate_steps=accum)
    tr = Trainer(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(0), (batch, seqlen), 0,
                             mcfg.vocab_size)
    labels = jnp.roll(ids, -1, axis=1)

    def step():
        (tr.params, tr.opt_state, loss, gnorm, tr.ema_params,
         tr.scaler) = tr._step(tr.params, tr.opt_state, ids, labels,
                               tr.ema_params, tr.scaler)
        return loss

    with jax.set_mesh(tr.mesh):
        loss = step()
        float(loss)
        iters = 8
        t0 = time.perf_counter()
        for _ in range(iters):
            loss = step()
        float(loss)
        t = (time.perf_counter() - t0) / iters
    tps = batch * seqlen / t
    tflops = tps * model_flops_per_token(mcfg, seqlen) / 1e12
    print(json.dumps({
        "batch": batch, "remat": remat, "fused_ce": fused_ce,
        "seqlen": seqlen, "step_ms": round(t * 1e3, 1),
        "tokens_per_s": round(tps, 1), "tflops": round(tflops, 2),
        "mfu": round(tflops / 197.0, 4)}), flush=True)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"error": type(e).__name__,
                          "msg": str(e)[:200]}), flush=True)
        sys.exit(1)
