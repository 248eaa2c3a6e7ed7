"""Round-2 verify drive: run the changed kernels on the REAL TPU chip and
check numerics against a host-side numpy reference. Small shapes to keep
remote Mosaic compiles bounded."""
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

_fetch = jax.jit(lambda r: jnp.sum(r.astype(jnp.float32)))
t0 = time.time()


def log(msg):
    print(f"[+{time.time()-t0:.0f}s] {msg}", flush=True)


def np_attn(q, k, v, causal=False, window=(None, None), softcap=0.0,
            scale=None):
    q, k, v = (np.asarray(x, np.float32) for x in (q, k, v))
    b, s, h, d = q.shape
    hk = k.shape[2]
    g = h // hk
    kf = np.repeat(k, g, axis=2)
    vf = np.repeat(v, g, axis=2)
    scale = scale or 1.0 / np.sqrt(d)
    S = np.einsum("bqhd,bkhd->bhqk", q, kf) * scale
    if softcap > 0:
        S = np.tanh(S / softcap) * softcap
    sk = S.shape[-1]
    rows = np.arange(s)[:, None]
    cols = np.arange(sk)[None, :]
    shift = sk - s
    mask = np.ones((s, sk), bool)
    wl, wr = window
    if causal:
        mask &= cols <= rows + shift
    elif wr is not None:
        mask &= cols <= rows + shift + wr
    if wl is not None:
        mask &= cols >= rows + shift - wl
    S = np.where(mask, S, -np.inf)
    M = S.max(-1, keepdims=True)
    M = np.where(np.isinf(M), 0, M)
    P = np.exp(S - M)
    P = P / np.maximum(P.sum(-1, keepdims=True), 1e-30)
    return np.einsum("bhqk,bkhd->bqhd", P, vf)


def main():
    from flash_attn_tpu import (flash_attn_func, flash_attn_varlen_func,
                                flash_attn_with_kvcache,
                                get_scheduler_metadata)

    print("devices:", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    b, s, h, d = 2, 256, 4, 64

    def mk(*shape, dt=jnp.bfloat16):
        return jnp.asarray(rng.randn(*shape), dt)

    # 1. causal fwd + grad (packed band + new vector-iota masks + fused bwd)
    q, k, v = mk(b, s, h, d), mk(b, s, h, d), mk(b, s, h, d)
    out = flash_attn_func(q, k, v, causal=True)
    ref = np_attn(q, k, v, causal=True)
    err = float(np.abs(np.asarray(out, np.float32) - ref).max())
    log(f"1 causal fwd err={err:.4f}")
    assert err < 2e-2, err
    gfn = jax.jit(jax.grad(lambda q, k, v: flash_attn_func(
        q, k, v, causal=True).astype(jnp.float32).sum(), argnums=(0, 1, 2)))
    dq, dk, dv = gfn(q, k, v)
    fin = all(bool(jnp.isfinite(x.astype(jnp.float32)).all())
              for x in (dq, dk, dv))
    log(f"2 fused bwd finite={fin} |dq|={float(jnp.abs(dq.astype(jnp.float32)).mean()):.4f}")
    assert fin

    # 2. GQA + window + softcap fwd
    kg, vg = mk(b, s, 2, d), mk(b, s, 2, d)
    out = flash_attn_func(q, kg, vg, causal=True, window_size=(64, 0),
                          softcap=20.0)
    ref = np_attn(q, kg, vg, causal=True, window=(64, None), softcap=20.0)
    err = float(np.abs(np.asarray(out, np.float32) - ref).max())
    log(f"3 gqa+window+softcap err={err:.4f}")
    assert err < 2e-2, err

    # 3. varlen + scheduler metadata
    lens_q = np.array([100, 156], np.int32)
    lens_k = np.array([200, 56], np.int32)
    cu_q = jnp.asarray(np.concatenate([[0], lens_q.cumsum()]), jnp.int32)
    cu_k = jnp.asarray(np.concatenate([[0], lens_k.cumsum()]), jnp.int32)
    qp, kp, vp = mk(256, h, d), mk(256, h, d), mk(256, h, d)
    md = get_scheduler_metadata(2, 156, 200, h, h, d, cu_seqlens_q=cu_q,
                                cu_seqlens_k=cu_k, causal=True)
    out_v = flash_attn_varlen_func(qp, kp, vp, cu_q, cu_k, 156, 200,
                                   causal=True, scheduler_metadata=md)
    ov = np.asarray(out_v, np.float32)
    errs = []
    for i in range(2):
        qs = qp[int(cu_q[i]):int(cu_q[i + 1])][None]
        ks = kp[int(cu_k[i]):int(cu_k[i + 1])][None]
        vs = vp[int(cu_k[i]):int(cu_k[i + 1])][None]
        r = np_attn(qs, ks, vs, causal=True)[0]
        errs.append(np.abs(ov[int(cu_q[i]):int(cu_q[i + 1])] - r).max())
    log(f"4 varlen+scheduler_metadata errs={[f'{e:.4f}' for e in errs]}")
    assert max(errs) < 2e-2, errs

    # 4. paged decode (vectorized batched-head kernel)
    page, ctx, hk = 128, 512, 2
    npages = b * (ctx // page)
    q1 = mk(b, 1, h, d)
    kc = mk(npages, hk, page, d)
    vc = mk(npages, hk, page, d)
    table = jnp.arange(npages, dtype=jnp.int32).reshape(b, ctx // page)
    seqlens = jnp.full((b,), ctx - 1, jnp.int32)
    out_d = flash_attn_with_kvcache(q1, kc, vc, cache_seqlens=seqlens,
                                    block_table=table, causal=True)
    # host ref: gather pages into (b, ctx, hk, d)
    kl = np.asarray(kc, np.float32).reshape(b, ctx // page, hk, page, d)
    kl = kl.transpose(0, 1, 3, 2, 4).reshape(b, ctx, hk, d)[:, :ctx - 1]
    vl = np.asarray(vc, np.float32).reshape(b, ctx // page, hk, page, d)
    vl = vl.transpose(0, 1, 3, 2, 4).reshape(b, ctx, hk, d)[:, :ctx - 1]
    refd = np_attn(np.asarray(q1, np.float32), kl, vl, causal=True)
    errd = float(np.abs(np.asarray(out_d, np.float32) - refd).max())
    log(f"5 paged decode err={errd:.4f}")
    assert errd < 2e-2, errd

    # 5. paged varlen prefill (block_table through flash_attn_varlen_func)
    lens_q2 = np.array([60, 120], np.int32)
    seq_k2 = jnp.asarray([200, 320], jnp.int32)  # total ctx incl. chunk
    cu_q2 = jnp.asarray(np.concatenate([[0], lens_q2.cumsum()]), jnp.int32)
    qp2 = mk(180, h, d)
    kc2 = mk(6, hk, page, d)
    vc2 = mk(6, hk, page, d)
    tab2 = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    out_p = flash_attn_varlen_func(
        qp2, kc2, vc2, cu_q2, None, 120, 320, causal=True,
        block_table=tab2, seqused_k=seq_k2)
    op = np.asarray(out_p, np.float32)
    kl2 = np.asarray(kc2, np.float32).reshape(2, 3, hk, page, d)
    kl2 = kl2.transpose(0, 1, 3, 2, 4).reshape(2, 3 * page, hk, d)
    vl2 = np.asarray(vc2, np.float32).reshape(2, 3, hk, page, d)
    vl2 = vl2.transpose(0, 1, 3, 2, 4).reshape(2, 3 * page, hk, d)
    errs2 = []
    for i in range(2):
        sq_i = int(lens_q2[i])
        sk_i = int(seq_k2[i])
        qs = qp2[int(cu_q2[i]):int(cu_q2[i + 1])][None]
        r = np_attn(qs, kl2[i:i + 1, :sk_i], vl2[i:i + 1, :sk_i],
                    causal=True)[0]
        errs2.append(np.abs(op[int(cu_q2[i]):int(cu_q2[i + 1])] - r).max())
    log(f"6 paged varlen prefill errs={[f'{e:.4f}' for e in errs2]}")
    assert max(errs2) < 2e-2, errs2

    log("ALL DRIVE CHECKS PASSED")


if __name__ == "__main__":
    main()
