"""flash_attn_with_kvcache tests vs the golden reference.

Mirrors the reference decode suite (tests/test_flash_attn.py:1907
``test_flash_attn_kvcache``): append, rotary, paged block tables, leftpad,
cache_batch_idx, split-KV, GQA.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu import flash_attn_with_kvcache
from flash_attn_tpu.ops.rotary import apply_rotary_emb
from flash_attn_tpu.utils.testing import attention_ref, check_against_ref


def _mk(key, shape, dtype=jnp.bfloat16):
    return jax.random.normal(key, shape).astype(dtype)


def _ref_decode(q, k_full, v_full, cache_seqlens_eff, causal, leftpad=None,
                window_size=(None, None), attention_chunk=0, upcast=True):
    """k_full/v_full: (b, s_max, h_k, d) with appended keys already placed."""
    b, s_max = k_full.shape[:2]
    kmask = jnp.arange(s_max)[None, :] < cache_seqlens_eff[:, None]
    if leftpad is not None:
        kmask = jnp.logical_and(kmask, jnp.arange(s_max)[None, :] >= leftpad[:, None])
    out, _ = attention_ref(
        q, k_full, v_full, None, kmask, causal=causal,
        key_leftpad=leftpad, window_size=window_size,
        attention_chunk=attention_chunk,
        upcast=upcast, reorder_ops=not upcast,
    )
    return out


@pytest.mark.parametrize("mha_type", ["mha", "gqa", "mqa"])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("seqlen_q", [1, 4])
def test_kvcache_basic(seqlen_q, causal, mha_type):
    key = jax.random.PRNGKey(hash(("kv", seqlen_q, causal, mha_type)) % 2**31)
    b, h, d, s_max = 2, 8, 128, 384
    h_k = {"mha": h, "gqa": 2, "mqa": 1}[mha_type]
    q = _mk(key, (b, seqlen_q, h, d))
    kc = _mk(jax.random.PRNGKey(1), (b, h_k, s_max, d))  # native layout
    vc = _mk(jax.random.PRNGKey(2), (b, h_k, s_max, d))
    cache_seqlens = jnp.array([200, 384 - seqlen_q], jnp.int32)

    out, lse = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=cache_seqlens, causal=causal,
        return_softmax_lse=True,
    )
    k_b = jnp.swapaxes(kc, 1, 2)
    v_b = jnp.swapaxes(vc, 1, 2)
    ref = _ref_decode(q, k_b, v_b, cache_seqlens, causal)
    ref_lp = _ref_decode(q, k_b, v_b, cache_seqlens, causal, upcast=False)
    check_against_ref(out, ref, ref_lp, msg=f"kvcache {mha_type} causal={causal}")
    assert lse.shape == (b, h, seqlen_q)


@pytest.mark.parametrize("rotary", [False, True])
@pytest.mark.parametrize("causal", [True])
def test_kvcache_append(causal, rotary):
    key = jax.random.PRNGKey(5)
    b, h, h_k, d, s_max, s_new = 2, 4, 2, 64, 256, 8
    q = _mk(key, (b, s_new, h, d))
    kc = _mk(jax.random.PRNGKey(1), (b, h_k, s_max, d))
    vc = _mk(jax.random.PRNGKey(2), (b, h_k, s_max, d))
    k_new = _mk(jax.random.PRNGKey(3), (b, s_new, h_k, d))
    v_new = _mk(jax.random.PRNGKey(4), (b, s_new, h_k, d))
    cache_seqlens = jnp.array([77, 150], jnp.int32)

    cos = sin = None
    if rotary:
        rot_dim = d // 2
        inv = 1.0 / (10000 ** (jnp.arange(0, rot_dim, 2) / rot_dim))
        t = jnp.arange(s_max)
        ang = t[:, None] * inv[None, :]
        cos, sin = jnp.cos(ang), jnp.sin(ang)

    out, kc2, vc2 = flash_attn_with_kvcache(
        q, kc, vc, k=k_new, v=v_new, rotary_cos=cos, rotary_sin=sin,
        cache_seqlens=cache_seqlens, causal=causal,
    )

    # reference: place (rotated) new keys into the bshd cache copy
    k_b = jnp.swapaxes(kc, 1, 2)
    v_b = jnp.swapaxes(vc, 1, 2)
    k_app, q_rot = k_new, q
    if rotary:
        k_app = apply_rotary_emb(k_new, cos, sin, seqlen_offsets=cache_seqlens)
        q_rot = apply_rotary_emb(q, cos, sin, seqlen_offsets=cache_seqlens)
    pos = cache_seqlens[:, None] + jnp.arange(s_new)[None, :]
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], pos.shape)
    k_b = k_b.at[rows, pos].set(k_app)
    v_b = v_b.at[rows, pos].set(v_new)
    eff = cache_seqlens + s_new
    ref = _ref_decode(q_rot, k_b, v_b, eff, causal)
    ref_lp = _ref_decode(q_rot, k_b, v_b, eff, causal, upcast=False)
    check_against_ref(out, ref, ref_lp, msg=f"append rotary={rotary}")

    # the updated cache must contain the new keys at the right offsets
    got_k = jnp.swapaxes(kc2, 1, 2)
    np.testing.assert_allclose(
        np.asarray(got_k[rows, pos], np.float32),
        np.asarray(k_app, np.float32), atol=1e-2, rtol=1e-2,
    )


def test_kvcache_paged():
    key = jax.random.PRNGKey(9)
    b, h, h_k, d = 2, 4, 2, 64
    page_size, pages_per_seq = 128, 3
    s_max = page_size * pages_per_seq
    num_pages = b * pages_per_seq + 2
    q = _mk(key, (b, 1, h, d))
    kp = _mk(jax.random.PRNGKey(1), (num_pages, h_k, page_size, d))
    vp = _mk(jax.random.PRNGKey(2), (num_pages, h_k, page_size, d))
    # shuffled page assignment
    table = jnp.array([[4, 0, 6], [1, 5, 2]], jnp.int32)
    cache_seqlens = jnp.array([300, 170], jnp.int32)

    out = flash_attn_with_kvcache(
        q, kp, vp, cache_seqlens=cache_seqlens, block_table=table, causal=True,
    )

    # gather pages into linear caches for the reference
    k_lin = jnp.swapaxes(kp[table].reshape(b, pages_per_seq, h_k, page_size, d)
                         .transpose(0, 1, 3, 2, 4).reshape(b, s_max, h_k, d), 0, 0)
    v_lin = (vp[table].reshape(b, pages_per_seq, h_k, page_size, d)
             .transpose(0, 1, 3, 2, 4).reshape(b, s_max, h_k, d))
    ref = _ref_decode(q, k_lin, v_lin, cache_seqlens, True)
    ref_lp = _ref_decode(q, k_lin, v_lin, cache_seqlens, True, upcast=False)
    check_against_ref(out, ref, ref_lp, msg="paged")


def test_kvcache_paged_append():
    key = jax.random.PRNGKey(11)
    b, h, h_k, d = 2, 2, 2, 64
    page_size, pages_per_seq = 128, 2
    num_pages = b * pages_per_seq
    s_max = page_size * pages_per_seq
    q = _mk(key, (b, 1, h, d))
    kp = _mk(jax.random.PRNGKey(1), (num_pages, h_k, page_size, d))
    vp = _mk(jax.random.PRNGKey(2), (num_pages, h_k, page_size, d))
    k_new = _mk(jax.random.PRNGKey(3), (b, 1, h_k, d))
    v_new = _mk(jax.random.PRNGKey(4), (b, 1, h_k, d))
    table = jnp.array([[2, 0], [3, 1]], jnp.int32)
    cache_seqlens = jnp.array([127, 200], jnp.int32)  # crosses a page boundary

    out, kp2, vp2 = flash_attn_with_kvcache(
        q, kp, vp, k=k_new, v=v_new, cache_seqlens=cache_seqlens,
        block_table=table, causal=True,
    )
    # check scatter landed on the right page slot
    for i in range(b):
        pos = int(cache_seqlens[i])
        pg = int(table[i, pos // page_size])
        got = kp2[pg, :, pos % page_size]
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(k_new[i, 0].swapaxes(0, 0), np.float32),
                                   atol=1e-2, rtol=1e-2)

    k_lin = (kp2[table].reshape(b, pages_per_seq, h_k, page_size, d)
             .transpose(0, 1, 3, 2, 4).reshape(b, s_max, h_k, d))
    v_lin = (vp2[table].reshape(b, pages_per_seq, h_k, page_size, d)
             .transpose(0, 1, 3, 2, 4).reshape(b, s_max, h_k, d))
    eff = cache_seqlens + 1
    ref = _ref_decode(q, k_lin, v_lin, eff, True)
    ref_lp = _ref_decode(q, k_lin, v_lin, eff, True, upcast=False)
    check_against_ref(out, ref, ref_lp, msg="paged append")


def test_kvcache_leftpad_and_batch_idx():
    key = jax.random.PRNGKey(13)
    b, h, h_k, d, s_max = 2, 4, 4, 64, 256
    b_cache = 4
    q = _mk(key, (b, 1, h, d))
    kc = _mk(jax.random.PRNGKey(1), (b_cache, h_k, s_max, d))
    vc = _mk(jax.random.PRNGKey(2), (b_cache, h_k, s_max, d))
    cache_seqlens = jnp.array([200, 130], jnp.int32)
    leftpad = jnp.array([16, 0], jnp.int32)
    batch_idx = jnp.array([3, 1], jnp.int32)

    out = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=cache_seqlens, cache_leftpad=leftpad,
        cache_batch_idx=batch_idx, causal=True,
    )
    k_b = jnp.swapaxes(kc, 1, 2)[batch_idx]
    v_b = jnp.swapaxes(vc, 1, 2)[batch_idx]
    ref = _ref_decode(q, k_b, v_b, cache_seqlens, True, leftpad=leftpad)
    ref_lp = _ref_decode(q, k_b, v_b, cache_seqlens, True, leftpad=leftpad,
                         upcast=False)
    check_against_ref(out, ref, ref_lp, msg="leftpad/batch_idx")


@pytest.mark.parametrize("num_splits", [1, 2, 5])
def test_kvcache_splits(num_splits):
    key = jax.random.PRNGKey(17)
    b, h, h_k, d, s_max = 2, 8, 2, 128, 1024
    q = _mk(key, (b, 1, h, d))
    kc = _mk(jax.random.PRNGKey(1), (b, h_k, s_max, d))
    vc = _mk(jax.random.PRNGKey(2), (b, h_k, s_max, d))
    cache_seqlens = jnp.array([1000, 513], jnp.int32)

    out = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=cache_seqlens, causal=True,
        num_splits=num_splits,
    )
    k_b = jnp.swapaxes(kc, 1, 2)
    v_b = jnp.swapaxes(vc, 1, 2)
    ref = _ref_decode(q, k_b, v_b, cache_seqlens, True)
    ref_lp = _ref_decode(q, k_b, v_b, cache_seqlens, True, upcast=False)
    check_against_ref(out, ref, ref_lp, msg=f"splits={num_splits}")


def test_kvcache_local_window():
    key = jax.random.PRNGKey(19)
    b, h, h_k, d, s_max = 2, 4, 4, 64, 256
    q = _mk(key, (b, 1, h, d))
    kc = _mk(jax.random.PRNGKey(1), (b, h_k, s_max, d))
    vc = _mk(jax.random.PRNGKey(2), (b, h_k, s_max, d))
    cache_seqlens = jnp.array([240, 111], jnp.int32)

    out = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=cache_seqlens, causal=True,
        window_size=(64, 0),
    )
    k_b = jnp.swapaxes(kc, 1, 2)
    v_b = jnp.swapaxes(vc, 1, 2)
    ref = _ref_decode(q, k_b, v_b, cache_seqlens, True, window_size=(64, 0))
    ref_lp = _ref_decode(q, k_b, v_b, cache_seqlens, True,
                         window_size=(64, 0), upcast=False)
    check_against_ref(out, ref, ref_lp, msg="kvcache window")


def test_kvcache_paged_batch_chunking():
    """Large (batch x pages) tables route through the lax.map chunking path
    and must match the unchunked small-batch result."""
    b, h, h_k, d = 8, 4, 2, 64
    page_size, ppseq = 128, 64  # b*ppseq = 512 > 256 -> chunked
    s_max = page_size * ppseq
    num_pages = b * ppseq
    q = _mk(jax.random.PRNGKey(0), (b, 1, h, d))
    kp = _mk(jax.random.PRNGKey(1), (num_pages, h_k, page_size, d))
    vp = _mk(jax.random.PRNGKey(2), (num_pages, h_k, page_size, d))
    table = jnp.arange(num_pages, dtype=jnp.int32).reshape(b, ppseq)
    cache_seqlens = jnp.array([500, 120, 1000, 333, 700, 64, 900, 257],
                              jnp.int32)

    out = flash_attn_with_kvcache(
        q, kp, vp, cache_seqlens=cache_seqlens, block_table=table,
        causal=True)
    # reference: per-batch unchunked calls
    for i in range(b):
        o1 = flash_attn_with_kvcache(
            q[i:i+1], kp, vp, cache_seqlens=cache_seqlens[i:i+1],
            block_table=table[i:i+1], causal=True)
        np.testing.assert_allclose(np.asarray(out[i:i+1], np.float32),
                                   np.asarray(o1, np.float32),
                                   atol=1e-3, rtol=1e-3)


def test_kvcache_paged_long_context_chunking():
    """ppseq > 16 routes through the context-split + combine path; must
    equal a manual page-gather reference."""
    b, h, h_k, d = 2, 4, 2, 64
    page_size, ppseq = 128, 32   # > 16 -> context-split path
    s_max = page_size * ppseq
    num_pages = b * ppseq
    q = _mk(jax.random.PRNGKey(0), (b, 1, h, d))
    kp = _mk(jax.random.PRNGKey(1), (num_pages, h_k, page_size, d))
    vp = _mk(jax.random.PRNGKey(2), (num_pages, h_k, page_size, d))
    table = jnp.arange(num_pages, dtype=jnp.int32).reshape(b, ppseq)
    cache_seqlens = jnp.array([4000, 1111], jnp.int32)

    out, lse = flash_attn_with_kvcache(
        q, kp, vp, cache_seqlens=cache_seqlens, block_table=table,
        causal=True, return_softmax_lse=True)

    k_lin = (kp[table].reshape(b, ppseq, h_k, page_size, d)
             .transpose(0, 1, 3, 2, 4).reshape(b, s_max, h_k, d))
    v_lin = (vp[table].reshape(b, ppseq, h_k, page_size, d)
             .transpose(0, 1, 3, 2, 4).reshape(b, s_max, h_k, d))
    ref = _ref_decode(q, k_lin, v_lin, cache_seqlens, True)
    ref_lp = _ref_decode(q, k_lin, v_lin, cache_seqlens, True, upcast=False)
    check_against_ref(out, ref, ref_lp, msg="long-ctx paged")
    assert lse.shape == (b, h, 1)


def test_kvcache_paged_block_table_bounds_guard():
    """Out-of-capacity paged lookups must be loud, never silently clamped
    (reference tests/test_flash_attn.py:2589, issue #2709: mha_fwd_kvcache
    raises when cache_seqlens + appended keys exceed block_table capacity).
    Eager: raises like the reference. Under jit (traced lengths): the
    overflowing batch rows come back NaN-poisoned."""
    import pytest

    b, h, d = 1, 1, 64
    page_size = 256
    max_pages_per_seq = 1
    capacity = max_pages_per_seq * page_size  # 256 tokens
    num_pages = 4
    q = _mk(jax.random.PRNGKey(0), (b, 1, h, d))
    kp = _mk(jax.random.PRNGKey(1), (num_pages, h, page_size, d))
    vp = _mk(jax.random.PRNGKey(2), (num_pages, h, page_size, d))
    table = jnp.zeros((b, max_pages_per_seq), jnp.int32)

    # eager overflow -> ValueError (capacity exceeded by cache_seqlens)
    with pytest.raises(ValueError, match="block_table capacity"):
        flash_attn_with_kvcache(
            q, kp, vp, cache_seqlens=jnp.array([capacity + 1], jnp.int32),
            block_table=table, causal=True)

    # eager overflow via appended keys (cache full + 1 new key)
    k_new = _mk(jax.random.PRNGKey(3), (b, 1, h, d))
    with pytest.raises(ValueError, match="block_table capacity"):
        flash_attn_with_kvcache(
            q, kp, vp, k=k_new, v=k_new,
            cache_seqlens=jnp.array([capacity], jnp.int32),
            block_table=table, causal=True)

    # at exactly capacity: fine, finite
    out = flash_attn_with_kvcache(
        q, kp, vp, cache_seqlens=jnp.array([capacity], jnp.int32),
        block_table=table, causal=True)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())

    # jit (traced cache_seqlens): overflow rows NaN-poisoned, valid rows ok
    fn = jax.jit(lambda sl: flash_attn_with_kvcache(
        q, kp, vp, cache_seqlens=sl, block_table=table, causal=True))
    bad = fn(jnp.array([capacity + 1], jnp.int32))
    assert bool(jnp.isnan(bad.astype(jnp.float32)).all())
    good = fn(jnp.array([capacity - 5], jnp.int32))
    assert bool(jnp.isfinite(good.astype(jnp.float32)).all())


@pytest.mark.parametrize("page_size,pages_per_seq", [(16, 24), (64, 8)])
def test_kvcache_paged_small_pages(page_size, pages_per_seq):
    """Small pages (16/64) — a KV tile spans pages_per_tile pages via
    concurrent unrolled DMAs (round-3; the reference serves page 16 too:
    benchmarks/benchmark_mla_paged_kv.py:20-33)."""
    key = jax.random.PRNGKey(17)
    b, h, h_k, d = 2, 4, 2, 64
    s_max = page_size * pages_per_seq
    num_pages = b * pages_per_seq + 3
    q = _mk(key, (b, 1, h, d))
    kp = _mk(jax.random.PRNGKey(1), (num_pages, h_k, page_size, d))
    vp = _mk(jax.random.PRNGKey(2), (num_pages, h_k, page_size, d))
    perm = jax.random.permutation(jax.random.PRNGKey(3), num_pages)
    table = perm[: b * pages_per_seq].reshape(b, pages_per_seq)
    cache_seqlens = jnp.array([s_max - 5, s_max // 2 + 3], jnp.int32)

    out = flash_attn_with_kvcache(
        q, kp, vp, cache_seqlens=cache_seqlens, block_table=table,
        causal=True)
    k_lin = (kp[table].reshape(b, pages_per_seq, h_k, page_size, d)
             .transpose(0, 1, 3, 2, 4).reshape(b, s_max, h_k, d))
    v_lin = (vp[table].reshape(b, pages_per_seq, h_k, page_size, d)
             .transpose(0, 1, 3, 2, 4).reshape(b, s_max, h_k, d))
    ref = _ref_decode(q, k_lin, v_lin, cache_seqlens, True)
    ref_lp = _ref_decode(q, k_lin, v_lin, cache_seqlens, True, upcast=False)
    check_against_ref(out, ref, ref_lp, msg=f"paged page={page_size}")


def test_paged_rejects_cache_batch_idx():
    """Reference contract: paged KV cache + cache_batch_idx raises
    (csrc/flash_attn/flash_api.cpp:1288)."""
    q = jnp.zeros((2, 1, 2, 64), jnp.bfloat16)
    kp = jnp.zeros((4, 2, 128, 64), jnp.bfloat16)
    with pytest.raises(ValueError, match="cache_batch_idx"):
        flash_attn_with_kvcache(
            q, kp, kp, cache_seqlens=jnp.array([5, 9], jnp.int32),
            block_table=jnp.array([[0, 1], [2, 3]], jnp.int32),
            cache_batch_idx=jnp.array([1, 0], jnp.int32), causal=True)


def test_kvcache_attention_chunk():
    """attention_chunk in the decode path (reference hopper
    flash_attn_with_kvcache:965): the query attends only within its
    chunk; matches the fp32 reference's chunked-causal mask."""
    b, h, d, s_max = 2, 4, 64, 256
    chunk = 64
    q = _mk(jax.random.PRNGKey(71), (b, 1, h, d))
    kc = _mk(jax.random.PRNGKey(72), (b, h, s_max, d))
    vc = _mk(jax.random.PRNGKey(73), (b, h, s_max, d))
    seqlens = jnp.array([200, 130], jnp.int32)  # mid-chunk positions
    out = flash_attn_with_kvcache(
        q, kc, vc, cache_seqlens=seqlens, causal=True,
        attention_chunk=chunk)
    k_lin = jnp.swapaxes(kc, 1, 2)
    v_lin = jnp.swapaxes(vc, 1, 2)
    ref = _ref_decode(q, k_lin, v_lin, seqlens, True,
                      attention_chunk=chunk)
    ref_lp = _ref_decode(q, k_lin, v_lin, seqlens, True,
                         attention_chunk=chunk, upcast=False)
    check_against_ref(out, ref, ref_lp, msg="kvcache chunk")


def test_kvcache_rotary_seqlens_override():
    """rotary_seqlens (reference hopper kvcache:957) overrides the rotary
    offsets of appended keys/queries: appending at cache position p with
    rotary_seqlens=r must equal manually rotating at r then appending."""
    from flash_attn_tpu.ops.rotary import apply_rotary_emb

    b, h, d, s_max = 2, 2, 64, 128
    q = _mk(jax.random.PRNGKey(91), (b, 1, h, d))
    kc = _mk(jax.random.PRNGKey(92), (b, h, s_max, d))
    vc = _mk(jax.random.PRNGKey(93), (b, h, s_max, d))
    k_new = _mk(jax.random.PRNGKey(94), (b, 1, h, d))
    v_new = _mk(jax.random.PRNGKey(95), (b, 1, h, d))
    seqlens = jnp.array([40, 70], jnp.int32)
    rot = jnp.array([3, 11], jnp.int32)  # != seqlens on purpose
    inv = 1.0 / (10000 ** (jnp.arange(0, d, 2) / d))
    t = jnp.arange(s_max)[:, None] * inv[None, :]
    cos, sin = jnp.cos(t), jnp.sin(t)

    out, kc2, vc2 = flash_attn_with_kvcache(
        q, kc, vc, k=k_new, v=v_new, rotary_cos=cos, rotary_sin=sin,
        cache_seqlens=seqlens, rotary_seqlens=rot, causal=True)

    q_rot = apply_rotary_emb(q, cos, sin, seqlen_offsets=rot)
    k_rot = apply_rotary_emb(k_new, cos, sin, seqlen_offsets=rot)
    out2, kc3, vc3 = flash_attn_with_kvcache(
        q_rot, kc, vc, k=k_rot, v=v_new, cache_seqlens=seqlens, causal=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(out2, np.float32),
                               atol=1e-2, rtol=1e-2)
    np.testing.assert_array_equal(np.asarray(kc2), np.asarray(kc3))


def test_kvcache_qv_softcap_crossing():
    """softcap x qv in decode: the cap applies to the full score."""
    b, h, d, dv, s_max = 1, 2, 64, 32, 128
    q = _mk(jax.random.PRNGKey(31), (b, 1, h, d)) * 3
    qv = _mk(jax.random.PRNGKey(32), (b, 1, h, dv)) * 3
    kc = _mk(jax.random.PRNGKey(33), (b, h, s_max, d)) * 3
    vc = _mk(jax.random.PRNGKey(34), (b, h, s_max, dv))
    seqlens = jnp.array([100], jnp.int32)
    out = flash_attn_with_kvcache(
        q, kc, vc, qv=qv, cache_seqlens=seqlens, causal=True, softcap=10.0)
    kmask = jnp.arange(s_max)[None, :] < seqlens[:, None]
    ref = attention_ref(
        q.astype(jnp.float32), jnp.swapaxes(kc, 1, 2).astype(jnp.float32),
        jnp.swapaxes(vc, 1, 2).astype(jnp.float32), None, kmask,
        qv=qv.astype(jnp.float32), causal=True, softcap=10.0,
        softmax_scale=1.0 / np.sqrt(d + dv))[0]
    ref_lp = attention_ref(
        q, jnp.swapaxes(kc, 1, 2), jnp.swapaxes(vc, 1, 2), None, kmask,
        qv=qv, causal=True, softcap=10.0,
        softmax_scale=1.0 / np.sqrt(d + dv), upcast=False,
        reorder_ops=True)[0]
    check_against_ref(out, ref, ref_lp, msg="kvcache qv softcap")
