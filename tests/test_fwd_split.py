"""Split-edge causal forward (kernels/flash_fwd_split.py) vs the standard
causal kernel and the golden fp32 reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attn_tpu.kernels.flash_fwd import flash_attention_fwd
from flash_attn_tpu.kernels.flash_fwd_split import (
    flash_attention_fwd_split,
    split_bands,
)
from flash_attn_tpu.utils.testing import attention_ref, check_against_ref


def _qkv(key, b, h, h_k, sq, sk, d, dv=None, dtype=jnp.bfloat16):
    dv = dv or d
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, sq, d), jnp.float32).astype(dtype)
    k = jax.random.normal(kk, (b, h_k, sk, d), jnp.float32).astype(dtype)
    v = jax.random.normal(kv, (b, h_k, sk, dv), jnp.float32).astype(dtype)
    return q, k, v


def test_split_bands_disjoint_cover():
    """bulk + edge tile sets exactly partition the causal band."""
    for nq, nk, bq, bk, shift in [
        (8, 8, 128, 128, 0),
        (4, 8, 256, 128, 0),
        (8, 4, 128, 256, 0),
        (8, 16, 128, 128, 1024),  # sk > sq
    ]:
        bulk, edge, n_empty = split_bands(nq, nk, bq, bk, shift)
        from flash_attn_tpu.dispatch.band import kv_band_static
        jmin, jmax = kv_band_static(nq, nk, bq, bk, shift,
                                    True, None, None, 0, 0)
        for i in range(nq):
            b_tiles = set(range(bulk[0][i], bulk[1][i] + 1))
            e_tiles = set(range(edge[0][i], edge[1][i] + 1))
            want = set(range(jmin[i], jmax[i] + 1))
            assert b_tiles | e_tiles == want, (i, b_tiles, e_tiles, want)
            assert not (b_tiles & e_tiles), (i, b_tiles, e_tiles)
            # every bulk tile fully below the block's min row
            for j in b_tiles:
                assert (j + 1) * bk - 1 <= i * bq + shift, (i, j)
        assert n_empty == sum(1 for i in range(nq) if bulk[1][i] < 0)


@pytest.mark.parametrize("sq,sk", [(512, 512), (1024, 1024), (512, 1024)])
@pytest.mark.parametrize("bq,bk", [(128, 128), (256, 128), (128, 256)])
def test_split_matches_standard(sq, sk, bq, bk):
    key = jax.random.PRNGKey(hash((sq, sk, bq, bk)) % 2**31)
    q, k, v = _qkv(key, 1, 4, 2, sq, sk, 64)
    out_s, lse_s = flash_attention_fwd_split(
        q, k, v, block_q=bq, block_k=bk, interpret=True)
    out_r, lse_r = flash_attention_fwd(
        q, k, v, causal=True, block_q=bq, block_k=bk, interpret=True)
    # Same kernels, different accumulation split: bf16-level agreement.
    np.testing.assert_allclose(
        np.asarray(out_s, np.float32), np.asarray(out_r, np.float32),
        atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(lse_s), np.asarray(lse_r),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("ebq,ebk", [(128, 128), (128, 64), (64, 64)])
def test_split_edge_retiled(ebq, ebk):
    """Smaller edge tiles (less diagonal waste) still exact."""
    sq = sk = 512
    q, k, v = _qkv(jax.random.PRNGKey(3), 1, 2, 2, sq, sk, 64)
    out_s, lse_s = flash_attention_fwd_split(
        q, k, v, block_q=128, block_k=128, edge_block_q=ebq,
        edge_block_k=ebk, interpret=True)
    out_r, lse_r = flash_attention_fwd(
        q, k, v, causal=True, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_s, np.float32), np.asarray(out_r, np.float32),
        atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(lse_s), np.asarray(lse_r),
                               atol=1e-4, rtol=1e-4)


def test_split_against_golden():
    """2x numerics contract against the fp32 reference (bshd layout)."""
    sq = sk = 512
    q, k, v = _qkv(jax.random.PRNGKey(11), 2, 4, 4, sq, sk, 128)
    out, _ = flash_attention_fwd_split(q, k, v, block_q=128, block_k=128,
                                       interpret=True)
    tr = lambda x: jnp.swapaxes(x, 1, 2)  # testing refs take (b, s, h, d)
    ref, _ = attention_ref(tr(q), tr(k), tr(v), causal=True)
    ref_lp, _ = attention_ref(tr(q), tr(k), tr(v), causal=True,
                              upcast=False, reorder_ops=True)
    check_against_ref(tr(out), ref, ref_lp, msg="split-edge causal fwd")


@pytest.mark.parametrize("h_k,d,dv", [(1, 128, 128), (2, 128, 256),
                                      (4, 256, 128)])
def test_split_gqa_dv_crossings(h_k, d, dv):
    """MQA/GQA and dv != d through both split passes and the diag merge."""
    sq = sk = 512
    key = jax.random.PRNGKey(hash((h_k, d, dv)) % 2**31)
    q, k, v = _qkv(key, 1, 4, h_k, sq, sk, d, dv=dv)
    out_s, lse_s = flash_attention_fwd_split(
        q, k, v, block_q=128, block_k=128, interpret=True)
    out_r, lse_r = flash_attention_fwd(
        q, k, v, causal=True, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_s, np.float32), np.asarray(out_r, np.float32),
        atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(lse_s), np.asarray(lse_r),
                               atol=1e-4, rtol=1e-4)


def test_split_fallback_partial_blocks():
    """Non-divisible seqlens route to the standard kernel (still correct)."""
    q, k, v = _qkv(jax.random.PRNGKey(5), 1, 2, 2, 384, 384, 64)
    out_s, lse_s = flash_attention_fwd_split(
        q, k, v, block_q=256, block_k=256, interpret=True)
    out_r, lse_r = flash_attention_fwd(
        q, k, v, causal=True, block_q=256, block_k=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(out_s), np.asarray(out_r))
