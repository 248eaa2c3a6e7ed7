"""Public-API back-compat pinning (the reference keeps an equivalent
suite: hopper/test_flash_attn.py:1254 API back-compat). Guards signature
drift: every reference-parity entry point must exist with its
reference-named parameters."""

import inspect

import flash_attn_tpu


def _params(fn):
    return set(inspect.signature(fn).parameters)


def test_flash_attn_func_signature():
    p = _params(flash_attn_tpu.flash_attn_func)
    for name in ["q", "k", "v", "dropout_p", "softmax_scale", "causal",
                 "window_size", "softcap", "alibi_slopes", "deterministic",
                 "return_attn_probs", "qv", "q_descale", "k_descale",
                 "v_descale", "score_mod", "mask_mod", "aux_tensors",
                 "attention_chunk", "learnable_sink"]:
        assert name in p, name


def test_varlen_func_signature():
    p = _params(flash_attn_tpu.flash_attn_varlen_func)
    for name in ["q", "k", "v", "cu_seqlens_q", "cu_seqlens_k",
                 "max_seqlen_q", "max_seqlen_k", "dropout_p", "causal",
                 "window_size", "softcap", "alibi_slopes", "seqused_q",
                 "seqused_k", "block_table", "scheduler_metadata"]:
        assert name in p, name


def test_kvcache_signature():
    p = _params(flash_attn_tpu.flash_attn_with_kvcache)
    for name in ["q", "k_cache", "v_cache", "k", "v", "qv", "rotary_cos",
                 "rotary_sin", "cache_seqlens", "cache_batch_idx",
                 "cache_leftpad", "block_table", "softmax_scale", "causal",
                 "window_size", "softcap", "attention_chunk",
                 "rotary_interleaved",
                 "alibi_slopes", "num_splits", "return_softmax_lse",
                 "q_descale", "k_descale", "v_descale"]:
        assert name in p, name


def test_exports():
    for name in ["flash_attn_func", "flash_attn_qkvpacked_func",
                 "flash_attn_kvpacked_func", "flash_attn_varlen_func",
                 "flash_attn_varlen_qkvpacked_func",
                 "flash_attn_varlen_kvpacked_func",
                 "flash_attn_sparse_mla_func", "flash_attn_with_kvcache",
                 "flash_attn_combine", "kv_cache_update",
                 "get_scheduler_metadata"]:
        assert hasattr(flash_attn_tpu, name), name
        assert name in flash_attn_tpu.__all__, name


def test_sparse_mla_signature():
    p = _params(flash_attn_tpu.flash_attn_sparse_mla_func)
    for name in ["q", "k", "v", "gather_kv_indices", "qv", "softmax_scale",
                 "causal", "return_attn_probs"]:
        assert name in p, name
