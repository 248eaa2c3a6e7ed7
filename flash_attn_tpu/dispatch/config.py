"""Static kernel-config resolution (tile sizes, split heuristics).

TPU-native analogue of the reference's per-arch tile tables + heuristics
(csrc/flash_attn/flash_api.cpp:281 ``num_splits_heuristic``,
hopper/heuristics.h:26, flash_attn/cute/interface.py:142 ``_tile_size_fwd``).
On TPU there is no binary-size concern: every static config is JIT-specialized
by XLA, so this module is pure policy, no codegen.
"""

import dataclasses
import functools
from typing import Optional, Tuple

# v5e per-core numbers used for VMEM budgeting and speed-of-light accounting.
# Overridable via tpu_spec() for other generations.
DEFAULT_VMEM_BUDGET = 96 * 1024 * 1024  # leave headroom below the 128MiB cap

# Mosaic's scoped-VMEM (kernel stack) budget. Large score tiles put
# block_q x block_k fp32 temporaries on the stack; past the default 16 MiB
# limit the kernel must raise CompilerParams.vmem_limit_bytes instead of
# shrinking tiles (measured on v5e: (2048,1024) stacks 16.64M, (2048,2048)
# 24.35M — r2_session.log scoped-OOM sizes).
SCOPED_VMEM_DEFAULT = 16 * 1024 * 1024
SCOPED_VMEM_CAP = 112 * 1024 * 1024  # stay below the ~128 MiB physical VMEM


def scoped_vmem_limit(rows: int, cols: int, n_f32_temps: int = 1):
    """``vmem_limit_bytes`` for ``pltpu.CompilerParams`` given the dominant
    fp32 temporaries of shape (rows, cols) on the kernel stack.

    Returns None while the temporaries fit the default limit alongside the
    ~8 MiB of double-buffered pipeline blocks (keeping the compiler's
    default behavior on the tuned hot configs), else a raised limit with 2x
    headroom capped below physical VMEM. Configs for which even the raised
    cap is insufficient must be rejected by the caller (scoped_vmem_ok).
    """
    temps = n_f32_temps * rows * cols * 4
    if temps <= SCOPED_VMEM_DEFAULT // 2:
        return None
    return min(SCOPED_VMEM_CAP, 2 * temps + SCOPED_VMEM_DEFAULT)


def scoped_vmem_ok(rows: int, cols: int, n_f32_temps: int = 1) -> bool:
    """True when (rows, cols) fp32 stack temporaries fit under the raised
    scoped-VMEM cap — the eligibility-side mirror of scoped_vmem_limit."""
    return n_f32_temps * rows * cols * 4 + SCOPED_VMEM_DEFAULT <= SCOPED_VMEM_CAP


@dataclasses.dataclass(frozen=True)
class FwdConfig:
    block_q: int
    block_k: int


@dataclasses.dataclass(frozen=True)
class BwdConfig:
    block_q: int  # q-tile in both dkdv and dq kernels
    block_k: int


def _round_block(seqlen: int, target: int, minimum: int) -> int:
    """Largest power-of-two block <= target that is still <= padded seqlen."""
    blk = target
    while blk > minimum and blk > seqlen:
        blk //= 2
    return max(blk, minimum)


@functools.lru_cache(maxsize=None)
def get_fwd_config(
    head_dim: int,
    head_dim_v: int,
    seqlen_q: int,
    seqlen_k: int,
    causal: bool,
    dtype_bits: int = 16,
) -> FwdConfig:
    """Tile sizes for the forward mainloop.

    Values measured on v5e via benchmarks/autotune_fwd.py (seq 8k, bf16):
      d=128 non-causal (1024, 2048) -> 125 TF/s; causal (1024, 1024) -> 85
      d=64  non-causal (1024, 2048) -> 58;     causal (1024, 1024) -> 39
    Bigger Bq amortizes K/V reloads; bigger Bk amortizes the per-block
    rescale. VMEM per step ~ q + k + v + acc + 2x-buffered pipeline copies.
    """
    if head_dim <= 128:
        bq, bk = (1024, 1024) if causal else (1024, 2048)
    else:  # 192/256
        bq, bk = 512, 1024
    bq = _round_block(seqlen_q, bq, 128)
    bk = _round_block(seqlen_k, bk, 128)
    return FwdConfig(block_q=bq, block_k=bk)


@functools.lru_cache(maxsize=None)
def get_bwd_config(
    head_dim: int,
    head_dim_v: int,
    seqlen_q: int,
    seqlen_k: int,
    causal: bool,
    dtype_bits: int = 16,
) -> BwdConfig:
    # Measured on v5e for the FUSED single-pass backward (round-2 sweep,
    # seq4k causal d128): (512,512) -> 102.1 TF/s-equiv, (1024,1024) 99.4,
    # (1024,512) 99.6, (512,1024) 96.6, (256,512) 89.0. The round-1
    # two-kernel numbers preferred (1024,512); the fused kernel's resident
    # full-KV accumulators favor the smaller square tile.
    bq, bk = 512, 512
    return BwdConfig(
        block_q=_round_block(seqlen_q, bq, 128),
        block_k=_round_block(seqlen_k, bk, 128),
    )


def normalize_window(
    window_size: Tuple[Optional[int], Optional[int]],
) -> Tuple[Optional[int], Optional[int]]:
    """Accept both the FA2 (-1 = unlimited) and FA4 (None = unlimited)
    window conventions (flash_attn/flash_attn_interface.py window_size=(-1,-1)
    vs flash_attn/cute/interface.py window_size=(None, None))."""
    left, right = window_size
    if left is not None and left < 0:
        left = None
    if right is not None and right < 0:
        right = None
    return (left, right)


def num_splits_heuristic(
    total_mblocks: int,
    num_cores: int,
    num_kv_blocks: int,
    max_splits: int = 8,
) -> int:
    """How many KV splits for decode so all TPU cores have work.

    Reference analogue: csrc/flash_attn/flash_api.cpp:281 /
    hopper/heuristics.h:26 (there: fill SMs; here: fill TensorCores, which are
    few, so the heuristic saturates quickly).
    """
    if total_mblocks >= 0.8 * num_cores:
        return 1
    max_useful = max(1, min(max_splits, num_kv_blocks, num_cores))
    best, best_eff = 1, 0.0
    for s in range(1, max_useful + 1):
        n_waves = (total_mblocks * s) / num_cores
        eff = n_waves / float(int(n_waves) + 1) if n_waves < 1 else 1.0
        if eff > best_eff * 1.05:
            best, best_eff = s, eff
    return best
