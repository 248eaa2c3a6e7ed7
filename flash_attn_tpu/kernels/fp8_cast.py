"""Fast fp8(e4m3) -> bf16 conversion for kernels on TPUs without a native
fp8 datapath (v5e and earlier).

The stock ``astype`` lowering on v5e is software-emulated and measured
4.4x SLOWER than reading a bf16 cache outright (DESIGN.md round-3
platform rule). But e4m3 -> bf16 is mechanically a bit relocation:

    e4m3:  s eeee mmm          (bias 7)
    bf16:  s eeeeeeee mmmmmmm  (bias 127)

For normal numbers, bf16_bits = sign<<8 | ((E*8+M) << 4) + (120 << 7) —
the 7 payload bits shift left 4 and the exponent re-bias (127-7) adds in
one go (no carry: M<<4 < 2^7). Denormals (E=0) decode as M * 2^-9, which
IS a normal bf16, handled by a second select. e4m3 NaN (0x7F/0xFF) maps
to a large finite value — attention masks remove garbage lanes before
use, and real NaN cache entries are corruption either way.

Exactness: bitwise-equal to ``astype(jnp.bfloat16)`` for every finite
e4m3 value incl. +-0 and denormals (tests/test_fp8.py).
"""

import jax
import jax.numpy as jnp

__all__ = ["fp8e4m3_to_bf16"]


def fp8e4m3_to_bf16(x):
    """Vectorized integer-op e4m3 -> bf16 (see module docstring).

    All bit math runs in the i32/f32 domain: Mosaic has no i16 vector
    shifts and no uint16<->bf16 converts; i32 shifts and the final
    f32 -> bf16 convert are native (and exact here — at most 3 live
    mantissa bits)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
    sign = (u >> 7) & 1
    payload = u & 0x7F
    exp = payload >> 3
    man = payload & 0x7
    # normal: f32 bits = s | (E - 7 + 127) << 23 | M << 20
    norm_bits = (sign << 31) | ((exp + 120) << 23) | (man << 20)
    norm = jax.lax.bitcast_convert_type(norm_bits, jnp.float32)
    # denormal (E == 0): value = +- man * 2^-9
    den = man.astype(jnp.float32) * (2.0 ** -9)
    den = jnp.where(sign == 1, -den, den)
    out = jnp.where(exp == 0, den, norm)
    return out.astype(jnp.bfloat16)
