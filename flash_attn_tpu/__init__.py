"""flash_attn_tpu: TPU-native flash-attention framework (JAX/Pallas).

Public API surface mirrors the reference flash-attention package
(flash_attn/__init__.py:8-16) — see README.md and SURVEY.md.
"""

__version__ = "0.1.0"

from flash_attn_tpu.interface import (
    flash_attn_func,
    flash_attn_kvpacked_func,
    flash_attn_qkvpacked_func,
)

__all__ = [
    "flash_attn_func",
    "flash_attn_qkvpacked_func",
    "flash_attn_kvpacked_func",
]
