"""Mesh construction helpers.

The reference's comm backend is NCCL process groups
(flash_attn/utils/distributed.py) + apex parallel_state; the TPU-native
replacement is one jax.sharding.Mesh spanning all hosts with named axes:

  data    — batch (DCN-friendly, maps across hosts)
  model   — tensor parallel (heads / mlp / vocab), rides ICI
  seq     — context/ring parallel (long context), rides ICI

XLA lowers collectives onto ICI/DCN per the mesh's physical layout.
"""

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

__all__ = ["make_mesh", "DATA_AXIS", "MODEL_AXIS", "SEQ_AXIS"]

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def make_mesh(
    data: int = 1,
    model: int = 1,
    seq: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = data * model * seq
    assert n <= len(devices), (n, len(devices))
    shape = (data, model, seq)
    try:
        arr = mesh_utils.create_device_mesh(shape, devices=devices[:n])
    except Exception:
        arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))
