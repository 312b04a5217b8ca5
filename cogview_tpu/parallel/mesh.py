"""Device mesh construction.

The whole distributed design is a 2-D ``Mesh(('data', 'model'))``: the
reference's mpu process groups (mpu/initialize.py:30-78 — DP groups with
stride mp, MP groups contiguous) map onto it with 'model' innermost so
tensor-parallel collectives ride adjacent-chip ICI links and 'data' can
span DCN, matching the reference's adjacent-ranks-per-box assumption
(SURVEY.md §5.8).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def create_mesh(
    model_parallel: int = 1,
    data_parallel: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    seq_parallel: int = 1,
) -> Mesh:
    """('data', 'model') mesh; ``seq_parallel > 1`` inserts a 'seq' axis
    between them — ('data', 'seq', 'model') — for ring-attention context
    parallelism (ops/ring_attention.py).  'seq' sits inside 'data' so its
    per-layer ppermute K/V rotations ride ICI, like 'model'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_parallel is None:
        assert n % (model_parallel * seq_parallel) == 0, (
            n, model_parallel, seq_parallel)
        data_parallel = n // (model_parallel * seq_parallel)
    assert data_parallel * model_parallel * seq_parallel <= n
    devices = devices[: data_parallel * model_parallel * seq_parallel]
    # 'model' innermost: adjacent devices form a TP group (ICI-contiguous).
    if seq_parallel > 1:
        arr = np.asarray(devices).reshape(
            data_parallel, seq_parallel, model_parallel)
        return Mesh(arr, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))
    arr = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
