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
PIPE_AXIS = "pipe"


def create_mesh(
    model_parallel: int = 1,
    data_parallel: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
    seq_parallel: int = 1,
    pipe_parallel: int = 1,
) -> Mesh:
    """('data', 'model') mesh, optionally extended with a 'pipe' and/or
    'seq' axis — full order ('data', 'pipe', 'seq', 'model'), axes of
    size 1 omitted.  'seq' (ring-attention context parallelism,
    ops/ring_attention.py) sits next to 'model' so its per-layer ppermute
    K/V rotations ride ICI; 'pipe' (GPipe stages, parallel/pipeline.py)
    sits outermost of the two — it moves one activation per tick, the
    cheapest traffic, so it can absorb the slowest links."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    par = model_parallel * seq_parallel * pipe_parallel
    if data_parallel is None:
        assert n % par == 0, (n, model_parallel, seq_parallel, pipe_parallel)
        data_parallel = n // par
    assert data_parallel * par <= n
    devices = devices[: data_parallel * par]
    # 'model' innermost: adjacent devices form a TP group (ICI-contiguous).
    dims = [(DATA_AXIS, data_parallel), (PIPE_AXIS, pipe_parallel),
            (SEQ_AXIS, seq_parallel), (MODEL_AXIS, model_parallel)]
    dims = [(a, s) for a, s in dims
            if s > 1 or a in (DATA_AXIS, MODEL_AXIS)]
    arr = np.asarray(devices).reshape([s for _, s in dims])
    return Mesh(arr, tuple(a for a, _ in dims))
