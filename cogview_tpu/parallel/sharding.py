"""Sharding rules: what the reference's mpu/ becomes on TPU.

Megatron-style tensor parallelism (mpu/layers.py) is pure metadata here:

  VocabParallelEmbedding      -> word embedding sharded P('model', None)
  ColumnParallelLinear (qkv)  -> [L,H,3,H] sharded on the last (head) dim
  RowParallelLinear (out/mlp2)-> sharded on the input (contraction) dim;
                                 pjit inserts the psum the reference coded
                                 at mpu/mappings.py:91
  copy/scatter/gather regions -> implicit at sharding boundaries

Everything 1-D (layernorms, biases of row-parallel layers) is replicated.
Head-sharding works because the fused qkv last dim is (heads, head_dim)
flattened with heads contiguous — slicing it across 'model' slices whole
heads, the same contract as the reference's strided ColumnParallelLinear
(mpu/layers.py:185-249 with stride=3).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def gpt_param_specs(cfg=None, fsdp_axis: "str | None" = None,
                    pp_axis: "str | None" = None) -> Dict[str, Any]:
    """PartitionSpec pytree matching models.gpt.init_params layout.

    ``fsdp_axis`` (usually 'data') additionally shards every weight
    matrix's non-TP dim over that axis — ZeRO-3/FSDP as pure metadata:
    XLA all-gathers each layer's weights at use (inside the layer scan,
    so only one layer is ever resident unsharded) and reduce-scatters its
    gradients; optimizer state inherits the same sharding, so param +
    grad + Adam HBM drops by the axis size.  The reference's DeepSpeed
    ZeRO stage-1 config (scripts/ds_config_zero.json) covered optimizer
    state only; this is the full stage-3 equivalent.  Composes with TP
    ('model' on the other dim).

    ``pp_axis`` shards every per-layer leaf's leading L dim over that
    axis — the stage decomposition for pipeline parallelism
    (parallel/pipeline.py; set cfg.pp_axis to match)."""
    M = MODEL_AXIS
    F = fsdp_axis
    ln = {"g": P(None, None), "b": P(None, None)}
    if pp_axis is not None:
        ln = {"g": P(pp_axis, None), "b": P(pp_axis, None)}
    return {
        "embed": {
            "word": P(M, F),  # vocab-parallel (mpu/layers.py:77-133)
            "pos": P(None, F),
        },
        "layers": {
            "ln_in": dict(ln),
            "qkv": {"w": P(pp_axis, F, None, M), "b": P(pp_axis, None, M)},
            "attn_out": {"w": P(pp_axis, M, F), "b": P(pp_axis, None)},
            "ln_attn": dict(ln),
            "ln_post": dict(ln),
            "mlp_in": {"w": P(pp_axis, F, M), "b": P(pp_axis, M)},
            "mlp_out": {"w": P(pp_axis, M, F), "b": P(pp_axis, None)},
            "ln_mlp": dict(ln),
        },
        "ln_final": {"g": P(None), "b": P(None)},
    }


def batch_spec() -> P:
    """Activations/batches shard over 'data' only."""
    return P(DATA_AXIS)


def cache_spec() -> Any:
    """KV cache [L, B, H, T]: batch over 'data', hidden (= heads-major)
    over 'model' — slicing H across 'model' slices whole heads."""
    from ..models.gpt import KVCache

    return KVCache(
        P(None, DATA_AXIS, MODEL_AXIS, None),
        P(None, DATA_AXIS, MODEL_AXIS, None),
    )


def shard_params(params, mesh: Mesh, specs=None):
    """Device_put params with NamedShardings (host -> mesh)."""
    specs = specs if specs is not None else gpt_param_specs()
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
