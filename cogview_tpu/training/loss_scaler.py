"""Dynamic loss scaling — the fp16 compatibility shim.

On TPU the framework trains in bf16 (same exponent range as fp32), so no
loss scaling is needed and the default train step simply skips non-finite
updates.  For fp16 experiments this reproduces the reference
DynamicLossScaler (fp16/loss_scaler.py:63-183): scale doubles after
``scale_window`` consecutive good steps, halves on overflow with
``hysteresis``/``min_scale`` guards.  Functional: state in, state out.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LossScaleState(NamedTuple):
    scale: jax.Array  # f32 scalar
    good_steps: jax.Array  # i32 consecutive overflow-free steps
    hysteresis_left: jax.Array  # i32


def init_loss_scale(
    init_scale: float = 2.0 ** 32, hysteresis: int = 2
) -> LossScaleState:
    return LossScaleState(
        jnp.float32(init_scale), jnp.int32(0), jnp.int32(hysteresis)
    )


def scale_loss(loss: jax.Array, state: LossScaleState) -> jax.Array:
    return loss * state.scale


def unscale_grads(grads, state: LossScaleState):
    inv = 1.0 / state.scale
    return jax.tree.map(lambda g: g * inv, grads)


def update_loss_scale(
    state: LossScaleState,
    overflow: jax.Array,  # bool: any non-finite grad this step
    scale_factor: float = 2.0,
    scale_window: int = 1000,
    min_scale: float = 1.0,
    hysteresis: int = 2,
) -> Tuple[LossScaleState, jax.Array]:
    """-> (new_state, apply_update: bool).  Mirrors DynamicLossScaler:
    on overflow consume hysteresis then halve the scale (floored at
    min_scale) and reset the good-step counter; after scale_window good
    steps, double the scale."""
    hy = jnp.where(overflow, state.hysteresis_left - 1, state.hysteresis_left)
    lower = overflow & (hy <= 0)
    new_scale = jnp.where(
        lower, jnp.maximum(state.scale / scale_factor, min_scale), state.scale
    )
    good = jnp.where(overflow, 0, state.good_steps + 1)
    grow = (~overflow) & (good >= scale_window)
    new_scale = jnp.where(grow, new_scale * scale_factor, new_scale)
    good = jnp.where(grow, 0, good)
    hy = jnp.where(overflow & (hy <= 0), hysteresis, hy)
    hy = jnp.where(~overflow, hysteresis, hy)
    return LossScaleState(new_scale, good, hy), ~overflow
