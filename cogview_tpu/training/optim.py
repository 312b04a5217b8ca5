"""Optimizer + LR schedule: optax rebuild of the reference stack.

* ``annealing_lr`` replays AnnealingLR (learning_rates.py:21-62) exactly:
  linear warmup ``lr * t / warmup``, then per-style decay — 'linear'
  ``lr * (N - (t - warmup)) / N``, 'cosine' with a ``decay_ratio`` floor
  (the reference stores 1/ratio and interpolates the half-cosine between
  lr and lr*ratio), 'constant'/'exponential' flat (exponential was a stub
  upstream too).
* ``make_optimizer`` replaces apex FusedAdam + FP16_Optimizer + DeepSpeed
  ZeRO-1: AdamW with the reference's weight-decay mask (no decay for
  layernorm params and biases, gpt2_modeling.py:35-52), global-norm grad
  clipping over the *whole* param pytree (the pjit analog of
  mpu.clip_grad_norm's MP-aware reduction — under sharding the norm
  reduction is inserted by XLA).  ZeRO-1 is not an engine here: optimizer
  state simply inherits the params' shardings (see parallel/sharding.py)
  or can be sharded over 'data' for replicated params.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def annealing_lr(
    start_lr: float,
    warmup_iter: int,
    num_iters: int,
    decay_style: Optional[str] = "cosine",
    decay_ratio: float = 0.5,
):
    """-> optax schedule fn(step) with the reference's exact breakpoints."""
    style = decay_style.lower() if isinstance(decay_style, str) else None
    inv_ratio = 1.0 / decay_ratio  # the reference stores the inverse

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        warm = start_lr * t / max(warmup_iter, 1)

        if style == "linear":
            after = start_lr * ((num_iters - (t - warmup_iter)) / num_iters)
        elif style == "cosine":
            ratio = jnp.minimum(1.0, (t - warmup_iter) / num_iters)
            after = (
                start_lr
                / inv_ratio
                * ((jnp.cos(jnp.pi * ratio) + 1.0) * (inv_ratio - 1.0) / 2.0 + 1.0)
            )
        else:  # constant / exponential(stub) / None
            after = jnp.asarray(start_lr, jnp.float32)

        if warmup_iter > 0:
            return jnp.where(t <= warmup_iter, warm, after)
        return after

    return schedule


def weight_decay_mask(params: Dict[str, Any]) -> Dict[str, Any]:
    """True = decayed.  Mirrors gpt2_get_params_for_weight_decay_optimization:
    layernorm tensors (any path containing 'ln_') and biases ('b' leaves of
    w/b pairs) are excluded; embeddings and matrices decay."""

    def mask_fn(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        if any(str(k).startswith("ln_") for k in keys):
            return False
        if str(keys[-1]) == "b":  # bias leaf of a {w,b} linear
            return False
        return True

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(
    params,
    *,
    lr: float = 4e-4,
    warmup_iter: int = 2000,
    num_iters: int = 100000,
    decay_style: str = "cosine",
    decay_ratio: float = 0.5,
    weight_decay: float = 1e-2,
    betas=(0.9, 0.95),
    eps: float = 1e-8,
    grad_clip: float = 1.0,
):
    """-> (optax.GradientTransformation, schedule fn)."""
    schedule = annealing_lr(lr, warmup_iter, num_iters, decay_style, decay_ratio)
    mask = weight_decay_mask(params)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip) if grad_clip else optax.identity(),
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps),
        optax.add_decayed_weights(weight_decay, mask=lambda p: mask),
        optax.scale_by_schedule(lambda step: -schedule(step)),
    )
    return tx, schedule
