"""SPMD training step and loop.

The reference's train_step (pretrain_gpt2.py:406-448) with its NaN-skip
guard and DeepSpeed fp16 engine becomes: one jitted function computing
value+grad of the masked LM loss in bf16-compute/fp32-params, applying the
optax update only when every gradient is finite (the bf16-on-TPU analog of
DynamicLossScaler's skip path — no loss scaling is needed in bf16, but the
skip semantics and the skipped-iteration counter are preserved).

Parallelism: the step is shape-polymorphic over the mesh — batch sharded
over 'data', params over 'model' per parallel/sharding.py; gradient
averaging over 'data' is the automatic psum XLA inserts for the replicated
params' gradients.  ZeRO-1-style optimizer-state sharding falls out of
giving the opt state the same shardings as the params.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..config import GPTConfig
from .losses import lm_loss, lm_loss_with_mems
from .loss_scaler import (LossScaleState, init_loss_scale, unscale_grads,
                          update_loss_scale)
from ..utils.rng import rbg_key

TrainState = Dict[str, Any]  # {'params', 'opt_state', 'step', 'skipped'[, 'loss_scale']}


def init_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return {
        "params": params,
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
        "skipped": jnp.zeros((), jnp.int32),
    }


def make_train_step(
    cfg: GPTConfig,
    tx: optax.GradientTransformation,
    *,
    img_vocab: int = 8192,
    txt_loss_scale: float = 1.0,
    remat: bool = True,
    donate: bool = True,
    is_sparse: bool = False,
    dual_positions_roi2=None,
    max_memory_length: int = 0,
):
    """-> jitted train_step(state, batch, rng) -> (state, metrics).

    ``max_memory_length > 0`` switches the loss to the transformer-XL mems
    path (reference --max-memory-length, arguments.py:268): the step then
    takes and returns the rolling memory —
    ``train_step(state, batch, rng, mems) -> (state, metrics, new_mems)``
    with ``mems=None`` on the first call.  The memory grows to its cap
    over the first ceil(cap/S) steps (each distinct length compiles once,
    exactly as many shapes as the reference's dynamic python loop visits).
    Mems advance even on a NaN-skipped step (the reference returns them
    from forward_step before the skip decision, pretrain_gpt2.py:412-417).
    """
    assert not (is_sparse and max_memory_length), \
        "sparse training attention has no mems path (reference trains sparse with --max-memory-length 0)"

    def loss_fn(params, batch, rng):
        return lm_loss(
            params, cfg, batch,
            img_vocab=img_vocab, txt_loss_scale=txt_loss_scale,
            rng=rng, train=True, remat=remat, is_sparse=is_sparse,
            dual_positions_roi2=dual_positions_roi2,
        )

    def mems_loss_fn(params, batch, rng, mems):
        return lm_loss_with_mems(
            params, cfg, batch, mems, max_memory_length=max_memory_length,
            img_vocab=img_vocab, txt_loss_scale=txt_loss_scale,
            rng=rng, train=True, remat=remat,
            dual_positions_roi2=dual_positions_roi2,
        )

    def _apply(state, loss, metrics, grads):
        gnorm = optax.global_norm(grads)
        finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)

        updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)

        def sel(new, old):
            return jax.tree.map(lambda n, o: jnp.where(finite, n, o), new, old)

        state = {
            "params": sel(new_params, state["params"]),
            "opt_state": sel(new_opt, state["opt_state"]),
            "step": state["step"] + finite.astype(jnp.int32),
            "skipped": state["skipped"] + (~finite).astype(jnp.int32),
        }
        metrics = dict(metrics, grad_norm=gnorm, skipped=(~finite).astype(jnp.int32))
        return state, metrics

    def step_fn(state: TrainState, batch, rng):
        rng = rbg_key(rng)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch, rng
        )
        return _apply(state, loss, metrics, grads)

    def mems_step_fn(state: TrainState, batch, rng, mems):
        rng = rbg_key(rng)
        (loss, (metrics, new_mems)), grads = jax.value_and_grad(
            mems_loss_fn, has_aux=True)(state["params"], batch, rng, mems)
        state, metrics = _apply(state, loss, metrics, grads)
        return state, metrics, new_mems

    if max_memory_length > 0:
        return jax.jit(mems_step_fn, donate_argnums=(0,) if donate else ())
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def init_fp16_train_state(
    params, tx: optax.GradientTransformation,
    init_scale: float = 2.0 ** 32, hysteresis: int = 2,
) -> TrainState:
    state = init_train_state(params, tx)
    state["loss_scale"] = init_loss_scale(init_scale, hysteresis)
    return state


def make_fp16_train_step(
    cfg: GPTConfig,
    tx: optax.GradientTransformation,
    *,
    img_vocab: int = 8192,
    txt_loss_scale: float = 1.0,
    remat: bool = True,
    donate: bool = True,
    is_sparse: bool = False,
    dual_positions_roi2=None,
    max_memory_length: int = 0,
    scale_factor: float = 2.0,
    scale_window: int = 1000,
    min_scale: float = 1.0,
    hysteresis: int = 2,
):
    """fp16-compute training step with dynamic loss scaling — the end-to-end
    analog of the reference FP16_Optimizer engine (fp16/fp16.py:74-554):
    params stay fp32 ("master weights" are just the params under functional
    state), the model computes in float16, the loss is scaled before the
    backward pass, gradients are unscaled in fp32, and an overflow skips
    the update and drives DynamicLossScaler's scale_window/hysteresis
    state machine.  Overflow detection via a global isfinite reduction is
    already MP/DP-global under pjit (the sharded analog of the MP-group
    all-reduce at fp16/loss_scaler.py:114-123).

    State must come from ``init_fp16_train_state`` (adds 'loss_scale').
    -> jitted train_step(state, batch, rng) -> (state, metrics), or with
    ``max_memory_length > 0`` the mems-threading signature documented on
    ``make_train_step``.
    """
    assert not (is_sparse and max_memory_length), \
        "sparse training attention has no mems path"
    cfg = cfg.replace(compute_dtype=jnp.float16)

    def loss_fn(params, batch, rng, scale, mems=None):
        if max_memory_length > 0:
            loss, (metrics, new_mems) = lm_loss_with_mems(
                params, cfg, batch, mems,
                max_memory_length=max_memory_length,
                img_vocab=img_vocab, txt_loss_scale=txt_loss_scale,
                rng=rng, train=True, remat=remat,
                dual_positions_roi2=dual_positions_roi2,
            )
            return loss * scale, (loss, metrics, new_mems)
        loss, metrics = lm_loss(
            params, cfg, batch,
            img_vocab=img_vocab, txt_loss_scale=txt_loss_scale,
            rng=rng, train=True, remat=remat, is_sparse=is_sparse,
            dual_positions_roi2=dual_positions_roi2,
        )
        return loss * scale, (loss, metrics, None)

    def step_fn(state: TrainState, batch, rng, mems=None):
        rng = rbg_key(rng)
        ls: LossScaleState = state["loss_scale"]
        grads, (loss, metrics, new_mems) = jax.grad(loss_fn, has_aux=True)(
            state["params"], batch, rng, ls.scale, mems
        )
        grads = unscale_grads(grads, ls)
        gnorm = optax.global_norm(grads)
        overflow = ~(jnp.isfinite(loss) & jnp.isfinite(gnorm))
        new_ls, apply_update = update_loss_scale(
            ls, overflow, scale_factor=scale_factor, scale_window=scale_window,
            min_scale=min_scale, hysteresis=hysteresis,
        )

        # non-finite grads would poison the optimizer state; zero them so the
        # update math stays finite, then select old state on overflow anyway
        safe_grads = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), grads
        )
        updates, new_opt = tx.update(safe_grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)

        def sel(new, old):
            return jax.tree.map(lambda n, o: jnp.where(apply_update, n, o), new, old)

        state = {
            "params": sel(new_params, state["params"]),
            "opt_state": sel(new_opt, state["opt_state"]),
            "step": state["step"] + apply_update.astype(jnp.int32),
            "skipped": state["skipped"] + overflow.astype(jnp.int32),
            "loss_scale": new_ls,
        }
        metrics = dict(metrics, grad_norm=gnorm, loss_scale=new_ls.scale,
                       skipped=overflow.astype(jnp.int32))
        if max_memory_length > 0:
            return state, metrics, new_mems
        return state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
