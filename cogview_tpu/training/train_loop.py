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
from .losses import lm_loss
from ..utils.rng import rbg_key

TrainState = Dict[str, Any]  # {'params', 'opt_state', 'step', 'skipped'}


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
):
    """-> jitted train_step(state, batch, rng) -> (state, metrics)."""

    def loss_fn(params, batch, rng):
        return lm_loss(
            params, cfg, batch,
            img_vocab=img_vocab, txt_loss_scale=txt_loss_scale,
            rng=rng, train=True, remat=remat, is_sparse=is_sparse,
            dual_positions_roi2=dual_positions_roi2,
        )

    def step_fn(state: TrainState, batch, rng):
        rng = rbg_key(rng)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch, rng
        )
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

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
