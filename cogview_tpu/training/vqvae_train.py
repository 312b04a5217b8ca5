"""VQ-VAE training step (SPMD).

The reference ships the model + EMA codebook machinery (vqvae/vqvae_zc.py)
and multi-GPU helpers (vqvae/distributed/) but no in-repo trainer; this
provides the standard trainer those support: reconstruction MSE +
``latent_weight`` x commitment loss, EMA codebook updates with the
sufficient statistics psum-med over the data axis (the all_reduce the
reference left commented at vqvae_zc.py:71-72 — here it's just sharding).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..models import vqvae


def vqvae_loss(params, batch, latent_weight: float = 0.25):
    """batch: normalized images [B,H,W,3] -> (loss, aux)."""
    z = vqvae.encode_features(params, batch)
    quant, codes, commit, _ = vqvae.quantize_st(params, z)
    recon = vqvae.decode_features(params, quant)
    mse = jnp.mean((recon - batch) ** 2)
    loss = mse + latent_weight * commit
    return loss, {"recon_mse": mse, "commit": commit, "codes": codes, "z": z}


def make_vqvae_train_step(
    tx: optax.GradientTransformation,
    latent_weight: float = 0.25,
    decay: float = 0.99,
):
    """-> jitted step(state, batch) -> (state, metrics).

    state: {'params', 'opt_state', 'step'}.  Gradients flow to encoder/
    decoder (the straight-through estimator passes through the codebook);
    the codebook itself updates via EMA on the batch statistics.
    """

    def step_fn(state, batch):
        (loss, aux), grads = jax.value_and_grad(vqvae_loss, has_aux=True)(
            state["params"], batch, latent_weight
        )
        # EMA statistics; under a 'data'-sharded batch the sums reduce
        # globally through sharding propagation
        onehot_sum, embed_sum = vqvae.codebook_stats(
            aux["z"], aux["codes"], state["params"]["quantize"]["embed"].shape[1]
        )
        new_q = vqvae.apply_ema(
            state["params"]["quantize"], onehot_sum, embed_sum, decay=decay
        )
        # no gradient updates for the codebook buffers
        grads["quantize"] = jax.tree.map(jnp.zeros_like, grads["quantize"])
        updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        params = dict(params, quantize=new_q)
        metrics = {
            "loss": loss,
            "recon_mse": aux["recon_mse"],
            "commit": aux["commit"],
            "codebook_usage": jnp.mean(
                (jnp.bincount(aux["codes"].reshape(-1),
                              length=new_q["embed"].shape[1]) > 0).astype(jnp.float32)
            ),
        }
        return {
            "params": params,
            "opt_state": new_opt,
            "step": state["step"] + 1,
        }, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_vqvae_gumbel_train_step(
    tx: optax.GradientTransformation,
    kl_weight: float = 0.25,
    hard: bool = False,
    decay: float = 0.99,
):
    """Gumbel-relaxed trainer (reference forward_(continuous_relax=True),
    vqvae_zc.py:55-65,245-248): recon MSE + ``kl_weight`` x KL(q||uniform).
    Soft mode backprops through the softmax mixture; hard mode uses the
    pure hard lookup and (like the reference, vqvae_zc.py:67-83) applies
    the EMA codebook update on the batch statistics.

    -> jitted step(state, batch, rng, temperature) -> (state, metrics);
    temperature is a traced scalar so callers can anneal it without
    recompiling.
    """

    def loss_fn(params, batch, rng, temperature):
        z = vqvae.encode_features(params, batch)
        quant, kl, codes = vqvae.quantize_gumbel(params, z, rng,
                                                 temperature=temperature,
                                                 hard=hard)
        recon = vqvae.decode_features(params, quant)
        mse = jnp.mean((recon - batch) ** 2)
        return mse + kl_weight * kl, {"recon_mse": mse, "kl": kl,
                                      "codes": codes, "z": z}

    def step_fn(state, batch, rng, temperature):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], batch, rng, temperature
        )
        params_q = state["params"]["quantize"]
        if hard:
            onehot_sum, embed_sum = vqvae.codebook_stats(
                aux["z"], aux["codes"], params_q["embed"].shape[1]
            )
            new_q = vqvae.apply_ema(params_q, onehot_sum, embed_sum, decay=decay)
        else:
            new_q = params_q
        grads["quantize"] = jax.tree.map(jnp.zeros_like, grads["quantize"])
        updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        params = dict(params, quantize=new_q)
        metrics = {"loss": loss, "recon_mse": aux["recon_mse"], "kl": aux["kl"]}
        return {
            "params": params,
            "opt_state": new_opt,
            "step": state["step"] + 1,
        }, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def init_vqvae_train_state(params, tx) -> Dict[str, Any]:
    return {"params": params, "opt_state": tx.init(params), "step": jnp.zeros((), jnp.int32)}
