"""LM loss with the reference's split image/text bookkeeping.

forward_step semantics (pretrain_gpt2.py:292-341): the sample is
``text [B, S+1]`` + ``loss_mask [B, S+1]``; inputs are text[:, :-1] and
labels text[:, 1:]; a position is a *text* position when its input token
id >= img_vocab and its mask is on; text positions' loss-mask entries are
multiplied by ``txt_loss_scale``; total loss = masked mean; img/txt means
are reported separately (txt unscaled back).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import GPTConfig
from ..models import gpt
from ..ops.sparse_attention import build_rmask, gather_pivot_mask, sample_pivots


def cross_entropy_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """fp32 softmax-CE per position.  Under a 'model'-sharded vocab this is
    the pjit analog of mpu.vocab_parallel_cross_entropy — the max/sum
    reductions lower to all-reduces over the model axis automatically."""
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return lse - picked


def dual_position_ids(tokens: jax.Array, roi2_id: int, max_pos: int) -> jax.Array:
    """In-jit dual-segment position ids (SR finetuning): restart at the
    first [ROI2] per row (pretrain_gpt2.py:228-247); rows without [ROI2]
    fall back to 0..S-1 (the host-side numpy variant raises instead)."""
    B, S = tokens.shape
    is_roi2 = tokens == roi2_id
    has = jnp.any(is_roi2, axis=1)
    sep = jnp.argmax(is_roi2, axis=1)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32), (B, S))
    second = pos - sep[:, None].astype(jnp.int32)
    dual = jnp.where(second >= 0, second, pos)
    out = jnp.where(has[:, None], dual, pos)
    return jnp.minimum(out, max_pos - 1)


def lm_loss(
    params,
    cfg: GPTConfig,
    batch: Dict[str, jax.Array],  # text [B,S+1] int32, loss_mask [B,S+1]
    *,
    img_vocab: int = 8192,
    txt_loss_scale: float = 1.0,
    rng: Optional[jax.Array] = None,
    train: bool = True,
    remat: bool = True,
    position_ids: Optional[jax.Array] = None,
    is_sparse: bool = False,
    sparse_rng: Optional[jax.Array] = None,
    dual_positions_roi2: Optional[int] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    text = batch["text"].astype(jnp.int32)
    mask = batch["loss_mask"].astype(jnp.float32)
    tokens = text[:, :-1]
    labels = text[:, 1:]
    lmask = mask[:, 1:]

    img_ind = tokens < img_vocab
    txt_ind = (~img_ind) & (lmask > 0)
    lmask = jnp.where(txt_ind, lmask * txt_loss_scale, lmask)

    if position_ids is None and dual_positions_roi2 is not None:
        position_ids = dual_position_ids(
            tokens, dual_positions_roi2, cfg.max_position_embeddings
        )

    sparse = None
    if is_sparse:
        # pivot+window training attention (is_sparse=1); pivots = all text
        # positions + random image positions, one draw per step
        S = tokens.shape[1]
        assert S % cfg.query_window == 0, (
            f"seq len {S} must be divisible by query_window {cfg.query_window}"
        )
        if sparse_rng is None:
            sparse_rng = rng if rng is not None else jax.random.PRNGKey(0)
        pivot_idx = sample_pivots(
            sparse_rng, tokens, cfg.num_pivot, img_vocab, loss_mask=lmask
        )
        rmask = jnp.asarray(build_rmask(S, cfg.query_window, cfg.key_window_times))
        pivot_mask = gather_pivot_mask(rmask, pivot_idx)
        sparse = gpt.SparseSpec(
            pivot_idx, pivot_mask, cfg.query_window, cfg.key_window_times
        )

    logits = gpt.forward(
        params, cfg, tokens, position_ids=position_ids, train=train, rng=rng,
        remat=remat, sparse=sparse,
    )
    loss, metrics = _split_losses(logits, labels, lmask, img_ind, txt_ind,
                                  txt_loss_scale)
    return loss, metrics


def _split_losses(logits, labels, lmask, img_ind, txt_ind, txt_loss_scale):
    """Masked mean CE + the reference's separate img/txt loss report
    (pretrain_gpt2.py:313-341)."""
    ce = cross_entropy_logits(logits, labels)
    losses = ce * lmask
    denom = jnp.maximum(jnp.sum(lmask), 1.0)
    loss = jnp.sum(losses) / denom
    img_loss = jnp.sum(losses * img_ind) / jnp.maximum(jnp.sum(img_ind), 1.0)
    txt_loss = (
        jnp.sum(losses * txt_ind) / jnp.maximum(jnp.sum(txt_ind), 1.0)
    ) / txt_loss_scale
    return loss, {"lm_loss": loss, "img_loss": img_loss, "txt_loss": txt_loss}


def lm_loss_with_mems(
    params,
    cfg: GPTConfig,
    batch: Dict[str, jax.Array],
    mems: Optional[jax.Array],  # [L+1, B, M, H] from the previous segment
    *,
    max_memory_length: int,
    img_vocab: int = 8192,
    txt_loss_scale: float = 1.0,
    rng: Optional[jax.Array] = None,
    train: bool = True,
    remat: bool = True,
    position_ids: Optional[jax.Array] = None,
    dual_positions_roi2: Optional[int] = None,
) -> Tuple[jax.Array, Tuple[Dict[str, jax.Array], jax.Array]]:
    """lm_loss over gpt.forward_with_mems — the training-driver mems path
    (reference --max-memory-length, arguments.py:268 + forward_step
    threading mems across iterations, pretrain_gpt2.py:292-341, 497-513).
    Each batch is treated as the continuation segment of the previous one,
    exactly as the reference does.  -> (loss, (metrics, new_mems)); the
    returned mems are detached (update_mems stop_gradients them)."""
    text = batch["text"].astype(jnp.int32)
    mask = batch["loss_mask"].astype(jnp.float32)
    tokens = text[:, :-1]
    labels = text[:, 1:]
    lmask = mask[:, 1:]
    img_ind = tokens < img_vocab
    txt_ind = (~img_ind) & (lmask > 0)
    lmask = jnp.where(txt_ind, lmask * txt_loss_scale, lmask)
    if position_ids is None and dual_positions_roi2 is not None:
        position_ids = dual_position_ids(
            tokens, dual_positions_roi2, cfg.max_position_embeddings
        )
    logits, new_mems = gpt.forward_with_mems(
        params, cfg, tokens, mems, max_memory_length=max_memory_length,
        position_ids=position_ids, train=train, rng=rng, remat=remat,
    )
    loss, metrics = _split_losses(logits, labels, lmask, img_ind, txt_ind,
                                  txt_loss_scale)
    return loss, (metrics, new_mems)
