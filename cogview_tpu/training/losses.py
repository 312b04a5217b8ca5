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


def _pick_ce_chunk(S: int, target: int) -> int:
    """Largest divisor of S that is <= target (static shapes under scan)."""
    for c in range(min(S, target), 0, -1):
        if S % c == 0:
            return c
    return S


# auto mode: full logits up to ~4.5 GiB fp32 (the tutorial bench config's
# 16x1088x58240 = 4.05 GB fits alongside its activations on a 16 GB chip
# and is the fast path; chunk beyond to cap the CE memory contribution)
_CE_AUTO_LOGIT_BYTES = int(4.5 * (1 << 30))


def cross_entropy_hidden(
    params, h: jax.Array, labels: jax.Array, *, chunk_target: int = 0,
) -> jax.Array:
    """fp32 softmax-CE [B, S] from post-final-LN hidden states [B, S, H]
    without ever materializing the full [B, S, V] logits.

    The reference's vocab-parallel CE (mpu/cross_entropy.py:25-104) exists
    for exactly this reason — its custom backward is softmax-minus-onehot so
    the [S, V] probability tensor never persists.  Here the vocab projection
    (tied word embedding, gpt2_modeling.py:115-118) is fused INTO the loss:
    a lax.scan over sequence chunks computes each chunk's logits, lse and
    gathered target logit, and ``jax.checkpoint`` on the chunk body makes
    the backward recompute the chunk logits instead of saving them.  Peak
    live logits = [B, chunk, V] (~0.5 GB at the tutorial bench config)
    instead of [B, S, V] fp32 twice per step (~8 GB).

    Math (and dtype path: compute-dtype matmul with fp32 accumulation, fp32
    reductions) is identical to ``cross_entropy_logits(_logits(h), labels)``
    — asserted by tests/test_losses_chunked_ce.py.

    ``chunk_target=0`` (auto, the default) uses full logits while
    [B, S, V] fp32 fits in ~2 GiB and chunks (160 tokens) above: measured
    on v5e the full-logits path is ~3.5% faster per step (45.9k vs 44.3k
    tok/s, tutorial b16) because XLA streams the lse/gather reductions
    through the vocab matmul — chunking pays one extra vocab-projection
    recompute in backward, and only earns its keep as a peak-memory cut.
    """
    from ..models.gpt import _wmul

    word = params["embed"]["word"]
    leaf = word if isinstance(word, dict) else {"w": word}
    B, S, H = h.shape
    if chunk_target == 0:
        V = leaf["w"].shape[0]
        chunk_target = S if B * S * V * 4 <= _CE_AUTO_LOGIT_BYTES else 160
    C = _pick_ce_chunk(S, chunk_target)
    if C == S:
        logits = _wmul(h, leaf, "bsh,vh->bsv", h.dtype)
        return cross_entropy_logits(logits, labels)
    nc = S // C
    hc = jnp.moveaxis(h.reshape(B, nc, C, H), 1, 0)  # [nc, B, C, H]
    lc = jnp.moveaxis(labels.reshape(B, nc, C), 1, 0)  # [nc, B, C]

    def chunk_fn(_, xs):
        h_c, lab_c = xs
        logits = _wmul(h_c, leaf, "bch,vh->bcv", h_c.dtype)  # f32 out
        lse = jax.nn.logsumexp(logits, axis=-1)
        picked = jnp.take_along_axis(logits, lab_c[..., None], axis=-1)[..., 0]
        return None, lse - picked

    _, ce = jax.lax.scan(
        jax.checkpoint(chunk_fn, prevent_cse=False), None, (hc, lc))
    return jnp.moveaxis(ce, 0, 1).reshape(B, S)


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

    h = gpt.forward(
        params, cfg, tokens, position_ids=position_ids, train=train, rng=rng,
        remat=remat, sparse=sparse, return_hidden=True,
    )
    ce = cross_entropy_hidden(params, h, labels,
                              chunk_target=cfg.ce_chunk_target)
    loss, metrics = _split_ce(ce, lmask, img_ind, txt_ind, txt_loss_scale)
    return loss, metrics


def _split_ce(ce, lmask, img_ind, txt_ind, txt_loss_scale):
    """Masked mean CE + the reference's separate img/txt loss report
    (pretrain_gpt2.py:313-341)."""
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
    h, new_mems = gpt.forward_with_mems(
        params, cfg, tokens, mems, max_memory_length=max_memory_length,
        position_ids=position_ids, train=train, rng=rng, remat=remat,
        return_hidden=True,
    )
    ce = cross_entropy_hidden(params, h, labels,
                              chunk_target=cfg.ce_chunk_target)
    loss, metrics = _split_ce(ce, lmask, img_ind, txt_ind, txt_loss_scale)
    return loss, (metrics, new_mems)
