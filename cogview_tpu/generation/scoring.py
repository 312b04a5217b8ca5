"""Caption-likelihood scoring (post-selection / reranking).

Rebuild of ``inverse_prompt_score`` (generation/sampling.py:214-230): for
sequences laid out as ``[BASE][BOI1] <1024 image codes> [EOI1] [ROI1]
<text>``, the score is the sum of text-token log-probabilities given the
image — one batched causal forward, image codes masked out of the softmax.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import GPTConfig
from ..models import gpt

BOTEXT = 2 + 1024 + 1  # [BASE][BOI1] + 1024 codes + [EOI1] (sampling.py:219)


@partial(jax.jit, static_argnames=("cfg", "img_vocab", "botext"))
def inverse_prompt_score(
    params,
    cfg: GPTConfig,
    tokens: jax.Array,  # [B, S] full sequences (no generation slots)
    img_vocab: int = 8192,
    botext: int = BOTEXT,
) -> jax.Array:
    """-> [B] sum of log p(text_t | image, prefix) over t > botext."""
    # logits only from botext on: the text tail is ~20 of 1048 positions,
    # so the full [S, 58240] projection would be 97% wasted MXU + HBM
    logits = gpt.forward(params, cfg, tokens, logits_from=botext)
    logits = logits.at[..., :img_vocab].set(-jnp.inf)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    pred = log_probs[:, :-1]  # predicts positions botext+1..S-1
    target = tokens[:, botext + 1 :]
    picked = jnp.take_along_axis(pred, target[..., None], axis=-1)[..., 0]
    return jnp.sum(picked, axis=-1)
