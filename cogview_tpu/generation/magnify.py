"""Sliding-window super-resolution (generation/magnify.py:22-43 rebuilt).

A 32x32 code grid becomes 64x64 through nine overlapping windows; each
window's context is ``text ++ 16x16 input codes ++ [EOI1][ROI2][POS0]
[BASE][BOI2]`` followed by the partially-filled magnified cells (already
generated cells from earlier windows are fixed template tokens, so the
overlap consistency falls out of the template machinery for free).

Windows are inherently sequential (later windows condition on earlier
outputs), matching the reference; each window is one jitted cached decode.
The window geometry (i, j, line) is copied behavior: window (i, j) covers
magnified rows 16i..16i+line and columns 16j..16j+32.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ..config import GPTConfig
from .sampling import SamplingParams, compile_template_batch, filling_sequence

WINDOWS = [
    (0, 0, 18), (0, 1, 30), (0, 2, 30),
    (1, 1, 30), (1, 0, 30), (1, 2, 30),
    (2, 0, 32), (2, 1, 32), (2, 2, 32),
]


def magnify(
    params,
    cfg: GPTConfig,
    tokenizer,
    code_tokens,  # [1024] or [B, 1024] image codes (32x32 base images)
    text_tokens,  # [T] or [B, T] '[ROI1] text [BASE] [BOI1]' prefix ids
    sampling: SamplingParams = SamplingParams(),
    rng: Optional[jax.Array] = None,
) -> np.ndarray:
    """-> [B, 4096] magnified codes.

    TPU adaptations over the reference loop: (a) multiple images batch
    through the same window schedule (windows are sequential — later ones
    condition on earlier outputs — but the batch dim is free throughput);
    (b) every window's template is padded to one common length with fixed
    [PAD] tail steps, so the nine windows share a single XLA compile
    instead of three.
    """
    code = np.atleast_2d(np.asarray(code_tokens, np.int64))
    B = code.shape[0]
    s = int(np.sqrt(code.shape[1] + 1e-6))
    assert s == 32, f"expected 32x32 codes, got {code.shape}"
    code = code.reshape(B, s, s)
    text = np.atleast_2d(np.asarray(text_tokens, np.int64))
    if text.shape[0] == 1 and B > 1:
        text = np.repeat(text, B, axis=0)
    assert text.shape[0] == B

    midfix = [
        tokenizer["[EOI1]"], tokenizer["[ROI2]"], tokenizer["[POS0]"],
        tokenizer["[BASE]"], tokenizer["[BOI2]"],
    ]
    magnified = np.full((B, 2 * s, 2 * s), -1, np.int64)
    if rng is None:
        rng = jax.random.PRNGKey(sampling.seed)
    ctx_len = text.shape[1] + 256 + len(midfix)
    common_len = ctx_len + 1024  # all windows compile to one shape

    for w, (i, j, line) in enumerate(WINDOWS):
        rng, wrng = jax.random.split(rng)
        seqs = []
        for b in range(B):
            code_part = code[b, 8 * i : 8 * (i + 2), 8 * j : 8 * (j + 2)].reshape(-1)
            mag_part = magnified[b, 16 * i : 16 * i + line, 16 * j : 16 * (j + 2)].reshape(-1)
            seqs.append(text[b].tolist() + code_part.tolist() + midfix + mag_part.tolist())
        # windows after the first have already-filled overlap cells, whose
        # fixed/generated pattern is identical across the batch (same window
        # schedule), so the batch shares one compiled template shape
        tpl = compile_template_batch(
            seqs, tokenizer, padded_vocab=cfg.vocab_size, pad_to=common_len
        )
        tokens, _ = filling_sequence(params, cfg, tpl, B, sampling, rng=wrng)
        out = np.asarray(tokens)[:, ctx_len : ctx_len + line * 32]
        for b in range(B):
            magnified[b, 16 * i : 16 * i + line, 16 * j : 16 * (j + 2)] = (
                out[b].reshape(line, 32)
            )

    assert (magnified >= 0).all()
    return magnified.reshape(B, 4 * s * s)
