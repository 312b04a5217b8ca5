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

from typing import List, Optional, Sequence

import jax
import numpy as np

from ..config import GPTConfig
from .sampling import SamplingParams, compile_template, filling_sequence

WINDOWS = [
    (0, 0, 18), (0, 1, 30), (0, 2, 30),
    (1, 1, 30), (1, 0, 30), (1, 2, 30),
    (2, 0, 32), (2, 1, 32), (2, 2, 32),
]


def magnify(
    params,
    cfg: GPTConfig,
    tokenizer,
    code_tokens: Sequence[int],  # 1024 image codes (the 32x32 base image)
    text_tokens: Sequence[int],  # the '[ROI1] text [BASE] [BOI1]' prefix ids
    sampling: SamplingParams = SamplingParams(),
    rng: Optional[jax.Array] = None,
) -> np.ndarray:
    code = np.asarray(code_tokens, np.int64)
    s = int(np.sqrt(len(code) + 1e-6))
    assert s == 32, f"expected 32x32 codes, got {len(code)}"
    code = code.reshape(s, s)

    midfix = [
        tokenizer["[EOI1]"], tokenizer["[ROI2]"], tokenizer["[POS0]"],
        tokenizer["[BASE]"], tokenizer["[BOI2]"],
    ]
    magnified = np.full((2 * s, 2 * s), -1, np.int64)
    if rng is None:
        rng = jax.random.PRNGKey(sampling.seed)

    for w, (i, j, line) in enumerate(WINDOWS):
        code_part = code[8 * i : 8 * (i + 2), 8 * j : 8 * (j + 2)].reshape(-1)
        mag_part = magnified[16 * i : 16 * i + line, 16 * j : 16 * (j + 2)].reshape(-1)
        context = list(text_tokens) + code_part.tolist() + midfix
        seq = context + mag_part.tolist()

        tpl = compile_template(seq, tokenizer, padded_vocab=cfg.vocab_size)
        rng, wrng = jax.random.split(rng)
        tokens, _ = filling_sequence(params, cfg, tpl, 1, sampling, rng=wrng)
        out = np.asarray(tokens)[0, len(context):]
        magnified[16 * i : 16 * i + line, 16 * j : 16 * (j + 2)] = out.reshape(line, 32)

    assert (magnified >= 0).all()
    return magnified.reshape(1, 4 * s * s)
