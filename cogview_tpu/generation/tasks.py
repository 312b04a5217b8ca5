"""Generation tasks: the five --generation-task modes of the reference CLI
(generate_samples.py:203-212), built on the template sampler.

Query templates (verbatim from the reference; '{}' slots are filled from
tab-separated input fields):

  text2image            '[ROI1] {} [BASE] [BOI1] [MASK]*1024'
  image2text            '[BASE] [BOI1] [Image]{} [EOI1] [ROI1] [MASK]*20'
  low-level sr          '[ROI1] {} [BASE] [BOI1] [Image]{} [EOI1] [ROI2]
                         [POS0] [BASE] [BOI2] [MASK]*1024'   (img_size 128)
  super-resolution      '[ROI1] {} [BASE] [BOI1] [Image]{}' -> magnify
  post-selection        '[BASE] [BOI1] [Image]{} [EOI1] [ROI1] {}' -> score
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import numpy as np

from ..config import GPTConfig
from .magnify import magnify
from .sampling import (
    SamplingParams,
    compile_template,
    filling_sequence,
    filling_sequence_aot,
)
from .scoring import inverse_prompt_score

QUERY_TEMPLATES = {
    "text2image": "[ROI1] {} [BASE] [BOI1] [MASK]*1024",
    "image2text": "[BASE] [BOI1] [Image]{} [EOI1] [ROI1] [MASK]*20",
    "low-level super-resolution": (
        "[ROI1] {} [BASE] [BOI1] [Image]{} [EOI1] [ROI2] [POS0] [BASE] [BOI2] [MASK]*1024"
    ),
    "super-resolution": "[ROI1] {} [BASE] [BOI1] [Image]{}",
    "post-selection": "[BASE] [BOI1] [Image]{} [EOI1] [ROI1] {}",
    # the input line IS the template-language query.  The reference lists
    # this choice (arguments.py:216) but its driver raises
    # NotImplementedError (generate_samples.py:212); here it works.
    "raw": "{}",
}


def task_img_size(task: str) -> int:
    # low-level SR conditions on a 128px image -> 16x16=256 codes
    return 128 if task == "low-level super-resolution" else 256


def parse_query_line(
    raw_text: str, task: str, tokenizer, img_size: Optional[int] = None
) -> List[int]:
    """reference _parse_and_to_tensor (generate_samples.py:68-73)."""
    template = QUERY_TEMPLATES[task]
    # 'raw' passes the whole line through (tabs and all); the templated
    # tasks fill their slots from tab-separated fields
    text = raw_text if task == "raw" else template.format(*raw_text.split("\t"))
    return tokenizer.parse_query(text, img_size=img_size or task_img_size(task))


@dataclasses.dataclass
class GenerationOutput:
    tokens: np.ndarray  # [B, S]
    scores: np.ndarray  # [B]
    images: List[np.ndarray]  # decoded [1,h,w,3] arrays (t2i/sr tasks)
    texts: List[list]  # decoded text/command streams (i2t)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def generate_once(
    params,
    cfg: GPTConfig,
    tokenizer,
    raw_text: str,
    task: str = "text2image",
    num: int = 8,
    max_inference_batch_size: int = 12,
    sampling: SamplingParams = SamplingParams(),
    rng: Optional[jax.Array] = None,
    pad_bucket: int = 32,
    aot_store=None,
) -> GenerationOutput:
    """text2image / image2text / low-level-sr (generate_images_once).

    Template lengths are bucketed to multiples of ``pad_bucket`` with
    trailing fixed [PAD] steps so differing text lengths reuse compiles.
    ``aot_store`` (a ``utils.aot.ProgramStore``) routes the filling program
    through the on-disk executable store: a restarted process skips trace +
    lowering + compile for templates it has served before.
    """
    seq = parse_query_line(raw_text, task, tokenizer)
    tpl = compile_template(
        seq, tokenizer, padded_vocab=cfg.vocab_size,
        pad_to=_round_up(len(seq), pad_bucket),
    )
    if rng is None:
        rng = jax.random.PRNGKey(sampling.seed)

    mbz = max_inference_batch_size
    outs, scores = [], []
    remaining = num
    while remaining > 0:
        b = min(remaining, mbz)
        rng, sub = jax.random.split(rng)
        if aot_store is not None:
            (t, s), _ = filling_sequence_aot(
                params, cfg, tpl, aot_store, b, sampling, rng=sub
            )
        else:
            t, s = filling_sequence(params, cfg, tpl, b, sampling, rng=sub)
        outs.append(np.asarray(t))
        scores.append(np.asarray(s))
        remaining -= b
    tokens = np.concatenate(outs, axis=0)[:, : len(seq)]
    scores = np.concatenate(scores, axis=0)

    images, texts = [], []
    for row in tokens:
        parts, imgs = tokenizer.DecodeIds(row.tolist())
        texts.append(parts)
        if imgs:
            images.append(imgs[-1])  # the generated (last) image
    return GenerationOutput(tokens, scores, images, texts)


def super_resolution(
    params,
    cfg: GPTConfig,
    tokenizer,
    raw_text: str,
    sampling: SamplingParams = SamplingParams(),
    rng: Optional[jax.Array] = None,
) -> GenerationOutput:
    """256->512 magnify (generate_samples.py:223-244): parse the text+image
    context, then run the nine-window magnify over the last 1024 codes."""
    seq = parse_query_line(raw_text, "super-resolution", tokenizer)
    code, text_part = seq[-1024:], seq[:-1024]
    magnified = magnify(params, cfg, tokenizer, code, text_part, sampling, rng)
    images = [tokenizer.img_tokenizer.DecodeIds(magnified[0])]
    return GenerationOutput(magnified, np.zeros((1,)), images, [])


def post_selection(
    params,
    cfg: GPTConfig,
    tokenizer,
    raw_text: str,
    max_inference_batch_size: int = 12,
) -> np.ndarray:
    """Score candidate images for one prompt (generate_samples.py:246-269).

    ``raw_text`` = 'text\\timg1\\timg2...'; returns [n_candidates] scores."""
    parts = raw_text.split("\t")
    seqs = []
    for cand in parts[1:]:
        seqs.append(
            parse_query_line("\t".join([cand, parts[0]]), "post-selection", tokenizer)
        )
    tokens = np.asarray(seqs, np.int32)
    assert tokens.ndim == 2
    roi1 = tokenizer["[ROI1]"]
    assert tokens[0, 2 + 1024 + 1] == roi1, "unexpected post-selection layout"

    mbz = max_inference_batch_size
    out = []
    for i in range(0, len(tokens), mbz):
        out.append(
            np.asarray(
                inverse_prompt_score(
                    params, cfg, tokens[i : i + mbz],
                    img_vocab=tokenizer.img_tokenizer.num_tokens,
                )
            )
        )
    return np.concatenate(out, axis=0)
