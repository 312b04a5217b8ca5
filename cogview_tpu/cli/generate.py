"""Generation CLI — parity surface for the reference ``generate_samples.py``.

Usage examples:

  python -m cogview_tpu.cli.generate --generation-task text2image \
      --input-source input.txt --output-path samples --batch-size 4 \
      --load ckpts/cogview-base --img-tokenizer-path ckpts/vqvae.pt

  python -m cogview_tpu.cli.generate --generation-task post-selection \
      --input-source candidates.txt --output-path scores

Inputs: 'interactive' or a file with one query per line (tab-separated
fields fill the task's template slots; --with-id prefixes each line with an
output id, reference generate_samples.py:114-117).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from ..config import GPTConfig, cogview_base, cogview_sr, cogview_tutorial, smoke, tiny_test
from ..generation.sampling import SamplingParams
from ..generation.tasks import (
    QUERY_TEMPLATES,
    generate_once,
    post_selection,
    super_resolution,
)
from ..models import gpt
from ..tokenization import UnifiedTokenizer
from ..tokenization.vq_tokenizer import JaxVQTokenizer

PRESETS = {
    "cogview-base": cogview_base,
    "cogview-sr": cogview_sr,
    "tutorial": cogview_tutorial,
    "smoke": smoke,
    "tiny": tiny_test,
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("cogview-tpu generate")
    g = p.add_argument_group("task")
    g.add_argument("--generation-task", default="text2image",
                   choices=list(QUERY_TEMPLATES.keys()))
    g.add_argument("--input-source", default="interactive",
                   help="'interactive' or a query file (one per line)")
    g.add_argument("--output-path", default="./samples")
    g.add_argument("--with-id", action="store_true",
                   help="file lines are '<id>\\t<query>'; outputs go to per-id dirs")
    g.add_argument("--debug", action="store_true")

    m = p.add_argument_group("model")
    m.add_argument("--preset", default="cogview-base", choices=list(PRESETS.keys()))
    m.add_argument("--load", default=None,
                   help="checkpoint: a DeepSpeed mp_rank_00_model_states.pt or an "
                        "orbax dir; omitted = random init (smoke testing)")
    m.add_argument("--img-tokenizer-path", default=None,
                   help="VQ-VAE .pt checkpoint; omitted = random init")
    m.add_argument("--text-model-path", default=None,
                   help="SentencePiece cog-pretrain.model path")
    m.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    m.add_argument("--weights", default="bfloat16", choices=["bfloat16", "int8"],
                   help="int8 = weight-only per-channel quantization of the "
                        "matmul weights (halves the decode's dominant HBM "
                        "stream; ~1e-2 relative logit error)")
    m.add_argument("--kv-cache", default="int8",
                   choices=["int8", "int4", "bfloat16"],
                   help="decode KV cache. DEFAULT is int8 (fused Pallas "
                        "kernel, ~2x decode batch per chip) — note released "
                        "weights are absent from this environment, so its "
                        "quality is validated only via the relative proxy "
                        "in scripts/kv_quality_check.py (per-step logit KL "
                        "vs the exact cache), not against published FID. "
                        "int4 = packed nibbles, another 2x batch, ~16x the "
                        "int8 rounding error (opt-in). bfloat16 = exact "
                        "(pass this for maximum-fidelity generation)")
    m.add_argument("--aot-dir", default=None,
                   help="directory of serialized compiled executables "
                        "(utils/aot.ProgramStore): first use per template "
                        "shape compiles and stores; later PROCESS RESTARTS "
                        "skip trace+lowering+compile and just load the "
                        "program — the fix for minutes-long first-query "
                        "latency. Entries are backend/machine specific.")

    s = p.add_argument_group("sampling")
    s.add_argument("--batch-size", type=int, default=4,
                   help="samples per query (reference num)")
    s.add_argument("--max-inference-batch-size", type=int, default=12)
    s.add_argument("--temperature", type=float, default=1.0)
    s.add_argument("--top_k", type=int, default=200)
    s.add_argument("--top_p", type=float, default=0.0)
    s.add_argument("--seed", type=int, default=1234)
    return p


def save_image_grid(images, path: str) -> None:
    """[n] list of [1,h,w,3] float arrays -> horizontal PNG grid (the
    reference uses torchvision save_image; PIL keeps this host-side)."""
    from PIL import Image

    arrs = [np.clip(np.asarray(im)[0], 0.0, 1.0) for im in images]
    h = max(a.shape[0] for a in arrs)
    total_w = sum(a.shape[1] for a in arrs)
    canvas = np.zeros((h, total_w, 3), np.float32)
    x = 0
    for a in arrs:
        canvas[: a.shape[0], x : x + a.shape[1]] = a
        x += a.shape[1]
    Image.fromarray((canvas * 255).astype(np.uint8)).save(path)


def iter_queries(args):
    if args.input_source == "interactive":
        while True:
            try:
                raw = input("\nPlease Input Query (stop to exit) >>> ")
            except EOFError:
                return
            if raw == "stop":
                return
            if raw:
                yield raw.strip(), args.output_path
    else:
        with open(args.input_source) as f:
            for line in f:
                raw = line.strip()
                if not raw:
                    continue
                out = args.output_path
                if args.with_id:
                    parts = raw.split("\t")
                    out = os.path.join(args.output_path, parts[0])
                    raw = "\t".join(parts[1:])
                yield raw, out


def load_model(args):
    import jax
    import jax.numpy as jnp

    cfg: GPTConfig = PRESETS[args.preset]()
    cfg = cfg.replace(
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        kv_cache_dtype=getattr(args, "kv_cache", "int8"),
    )
    if args.load:
        from ..models.convert import load_gpt_checkpoint
        from ..training.checkpointing import maybe_load_orbax

        params = maybe_load_orbax(args.load)
        if params is None:
            params = load_gpt_checkpoint(args.load, cfg.num_layers, cfg.num_heads)
        params = jax.tree.map(jnp.asarray, params)
        # 1089-pos base checkpoints serve the 1345-pos SR preset by tiling
        # the table (reference utils.py:283-287)
        params = gpt.adapt_position_embeddings(params, cfg)
    else:
        print("[warn] no --load: random-initialized model", file=sys.stderr)
        # init directly in compute dtype: a 4B fp32 init would need 16GB
        # HBM before the cast (the chip has 15.75GB)
        params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=cfg.compute_dtype)
    # decode reads weights every step: keep them in compute dtype on device
    params = jax.tree.map(lambda x: x.astype(cfg.compute_dtype)
                          if x.dtype == jnp.float32 else x, params)
    if getattr(args, "weights", "bfloat16") == "int8":
        params = jax.jit(gpt.quantize_weights, donate_argnums=0)(params)
    return params, cfg


def build_tokenizer(args, n_img: int = 8192) -> UnifiedTokenizer:
    if args.img_tokenizer_path:
        img_tok = JaxVQTokenizer.from_checkpoint(args.img_tokenizer_path)
    else:
        print("[warn] no --img-tokenizer-path: random VQ-VAE", file=sys.stderr)
        img_tok = JaxVQTokenizer.random_init()
    return UnifiedTokenizer(img_tokenizer=img_tok, text_model_path=args.text_model_path)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    params, cfg = load_model(args)
    tokenizer = build_tokenizer(args)
    sampling = SamplingParams(
        temperature=args.temperature, top_k=args.top_k, top_p=args.top_p,
        seed=args.seed,
    )
    aot_store = None
    if args.aot_dir:
        from ..utils.aot import ProgramStore
        aot_store = ProgramStore(args.aot_dir)

    for qi, (raw, out_dir) in enumerate(iter_queries(args)):
        os.makedirs(out_dir, exist_ok=True)
        t0 = time.time()
        task = args.generation_task
        if task == "post-selection":
            scores = post_selection(params, cfg, tokenizer, raw,
                                    args.max_inference_batch_size)
            out_file = os.path.join(out_dir, "scores_rank_0.txt")
            with open(out_file, "a") as f:
                f.write(raw + "\n")
                f.write("\t".join(str(x) for x in scores.tolist()) + "\n")
            print(f"scores -> {out_file}")
        elif task == "super-resolution":
            res = super_resolution(params, cfg, tokenizer, raw, sampling)
            out_file = os.path.join(out_dir, f"sr-{qi}.png")
            save_image_grid(res.images, out_file)
            print(f"saved {out_file}")
        else:
            res = generate_once(
                params, cfg, tokenizer, raw, task,
                num=args.batch_size,
                max_inference_batch_size=args.max_inference_batch_size,
                sampling=sampling,
                aot_store=aot_store,
            )
            if task == "image2text" or (task == "raw" and not res.images):
                for parts in res.texts:
                    print([p for p in parts if isinstance(p, str)])
            else:
                for i, img in enumerate(res.images):
                    save_image_grid([img], os.path.join(out_dir, f"{i}.png"))
                if res.images:
                    save_image_grid(res.images, os.path.join(out_dir, "concat.png"))
                print(f"saved {len(res.images)} images -> {out_dir}")
        print(f"Taken time {time.time() - t0:.2f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
