"""Folder-watcher generation service.

The reference reserved an "api" flag group (arguments.py:275-287:
input_folder_path / img_folder_path / time_interval) for a polling service
it never shipped; this implements it: watch an input folder for query
files, generate, write PNGs to the image folder, move processed inputs to
a done/ subfolder.  Each query file holds one line per query (same format
as cli.generate's --input-source files).

  python -m cogview_tpu.cli.serve --preset cogview-base \
      --input-folder-path input/ --img-folder-path image/ \
      --load ckpts/cogview-base --img-tokenizer-path ckpts/vqvae.pt
"""

from __future__ import annotations

import argparse
import os
import shutil
import time

from .generate import build_tokenizer, load_model, save_image_grid
from ..generation.sampling import SamplingParams
from ..generation.tasks import generate_once


def build_parser():
    p = argparse.ArgumentParser("cogview-tpu serve")
    p.add_argument("--input-folder-path", default="input/")
    p.add_argument("--img-folder-path", default="image/")
    p.add_argument("--time-interval", type=float, default=10.0,
                   help="poll period in seconds")
    p.add_argument("--generation-task", default="text2image",
                   choices=["text2image", "image2text"])
    p.add_argument("--preset", default="cogview-base",
                   choices=["cogview-base", "cogview-sr", "tutorial", "smoke", "tiny"])
    p.add_argument("--load", default=None)
    p.add_argument("--img-tokenizer-path", default=None)
    p.add_argument("--text-model-path", default=None)
    p.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    p.add_argument("--weights", default="bfloat16", choices=["bfloat16", "int8"],
                   help="int8 weight-only quantization (see generate --weights)")
    p.add_argument("--kv-cache", default="int8",
                   choices=["int8", "int4", "bfloat16"],
                   help="decode KV cache (see generate --kv-cache)")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-inference-batch-size", type=int, default=8)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=200)
    p.add_argument("--top_p", type=float, default=0.0)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--max-polls", type=int, default=0,
                   help="stop after N polls (0 = forever); for testing")
    p.add_argument("--aot-dir", default=None,
                   help="serialized-executable store (see generate --aot-dir): "
                        "warmup populates it, so a RESTARTED server loads the "
                        "generation program instead of re-tracing/compiling")
    p.add_argument("--no-warmup", dest="warmup", action="store_false",
                   default=True,
                   help="skip the pre-serving warmup generation (default: "
                        "compile + first-run the text2image program before "
                        "accepting queries, so query one is not a cold "
                        "start — first compiles run minutes on a cold "
                        "cache; see utils/compile_cache.py)")
    return p


def process_file(path: str, args, params, cfg, tokenizer, sampling,
                 aot_store=None) -> int:
    n = 0
    stem = os.path.splitext(os.path.basename(path))[0]
    with open(path, encoding="utf-8") as f:
        for qi, line in enumerate(f):
            raw = line.strip()
            if not raw:
                continue
            res = generate_once(
                params, cfg, tokenizer, raw, args.generation_task,
                num=args.batch_size,
                max_inference_batch_size=args.max_inference_batch_size,
                sampling=sampling,
                aot_store=aot_store,
            )
            out_dir = os.path.join(args.img_folder_path, f"{stem}-{qi}")
            os.makedirs(out_dir, exist_ok=True)
            if args.generation_task == "image2text":
                with open(os.path.join(out_dir, "captions.txt"), "w") as out:
                    for parts in res.texts:
                        out.write(" ".join(p for p in parts if isinstance(p, str)) + "\n")
            else:
                for i, img in enumerate(res.images):
                    save_image_grid([img], os.path.join(out_dir, f"{i}.png"))
            n += 1
    return n


def watch_folder(input_folder: str, process, time_interval: float = 10.0,
                 max_polls: int = 0) -> int:
    """Poll ``input_folder`` for *.txt query files; run ``process(path)`` on
    each.  Successes move to done/, failures to failed/ (with the exception
    text in a sibling .err file) so done/ only ever holds successfully
    processed inputs and failed queries are never silently dropped."""
    done_dir = os.path.join(input_folder, "done")
    failed_dir = os.path.join(input_folder, "failed")
    os.makedirs(done_dir, exist_ok=True)
    os.makedirs(failed_dir, exist_ok=True)

    polls = 0
    while True:
        entries = sorted(
            e for e in os.listdir(input_folder)
            if e.endswith(".txt") and os.path.isfile(os.path.join(input_folder, e))
        )
        for e in entries:
            src = os.path.join(input_folder, e)
            t0 = time.time()
            try:
                n = process(src)
                print(f"processed {e}: {n} queries in {time.time()-t0:.1f}s", flush=True)
                shutil.move(src, os.path.join(done_dir, e))
            except Exception as exc:  # keep serving on bad inputs
                print(f"[error] {e}: {exc}", flush=True)
                shutil.move(src, os.path.join(failed_dir, e))
                with open(os.path.join(failed_dir, e + ".err"), "w") as err:
                    err.write(f"{type(exc).__name__}: {exc}\n")
        polls += 1
        if max_polls and polls >= max_polls:
            return 0
        time.sleep(time_interval)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    params, cfg = load_model(args)
    tokenizer = build_tokenizer(args)
    sampling = SamplingParams(temperature=args.temperature, top_k=args.top_k,
                              top_p=args.top_p, seed=args.seed)

    os.makedirs(args.input_folder_path, exist_ok=True)
    os.makedirs(args.img_folder_path, exist_ok=True)
    aot_store = None
    if args.aot_dir:
        from ..utils.aot import ProgramStore
        aot_store = ProgramStore(args.aot_dir)

    if args.warmup and args.generation_task == "text2image":
        # pre-load the generation program so the first real query does not
        # pay trace + backend compile + remote program load.  The dummy
        # text lands in the 32-token template bucket that short queries
        # share (generation/tasks.py pad_bucket); longer queries compile
        # their own bucket on first sight.
        t0 = time.time()
        try:
            generate_once(
                params, cfg, tokenizer, "warmup 预热", "text2image",
                num=min(args.batch_size, args.max_inference_batch_size),
                max_inference_batch_size=args.max_inference_batch_size,
                sampling=sampling,
                aot_store=aot_store,
            )
            print(f"warmup: generation program ready in {time.time()-t0:.1f}s",
                  flush=True)
        except Exception as exc:  # never block serving on warmup
            print(f"warmup skipped ({type(exc).__name__}: {exc})", flush=True)

    print(f"serving: watching {args.input_folder_path} every "
          f"{args.time_interval}s -> {args.img_folder_path}", flush=True)
    return watch_folder(
        args.input_folder_path,
        lambda src: process_file(src, args, params, cfg, tokenizer, sampling,
                                 aot_store=aot_store),
        time_interval=args.time_interval,
        max_polls=args.max_polls,
    )


if __name__ == "__main__":
    raise SystemExit(main())
