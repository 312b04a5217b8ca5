"""Pretraining CLI — the reference ``pretrain_gpt2.py`` driver rebuilt.

One SPMD program: build the mesh, shard params/optimizer state, iterate
global batches, jitted train_step with NaN-skip, periodic eval (loss +
PPL), orbax checkpoints with the tracker-file protocol, per-interval
metrics (lr, lm/img/txt losses, elapsed ms/iter), dataset hot-reload
polling, --resume-dataloader fast-forward.

Example (tiny synthetic run):
  python -m cogview_tpu.cli.pretrain --preset smoke --train-data data/x.bin \
      --train-iters 100 --batch-size 8 --save ckpts/run1
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

from ..config import GPTConfig
from ..data.loader import DataConfig, detect_new_datasets, make_loaders
from ..training import checkpointing
from ..training.loss_scaler import LossScaleState
from ..training.optim import make_optimizer
from ..training.train_loop import (init_fp16_train_state, init_train_state,
                                   make_fp16_train_step, make_train_step)
from ..utils.metrics import MetricsWriter
from ..utils.timers import Timers


def build_parser():
    p = argparse.ArgumentParser("cogview-tpu pretrain")
    m = p.add_argument_group("model")
    m.add_argument("--preset", default="tutorial",
                   choices=["cogview-base", "cogview-sr", "tutorial", "smoke", "tiny"])
    m.add_argument("--num-layers", type=int, default=None)
    m.add_argument("--hidden-size", type=int, default=None)
    m.add_argument("--num-attention-heads", type=int, default=None)
    m.add_argument("--max-position-embeddings", type=int, default=None)
    m.add_argument("--checkpoint-activations", action="store_true", default=True)
    m.add_argument("--finetune", action="store_true",
                   help="reset iteration/optimizer on load; enable dual-segment "
                        "position ids when the SR preset extends positions")

    t = p.add_argument_group("train")
    t.add_argument("--batch-size", type=int, default=4, help="GLOBAL batch")
    t.add_argument("--train-iters", type=int, default=1000)
    t.add_argument("--lr", type=float, default=4e-4)
    t.add_argument("--lr-decay-style", default="cosine",
                   choices=["constant", "linear", "cosine", "exponential"])
    t.add_argument("--lr-decay-ratio", type=float, default=0.5)
    t.add_argument("--warmup", type=float, default=0.01,
                   help="fraction of train-iters for linear warmup")
    t.add_argument("--weight-decay", type=float, default=1e-2)
    t.add_argument("--clip-grad", type=float, default=1.0)
    t.add_argument("--txt-loss-scale", type=float, default=1.0)
    t.add_argument("--seed", type=int, default=1234)
    t.add_argument("--model-parallel-size", type=int, default=1)
    t.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3/FSDP: shard every weight (+ its grads and "
                        "Adam state) over the 'data' axis too — params are "
                        "all-gathered one layer at a time inside the layer "
                        "scan. The reference's DeepSpeed config stopped at "
                        "ZeRO-1 (optimizer state only).")
    t.add_argument("--sequence-parallel-size", type=int, default=1,
                   help="ring-attention context parallelism: shard the "
                        "sequence over a 'seq' mesh axis (beyond the "
                        "reference — scales context length with chips; "
                        "ops/ring_attention.py)")
    t.add_argument("--pipeline-parallel-size", type=int, default=1,
                   help="GPipe pipeline parallelism: layers shard over a "
                        "'pipe' mesh axis, microbatches stream through "
                        "the stages (parallel/pipeline.py; beyond the "
                        "reference). num_layers must divide it.")
    t.add_argument("--pipeline-microbatches", type=int, default=0,
                   help="microbatches per step (default: = stages); "
                        "batch-size must divide it")
    t.add_argument("--is-sparse", type=int, default=0, choices=[0, 1],
                   help="1 = pivot+window sparse attention for training")
    # sparse geometry (reference arguments.py:289-298; its shipped scripts
    # pass 64/4/256 — text2image.sh:39-41 — which also divides the 1088
    # training tokens of the production presets, unlike the 128 default)
    t.add_argument("--query-window", type=int, default=0,
                   help="sparse attention local window (0 = config "
                        "default 128; training tokens must divide it)")
    t.add_argument("--key-window-times", type=int, default=0,
                   help="sparse attention window multiplier (0 = config "
                        "default 6)")
    t.add_argument("--num-pivot", type=int, default=0,
                   help="sparse attention pivot count (0 = config "
                        "default 768)")
    t.add_argument("--max-memory-length", type=int, default=0,
                   help="transformer-XL-style rolling memory of layer "
                        "hidden states threaded across training batches "
                        "(reference arguments.py:268; its shipped scripts "
                        "use 0).  Each batch continues the previous one "
                        "as a segment; mems are detached (no gradient "
                        "through the memory)")
    t.add_argument("--dual-positions", action="store_true",
                   help="dual-segment position ids restarting at [ROI2] "
                        "(super-resolution finetuning)")
    t.add_argument("--fp16", action="store_true",
                   help="float16 compute with dynamic loss scaling (the "
                        "reference FP16_Optimizer engine; TPU default is "
                        "bf16, which needs no scaling)")
    t.add_argument("--loss-scale-init", type=float, default=2.0 ** 32)
    t.add_argument("--loss-scale-window", type=int, default=1000)
    t.add_argument("--min-loss-scale", type=float, default=1.0)
    t.add_argument("--loss-scale-hysteresis", type=int, default=2)

    d = p.add_argument_group("data")
    d.add_argument("--train-data", nargs="+", default=None)
    d.add_argument("--dataset-type", default="CompactBinaryDataset",
                   choices=["TokenizedDataset", "TextCodeDataset", "CompactBinaryDataset"])
    d.add_argument("--split", default="0.95,0.04,0.01")
    d.add_argument("--resume-dataloader", action="store_true")
    d.add_argument("--img-tokenizer-num-tokens", type=int, default=8192)
    d.add_argument("--text-model-path", default=None)

    io = p.add_argument_group("io")
    io.add_argument("--save", default=None)
    io.add_argument("--load", default=None)
    io.add_argument("--save-interval", type=int, default=5000)
    io.add_argument("--eval-interval", type=int, default=1000)
    io.add_argument("--eval-iters", type=int, default=10)
    io.add_argument("--log-interval", type=int, default=100)
    io.add_argument("--summary-dir", default=None)
    io.add_argument("--experiment-name", default="cogview-tpu")
    io.add_argument("--exit-interval", type=int, default=None)
    io.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of steps 10-13 (the "
                        "TPU analog of the reference wall_clock_breakdown)")
    io.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() (TPU pod slices)")
    return p


def get_config(args) -> GPTConfig:
    from .. import config as C

    cfg = {
        "cogview-base": C.cogview_base, "cogview-sr": C.cogview_sr,
        "tutorial": C.cogview_tutorial, "smoke": C.smoke, "tiny": C.tiny_test,
    }[args.preset]()
    over = {}
    if args.num_layers:
        over["num_layers"] = args.num_layers
    if args.hidden_size:
        over["hidden_size"] = args.hidden_size
    if args.num_attention_heads:
        over["num_heads"] = args.num_attention_heads
    if args.max_position_embeddings:
        over["max_position_embeddings"] = args.max_position_embeddings
    if getattr(args, "query_window", 0):
        over["query_window"] = args.query_window
    if getattr(args, "key_window_times", 0):
        over["key_window_times"] = args.key_window_times
    if getattr(args, "num_pivot", 0):
        over["num_pivot"] = args.num_pivot
    return cfg.replace(**over) if over else cfg


def build_tokenizer(args):
    from ..tokenization import FakeImageTokenizer, UnifiedTokenizer

    # pretraining needs only the vocab layout (reference FakeTokenizer path)
    return UnifiedTokenizer(
        img_tokenizer=FakeImageTokenizer(args.img_tokenizer_num_tokens),
        text_model_path=args.text_model_path,
    )


def evaluate(step_loss_fn, state, val_batches, eval_iters):
    """``val_batches`` is one long-lived iterator (reference
    pretrain_gpt2.py:569 evaluates from a persistent val iterator);
    re-calling iter() per eval would leak a prefetch thread each time."""
    losses = []
    for _ in range(eval_iters):
        try:
            batch = next(val_batches)
        except StopIteration:
            break
        losses.append(float(step_loss_fn(state["params"], batch)))
    if not losses:
        return None
    loss = float(np.mean(losses))
    ppl = math.exp(min(20.0, loss))
    return {"val_loss": loss, "val_ppl": ppl}


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import jax

    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    if args.multihost:
        # pod runtime discovers coordinator/topology itself — the analog of
        # the reference's hostfile/ssh/NCCL-env machinery is one call
        jax.distributed.initialize()
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models import gpt
    from ..parallel import create_mesh, gpt_param_specs, shard_params
    from ..training.losses import lm_loss

    cfg = get_config(args)
    tokenizer = build_tokenizer(args)
    if cfg.vocab_size < len(tokenizer):
        print(f"[warn] model vocab {cfg.vocab_size} < tokenizer vocab "
              f"{len(tokenizer)}: out-of-range ids will NaN (and be skipped); "
              "check --preset", file=sys.stderr)
    timers = Timers()
    writer = MetricsWriter(args.summary_dir, args.experiment_name)

    n_dev = len(jax.devices())
    mp = min(args.model_parallel_size, n_dev)
    sp = max(1, args.sequence_parallel_size)
    pp = max(1, args.pipeline_parallel_size)
    if sp > 1 and pp > 1:
        raise SystemExit("--sequence-parallel-size and "
                         "--pipeline-parallel-size are mutually exclusive")
    if n_dev % (mp * sp * pp):
        raise SystemExit(
            f"{n_dev} devices not divisible by model_parallel {mp} x "
            f"sequence_parallel {sp} x pipeline_parallel {pp}")
    dp = n_dev // (mp * sp * pp)
    mesh = create_mesh(model_parallel=mp, data_parallel=dp,
                       seq_parallel=sp, pipe_parallel=pp)
    if sp > 1:
        # (sequence divisibility is asserted at trace time on the actual
        # attention length — rows are max_len and tokens max_len-1)
        cfg = cfg.replace(sp_axis="seq", sp_num_shards=sp,
                          sp_data_axis="data",
                          sp_head_axis="model" if mp > 1 else None)
    if pp > 1:
        if cfg.num_layers % pp:
            raise SystemExit(f"num_layers {cfg.num_layers} not divisible "
                             f"by --pipeline-parallel-size {pp}")
        mb = args.pipeline_microbatches or pp
        if args.batch_size % mb:
            raise SystemExit(f"--batch-size {args.batch_size} not "
                             f"divisible by {mb} pipeline microbatches")
        cfg = cfg.replace(pp_axis="pipe", pp_num_stages=pp,
                          pp_microbatches=mb)
    axes = f"data={dp}" + (f" x pipe={pp}" if pp > 1 else "") + (
        f" x seq={sp}" if sp > 1 else "") + f" x model={mp}"
    print(f"mesh: {axes}; config {args.preset} "
          f"({cfg.num_layers}L/{cfg.hidden_size}H/{cfg.num_heads}h, vocab {cfg.vocab_size})")
    if args.batch_size % dp:
        # fail with a readable message instead of device_put's sharding
        # error deep inside the first step
        raise SystemExit(
            f"--batch-size {args.batch_size} must be divisible by the data "
            f"axis ({dp} = {n_dev} devices / mp {mp} / sp {sp} / pp {pp})")

    data_cfg = DataConfig(
        train_data=args.train_data or (),
        dataset_type=args.dataset_type,
        split=tuple(float(x) for x in args.split.split(",")),
        batch_size=args.batch_size,
        max_len=cfg.max_position_embeddings,
        seed=args.seed,
    )
    train_it, val_it, _ = make_loaders(data_cfg, tokenizer)
    assert train_it is not None, "no training data"

    tx, schedule = make_optimizer(
        gpt.init_params(jax.random.PRNGKey(args.seed), cfg),
        lr=args.lr,
        warmup_iter=max(1, int(args.warmup * args.train_iters)),
        num_iters=args.train_iters,
        decay_style=args.lr_decay_style,
        decay_ratio=args.lr_decay_ratio,
        weight_decay=args.weight_decay,
        grad_clip=args.clip_grad,
    )

    with jax.set_mesh(mesh):
        params = gpt.init_params(jax.random.PRNGKey(args.seed), cfg)
        params = shard_params(
            params, mesh,
            gpt_param_specs(fsdp_axis="data" if args.fsdp else None,
                            pp_axis="pipe" if pp > 1 else None))
        if args.fp16:
            state = init_fp16_train_state(
                params, tx, init_scale=args.loss_scale_init,
                hysteresis=args.loss_scale_hysteresis,
            )
        else:
            state = init_train_state(params, tx)
        iteration = 0
        rng = jax.random.PRNGKey(args.seed + 1)
        loader_consumed = 0  # batches drawn from the *current* train iterator

        if args.load:
            target = {
                "params": jax.tree.map(np.asarray, state["params"]),
                "opt_state": jax.tree.map(np.asarray, state["opt_state"]),
                "iteration": 0,
                "rng": np.asarray(rng),
                "loader_consumed": 0,
            }
            if args.fp16:
                target["loss_scale"] = jax.tree.map(np.asarray,
                                                    state["loss_scale"]._asdict())
            try:
                loaded = checkpointing.load_latest(args.load, target=target)
            except Exception:
                # shape/structure mismatch (e.g. a 1089-pos base checkpoint
                # loaded into the 1345-pos SR preset for --finetune):
                # restore untyped, then adapt below
                loaded = checkpointing.load_latest(args.load, target=None)
            if loaded is not None:
                loaded["params"] = gpt.adapt_position_embeddings(
                    jax.tree.map(jnp.asarray, loaded["params"]), cfg)
                state["params"] = loaded["params"]
                if not args.finetune and "opt_state" in loaded:
                    state["opt_state"] = jax.tree.map(jnp.asarray, loaded["opt_state"])
                    iteration = int(loaded.get("iteration", 0))
                    # bit-deterministic resume: training rng + loss-scaler
                    # state + dataloader position (reference utils.py:203-220)
                    if loaded.get("rng") is not None:
                        rng = jnp.asarray(loaded["rng"])
                    if args.fp16 and loaded.get("loss_scale") is not None:
                        state["loss_scale"] = LossScaleState(
                            **jax.tree.map(jnp.asarray, loaded["loss_scale"]))
                    loader_consumed = int(loaded.get("loader_consumed", iteration))
                print(f"loaded checkpoint from {args.load} at iteration {iteration}")
        if args.resume_dataloader and loader_consumed > 0:
            train_it.fast_forward(loader_consumed)

        def host_checkpoint_state():
            hs = {
                "params": state["params"], "opt_state": state["opt_state"],
                "iteration": iteration, "rng": rng,
                "loader_consumed": loader_consumed,
            }
            if args.fp16:
                hs["loss_scale"] = state["loss_scale"]._asdict()
            return jax.tree.map(np.asarray, hs)

        mk_step = make_fp16_train_step if args.fp16 else make_train_step
        extra = {}
        if args.fp16:
            extra = dict(scale_window=args.loss_scale_window,
                         min_scale=args.min_loss_scale,
                         hysteresis=args.loss_scale_hysteresis)
        step = mk_step(
            cfg, tx,
            img_vocab=tokenizer.img_tokenizer.num_tokens,
            txt_loss_scale=args.txt_loss_scale,
            remat=args.checkpoint_activations,
            is_sparse=bool(args.is_sparse),
            dual_positions_roi2=(tokenizer["[ROI2]"] if args.dual_positions else None),
            max_memory_length=args.max_memory_length,
            **extra,
        )
        eval_loss = jax.jit(
            lambda p, b: lm_loss(
                p, cfg, b, img_vocab=tokenizer.img_tokenizer.num_tokens,
                txt_loss_scale=args.txt_loss_scale, train=False, remat=False,
            )[0]
        )

        def put(batch):
            return {
                k: jax.device_put(v, NamedSharding(mesh, P("data")))
                for k, v in batch.items()
            }

        known_paths = set(args.train_data or ())
        data_iter = iter(train_it)
        eval_batches = None  # created lazily, reused across eval intervals
        mems = None  # rolling memory (--max-memory-length > 0)
        log_loss, log_img, log_txt, t_last = 0.0, 0.0, 0.0, time.time()

        while iteration < args.train_iters:
            if iteration % 100 == 0 and iteration > 0:
                new_it, known_paths = detect_new_datasets(data_cfg, tokenizer, known_paths)
                if new_it is not None:
                    print(f"detected new datasets ({len(known_paths)} paths)")
                    train_it = new_it
                    data_iter = iter(train_it)
                    loader_consumed = 0  # position is relative to the new loader

            timers("data loader").start()
            batch = put(next(data_iter))
            loader_consumed += 1
            timers("data loader").stop()

            timers("train step").start()
            rng, sub = jax.random.split(rng)
            if args.max_memory_length > 0:
                state, metrics, mems = step(state, batch, sub, mems)
            else:
                state, metrics = step(state, batch, sub)
            timers("train step").stop()

            iteration += 1
            log_loss += float(metrics["lm_loss"])
            log_img += float(metrics["img_loss"])
            log_txt += float(metrics["txt_loss"])

            if args.profile_dir and iteration == 10:
                jax.profiler.start_trace(args.profile_dir)
            if args.profile_dir and iteration == 13:
                jax.profiler.stop_trace()
                print(f"profiler trace (steps 10-13) -> {args.profile_dir}")

            if iteration % args.log_interval == 0:
                n = args.log_interval
                elapsed = (time.time() - t_last) * 1000.0 / n
                lr_now = float(schedule(iteration))
                print(
                    f" iteration {iteration:8d}/{args.train_iters} | "
                    f"elapsed ms/iter {elapsed:.1f} | lr {lr_now:.3E} | "
                    f"lm loss {log_loss / n:.6f} | img loss {log_img / n:.6f} | "
                    f"unscaled txt loss {log_txt / n:.6f} | "
                    f"skipped {int(state['skipped'])}",
                    flush=True,
                )
                print("   " + timers.log(["data loader", "train step"],
                                           normalizer=n), flush=True)
                writer.add_scalars(iteration, {
                    "lr": lr_now, "train_loss": log_loss / n,
                    "img_loss": log_img / n, "txt_loss": log_txt / n,
                    "elapsed_ms": elapsed,
                })
                log_loss = log_img = log_txt = 0.0
                t_last = time.time()

            if args.save and iteration % args.save_interval == 0:
                checkpointing.save_checkpoint(args.save, iteration,
                                              host_checkpoint_state())
                print(f"saved checkpoint at iteration {iteration}")

            if val_it is not None and iteration % args.eval_interval == 0:
                if eval_batches is None:
                    eval_batches = iter(val_it)
                ev = evaluate(eval_loss, state, eval_batches, args.eval_iters)
                if ev:
                    print(f" validation loss {ev['val_loss']:.6f} | ppl {ev['val_ppl']:.3f}")
                    writer.add_scalars(iteration, ev)

            if args.exit_interval and iteration % args.exit_interval == 0:
                print(f"exiting at iteration {iteration} (--exit-interval)")
                break

        if args.save:
            checkpointing.save_checkpoint(args.save, iteration,
                                          host_checkpoint_state())
        writer.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
