"""Stage-1 VQ-VAE trainer.

The reference documents stage-1 training (`train_vqvae.py [DATASET PATH]`,
vqvae/README.md:20-24) but vendors only the model + EMA codebook machinery
(vqvae/vqvae_zc.py) and the multi-GPU launcher (vqvae/distributed/launch.py)
— the trainer script itself was never shipped.  This is that trainer, SPMD
over the device mesh: images shard over the 'data' axis and the EMA
codebook statistics reduce globally through sharding propagation
(training/vqvae_train.py).

  python -m cogview_tpu.cli.vqtrain --data images/ --train-iters 20000 \
      --batch-size 32 --save checkpoints/vqvae

Two codebook modes, matching the reference model's two quantizers:
straight-through + EMA codebook (default; vqvae_zc.py:67-83) and the
gumbel relaxation (--gumbel [--gumbel-hard]; vqvae_zc.py:55-65) with an
exponentially annealed temperature.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("cogview-tpu vqtrain")
    p.add_argument("--data", required=True,
                   help="image source: folder, .zip, .tar(.gz), .rar, or "
                        ".h5 (preprocess/raw_datasets.py)")
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--train-iters", type=int, default=20000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--latent-weight", type=float, default=0.25,
                   help="commitment loss weight (ST mode)")
    p.add_argument("--ema-decay", type=float, default=0.99)
    p.add_argument("--gumbel", action="store_true",
                   help="gumbel-relaxed codebook instead of ST+EMA")
    p.add_argument("--gumbel-hard", action="store_true",
                   help="hard lookup + EMA inside the gumbel mode")
    p.add_argument("--kl-weight", type=float, default=0.25,
                   help="KL(q||uniform) weight (gumbel mode)")
    p.add_argument("--temp", type=float, default=1.0,
                   help="initial gumbel temperature")
    p.add_argument("--temp-min", type=float, default=0.0625)
    p.add_argument("--temp-decay", type=float, default=1e-4,
                   help="temp = max(temp_min, temp * exp(-decay * step))")
    # model size overrides (defaults = the released tokenizer's geometry)
    p.add_argument("--channel", type=int, default=512)
    p.add_argument("--embed-dim", type=int, default=256)
    p.add_argument("--n-embed", type=int, default=8192)
    p.add_argument("--save", default=None, help="checkpoint directory")
    p.add_argument("--save-interval", type=int, default=1000)
    p.add_argument("--log-interval", type=int, default=10)
    p.add_argument("--summary-dir", default=None)
    p.add_argument("--experiment-name", default="vqtrain")
    p.add_argument("--seed", type=int, default=0)
    return p


def _batches(source_path: str, img_size: int, batch: int):
    """Cycle the image source forever, yielding [B, S, S, 3] float32."""
    from ..preprocess.raw_datasets import open_image_source

    buf = []
    while True:
        n = 0
        for _name, arr in open_image_source(source_path, img_size=img_size):
            buf.append(arr)
            n += 1
            if len(buf) == batch:
                yield np.stack(buf)
                buf.clear()
        if n == 0:
            raise SystemExit(f"--data {source_path}: no decodable images")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from ..utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..models import vqvae
    from ..parallel import create_mesh
    from ..training.checkpointing import save_checkpoint
    from ..training.vqvae_train import (
        init_vqvae_train_state,
        make_vqvae_gumbel_train_step,
        make_vqvae_train_step,
    )
    from ..utils.metrics import MetricsWriter

    n_dev = len(jax.devices())
    mesh = create_mesh(model_parallel=1, data_parallel=n_dev)
    if args.batch_size % n_dev:
        raise SystemExit(f"--batch-size {args.batch_size} must be divisible "
                         f"by the {n_dev}-device data axis")

    cfg = vqvae.VQVAEConfig(channel=args.channel, embed_dim=args.embed_dim,
                            n_embed=args.n_embed, decay=args.ema_decay)
    params = vqvae.init_params(jax.random.PRNGKey(args.seed), cfg)
    tx = optax.adam(args.lr)
    state = init_vqvae_train_state(params, tx)
    if args.gumbel:
        step = make_vqvae_gumbel_train_step(
            tx, kl_weight=args.kl_weight, hard=args.gumbel_hard,
            decay=args.ema_decay)
    else:
        step = make_vqvae_train_step(
            tx, latent_weight=args.latent_weight, decay=args.ema_decay)

    writer = MetricsWriter(args.summary_dir, args.experiment_name)
    rng = jax.random.PRNGKey(args.seed + 1)
    batches = _batches(args.data, args.img_size, args.batch_size)
    shard = NamedSharding(mesh, P("data"))
    t0 = time.time()
    with jax.set_mesh(mesh):
        for it in range(1, args.train_iters + 1):
            batch = jax.device_put(jnp.asarray(next(batches)), shard)
            if args.gumbel:
                rng, sub = jax.random.split(rng)
                temp = max(args.temp_min,
                           args.temp * float(np.exp(-args.temp_decay * it)))
                state, m = step(state, batch, sub, jnp.float32(temp))
            else:
                state, m = step(state, batch)
            if it % args.log_interval == 0 or it == args.train_iters:
                m = {k: float(v) for k, v in m.items()}
                dt = (time.time() - t0) / args.log_interval
                t0 = time.time()
                parts = " ".join(f"{k} {v:.5f}" for k, v in sorted(m.items()))
                print(f"iter {it}/{args.train_iters} | {parts} | "
                      f"{dt * 1000:.0f} ms/iter", flush=True)
                writer.add_scalars(it, m)
            if args.save and (it % args.save_interval == 0
                              or it == args.train_iters):
                save_checkpoint(args.save, it, state)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
