"""Op-level flash-vs-dense attention timing at the production geometry.

VERDICT r2 item 2: at S=1089 (CogView text2image training length,
reference scripts/text2image.sh:33) the flash kernel measured ~18% slower
than XLA dense attention inside the full train step.  This script times
the two ops in ISOLATION (fwd and fwd+bwd) so kernel changes can be
iterated without paying the full-model compile each time.

Usage (on the TPU):
  python scripts/flash_microbench.py [--batch 16] [--seq 1089]
      [--heads 16] [--head-dim 64] [--dropout 0.1] [--bq 128] [--bk 128]
      [--sep 65] [--reps 20] [--mode both|fwd|bwd]

Prints one JSON line per (impl, pass) with ms/call and score-TFLOP/s
(2*B*N*S^2*D*2 dense-equivalent FLOPs fwd; x2.5 fwd+bwd).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=1089)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--head-dim", type=int, default=64)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--bq", type=int, default=128)
    ap.add_argument("--bk", type=int, default=128)
    ap.add_argument("--sep", type=int, default=65)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--mode", default="both", choices=["both", "fwd", "bwd"])
    ap.add_argument("--impl", default="both",
                    choices=["both", "flash", "dense"])
    args = ap.parse_args()

    from cogview_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from cogview_tpu.ops.attention import causal_mask, dense_attention
    from cogview_tpu.ops.flash_attention import flash_attention

    B, S, N, D = args.batch, args.seq, args.heads, args.head_dim
    rate, seed = args.dropout, jnp.uint32(7)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, S, N, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, S, N, D), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, S, N, D), jnp.bfloat16)
    mask = causal_mask(S, sep=args.sep)

    def dense_fn(q, k, v):
        return dense_attention(q, k, v, mask, dropout_rate=rate,
                               dropout_seed=seed, train=rate > 0)

    def flash_fn(q, k, v):
        return flash_attention(q, k, v, sep=args.sep, block_q=args.bq,
                               block_k=args.bk, dropout_rate=rate,
                               dropout_seed=seed if rate > 0 else None)

    def fwd_loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32))

    impls = {}
    if args.impl in ("both", "flash"):
        impls["flash"] = flash_fn
    if args.impl in ("both", "dense"):
        impls["dense"] = dense_fn

    flops_fwd = 4.0 * B * N * S * S * D  # QK^T + PV, dense-equivalent
    for name, fn in impls.items():
        jobs = []
        if args.mode in ("both", "fwd"):
            jobs.append(("fwd", jax.jit(fn)))
        if args.mode in ("both", "bwd"):
            jobs.append(("fwdbwd", jax.jit(jax.grad(fwd_loss(fn)))))
        for passname, jf in jobs:
            t0 = time.time()
            np.asarray(jf(q, k, v))  # compile + run
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.reps):
                out = jf(q, k, v)
            np.asarray(out)
            ms = (time.time() - t0) / args.reps * 1e3
            fl = flops_fwd * (2.5 if passname == "fwdbwd" else 1.0)
            print(json.dumps({
                "impl": name, "pass": passname, "ms": round(ms, 3),
                "dense_equiv_tflops": round(fl / ms / 1e9, 2),
                "B": B, "S": S, "N": N, "D": D, "dropout": rate,
                "bq": args.bq, "bk": args.bk,
                "compile_s": round(compile_s, 1),
            }))


if __name__ == "__main__":
    main()
