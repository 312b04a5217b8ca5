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
    ap.add_argument("--remat", action="store_true",
                    help="wrap the op in jax.checkpoint for the fwdbwd "
                         "pass (reproduces the train step's cost "
                         "structure: bwd re-runs the forward)")
    ap.add_argument("--policy", default=None, choices=[None, "dots"],
                    help="with --remat: use the model's "
                         "dots_with_no_batch_dims_saveable policy instead "
                         "of full recompute (gpt._maybe_checkpoint)")
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
        # quadratic loss: dO depends on the forward output, so XLA cannot
        # elide any forward work inside grad (a sum loss has dO == 1 and
        # lets dense skip its PV matmul entirely)
        return lambda q, k, v: jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

    R = args.reps
    from jax import lax

    # per-jit-call dispatch through the tunneled runtime is ~50ms —
    # larger than the op itself — so all reps run inside ONE jit via a
    # scan whose carry perturbs q (defeats CSE without changing cost)
    def many_fwd(fn):
        def run(q, k, v):
            def step(carry, _):
                o = fn(q + carry.astype(q.dtype) * 1e-6, k, v)
                return o.astype(jnp.float32), None
            out, _ = lax.scan(step, jnp.zeros(q.shape, jnp.float32),
                              None, length=R)
            # return a SCALAR: the tunneled runtime fetches outputs at
            # ~50MB/s, so returning the [B,S,N,D] array would swamp the
            # measurement (measured: a 105 TFLOP/s matmul chain reads as
            # 9.5 TFLOP/s when its 36MB output is fetched)
            return jnp.sum(out)
        return run

    def many_bwd(fn):
        if args.remat:
            policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                      if args.policy == "dots" else None)
            fn = jax.checkpoint(fn, prevent_cse=False, policy=policy)
        loss = fwd_loss(fn)
        def run(q, k, v):
            # grad wrt ALL inputs: grad-wrt-q-only lets XLA dead-code the
            # entire dk/dv kernel (and the analogous dense matmuls)
            def step(carry, _):
                gq_prev, acc = carry
                g = jax.grad(loss, argnums=(0, 1, 2))(
                    q + gq_prev.astype(q.dtype) * 1e-6, k, v)
                acc = (acc + jnp.sum(g[1]).astype(jnp.float32)
                       + jnp.sum(g[2]).astype(jnp.float32))
                return (g[0].astype(jnp.float32), acc), None
            (gq, acc), _ = lax.scan(
                step, (jnp.zeros(q.shape, jnp.float32), jnp.float32(0)),
                None, length=R)
            return jnp.sum(gq) + acc  # scalar fetch (see many_fwd)
        return run

    impls = {}
    if args.impl in ("both", "flash"):
        impls["flash"] = flash_fn
    if args.impl in ("both", "dense"):
        impls["dense"] = dense_fn

    flops_fwd = 4.0 * B * N * S * S * D  # QK^T + PV, dense-equivalent
    for name, fn in impls.items():
        jobs = []
        if args.mode in ("both", "fwd"):
            jobs.append(("fwd", jax.jit(many_fwd(fn))))
        if args.mode in ("both", "bwd"):
            jobs.append(("fwdbwd", jax.jit(many_bwd(fn))))
        for passname, jf in jobs:
            t0 = time.time()
            np.asarray(jf(q, k, v))  # compile + run
            compile_s = time.time() - t0
            t0 = time.time()
            np.asarray(jf(q, k, v))
            ms = (time.time() - t0) / R * 1e3
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
