"""Isolated decode-kernel cost vs live windows (single dispatch, on-device
loop): per-call fixed cost + per-window slope, without tunnel dispatch
noise.  Drives ops/decode_attention.py tuning.

Usage: python scripts/decode_kernel_microbench.py [--batch 40] [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=40)
    ap.add_argument("--iters", type=int, default=50,
                    help="kernel calls per timed dispatch (48 = one step)")
    ap.add_argument("--kv", default="int8", choices=["int8", "int4"])
    ap.add_argument("--ring-write", type=int, default=1, choices=[0, 1],
                    help="0 = hoist the per-call ring dynamic_update_slice "
                    "out of the loop (isolates the kernel from the DUS "
                    "tile-RMW cost)")
    ap.add_argument("--row-block", type=int, default=0,
                    help="override the kernel's row block (0 = default)")
    args = ap.parse_args()

    from cogview_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from cogview_tpu.config import cogview_base
    from cogview_tpu.models import gpt
    from cogview_tpu.ops import decode_attention as da

    cfg = cogview_base().replace(kv_cache_dtype=args.kv)
    B = args.batch
    L, N, D = cfg.num_layers, cfg.num_heads, cfg.head_dim
    T = cfg.max_position_embeddings
    fn = (da.decode_attention_quant if args.kv == "int8"
          else da.decode_attention_quant4)
    if args.row_block:
        import functools
        fn = functools.partial(fn, row_block=args.row_block)

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, N, D), jnp.bfloat16)
    kc = jax.random.normal(key, (B, N, D), jnp.bfloat16)
    vc = jax.random.normal(key, (B, N, D), jnp.bfloat16)

    def many(q, kc, vc, index, iters):
        from cogview_tpu.ops.decode_attention import SEAL_GROUP as G

        # cache created INSIDE the jit (CLAUDE.md landmine: a donated
        # multi-GB buffer carried through fori_loop double-buffers at the
        # loop boundary — 23GB request, instant compile OOM at base/B40)
        kv8, kvs, rec = gpt.init_cache(cfg, B, T)

        def body(i, carry):
            kv8, kvs, rec, acc = carry
            li = lax.rem(i, L)
            if args.ring_write:
                cols = jnp.concatenate([kc, vc], axis=-1).astype(rec.dtype)
                rec = lax.dynamic_update_slice(
                    rec, cols[None, None],
                    (li, lax.rem(index, G), 0, 0, 0))
            ctx, kv8, kvs = fn(q, rec, kv8, kvs, li, index)
            return kv8, kvs, rec, acc + ctx.astype(jnp.float32)
        init = (kv8, kvs, rec, jnp.zeros((B, N, D), jnp.float32))
        return jnp.sum(lax.fori_loop(0, iters, body, init)[3])

    import functools as _ft
    jf = jax.jit(_ft.partial(many, iters=args.iters))
    # zero-iteration baseline: the in-jit init_cache zero-fills a multi-GB
    # cache per dispatch; subtracting it keeps the least-squares INTERCEPT
    # (the per-call fixed cost this script exists to measure) from
    # absorbing a constant that is not the kernel's
    jf0 = jax.jit(_ft.partial(many, iters=0))
    out = jf0(q, kc, vc, jnp.int32(0))
    np.asarray(out)
    t0 = time.time()
    for _ in range(3):
        out = jf0(q, kc, vc, jnp.int32(0))
    np.asarray(out)
    base_us = (time.time() - t0) / 3 * 1e6
    print(f"dispatch+init baseline {base_us/1e3:.2f} ms (subtracted)",
          flush=True)
    W = da.WRITE_WINDOW
    nw = -(-T // W)
    rows = []
    for wlive in [1, 3, 5, 7, 9]:
        idx = jnp.int32(min(wlive * W - W // 2, T - 1))
        out = jf(q, kc, vc, idx)
        np.asarray(out)  # warm
        t0 = time.time()
        out = jf(q, kc, vc, idx)
        np.asarray(out)
        dt = (time.time() - t0 - base_us * 1e-6) / args.iters * 1e6
        rows.append((wlive, dt))
        print(f"live_windows {wlive:2d}  {dt:7.1f} us/call", flush=True)

    xs = np.array([r[0] for r in rows], np.float64)
    ys = np.array([r[1] for r in rows], np.float64)
    A = np.stack([xs, np.ones_like(xs)], 1)
    (slope, intercept), *_ = np.linalg.lstsq(A, ys, rcond=None)
    dc = 1 if args.kv == "int8" else 0.5
    win_bytes = B * N * W * (2 * D * dc + 2 * 4)
    bw = win_bytes / (slope * 1e-6) / 1e9 if slope > 0 else float("inf")
    print(f"per-call: slope {slope:.1f} us/window  fixed {intercept:.1f} us"
          f"  -> {bw:.0f} GB/s marginal ({win_bytes/1e6:.1f} MB/window)"
          f"  [one 48-layer step: {48*(intercept+slope*5.5)/1e3:.2f} ms"
          f" at avg 5.5 windows]")


if __name__ == "__main__":
    main()
