"""Per-step decode cost vs live-window count (v5e microbench).

Times one jitted forward_with_cache decode step (base scale, int8 KV +
int8 weights, B40 default) at a sweep of cache indices; the slope over
windows is the cache-streaming bandwidth, the intercept is weights +
fixed overhead.  Drives kernel-tuning decisions in
ops/decode_attention.py (see its module docstring).

Usage: python scripts/decode_step_microbench.py [--batch 40] [--reps 20]
       [--preset base] [--kv int8] [--weights int8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=40)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--preset", default="base",
                    choices=["tiny", "tutorial", "base"])
    ap.add_argument("--kv", default="int8",
                    choices=["int8", "int4", "bfloat16"])
    ap.add_argument("--weights", default="int8", choices=["int8", "bfloat16"])
    args = ap.parse_args()

    from cogview_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cogview_tpu.config import cogview_base, cogview_tutorial, tiny_test
    from cogview_tpu.models import gpt

    cfg = {"tiny": lambda: tiny_test(compute_dtype=jnp.bfloat16),
           "tutorial": cogview_tutorial, "base": cogview_base}[args.preset]()
    cfg = cfg.replace(kv_cache_dtype=args.kv)
    B = args.batch
    T = cfg.max_position_embeddings  # 1089 at base
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if args.weights == "int8":
        params = jax.jit(gpt.quantize_weights, donate_argnums=0)(params)

    cache = gpt.init_cache(cfg, B, T)
    step = jax.jit(
        lambda p, t, q, c, i: gpt.forward_with_cache(p, cfg, t, q, c, i),
        donate_argnums=(3,))

    tok = jnp.zeros((B, 1), jnp.int32)
    W = 128
    nw = -(-T // W)
    idxs = [W * k + W // 2 for k in range(0, nw, 2)] + [T - 1]
    rows = []
    for idx in idxs:
        pos = jnp.full((B, 1), idx, jnp.int32)
        i = jnp.int32(idx)
        lg, cache = step(params, tok, pos, cache, i)  # compile+warm
        np.asarray(lg)
        t0 = time.time()
        for _ in range(args.reps):
            lg, cache = step(params, tok, pos, cache, i)
        np.asarray(lg)
        dt = (time.time() - t0) / args.reps * 1e3
        rows.append((idx, idx // W + 1, dt))
        print(f"index {idx:5d}  live_windows {idx // W + 1:2d}  "
              f"{dt:7.2f} ms/step", flush=True)

    # least-squares slope/intercept over live windows
    xs = np.array([r[1] for r in rows], np.float64)
    ys = np.array([r[2] for r in rows], np.float64)
    A = np.stack([xs, np.ones_like(xs)], 1)
    (slope, intercept), *_ = np.linalg.lstsq(A, ys, rcond=None)
    # bytes per window step: K+V int8 [L,B,N,D,W] + 2 scale rows f32
    L, N, D = cfg.num_layers, cfg.num_heads, cfg.head_dim
    win_bytes = L * B * N * W * (2 * D + 2 * 4)
    bw = win_bytes / (slope * 1e-3) / 1e9 if slope > 0 else float("inf")
    print(f"slope {slope:.3f} ms/window  intercept {intercept:.2f} ms  "
          f"-> marginal cache BW {bw:.0f} GB/s "
          f"({win_bytes / 1e6:.0f} MB/window-step)")


if __name__ == "__main__":
    main()
