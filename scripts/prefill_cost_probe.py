"""How much of a bench decode rep is the PREFILL (ctx=33) paying?

The phase microbench accounts 17.6 ms/step expected (fwdvar + tail +
window-mix correction) yet the real bench rep measures ~21.0 s / 1024
steps.  This probe times the real ``filling_sequence`` at image lengths
{8, 256, 1024}: the 8-mask run is ~pure prefill + dispatch, and the
(1024-256) marginal gives the true per-step cost free of prefill.

Usage: python scripts/prefill_cost_probe.py [--batch 40] [--reps 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=40)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--lens", default="8,256,1024")
    args = ap.parse_args()

    from cogview_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _decode_template, _LayoutTokenizer, CMD, IMG_VOCAB, pick_cfg
    from cogview_tpu.generation.sampling import (
        SamplingParams, compile_template, filling_sequence)
    from cogview_tpu.models import gpt

    cfg, _ = pick_cfg()
    cfg = cfg.replace(kv_cache_dtype="int8")
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    params = jax.jit(gpt.quantize_weights, donate_argnums=0)(params)
    sp = SamplingParams(temperature=1.0, top_k=200, seed=0)

    fake_text = list(range(IMG_VOCAB + 100, IMG_VOCAB + 130))
    lens = [int(x) for x in args.lens.split(",")]
    rows = []
    for n in lens:
        seq = ([CMD["[ROI1]"]] + fake_text + [CMD["[BASE]"], CMD["[BOI1]"]]
               + [-1] * n)
        tpl = compile_template(seq, _LayoutTokenizer(),
                               padded_vocab=cfg.vocab_size)
        tokens, _ = filling_sequence(params, cfg, tpl, args.batch, sp,
                                     rng=jax.random.PRNGKey(0))
        np.asarray(tokens)  # compile + first exec
        t0 = time.time()
        for i in range(args.reps):
            tokens, _ = filling_sequence(params, cfg, tpl, args.batch, sp,
                                         rng=jax.random.PRNGKey(i + 1))
        np.asarray(tokens)
        dt = (time.time() - t0) / args.reps
        rows.append((n, dt))
        print(f"masks {n:5d}  {dt:8.3f} s/rep", flush=True)

    if len(rows) >= 2:
        (n0, t0_), (n1, t1_) = rows[-2], rows[-1]
        ms = (t1_ - t0_) / (n1 - n0) * 1e3
        print(f"marginal per step ({n0}->{n1}): {ms:.3f} ms/step")
        est_prefill = rows[0][1] - rows[0][0] * ms / 1e3
        print(f"prefill + dispatch estimate: {est_prefill:.3f} s/rep")


if __name__ == "__main__":
    main()
