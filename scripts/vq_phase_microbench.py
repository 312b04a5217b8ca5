"""Phase-resolved VQ roundtrip cost (v5e): encoder vs argmin vs decoder.

bench.py mode=vq times the full jitted roundtrip; this splits it so the
optimization target is visible.  Each phase runs K times inside one jit
(chained through a scalar so nothing dead-codes) and returns a SCALAR —
per-call dispatch and fetch through the tunneled runtime would otherwise
bury phases that cost <1 ms.

Phases:
  enc32   encode_features, fp32 HIGHEST (the bit-parity tokenize path)
  enc16   encode_features, bf16 (native MXU; self-consistent corpora only)
  argmin  nearest_code (fp32 codebook distance + argmin)
  dec16   lookup + decode_features + denormalize, bf16 (bench default)
  dec32   same in fp32 HIGHEST

Usage: python scripts/vq_phase_microbench.py [--batch 32] [--k 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--phases", default="enc32,enc16,argmin,dec16,dec32")
    args = ap.parse_args()

    from cogview_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from cogview_tpu.models import vqvae

    B, K = args.batch, args.k
    params = vqvae.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(B, 256, 256, 3).astype(np.float32))
    codes = jnp.asarray(rng.randint(0, 8192, (B, 1024)), jnp.int32)

    def timed(name, fn, *xs):
        out = fn(*xs)
        np.asarray(out)
        t0 = time.time()
        for _ in range(args.reps):
            out = fn(*xs)
        np.asarray(out)
        ms = (time.time() - t0) / args.reps / K * 1e3
        print(f"{name:7s} {ms:8.3f} ms/call  ({ms / B * 1e3:7.1f} us/img)",
              flush=True)
        return ms

    phases = set(args.phases.split(","))

    def loop(body):
        @jax.jit
        def f(p, x):
            def step(i, acc):
                out = body(p, x + acc * 1e-30)
                return jnp.sum(out.astype(jnp.float32)) * 1e-30
            return lax.fori_loop(0, K, step, jnp.float32(0))
        return f

    if "enc32" in phases:
        timed("enc32", loop(lambda p, im: vqvae.encode_features(p, im)),
              params, imgs)
    if "enc16" in phases:
        def enc16(p, im):
            enc = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p["encoder"])
            return vqvae.encode_features(
                {"encoder": enc}, im.astype(jnp.bfloat16))
        timed("enc16", loop(enc16), params, imgs)
    if "argmin" in phases:
        z = jnp.asarray(rng.randn(B, 32, 32, 256).astype(np.float32))
        timed("argmin",
              loop(lambda p, zz: vqvae.nearest_code(
                  p["quantize"]["embed"], zz).astype(jnp.float32)),
              params, z)
    def dec_loop(dtype):
        @jax.jit
        def f(p, c):
            def step(i, acc):
                # data-depend the codes on acc so XLA cannot hoist the
                # (otherwise loop-invariant) decode out of the loop
                cc = c + (acc > 1e30).astype(jnp.int32)
                out = vqvae.code2img(p, cc, dtype=dtype)
                return acc * 1e-30 + jnp.sum(out)
            return lax.fori_loop(0, K, step, jnp.float32(0))
        return f

    if "dec16" in phases:
        timed("dec16", dec_loop(jnp.bfloat16), params, codes)
    if "dec32" in phases:
        timed("dec32", dec_loop(None), params, codes)

    # ---- round: the bench's actual composition (enc32 -> argmin ->
    # dec16) in the same K-loop harness.  round vs enc32+argmin+dec16
    # isolates composition/fusion pathologies from per-dispatch cost ----
    if "round" in phases:
        edt = os.environ.get("COGVIEW_BENCH_VQ_ENCODE", "float32")

        @jax.jit
        def round_f(p, im):
            def step(i, acc):
                imc = im + acc * 1e-30
                codes = vqvae.img2code(
                    p, imc,
                    dtype=jnp.bfloat16 if edt == "bfloat16" else None)
                out = vqvae.code2img(p, codes, dtype=jnp.bfloat16)
                return acc * 1e-30 + jnp.sum(out)
            return lax.fori_loop(0, K, step, jnp.float32(0))
        timed("round", round_f, params, imgs)


if __name__ == "__main__":
    main()
