"""Per-call launch overhead of a pallas_call on this runtime.

The decode-kernel microbench measures ~134us of per-call FIXED cost
(intercept of the live-window sweep) on top of ~37.5us/window of
streaming.  This probe isolates the launch floor: a kernel that copies
one tiny VMEM block (no HBM streaming, no scalar prefetch) vs one with
the decode kernel's full calling convention (scalar prefetch + 3 ANY-
space HBM tensors aliased in/out + manual DMA of a single window) — both
driven by the same on-device fori_loop so tunnel dispatch amortizes.

Usage: python scripts/pallas_launch_probe.py [--iters 480]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=480)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from cogview_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def timed(name, fn, *xs):
        out = fn(*xs)
        np.asarray(out)
        t0 = time.time()
        for _ in range(args.reps):
            out = fn(*xs)
        np.asarray(out)
        us = (time.time() - t0) / args.reps / args.iters * 1e6
        print(f"{name:28s} {us:8.2f} us/call", flush=True)
        return us

    # ---- 1. minimal kernel: one [8, 128] VMEM block in -> out ----
    def tiny_kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    @jax.jit
    def tiny_loop(x):
        def body(i, x):
            return pl.pallas_call(
                tiny_kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(x)
        return jnp.sum(lax.fori_loop(0, args.iters, body, x))

    timed("tiny [8,128] block", tiny_loop,
          jnp.zeros((8, 128), jnp.float32))

    # ---- 2. decode calling convention, 1-window DMA ----
    # shapes mirror base/B40: kv8 [L, NW, B, 2, N, D, W] int8 + scales,
    # but the kernel DMAs exactly ONE [rb, 2, hb, D, W] block and does a
    # trivial reduce, so the measured cost is launch + 1 window-block DMA.
    L, NW, B, N, D, W = 48, 9, 40, 40, 64, 128
    hb, rb = N, 2

    def conv_kernel(s_ref, q_ref, kv_hbm, s_hbm, o_ref, buf, sbuf, dsem,
                    ssem):
        li = s_ref[0]
        cp1 = pltpu.make_async_copy(
            kv_hbm.at[li, 0, pl.ds(0, rb), pl.ds(0, 2), pl.ds(0, hb)],
            buf, dsem)
        cp2 = pltpu.make_async_copy(
            s_hbm.at[li, 0, pl.ds(0, rb), pl.ds(0, 2), pl.ds(0, hb)],
            sbuf, ssem)
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        o_ref[...] = (q_ref[...]
                      + jnp.sum(sbuf[0, 0, 0, :1]).astype(q_ref.dtype))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((B, hb, D), lambda h, s: (0, h, 0)),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((B, hb, D), lambda h, s: (0, h, 0))],
        scratch_shapes=[
            pltpu.VMEM((rb, 2, hb, D, W), jnp.int8),
            pltpu.VMEM((rb, 2, hb, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    call = pl.pallas_call(
        functools.partial(conv_kernel),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, N, D), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )

    @jax.jit
    def conv_loop(q):
        kv8 = jnp.zeros((L, NW, B, 2, N, D, W), jnp.int8)
        sc = jnp.zeros((L, NW, B, 2, N, W), jnp.float32)

        def body(i, q):
            scalars = jnp.stack([lax.rem(i, L).astype(jnp.int32),
                                 jnp.int32(0)])
            (o,) = call(scalars, q, kv8, sc)
            return o
        return jnp.sum(lax.fori_loop(0, args.iters, body, q)
                       .astype(jnp.float32))

    timed("decode-convention 1 window", conv_loop,
          jnp.zeros((B, N, D), jnp.bfloat16))


if __name__ == "__main__":
    main()
