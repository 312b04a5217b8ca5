"""Which Mosaic construct can scatter G ring columns into window lanes?

The seal step must place column g's quantized [hb, Dc] values into lane
lane0+g of a [hb, Dc, W] window block.  The one-hot ``dot_general`` with
a 3D lhs ([G, hb, Dc] x [G, W]) fails Mosaic layout inference
("unsupported shape cast" — it tries to collapse [G,hb,Dc] -> [G,hb*Dc]
with a 64-lane minor).  This probe AOT-compiles candidate lowerings on
the real TPU and times the ones that compile:

  accum   per-g f32 multiply-add chain (8 terms, small temps)
  bigsum  one-shot [G,hb,Dc,W] broadcast-multiply + sum over G
  batched dot_general with hb as a batch dim
  fused2d K|V-fused [G, hb, 128] -> reshape [G, hb*128] -> 2D dot
  serial  the r4 per-g int8 where-chain (baseline being replaced)

Usage: python scripts/seal_scatter_probe.py [--iters 64]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated variant names (default: all)")
    ap.add_argument("--compile-only", action="store_true")
    args = ap.parse_args()

    from cogview_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl

    G, hb, Dc, W = 8, 40, 64, 128

    def make(body):
        def kernel(qc_ref, oh_ref, l0_ref, o_ref):
            qc = qc_ref[...]          # [G, hb, Dc] f32
            oh = oh_ref[...]          # [G, W] f32 one-hot
            lane0 = l0_ref[0, 0]
            lane_i3 = lax.broadcasted_iota(jnp.int32, (hb, Dc, W), 2)
            grp3 = (lane_i3 >= lane0) & (lane_i3 < lane0 + G)
            out = body(qc, oh, lane0)  # [hb, Dc, W] f32
            o_ref[...] = jnp.where(grp3, out.astype(jnp.int8),
                                   jnp.zeros((hb, Dc, W), jnp.int8))

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((hb, Dc, W), jnp.int8),
        )

    def v_accum(qc, oh, lane0):
        acc = jnp.zeros((hb, Dc, W), jnp.float32)
        for g in range(G):
            acc = acc + qc[g][:, :, None] * oh[g][None, None, :]
        return acc

    def v_bigsum(qc, oh, lane0):
        return jnp.sum(qc[:, :, :, None] * oh[:, None, None, :], axis=0)

    def v_batched(qc, oh, lane0):
        qcb = jnp.broadcast_to(qc[None], (hb, G, Dc))  # wrong data, probe only
        del qcb
        qct = jnp.swapaxes(qc, 0, 1)                   # [hb, G, Dc]
        ohb = jnp.broadcast_to(oh[None], (hb, G, W))
        return lax.dot_general(
            qct, ohb, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).swapaxes(1, 2)  # [hb,Dc,W]? ->
        # dot out = [hb, Dc, W] already: batch hb, lhs free Dc, rhs free W

    def v_fused2d(qc, oh, lane0):
        # pad minor 64 -> 128, collapse into minor, 2D dot, expand back
        qcp = jnp.concatenate(
            [qc, jnp.zeros((G, hb, 128 - Dc), jnp.float32)], axis=2)
        qc2 = qcp.reshape(G, hb * 128)
        out = lax.dot_general(qc2, oh, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        return out.reshape(hb, 128, W)[:, :Dc, :]

    def v_serial(qc, oh, lane0):
        lane_i3 = lax.broadcasted_iota(jnp.int32, (hb, Dc, W), 2)
        out = jnp.zeros((hb, Dc, W), jnp.float32)
        for g in range(G):
            qg = jnp.broadcast_to(qc[g][:, :, None], (hb, Dc, W))
            out = jnp.where(lane_i3 == lane0 + g, qg, out)
        return out

    variants = {"accum": v_accum, "bigsum": v_bigsum, "batched": v_batched,
                "fused2d": v_fused2d, "serial": v_serial}

    rng = np.random.RandomState(0)
    qc0 = jnp.asarray(rng.randint(-127, 127, (G, hb, Dc)).astype(np.float32))
    l0 = jnp.full((1, 1), 16, jnp.int32)
    oh0 = (jnp.arange(W)[None, :] == 16 + jnp.arange(G)[:, None]).astype(
        jnp.float32)

    sel = [s for s in args.only.split(",") if s]
    for name, body in variants.items():
        if sel and name not in sel:
            continue
        call = make(body)

        @jax.jit
        def loop(qc, oh, l0v, call=call):
            def step(i, acc):
                o = call(qc + acc.astype(jnp.float32)[:1, :1, :1] * 0, oh,
                         l0v)
                return acc + o.astype(jnp.int32)[:G]
            return jnp.sum(lax.fori_loop(
                0, args.iters, step, jnp.zeros((G, Dc, W), jnp.int32)))
        try:
            t0 = time.time()
            loop.lower(qc0, oh0, l0).compile()
            tc = time.time() - t0
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:90]
            print(f"{name:8s} COMPILE-FAIL  {msg}", flush=True)
            continue
        if args.compile_only:
            print(f"{name:8s} COMPILE-OK  ({tc:.1f}s)", flush=True)
            continue
        out = loop(qc0, oh0, l0)
        np.asarray(out)
        t0 = time.time()
        for _ in range(args.reps):
            out = loop(qc0, oh0, l0)
        np.asarray(out)
        us = (time.time() - t0) / args.reps / args.iters * 1e6
        print(f"{name:8s} PASS  {us:8.2f} us/call  (compile {tc:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
