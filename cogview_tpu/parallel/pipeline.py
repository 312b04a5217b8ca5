"""Pipeline parallelism (GPipe schedule) over a 'pipe' mesh axis.

Beyond-reference capability (the reference scales only by DP x TP).  The
model's layer-stacked parameter layout ([L, ...] leaves, scanned in
models/gpt.py) IS the pipeline decomposition: sharding the leading L dim
over a 'pipe' axis gives each chip a contiguous block of L/p layers, and
a GPipe schedule runs microbatches through the stages — activations hop
stage-to-stage with one `lax.ppermute` per tick, so a 48-layer 4B model
fits across chips that could not hold it whole.

Schedule: T = M + p - 1 ticks (M microbatches, p stages).  At tick t,
stage s runs microbatch t - s through its local layers (warmup/drain
ticks compute on garbage that is never read — the classic bubble,
p-1 / (M + p - 1) of the work).  Backward is jax autodiff through the
tick scan: the transposed ppermute runs the reverse pipeline, and
``remat`` checkpoints each tick so only per-tick activations are saved.

Partial-manual shard_map (``axis_names={pipe_axis}``): only 'pipe' is
manual here — 'data'/'model'/'seq' sharding of the SAME arrays stays
under GSPMD, so PP composes with DP/TP/FSDP without nesting tricks.

Dropout note: layer dropout seeds are perturbed per microbatch (the
counter-hash mask would otherwise repeat identically across microbatches,
which share local coordinates); masks are therefore valid and independent
but not bit-identical to an unpipelined run — equivalence tests run with
dropout off.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P


def gpipe_scan(
    layer_fn: Callable[..., jax.Array],
    stacked_params: Any,  # pytree with leading L dim on every leaf
    layer_rngs: jax.Array,  # [L, 2] uint32 key data
    h: jax.Array,  # [B, S, H] activations entering the stack
    *aux: jax.Array,  # extra replicated arrays (e.g. the attention mask)
    pipe_axis: str,
    n_stages: int,
    n_microbatches: int,
    remat: bool = True,
    mb_aux: tuple = (),  # per-sample arrays (leading dim B), microbatched
) -> jax.Array:
    """Apply the whole layer stack to ``h`` with a GPipe pipeline.

    ``layer_fn(act, p, r, *mb_aux_chunks, *aux) -> act`` applies ONE layer
    (params ``p`` with the L dim stripped) to a [B/M, S, H] microbatch.
    ``aux`` arrays are passed through replicated — traced values must
    enter as arguments here, not closures (a closure captured across the
    Auto->Manual mesh boundary fails sharding canonicalization).
    ``mb_aux`` arrays carry a leading batch dim B and are sliced to the
    [B/M, ...] chunk of whichever microbatch a stage is computing at each
    tick — this is what lets per-sample attention state (e.g. the sparse
    pivot set, models/gpt.py) ride the pipeline alongside its rows.
    Returns [B, S, H], replicated over ``pipe_axis`` (one psum at the end).
    """
    B = h.shape[0]
    for a in mb_aux:
        assert a.shape[0] == B, (a.shape, B)
    assert B % n_microbatches == 0, (B, n_microbatches)
    mesh_shape = jax.sharding.get_abstract_mesh().shape
    assert mesh_shape.get(pipe_axis) == n_stages, (
        f"n_stages={n_stages} != mesh axis {pipe_axis!r} size "
        f"{mesh_shape.get(pipe_axis)}")

    M, p = n_microbatches, n_stages
    perm = [(i, (i + 1) % p) for i in range(p)]

    # f32 at the shard_map boundary: transposing a REPLICATED bf16 input
    # across a partial-manual mesh (the cotangent psum over 'pipe') hits
    # an XLA-CPU check failure ("Invalid binary instruction opcode copy",
    # jax 0.9); compute stays in h.dtype inside
    h_dtype = h.dtype

    n_mb_aux = len(mb_aux)

    def body(local_params, local_rngs, hh32, *aux_in):
        mb_in, rep_in = aux_in[:n_mb_aux], aux_in[n_mb_aux:]
        s = lax.axis_index(pipe_axis)
        hh = hh32.astype(h_dtype)
        x = hh.reshape(M, B // M, *hh.shape[1:])
        mb_x = tuple(a.reshape(M, B // M, *a.shape[1:]) for a in mb_in)

        def stage_apply(act, mb_idx):
            chunks = tuple(
                lax.dynamic_index_in_dim(a, mb_idx, 0, keepdims=False)
                for a in mb_x)

            def layer(a, xs):
                pl, r = xs
                # decorrelate dropout across microbatches (module docstring)
                return layer_fn(a, pl, r ^ mb_idx.astype(jnp.uint32),
                                *chunks, *rep_in), None
            act, _ = lax.scan(layer, act, (local_params, local_rngs))
            return act

        def tick(carry, t):
            buf, out = carry
            mb_idx = jnp.clip(t - s, 0, M - 1)  # microbatch at this stage
            feed = lax.dynamic_index_in_dim(
                x, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            act = jnp.where(s == 0, feed, buf)
            act = stage_apply(act, mb_idx)
            # last stage commits microbatch t-(p-1) once it's real
            w = t - (p - 1)
            widx = jnp.clip(w, 0, M - 1)
            valid = (w >= 0) & (s == p - 1)
            cur = lax.dynamic_index_in_dim(out, widx, 0, keepdims=False)
            out = lax.dynamic_update_index_in_dim(
                out, jnp.where(valid, act, cur), widx, 0)
            buf = lax.ppermute(act, pipe_axis, perm)
            return (buf, out), None

        # warmup buffers start as REAL activations (microbatch 0), not
        # zeros: all-zero activations NaN through the PB-relax eps-folded
        # layernorm (eps scales by max|x|^2 == 0), and a NaN primal turns
        # even the zero cotangents of masked-out ticks into NaN grads
        carry0 = (x[0], jnp.zeros_like(x))
        (_, out), _ = lax.scan(
            jax.checkpoint(tick) if remat else tick,
            carry0, jnp.arange(M + p - 1))
        # results live on the last stage only; replicate for the caller
        # (f32 for the same boundary reason, and the reduction is exact)
        out = lax.psum(
            jnp.where(s == p - 1, out.astype(jnp.float32),
                      jnp.zeros(out.shape, jnp.float32)), pipe_axis)
        return out.reshape(hh.shape)

    pspecs = jax.tree.map(lambda _: P(pipe_axis), stacked_params)
    out = jax.shard_map(
        body,
        in_specs=(pspecs, P(pipe_axis), P())
        + (P(),) * (len(mb_aux) + len(aux)),
        out_specs=P(),
        axis_names={pipe_axis},
        check_vma=False,
    )(stacked_params, layer_rngs, h.astype(jnp.float32), *mb_aux, *aux)
    return out.astype(h_dtype)
