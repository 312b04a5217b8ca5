"""Phase-resolved decode-step cost (v5e): where does each ms/step go?

The slope/intercept microbench (decode_step_microbench.py) times single
jitted steps — but per-call dispatch through the tunneled runtime is
~50 ms, which buries the intercept.  This script instead runs K steps of
each PHASE inside one jit (lax.fori_loop), so dispatch amortizes to
noise, and reports ms/step per phase:

  attn    scan over L layers of the fused decode-attention kernel only
  mats    the layer matmul stack (LN + QKV + attn_out + MLP) with the
          attention kernel replaced by identity, + final LN + logits
  fwd     gpt.forward_with_cache (= mats + attn, the real model step)
  tail    the sampler tail on [B, V] logits: temperature + vocab mask +
          top-k bisection + hashed gumbel-max + log_softmax score
  full    fwd + tail (≈ one filling_sequence loop iteration)

``fwd - (attn + mats)`` is scheduling/fusion overhead between the two;
``full`` should track the bench's measured ms/step.

Usage: python scripts/decode_phase_microbench.py [--batch 40] [--k 64]
       [--index 576] [--phases attn,mats,fwd,tail,full]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=40)
    ap.add_argument("--k", type=int, default=64, help="steps per jit call")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--index", type=int, default=576,
                    help="decode position (live windows = index//128+1)")
    ap.add_argument("--preset", default="base",
                    choices=["tiny", "tutorial", "base"])
    ap.add_argument("--kv", default="int8", choices=["int8", "int4"])
    ap.add_argument("--weights", default="int8", choices=["int8", "bfloat16"])
    ap.add_argument("--phases", default="attn,mats,fwd,tail,full")
    args = ap.parse_args()

    from cogview_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from cogview_tpu.config import cogview_base, cogview_tutorial, tiny_test
    from cogview_tpu.models import gpt
    from cogview_tpu.generation.sampling import apply_top_k
    from cogview_tpu.ops.hash_prng import hash_uniform

    cfg = {"tiny": lambda: tiny_test(compute_dtype=jnp.bfloat16),
           "tutorial": cogview_tutorial, "base": cogview_base}[args.preset]()
    cfg = cfg.replace(kv_cache_dtype=args.kv)
    B, K, idx = args.batch, args.k, args.index
    T = cfg.max_position_embeddings
    V = cfg.vocab_size
    N, D, H, L = cfg.num_heads, cfg.head_dim, cfg.hidden_size, cfg.num_layers
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if args.weights == "int8":
        params = jax.jit(gpt.quantize_weights, donate_argnums=0)(params)
    cache_cls = type(gpt.init_cache(
        cfg.replace(num_layers=1), 1, 128))  # class only; built inside jits

    rng = np.random.RandomState(0)
    base_logits = jnp.asarray(rng.randn(B, V).astype(np.float32))
    q0 = jnp.asarray(rng.randn(B, N, D).astype(np.float32), jnp.bfloat16)

    def timed(name, fn, *xs):
        out = fn(*xs)
        jax.tree.map(np.asarray, out)  # warm (compile + first exec)
        t0 = time.time()
        for _ in range(args.reps):
            out = fn(*xs)
        jax.tree.map(np.asarray, out)
        ms = (time.time() - t0) / args.reps / K * 1e3
        print(f"{name:6s} {ms:8.3f} ms/step", flush=True)
        return ms

    phases = set(args.phases.split(","))
    results = {}

    # ---- attn: L-layer scan of the fused kernel, K steps ----
    if "attn" in phases:
        from cogview_tpu.ops.decode_attention import (
            SEAL_GROUP, decode_attention_quant, decode_attention_quant4)
        dec = (decode_attention_quant4 if args.kv == "int4"
               else decode_attention_quant)
        g0 = idx % SEAL_GROUP

        @jax.jit
        def attn_loop(q):
            # cache created INSIDE the jit like the real sampler does
            # (_filling_sequence_jit): a donated 11.6GB input carried
            # through fori_loop hangs the tunneled runtime on first exec
            cache = gpt.init_cache(cfg, B, T)

            def step(t, st):
                q, (kv8, kvs, rec) = st

                def layer(carry, _):
                    q, kv8, kvs, rec, li = carry
                    # write the current column into its ring slot like
                    # gpt._layer_body does (q stands in for K and V)
                    cols = jnp.concatenate([q, q], axis=-1).astype(rec.dtype)
                    rec = lax.dynamic_update_slice(
                        rec, cols[None, None], (li, jnp.int32(g0), 0, 0, 0))
                    ctx, kv8, kvs = dec(q, rec, kv8, kvs, li, jnp.int32(idx))
                    return (ctx.astype(q.dtype), kv8, kvs, rec, li + 1), None

                (q, kv8, kvs, rec, _), _ = lax.scan(
                    layer, (q, kv8, kvs, rec, jnp.int32(0)), None, length=L)
                return q, cache_cls(kv8, kvs, rec)
            q, kv = lax.fori_loop(0, K, step, (q, cache))
            return jnp.sum(q.astype(jnp.float32))
        results["attn"] = timed("attn", attn_loop, q0)

    # ---- mats: layer matmuls with attention = identity, + logits ----
    if "mats" in phases:
        from cogview_tpu.models.gpt import _layer_body  # noqa: F401

        @jax.jit
        def mats_loop(prms, h0):
            cdt = cfg.compute_dtype
            eps = cfg.layernorm_epsilon
            from cogview_tpu.ops.layernorm import layer_norm
            from cogview_tpu.models.gpt import _wmul, _logits

            def step(t, h):
                def layer(hh, p):
                    ln1 = layer_norm(hh, p["ln_in"]["g"], p["ln_in"]["b"],
                                     eps, cfg.pb_relax)
                    qkv = (_wmul(ln1, p["qkv"], "bsh,hcj->bscj", cdt)
                           + p["qkv"]["b"].astype(jnp.float32)).astype(cdt)
                    ctx = qkv[:, :, 0]
                    ao = (_wmul(ctx, p["attn_out"], "bsh,hj->bsj", cdt)
                          + p["attn_out"]["b"].astype(jnp.float32)).astype(cdt)
                    if cfg.sandwich_ln:
                        ao = layer_norm(ao, p["ln_attn"]["g"],
                                        p["ln_attn"]["b"], eps, cfg.pb_relax)
                    hh = hh + ao
                    ln2 = layer_norm(hh, p["ln_post"]["g"], p["ln_post"]["b"],
                                     eps, cfg.pb_relax)
                    inter = (_wmul(ln2, p["mlp_in"], "bsh,hj->bsj", cdt)
                             + p["mlp_in"]["b"].astype(jnp.float32)).astype(cdt)
                    inter = jax.nn.gelu(inter, approximate=True)
                    mo = (_wmul(inter, p["mlp_out"], "bsj,jh->bsh", cdt)
                          + p["mlp_out"]["b"].astype(jnp.float32)).astype(cdt)
                    if cfg.sandwich_ln:
                        mo = layer_norm(mo, p["ln_mlp"]["g"], p["ln_mlp"]["b"],
                                        eps, cfg.pb_relax)
                    return hh + mo, None

                hh, _ = lax.scan(layer, h, prms["layers"])
                hh = layer_norm(hh, prms["ln_final"]["g"],
                                prms["ln_final"]["b"], eps, cfg.pb_relax)
                lg = _logits(prms, cfg, hh)
                # feed a reduction back so nothing dead-codes
                return h + (jnp.sum(lg) * 1e-30).astype(h.dtype)

            h = lax.fori_loop(0, K, step, h0)
            return jnp.sum(h.astype(jnp.float32))
        h0 = jnp.asarray(rng.randn(B, 1, H).astype(np.float32),
                         cfg.compute_dtype)
        results["mats"] = timed("mats", mats_loop, params, h0)

    # ---- fwd: the real model step ----
    if "fwd" in phases:
        from functools import partial

        @jax.jit
        def fwd_loop(prms, tok0):
            cache = gpt.init_cache(cfg, B, T)
            pos = jnp.full((B, 1), idx, jnp.int32)

            def step(t, st):
                tok, kv = st
                lg, kv = gpt.forward_with_cache(
                    prms, cfg, tok, pos, kv, jnp.int32(idx))
                nxt = jnp.argmax(lg[:, 0], -1).astype(jnp.int32)[:, None]
                return nxt, kv
            tok, kv = lax.fori_loop(0, K, step, (tok0, cache))
            return jnp.sum(tok)
        tok0 = jnp.zeros((B, 1), jnp.int32)
        results["fwd"] = timed("fwd", fwd_loop, params, tok0)

    # ---- fwdvar: fwd with the index ADVANCING each step (dynamic index
    # + a seal every G-th step), i.e. the real sampler's index pattern
    # centered on --index.  fwdvar - fwd isolates what a traced,
    # per-step-varying position costs beyond the fixed-index model step
    # (seal amortization + any dynamic-slice codegen penalty) ----
    if "fwdvar" in phases:
        i0 = idx - K // 2

        @jax.jit
        def fwdvar_loop(prms, tok0):
            cache = gpt.init_cache(cfg, B, T)

            def step(t, st):
                tok, kv = st
                ix = jnp.int32(i0) + t
                pos = jnp.full((B, 1), ix, jnp.int32)
                lg, kv = gpt.forward_with_cache(prms, cfg, tok, pos, kv, ix)
                nxt = jnp.argmax(lg[:, 0], -1).astype(jnp.int32)[:, None]
                return nxt, kv
            tok, kv = lax.fori_loop(0, K, step, (tok0, cache))
            return jnp.sum(tok)
        tok0 = jnp.zeros((B, 1), jnp.int32)
        results["fwdvar"] = timed("fwdvar", fwdvar_loop, params, tok0)

    # ---- tail: sampler math on [B, V] logits ----
    if "tail" in phases:
        @jax.jit
        def tail_loop(lg0):
            def step(t, acc):
                filtered = lg0 / 1.0 + acc * 1e-30
                filtered = apply_top_k(filtered, 200)
                rows = lax.broadcasted_iota(jnp.uint32, (B, V), 0)
                cols = lax.broadcasted_iota(jnp.uint32, (B, V), 1)
                u = hash_uniform(jnp.uint32(7), rows, cols,
                                 t.astype(jnp.uint32))
                gumbel = -jnp.log(-jnp.log(u))
                sampled = jnp.argmax(filtered + gumbel, -1).astype(jnp.int32)
                lp = jax.nn.log_softmax(filtered, -1)
                sc = jnp.take_along_axis(lp, sampled[:, None], -1)[:, 0]
                return acc + jnp.sum(sc)
            return lax.fori_loop(0, K, step, jnp.float32(0))
        results["tail"] = timed("tail", tail_loop, base_logits)

    # ---- tailreal: the REAL sampler step's tail, verbatim from
    # generation/sampling._filling_sequence_jit (mode-table gather +
    # vocab mask + top-k + hashed gumbel + log_softmax score + token DUS
    # + mode transition), on a carried [B, S] token array.  tailreal -
    # tail isolates the template/mode glue the plain tail omits ----
    if "tailreal" in phases:
        S = T + 65
        mask_table = jnp.asarray(
            rng.rand(3, V) > 0.1)  # [3, V] bool stand-in
        is_fixed0 = jnp.zeros((S,), jnp.bool_)
        boi = jnp.asarray([5, -1], jnp.int32)
        eoi = jnp.asarray([6, -1], jnp.int32)

        @jax.jit
        def tailreal_loop(lg0, toks0):
            def step(t, st):
                toks, mode, scores, acc = st
                fixed = is_fixed0[t]
                tpl_tok = toks[:, t]
                filtered = lg0 / 1.0 + acc * 1e-30
                allowed = mask_table[mode]
                filtered = jnp.where(allowed, filtered, -1e4)
                filtered = apply_top_k(filtered, 200)
                rows = lax.broadcasted_iota(jnp.uint32, (B, V), 0)
                cols = lax.broadcasted_iota(jnp.uint32, (B, V), 1)
                u = hash_uniform(jnp.uint32(7), rows, cols,
                                 t.astype(jnp.uint32))
                gumbel = -jnp.log(-jnp.log(u))
                sampled = jnp.argmax(filtered + gumbel, -1).astype(jnp.int32)
                lp = jax.nn.log_softmax(filtered, -1)
                sc = jnp.take_along_axis(lp, sampled[:, None], -1)[:, 0]
                tok_t = jnp.where(fixed, tpl_tok, sampled).astype(jnp.int32)
                scores = scores + jnp.where(fixed, 0.0, sc)
                toks = lax.dynamic_update_slice(toks, tok_t[:, None], (0, t))
                is_boi = jnp.any(tok_t[:, None] == boi[None, :], axis=-1)
                is_eoi = jnp.any(tok_t[:, None] == eoi[None, :], axis=-1)
                mode = jnp.where(is_boi, 1,
                                 jnp.where(is_eoi, 0, mode)).astype(jnp.int32)
                return toks, mode, scores, acc + jnp.sum(sc)
            st = (toks0, jnp.ones((B,), jnp.int32), jnp.zeros((B,)),
                  jnp.float32(0))
            return lax.fori_loop(0, K, step, st)[3]
        toks0 = jnp.zeros((B, S), jnp.int32)
        results["tailreal"] = timed("tailreal", tailreal_loop,
                                    base_logits, toks0)

    # ---- full: fwd + tail ----
    if "full" in phases:
        from functools import partial

        @jax.jit
        def full_loop(prms, tok0):
            cache = gpt.init_cache(cfg, B, T)
            pos = jnp.full((B, 1), idx, jnp.int32)

            def step(t, st):
                tok, kv, acc = st
                lg, kv = gpt.forward_with_cache(
                    prms, cfg, tok, pos, kv, jnp.int32(idx))
                filtered = lg[:, 0]
                filtered = apply_top_k(filtered, 200)
                rows = lax.broadcasted_iota(jnp.uint32, (B, V), 0)
                cols = lax.broadcasted_iota(jnp.uint32, (B, V), 1)
                u = hash_uniform(jnp.uint32(7), rows, cols,
                                 t.astype(jnp.uint32))
                gumbel = -jnp.log(-jnp.log(u))
                sampled = jnp.argmax(filtered + gumbel, -1).astype(jnp.int32)
                lp = jax.nn.log_softmax(filtered, -1)
                sc = jnp.take_along_axis(lp, sampled[:, None], -1)[:, 0]
                return sampled[:, None], kv, acc + jnp.sum(sc)
            tok, kv, acc = lax.fori_loop(0, K, step, (tok0, cache,
                                                      jnp.float32(0)))
            return acc
        tok0 = jnp.zeros((B, 1), jnp.int32)
        results["full"] = timed("full", full_loop, params, tok0)

    if {"attn", "mats", "fwd"} <= results.keys():
        print(f"fwd - (attn+mats) = "
              f"{results['fwd'] - results['attn'] - results['mats']:+.3f} "
              f"ms/step (scheduling/fusion gap)")
    if {"fwd", "tail", "full"} <= results.keys():
        print(f"full - (fwd+tail) = "
              f"{results['full'] - results['fwd'] - results['tail']:+.3f} "
              f"ms/step")


if __name__ == "__main__":
    main()
