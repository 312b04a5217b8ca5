"""Phase-resolved train-step cost (tutorial 12L/1024H, S=1089): where does
each ms/step go?  Mirrors scripts/decode_phase_microbench.py — K steps of
each PHASE inside one jit (lax.fori_loop) so the ~50ms tunnel dispatch
amortizes to noise.

  fwd    lm_loss forward only (embed + 12 layers + final LN + CE)
  grad   value_and_grad of lm_loss (fwd + bwd, no optimizer)
  full   grad + adamw update + NaN-skip select (the real train step math)
  ce     final-LN-hidden -> CE slice alone, fwd+bwd wrt (embedding, h):
         the [B,S,V] vocab projection + fp32 softmax-CE round trip
  attn   flash-attention kernel alone, fwd+bwd at (B, N, S, D)
  opt    adamw update + apply alone on fixed grads (pure param/m/v stream)

Derived lines: bwd = grad - fwd; optimizer-in-situ = full - grad;
transformer-matmuls fwd = fwd - ce - attn.

Reference cost model being decomposed: the pretrain hot loop,
/root/reference/pretrain_gpt2.py:406-448 (fwd/bwd/optimizer around a
Megatron transformer).

Usage: python scripts/train_phase_microbench.py [--batch 16] [--k 8]
       [--phases fwd,grad,full,ce,attn,opt]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--k", type=int, default=8, help="steps per jit call")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--seq", type=int, default=1089)
    ap.add_argument("--preset", default="tutorial",
                    choices=["tiny", "tutorial", "base"])
    ap.add_argument("--remat", default="dots", choices=["0", "1", "dots"])
    ap.add_argument("--no-dropout", action="store_true",
                    help="zero all three dropout rates (isolates the "
                    "counter-hash VPU cost, paid fwd AND in remat replay)")
    ap.add_argument("--phases", default="fwd,grad,full,ce,attn,opt,situ")
    args = ap.parse_args()

    from cogview_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from cogview_tpu.config import cogview_base, cogview_tutorial, tiny_test
    from cogview_tpu.models import gpt
    from cogview_tpu.training.losses import (
        cross_entropy_hidden, lm_loss, _split_ce)
    from cogview_tpu.training.optim import make_optimizer
    from cogview_tpu.utils.rng import rbg_key

    cfg = {"tiny": lambda: tiny_test(compute_dtype=jnp.bfloat16),
           "tutorial": cogview_tutorial, "base": cogview_base}[args.preset]()
    if args.no_dropout:
        cfg = cfg.replace(embedding_dropout=0.0, attention_dropout=0.0,
                          output_dropout=0.0)
    B, K, S = args.batch, args.k, args.seq
    if S != 1089:
        cfg = cfg.replace(max_position_embeddings=S)
    remat = {"0": False, "1": True, "dots": "dots"}[args.remat]
    N, D, H, V = cfg.num_heads, cfg.head_dim, cfg.hidden_size, cfg.vocab_size
    toks = S - 1

    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(params, lr=1e-4, warmup_iter=10, num_iters=1000)
    rng0 = rbg_key(0)
    rng = np.random.RandomState(0)
    batch = {
        "text": jnp.asarray(
            rng.randint(0, 58000, size=(B, S)).astype(np.int32)),
        "loss_mask": jnp.ones((B, S), jnp.float32),
    }

    def loss_fn(p, b, r):
        return lm_loss(p, cfg, b, txt_loss_scale=5.0, rng=r, train=True,
                       remat=remat)

    def timed(name, fn, *xs):
        out = fn(*xs)
        jax.tree.map(np.asarray, out)  # warm (compile + first exec)
        t0 = time.time()
        for _ in range(args.reps):
            out = fn(*xs)
        jax.tree.map(np.asarray, out)
        ms = (time.time() - t0) / args.reps / K * 1e3
        tps = B * toks / (ms / 1e3)
        print(f"{name:5s} {ms:8.1f} ms/step  ({tps/1e3:6.1f}k tok/s-equiv)",
              flush=True)
        return ms

    phases = set(args.phases.split(","))
    results = {}

    def perturb(b, acc):
        # data-depend the batch on the carry: without this XLA's
        # loop-invariant code motion hoists the WHOLE loss/grad out of
        # the K-loop and the phase reads K-fold too fast (r5: 'grad'
        # printed 46.8 ms/step while the true cost was ~375)
        return dict(b, loss_mask=b["loss_mask"] + acc * 1e-30)

    if "fwd" in phases:
        @jax.jit
        def fwd_loop(p, b):
            def step(i, acc):
                loss, _ = loss_fn(p, perturb(b, acc), rng0)
                return acc + loss
            return lax.fori_loop(0, K, step, jnp.float32(0))
        results["fwd"] = timed("fwd", fwd_loop, params, batch)

    if "grad" in phases:
        @jax.jit
        def grad_loop(p, b):
            def step(i, acc):
                (loss, _), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(p, perturb(b, acc), rng0)
                # global_norm touches every grad leaf — nothing dead-codes
                import optax
                return acc + loss + optax.global_norm(g)
            return lax.fori_loop(0, K, step, jnp.float32(0))
        results["grad"] = timed("grad", grad_loop, params, batch)

    if "full" in phases:
        import optax

        @jax.jit
        def full_loop(p, b):
            opt0 = tx.init(p)

            def step(i, carry):
                p, opt = carry
                (loss, _), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(p, b, rng0)
                gnorm = optax.global_norm(g)
                finite = jnp.isfinite(loss) & jnp.isfinite(gnorm)
                upd, new_opt = tx.update(g, opt, p)
                new_p = optax.apply_updates(p, upd)
                sel = lambda n, o: jax.tree.map(
                    lambda a, c: jnp.where(finite, a, c), n, o)
                return sel(new_p, p), sel(new_opt, opt)
            p, _ = lax.fori_loop(0, K, step, (p, opt0))
            return jnp.float32(0) + jax.tree.leaves(p)[0].astype(
                jnp.float32).sum() * 1e-30
        results["full"] = timed("full", full_loop, params, batch)

    if "ce" in phases:
        # the CE slice: hidden -> vocab matmul -> fp32 CE, fwd + bwd wrt
        # BOTH the embedding params and h (quadratic-ish masked-mean loss,
        # so dO != 1 and nothing elides)
        h0 = jnp.asarray(rng.randn(B, toks, H).astype(np.float32),
                         cfg.compute_dtype)
        labels = batch["text"][:, 1:]
        lmask = batch["loss_mask"][:, 1:]
        img_ind = batch["text"][:, :-1] < 8192
        txt_ind = (~img_ind) & (lmask > 0)

        def ce_fn(p, h):
            ce = cross_entropy_hidden(p, h, labels,
                                      chunk_target=cfg.ce_chunk_target)
            loss, _ = _split_ce(ce, lmask, img_ind, txt_ind, 5.0)
            return loss

        @jax.jit
        def ce_loop(p, h):
            def step(i, acc):
                loss, (gp, gh) = jax.value_and_grad(ce_fn, argnums=(0, 1))(
                    p, h + (acc * 1e-30).astype(h.dtype))
                return (acc + loss
                        + jax.tree.leaves(gp)[0].astype(jnp.float32).sum()
                        * 1e-30 + gh.astype(jnp.float32).sum() * 1e-30)
            return lax.fori_loop(0, K, step, jnp.float32(0))
        results["ce"] = timed("ce", ce_loop, params, h0)

    if "embed" in phases:
        # token-embedding gather fwd + its transpose (scatter-add into the
        # [V, H] table) in bwd — XLA:TPU lowers the transpose of a big
        # gather to a serialized scatter, a classic hidden train cost
        tokens0 = batch["text"][:, :-1]

        def embed_fn(w, cot):
            h = jnp.take(w, tokens0, axis=0).astype(cfg.compute_dtype)
            return jnp.sum(h.astype(jnp.float32) * cot)

        cot0 = jnp.asarray(rng.randn(B, toks, H).astype(np.float32))

        @jax.jit
        def embed_loop(w, cot):
            def step(i, acc):
                loss, gw = jax.value_and_grad(embed_fn)(
                    w, cot + acc * 1e-30)
                return acc + loss * 1e-30 + jnp.sum(
                    gw.astype(jnp.float32)) * 1e-30
            return lax.fori_loop(0, K, step, jnp.float32(0))
        results["embed"] = timed("embed", embed_loop,
                                 params["embed"]["word"], cot0)

    if "attn" in phases:
        from cogview_tpu.models.gpt import should_use_flash
        if should_use_flash(cfg, toks):
            from cogview_tpu.ops.flash_attention import flash_attention
            q0 = jnp.asarray(rng.randn(B, toks, N, D).astype(np.float32),
                             cfg.compute_dtype)

            def attn_fn(q, k, v):
                o = flash_attention(q, k, v)  # causal(+sep=0) mask built in
                return jnp.sum(o.astype(jnp.float32) ** 2)

            @jax.jit
            def attn_loop(q, k, v):
                def step(i, acc):
                    loss, (gq, gk, gv) = jax.value_and_grad(
                        attn_fn, argnums=(0, 1, 2))(
                            q + (acc * 1e-30).astype(q.dtype), k, v)
                    return (acc + loss * 1e-30
                            + gq.astype(jnp.float32).sum() * 1e-30)
                # x12 layers worth of attention per "step"
                return lax.fori_loop(0, K * cfg.num_layers, step,
                                     jnp.float32(0))
            ms = timed("attn", attn_loop, q0, q0, q0)
            results["attn"] = ms
        else:
            print("attn   (flash not eligible at this seq — skipped)")

    def _checksum(*trees):
        # touch EVERY leaf: returning one leaf lets XLA dead-code every
        # other leaf's update (r5: 'opt' printed 1.2 ms/step that way —
        # one leaf's worth; the honest number is ~8x more)
        return sum(jnp.sum(x.astype(jnp.float32)) * 1e-30
                   for t in trees for x in jax.tree.leaves(t)
                   if jnp.issubdtype(x.dtype, jnp.floating))

    if "opt" in phases:
        import optax
        grads0 = jax.tree.map(lambda x: (x * 1e-3).astype(x.dtype), params)

        @jax.jit
        def opt_loop(p, g):
            opt0 = tx.init(p)

            def step(i, carry):
                p, opt = carry
                upd, opt = tx.update(g, opt, p)
                return optax.apply_updates(p, upd), opt
            p, opt = lax.fori_loop(0, K, step, (p, opt0))
            return _checksum(p, opt)
        results["opt"] = timed("opt", opt_loop, params, grads0)

    if "situ" in phases:
        # the real step's _apply composition (global_norm + finite +
        # tx.update + apply_updates + the two NaN-skip selects) on
        # carry-perturbed grads: 'situ' ~ 'full' - 'grad' without the
        # grad computation in the program
        import optax
        grads0 = jax.tree.map(lambda x: (x * 1e-3).astype(x.dtype), params)

        @jax.jit
        def situ_loop(p, g0):
            opt0 = tx.init(p)

            def step(i, carry):
                p, opt = carry
                g = jax.tree.map(
                    lambda x: x + jnp.float32(i).astype(x.dtype) * 1e-30, g0)
                gnorm = optax.global_norm(g)
                finite = jnp.isfinite(gnorm)
                upd, new_opt = tx.update(g, opt, p)
                new_p = optax.apply_updates(p, upd)
                sel = lambda n, o: jax.tree.map(
                    lambda a, c: jnp.where(finite, a, c), n, o)
                return sel(new_p, p), sel(new_opt, opt)
            p, opt = lax.fori_loop(0, K, step, (p, opt0))
            return _checksum(p, opt)
        results["situ"] = timed("situ", situ_loop, params, grads0)

    if {"fwd", "grad"} <= results.keys():
        print(f"bwd = grad - fwd            = "
              f"{results['grad'] - results['fwd']:8.1f} ms/step")
    if {"grad", "full"} <= results.keys():
        print(f"optimizer-in-situ = full-grad = "
              f"{results['full'] - results['grad']:8.1f} ms/step")
    if {"fwd", "ce", "attn"} <= results.keys():
        print(f"transformer fwd = fwd-ce-attn ~ "
              f"{results['fwd'] - results['ce'] - results['attn']:8.1f}"
              f" ms/step (attn line already x{12} layers)")


if __name__ == "__main__":
    main()
