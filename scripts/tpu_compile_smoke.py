"""Real-TPU compile gate: ``.lower().compile()`` every production program
at its real shapes WITHOUT executing anything.

WHY THIS EXISTS (VERDICT r4 item 2): CPU interpret-mode tests structurally
cannot catch Mosaic tiling/alignment constraints — r4 shipped a 392-line
decode-kernel rewrite whose ring buffer was lane-misaligned, every CPU test
passed, and the committed tree failed to compile on the TPU
(BENCH_r04.json rc=1: "Slice shape along dimension 5 must be aligned to
tiling (128), but is 64").  This script is the hardware gate that makes
that class of failure impossible to ship:

    MANDATORY after ANY kernel / cache-layout / model-structure change,
    and ALWAYS before a round's final commit:

        python scripts/tpu_compile_smoke.py              # all targets
        python scripts/tpu_compile_smoke.py --only decode_int8_b40,train

Params are jax.eval_shape structs — nothing is initialized or transferred,
no device memory is held, and compilation (where Mosaic runs) still happens
for real on the TPU backend.  Each target prints PASS + seconds or the
exception; exit code is the number of failures.  A persistent-compile-cache
hit still counts: the cache key covers the exact program, so a hit proves
this program compiled on this backend before.

Runtime: ~1-4 min total warm, longer on a cold cache.
"""

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _decode_args(cfg, batch, weights, n_gen=1024, n_fixed_img=0):
    """Abstract-params argument tuple for _filling_sequence_jit.lower()."""
    import jax
    import jax.numpy as jnp

    from cogview_tpu.generation import sampling as S
    from cogview_tpu.generation.sampling import SamplingParams, compile_template
    from cogview_tpu.models import gpt
    from cogview_tpu.utils.rng import rbg_key

    IMG, TXT = 8192, 50000
    CMD = {n: IMG + TXT + i for i, n in enumerate(
        ["[PAD]", "[BOI1]", "[BOI2]", "[BOI3]", "[EOI1]", "[EOI2]", "[EOI3]",
         "[ROI1]", "[ROI2]", "[ROI3]", "[SEP]", "[MASK]", "[CLS]", "[ENC]",
         "[TINY]", "[SMALL]", "[BASE]", "[BIG]"]
        + [f"[POS{i}]" for i in range(9)])}

    class _Tok:
        class _N:
            num_tokens = IMG

        class _T:
            num_tokens = TXT

        img_tokenizer = _N()
        txt_tokenizer = _T()

        def __getitem__(self, k):
            return CMD[k]

    seq = ([CMD["[ROI1]"]] + list(range(IMG + 100, IMG + 130))
           + [CMD["[BASE]"], CMD["[BOI1]"]]
           + list(range(n_fixed_img)) + [-1] * n_gen)
    tpl = compile_template(seq, _Tok(), padded_vocab=cfg.vocab_size)

    p_s = jax.eval_shape(
        lambda k: gpt.init_params(k, cfg, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    if weights == "int8":
        p_s = jax.eval_shape(gpt.quantize_weights, p_s)
    rng_s = jax.eval_shape(rbg_key, 0)
    return S._filling_sequence_jit, S._fill_call_args(
        p_s, cfg, tpl, batch, SamplingParams(temperature=1.0, top_k=200,
                                             seed=0), rng_s)


def t_decode(kv, batch, weights="int8", max_pos=1089):
    import jax.numpy as jnp  # noqa: F401

    from cogview_tpu.config import cogview_base

    cfg = cogview_base().replace(kv_cache_dtype=kv)
    n_fixed = 0
    n_gen = 1024
    if max_pos != 1089:  # the SR/magnify window shape (1345 positions)
        cfg = cfg.replace(max_position_embeddings=max_pos)
        n_fixed = max_pos - 1057  # template fills the window exactly
    fn, args = _decode_args(cfg, batch, weights, n_gen, n_fixed)
    fn.lower(*args).compile()


def t_train(seq=1089, sparse=False, flash=None):
    import jax
    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from cogview_tpu.config import cogview_tutorial
    from cogview_tpu.models import gpt
    from cogview_tpu.training.optim import make_optimizer
    from cogview_tpu.training.train_loop import init_train_state, make_train_step

    cfg = cogview_tutorial()
    if seq != 1089:
        cfg = cfg.replace(max_position_embeddings=seq)
    if sparse:
        cfg = cfg.replace(query_window=64, key_window_times=4, num_pivot=256)
    if flash is not None:
        cfg = cfg.replace(use_flash_attention=flash)
    batch = 16
    p_s = jax.eval_shape(lambda k: gpt.init_params(k, cfg),
                         jax.random.PRNGKey(0))
    tx, _ = make_optimizer(p_s, lr=1e-4, warmup_iter=10, num_iters=1000)
    state_s = jax.eval_shape(lambda p: init_train_state(p, tx), p_s)
    step = make_train_step(cfg, tx, txt_loss_scale=5.0, remat="dots",
                           is_sparse=sparse)
    b_s = {
        "text": jax.ShapeDtypeStruct((batch, seq), np.int32),
        "loss_mask": jax.ShapeDtypeStruct((batch, seq), np.float32),
    }
    k_s = jax.eval_shape(jax.random.PRNGKey, 0)
    step.lower(state_s, b_s, k_s).compile()


def t_score():
    import jax
    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from cogview_tpu.config import cogview_base
    from cogview_tpu.generation.scoring import inverse_prompt_score
    from cogview_tpu.models import gpt

    cfg = cogview_base()
    p_s = jax.eval_shape(
        lambda k: gpt.init_params(k, cfg, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    tok_s = jax.ShapeDtypeStruct((8, 1048), np.int32)
    inverse_prompt_score.lower(p_s, cfg, tok_s).compile()


def t_vq():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cogview_tpu.models import vqvae

    p_s = jax.eval_shape(vqvae.init_params, jax.random.PRNGKey(0))
    im_s = jax.ShapeDtypeStruct((32, 256, 256, 3), np.float32)
    rt = jax.jit(lambda p, im: vqvae.code2img(
        p, vqvae.img2code(p, im), dtype=jnp.bfloat16))
    rt.lower(p_s, im_s).compile()


TARGETS = {
    # (builder, kwargs) — bench.py's production configs, cross-checked
    # against its default-batch table
    "decode_int8_b40": (t_decode, dict(kv="int8", batch=40)),
    "decode_int8_b8": (t_decode, dict(kv="int8", batch=8)),
    "decode_int4_b64": (t_decode, dict(kv="int4", batch=64)),
    "decode_bf16_b8": (t_decode, dict(kv="bfloat16", batch=8)),
    "decode_bf16w_b24": (t_decode, dict(kv="int8", batch=24,
                                        weights="bfloat16")),
    "sr_int8_b16": (t_decode, dict(kv="int8", batch=16, max_pos=1345)),
    "train": (t_train, {}),
    "train_sparse": (t_train, dict(sparse=True)),
    "score": (t_score, {}),
    "vq": (t_vq, {}),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated target names (default: all)")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()
    if args.list:
        print("\n".join(TARGETS))
        return 0

    from cogview_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    import jax

    names = list(TARGETS) if not args.only else args.only.split(",")
    unknown = [n for n in names if n not in TARGETS]
    if unknown:
        raise SystemExit(f"unknown targets {unknown}; --list to see all")
    dev = jax.devices()[0]
    print(f"compile-smoke on {dev} ({dev.platform})", flush=True)
    if dev.platform == "cpu":
        print("WARNING: CPU backend — Mosaic TPU constraints are NOT "
              "checked here; run on the real chip.", flush=True)
    failures = 0
    for name in names:
        fn, kw = TARGETS[name]
        t0 = time.time()
        try:
            fn(**kw)
            print(f"PASS {name:18s} {time.time() - t0:6.1f}s", flush=True)
        except Exception:
            failures += 1
            print(f"FAIL {name:18s} {time.time() - t0:6.1f}s", flush=True)
            traceback.print_exc()
    return failures


if __name__ == "__main__":
    sys.exit(main())
