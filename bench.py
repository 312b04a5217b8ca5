"""Headline benchmark: images/sec/chip for 256x256 text2image.

One image = a 1024-token autoregressive decode of the flagship model
(cogview-base scale: 48L x 2560H x 40 heads, vocab 58240, seq 1089) through
the jitted KV-cached template sampler.  Default config: batch 40, int8 KV
cache (fused Pallas decode kernel, ops/decode_attention.py) AND int8
weight-only quantization (gpt.quantize_weights: per-output-channel scales,
exact-on-output dequant); the reference script uses batch 4
(scripts/text2image.sh:46-48).  Weights are random bf16 before
quantization — throughput is weight-value-independent.

Roofline (v5e: 16GB HBM, ~750GB/s measured streaming BW): every decode step
streams the weights (7.86GB bf16 / 4.1GB int8+scales) plus each image's
LIVE int8 KV cache windows — the r3 kernel streams only the
ceil((index+1)/128) live 128-token windows of the window-blocked cache
(avg 5.5/9 over a 1089-slot decode), not the full padded Tp: per image
268MB*5.5/9 + 34MB*5.5/9 scales ~= 185MB, ~0.25ms/image average.
Measured (r3, reps=3 full sampler, live-window kernel):
  int8 weights: B40 = 1.670 img/s (23.4ms/step avg)
  int4 KV (live-window flat-loop kernel, int8 weights): B64 = 2.220 img/s
  [r2 full-Tp kernels for comparison: int8 B40 = 1.491 (25.8ms flat),
   int4 B64 = 1.81]
  bf16 weights: B24 = 0.980 img/s (r2; B32 OOMs: 7.9+9.0GB)
The weight stream runs ~650GB/s of s8 — XLA fuses the s8->bf16 convert
into the dot.  COGVIEW_BENCH_WEIGHTS=bfloat16 reverts to exact weights.
COGVIEW_BENCH_KV=int4 (packed-nibble cache, ops/decode_attention.py):
kept OPT-IN on quality grounds (absmax/7 4-bit KV; quantified by
scripts/kv_quality_check.py — see README "KV cache quality").
History: r1 (bf16 cache, XLA attention) batch 8 = 0.30 img/s; r2 int8-KV
fused kernel batch 40 = 1.49; r3 live-window streaming = 1.67.

Baselines for vs_baseline (r3: ALL modes carry the same convention — an
analytic OPTIMISTIC CEILING for the reference at 100% of V100 peak, so
every ratio is a LOWER bound on the real advantage; r1/r2 vs_baseline
values used looser estimates and are not comparable):

The reference decodes with NO KV cache: each step feeds only the new
token but re-projects QKV over cat(mems, hidden) — the WHOLE prefix —
through the fused [H, 3H] weight (mpu/sparse_transformer.py:136-137);
the other layer matmuls touch new tokens only.  Per-token FLOPs at
prefix t: 2P (new token through all P=4.06e9 params) + 2*(3*H^2*L)*t
(QKV re-projection, 3*2560^2*48 = 9.4e8 params) + 4*H*L*t attention
(4*2560*48 = 4.9e5, negligible).  One image (t = 65..1088):
1024*8.1e9 + 1.89e9 * sum(t) [sum = 5.90e5] ~= 1.12e15 FLOPs.  At 100%
of the V100's 112 TFLOP/s fp16 peak that is 10.0 s/image -> 0.1 img/s
CEILING (the fp16 batch-4 weight stream, 8.1GB/900GB/s/4img*1024 steps
= 2.3 s/img, is below the FLOP bound, so compute governs).  r1/r2 used
0.025 img/s, which read the recompute as full-model-over-prefix; the
qkv-only reading above is what the reference code actually does, and is
4x *less* favorable to us.  BASELINE.json's >=10x target corresponds to
vs_baseline >= 10 under this ceiling.

Env overrides: COGVIEW_BENCH_PRESET=tiny|tutorial|base (default base on
accelerators, tiny on cpu), COGVIEW_BENCH_BATCH, COGVIEW_BENCH_REPS,
COGVIEW_BENCH_KV=int8|int4|bfloat16, COGVIEW_BENCH_WEIGHTS=int8|bfloat16,
COGVIEW_BENCH_REMAT=dots|1|0 + COGVIEW_BENCH_SPARSE=1 +
COGVIEW_BENCH_SEQ=N (train mode), COGVIEW_BENCH_VQ_ENCODE/DECODE (vq
mode), and COGVIEW_BENCH_MODE selecting the BASELINE.md config:

  decode (default)  256x256 text2image AR decode       [config 2]
  vq                VQ-VAE encode+decode roundtrip      [config 1]
  score             post-selection scoring, 8 cands    [config 3]
  sr                sliding-window magnify 256->512     [config 4]
  train             pretrain fwd/bwd step                [config 5]
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from cogview_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

# Optimistic V100 ceilings per mode — every denominator is DERIVED, not
# guessed; full derivations in the module docstring (decode) and at each
# bench_* site.  All assume 100% of V100 peak (112 TFLOP/s fp16 /
# 15.7 TFLOP/s fp32), so vs_baseline is a LOWER bound on the advantage.
V100_BASELINE_IMAGES_PER_SEC = 0.1  # decode; derivation in docstring

# unified vocab layout constants (no tokenizer files needed for the bench)
IMG_VOCAB = 8192
TXT_VOCAB = 50000
CMD = {name: IMG_VOCAB + TXT_VOCAB + i for i, name in enumerate(
    ["[PAD]", "[BOI1]", "[BOI2]", "[BOI3]", "[EOI1]", "[EOI2]", "[EOI3]",
     "[ROI1]", "[ROI2]", "[ROI3]", "[SEP]", "[MASK]", "[CLS]", "[ENC]",
     "[TINY]", "[SMALL]", "[BASE]", "[BIG]"] + [f"[POS{i}]" for i in range(9)]
)}


class _LayoutTokenizer:
    """Minimal UnifiedTokenizer protocol for template compilation."""

    class _N:  # noqa: D401
        num_tokens = IMG_VOCAB

    class _T:
        num_tokens = TXT_VOCAB

    img_tokenizer = _N()
    txt_tokenizer = _T()

    def __getitem__(self, k):
        return CMD[k]


def pick_cfg():
    from cogview_tpu.config import cogview_base, cogview_tutorial, smoke

    preset = os.environ.get("COGVIEW_BENCH_PRESET")
    if preset is None:
        preset = "base" if jax.devices()[0].platform != "cpu" else "tiny"
    return {
        "base": cogview_base,
        "tutorial": cogview_tutorial,
        "tiny": smoke,
    }[preset](), preset


def bench_vq(reps, batch):
    import time as _t

    from cogview_tpu.models import vqvae

    params = vqvae.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(batch, 256, 256, 3).astype(np.float32))
    # encode = fp32 HIGHEST (the bit-parity tokenization path; bf16 encode
    # exists for self-consistent corpora, img2code docstring).  decode =
    # bf16 by default: the decoder is COMPUTE-bound (~170 GFLOP/img at
    # 512ch 256x256) and its bf16 error (<1.5e-2, tested) vanishes in
    # 8-bit pixels.  Measured b32 device-resident roundtrips/s on v5e
    # (r5 chained harness): fp32/bf16 266; phase split (scripts/
    # vq_phase_microbench.py): enc32 1.52 ms/img, argmin 0.18,
    # dec16 2.12 (the sub-pixel ConvT lowering; the naive
    # lax.conv_transpose path was 12x slower).
    edt = os.environ.get("COGVIEW_BENCH_VQ_ENCODE", "float32")
    ddt = os.environ.get("COGVIEW_BENCH_VQ_DECODE", "bfloat16")
    for name, val in [("COGVIEW_BENCH_VQ_ENCODE", edt),
                      ("COGVIEW_BENCH_VQ_DECODE", ddt)]:
        if val not in ("float32", "bfloat16"):
            raise SystemExit(f"{name}={val!r}: use float32|bfloat16")
    enc_f = functools.partial(
        vqvae.img2code, dtype=jnp.bfloat16 if edt == "bfloat16" else None)
    dec_f = functools.partial(
        vqvae.code2img, dtype=jnp.bfloat16 if ddt == "bfloat16" else None)
    # K roundtrips chained inside ONE jit, scalar out: this runtime's
    # tunnel pays ~50 ms dispatch per call and fetches outputs at
    # ~50 MB/s (measurement-hygiene notes), so per-call dispatch of a
    # 25MB-returning roundtrip measures the HTTP relay, not the chip
    # (48 img/s dispatched vs 266 device-resident, r5).  Production TPU
    # hosts fetch over PCIe at GB/s; device-resident throughput is the
    # honest cross-hardware number (the reference baseline is likewise
    # pure GPU compute).  Each iteration data-depends on the previous
    # scalar so XLA cannot hoist or elide the chain.
    K = int(os.environ.get("COGVIEW_BENCH_VQ_CHAIN", "8"))

    @jax.jit
    def roundtrips(p, im):
        def step(i, acc):
            out = dec_f(p, enc_f(p, im + acc * 1e-30))
            return acc * 1e-30 + jnp.sum(out)
        return jax.lax.fori_loop(0, K, step, jnp.float32(0))

    np.asarray(roundtrips(params, imgs))  # compile + first exec
    t0 = _t.time()
    for _ in range(reps):
        out = roundtrips(params, imgs)
    np.asarray(out)
    dt = _t.time() - t0
    ips = reps * K * batch / dt
    # V100 ceiling: the reference keeps the VQ-VAE fp32 (the tokenizer
    # loads it without .half(), data_utils/vqvae_tokenizer.py:38-49).
    # Roundtrip FLOPs per 256x256 image: encoder 3 stride-2 convs + proj
    # (2*HW*Cout*Cin*k^2: 0.4 + 17.2 + 8.6 + ~0.5 GFLOP ~= 27G), codebook
    # distance 1024*8192*256*2 = 4.3G, decoder ~170G (512-ch ConvT stack,
    # derivation in models/vqvae.py decode docstring) -> ~200 GFLOP.  At
    # 100% of V100 fp32 peak (15.7 TFLOP/s): 12.8 ms -> 78 img/s CEILING
    # (real cuDNN conv efficiency ~50-60% puts the reference nearer 40).
    return {
        "metric": "VQ-VAE 256x256 encode+decode roundtrips/sec",
        "value": round(ips, 2), "unit": "images/sec",
        "vs_baseline": round(ips / 78.0, 2),
        "extra": {"batch": batch, "reps": reps, "chain": K,
                  "encode_dtype": edt, "decode_dtype": ddt},
    }


def bench_score(cfg, reps, n_cands=8):
    import time as _t

    from cogview_tpu.generation.scoring import inverse_prompt_score
    from cogview_tpu.models import gpt

    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    S = 1028 + 20
    tokens = rng.randint(0, 58000, size=(n_cands, S)).astype(np.int32)
    tokens[:, 1027] = CMD["[ROI1]"]
    np.asarray(inverse_prompt_score(params, cfg, jnp.asarray(tokens)))
    t0 = _t.time()
    for _ in range(reps):
        out = inverse_prompt_score(params, cfg, jnp.asarray(tokens))
    np.asarray(out)
    dt = _t.time() - t0
    qps = reps / dt
    # V100 ceiling: one query = ONE batched full forward of 8 candidates
    # at S=1048 (inverse_prompt_score, generation/sampling.py:214-230 —
    # no decode loop).  FLOPs/candidate = 2*P*S (P=4.06e9: 8.5e12) +
    # attention 4*H*L*S^2 (4*2560*48*1048^2 = 5.4e11) ~= 9.0e12; x8 =
    # 7.2e13/query.  At 100% of 112 TFLOP/s fp16: 0.64 s -> 1.56
    # queries/s CEILING (at Megatron-LM's measured ~30% sustained V100
    # efficiency, arXiv:1909.08053, the reference lands near 0.5 q/s).
    return {
        "metric": f"post-selection rerank ({n_cands} candidates)/sec",
        "value": round(qps, 3), "unit": "queries/sec",
        "vs_baseline": round(qps / 1.56, 2),
        "extra": {"candidates": n_cands, "reps": reps,
                  "seconds_per_query": round(1.0 / qps, 3)},
    }


def bench_sr(cfg, reps, batch=4):
    import time as _t

    from cogview_tpu.generation.magnify import magnify
    from cogview_tpu.generation.sampling import SamplingParams
    from cogview_tpu.models import gpt

    cfg = cfg.replace(
        max_position_embeddings=1345,
        kv_cache_dtype=os.environ.get("COGVIEW_BENCH_KV", "int8"),
    )
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if os.environ.get("COGVIEW_BENCH_WEIGHTS", "int8") == "int8":
        # the 9 window decodes run at small batch -> weight-stream bound;
        # int8 weights halve the dominant HBM term (see decode docstring)
        params = jax.jit(gpt.quantize_weights, donate_argnums=0)(params)
    rng = np.random.RandomState(0)
    codes = rng.randint(0, IMG_VOCAB, (batch, 1024))
    text = [CMD["[ROI1]"]] + list(range(IMG_VOCAB + 100, IMG_VOCAB + 110)) + [CMD["[BASE]"], CMD["[BOI1]"]]
    # warmup/compile (windows share one compiled shape)
    magnify(params, cfg, _LayoutTokenizer(), codes, text, SamplingParams(seed=0))
    t0 = _t.time()
    for i in range(reps):
        out = magnify(params, cfg, _LayoutTokenizer(), codes, text,
                      SamplingParams(seed=i + 1))
    dt = _t.time() - t0
    ips = reps * batch / dt
    # V100 ceiling: magnify = 9 sequential windowed decodes per image
    # (generation/magnify.py:32-42), generating 32*line cells per window
    # (lines 18,30,30,30,30,30,30,30,32 -> ~8300 generated tokens incl.
    # overlap regions) with the reference's qkv-over-prefix recompute at
    # seq<=1345 (see module docstring).  F ~= 8300 * (2P + 2*9.4e8*t_avg)
    # with t_avg ~= 830 -> ~1.3e16 FLOPs/image.  At 100% of 112 TFLOP/s:
    # 117 s/img -> 0.0085 img/s CEILING — which is also what readme.md:59
    # means by "it runs slow".
    return {
        "metric": "super-resolution magnify 256->512 images/sec",
        "value": round(ips, 4), "unit": "images/sec",
        "vs_baseline": round(ips / 0.0085, 2),
        "extra": {"reps": reps, "batch": batch,
                  "seconds_per_image": round(1.0 / ips, 1)},
    }


def bench_train(cfg, reps, batch):
    import time as _t

    from cogview_tpu.models import gpt
    from cogview_tpu.training.optim import make_optimizer
    from cogview_tpu.training.train_loop import init_train_state, make_train_step

    # COGVIEW_BENCH_SPARSE=1 trains with pivot+window sparse attention at
    # the reference script's geometry (text2image.sh:39-41: window 64,
    # times 4, 256 pivots; training tokens must divide the window).
    # Measured long-context picture (tutorial width, v5e, r3 flash):
    #   seq 1089:  flash 45.7k (auto default) > dense 42.2k > sparse
    #              37.5k tok/s (b16) — pivot gathers cost more than the
    #              FLOPs they save at this length
    #   seq 4225:  flash 34.6k (b4, bk=704) > sparse 33.1k > dense 12.1k
    #              tok/s (r2 flash: 18.6k) — sparse stays opt-in like the
    #              reference (mpu/sparse_transformer.py:753); sparse b8
    #              OOMs
    sparse = os.environ.get("COGVIEW_BENCH_SPARSE", "0") == "1"
    if sparse:
        cfg = cfg.replace(query_window=64, key_window_times=4, num_pivot=256)
    # COGVIEW_BENCH_SEQ overrides the 1089-token sample length (long-
    # context comparisons: dense vs flash-auto vs sparse); training tokens
    # = seq-1 must divide the sparse window
    seq = int(os.environ.get("COGVIEW_BENCH_SEQ", "1089"))
    if seq != 1089:
        cfg = cfg.replace(max_position_embeddings=seq)
    # COGVIEW_BENCH_CE_CHUNK=N overrides the chunked-CE sequence chunk
    # (config.GPTConfig.ce_chunk_target); N >= seq selects the naive
    # full-logits CE for comparison
    cenv = os.environ.get("COGVIEW_BENCH_CE_CHUNK")
    if cenv:
        cfg = cfg.replace(ce_chunk_target=int(cenv))
    # COGVIEW_BENCH_FLASH=1|0 forces the Pallas flash kernel on/off
    # (default: cfg "auto" routes by seq >= flash_min_seq)
    fenv = os.environ.get("COGVIEW_BENCH_FLASH")
    if fenv is not None:
        if fenv not in ("0", "1"):
            raise SystemExit(f"COGVIEW_BENCH_FLASH={fenv!r}: use 0|1")
        cfg = cfg.replace(use_flash_attention=fenv == "1")
    # COGVIEW_BENCH_FLASH_BLOCKS=bq,bk overrides the flash tile sizes
    benv = os.environ.get("COGVIEW_BENCH_FLASH_BLOCKS")
    if benv:
        bq_, bk_ = (int(x) for x in benv.split(","))
        cfg = cfg.replace(flash_block_q=bq_, flash_block_k=bk_)
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    tx, _ = make_optimizer(params, lr=1e-4, warmup_iter=10, num_iters=1000)
    state = init_train_state(params, tx)
    # "dots" keeps batch-dim-free matmul outputs across the backward pass
    # (models/gpt.py): measured 42.2k tok/s vs 41k full-remat at batch 16
    renv = os.environ.get("COGVIEW_BENCH_REMAT", "dots")
    if renv not in ("0", "1", "dots"):
        raise SystemExit(f"COGVIEW_BENCH_REMAT={renv!r}: use 0|1|dots")
    remat = {"0": False, "1": True, "dots": "dots"}[renv]
    step = make_train_step(cfg, tx, txt_loss_scale=5.0, remat=remat,
                           is_sparse=sparse)
    rng = np.random.RandomState(0)
    b = {
        "text": rng.randint(0, 58000, size=(batch, seq)).astype(np.int32),
        "loss_mask": np.ones((batch, seq), np.float32),
    }
    state, m = step(state, b, jax.random.PRNGKey(1))
    float(m["lm_loss"])
    t0 = _t.time()
    for i in range(reps):
        state, m = step(state, b, jax.random.PRNGKey(i + 2))
    float(m["lm_loss"])
    dt = _t.time() - t0
    tps = reps * batch * (seq - 1) / dt
    # V100 ceiling (tutorial 12L/1024H, seq 1089): fwd+bwd FLOPs/token =
    # 6*N_matmul (transformer 12*12H^2 = 1.51e8 + tied logits V*H =
    # 5.96e7 -> 2.1e8 params => 1.26e9) + attention 3*4*S*H*L (1.6e8)
    # ~= 1.42e9 FLOP/token.  At 100% of 112 TFLOP/s fp16: 79k tok/s
    # CEILING per V100.  At Megatron-LM's measured ~30% sustained
    # efficiency (arXiv:1909.08053; the reference is the same
    # Megatron/DeepSpeed lineage, and small models with a 58k-vocab logit
    # matmul run below that) the reference lands nearer 24k tok/s.
    return {
        "metric": "pretrain tokens/sec (tutorial 12L/1024H, remat)",
        "value": round(tps, 1), "unit": "tokens/sec/chip",
        "vs_baseline": round(tps / 79000.0, 2),
        "extra": {"batch": batch, "seq": seq, "reps": reps, "remat": renv,
                  "ce_chunk": cfg.ce_chunk_target,
                  "attention": ("sparse" if sparse else
                                "flash" if cfg.use_flash_attention is True or
                                (cfg.use_flash_attention == "auto" and
                                 seq >= cfg.flash_min_seq) else "dense"),
                  "ms_per_step": round(dt / reps * 1000, 1),
                  "vs_v100_sustained_30pct": round(tps / 23700.0, 2)},
    }


# executable store for the restart probe: persistent across runs so a
# driver re-run's warm child hits an entry written by an earlier round
AOT_STORE_DIR = os.path.expanduser("~/.cache/cogview_tpu/aot_bench")


def _decode_template(cfg):
    from cogview_tpu.generation.sampling import compile_template

    fake_text = list(range(IMG_VOCAB + 100, IMG_VOCAB + 130))  # 30 text ids
    seq = ([CMD["[ROI1]"]] + fake_text + [CMD["[BASE]"], CMD["[BOI1]"]]
           + [-1] * 1024)
    return compile_template(seq, _LayoutTokenizer(), padded_vocab=cfg.vocab_size)


def _aot_child():
    """Restart-probe child: a fresh process answering one batch-8 decode
    query through the AOT executable store (utils/aot.py), reporting how
    long a *restarted server's first query* takes.  source='compiled' =
    cold store (trace+lower+compile+save), 'aot' = one pickle read +
    executable load.  setup_s (param init+quantize) is reported separately
    — it is weight-load time a real server pays from a checkpoint,
    orthogonal to program readiness."""
    from cogview_tpu.generation.sampling import SamplingParams, filling_sequence_aot
    from cogview_tpu.models import gpt
    from cogview_tpu.utils.aot import ProgramStore

    cfg, _ = pick_cfg()
    cfg = cfg.replace(kv_cache_dtype=os.environ.get("COGVIEW_BENCH_KV", "int8"))
    t0 = time.time()
    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if os.environ.get("COGVIEW_BENCH_WEIGHTS", "int8") == "int8":
        params = jax.jit(gpt.quantize_weights, donate_argnums=0)(params)
    jax.block_until_ready(params)
    setup_s = time.time() - t0
    tpl = _decode_template(cfg)
    store = ProgramStore(AOT_STORE_DIR)
    t0 = time.time()
    (tokens, _), info = filling_sequence_aot(
        params, cfg, tpl, store, batch_size=8,
        sampling=SamplingParams(temperature=1.0, top_k=200, seed=0))
    np.asarray(tokens)  # the tunneled runtime's real fence
    info["first_query_s"] = round(time.time() - t0, 2)
    info["setup_s"] = round(setup_s, 2)
    info["platform"] = jax.devices()[0].platform
    print(json.dumps(info))


def _subprocess_backend(timeout_s=120):
    """The default JAX backend, learned WITHOUT attaching this process to
    the (possibly tunneled) chip.  Falls back to 'unknown' (treated as
    non-CPU) if the child fails."""
    import subprocess

    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s)
        if proc.returncode == 0:
            return proc.stdout.strip().splitlines()[-1]
    except Exception:
        pass
    return "unknown"


def _tpu_health_gate(max_wait_s=600):
    """Poll the chip with a tiny-matmul SUBPROCESS until it answers (or
    the budget runs out).  Run after any child that may have been killed
    mid-execution: killing a hung TPU job wedges the tunneled worker for
    1-5 minutes, and a bench that attaches during recovery measures the
    recovery, not the kernel (r5: the timed-out warm_restart child
    depressed the decode headline 2.28 -> 1.91 img/s).  Subprocess so the
    parent still performs its own first attach exactly once."""
    import subprocess

    t0 = time.time()
    code = ("import jax, jax.numpy as jnp, numpy as np;"
            "x = jnp.ones((128, 128), jnp.bfloat16);"
            "print(float(np.asarray(x @ x)[0, 0]))")
    while time.time() - t0 < max_wait_s:
        try:
            proc = subprocess.run([sys.executable, "-c", code],
                                  capture_output=True, timeout=240)
            if proc.returncode == 0:
                return round(time.time() - t0, 1)
        except Exception:
            pass
        time.sleep(15)
    return round(time.time() - t0, 1)


def _aot_restart_probe(timeout_s=900):
    """Run the restart-probe child twice: once to populate the store (or
    hit a prior round's entry) and once to measure the warm restart.  The
    deliverable VERDICT r3 item 5 asks for: either first_query_s(warm) <<
    the jit cold start, or measured proof the tunneled runtime's program
    load dominates even an AOT load.

    MUST run before the parent initializes its own TPU client (main()
    calls it before pick_cfg's jax.devices()): two processes attached to
    the tunneled chip is the exact contention that corrupted an SR bench
    9.8 -> 33 s/img (measurement-hygiene notes).  Children run serially
    and each exits before the next attaches.  If the first child lands on
    CPU (no TPU in this environment) the probe is skipped."""
    import subprocess

    env = dict(os.environ)
    env["COGVIEW_BENCH_AOT_CHILD"] = "1"
    results = {"store_dir": AOT_STORE_DIR}
    for label in ("populate", "warm_restart"):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True, timeout=timeout_s)
            line = proc.stdout.strip().splitlines()[-1]
            results[label] = json.loads(line)
            if results[label].get("platform") == "cpu":
                return {"skipped": "cpu backend"}
        except Exception as exc:  # timeout/parse/crash: report, don't fail
            results[label] = {"error": f"{type(exc).__name__}: {exc}"}
            break
    # a timed-out child was SIGKILLed mid-execution — wedging the worker;
    # gate on recovery before the parent attaches and measures.  Children
    # that exited cleanly leave the worker healthy, so the gate (a full
    # tunneled attach, ~60-80s cold) runs only on the error path.
    if any(isinstance(v, dict) and "error" in v for v in results.values()):
        results["health_gate_s"] = _tpu_health_gate()
    return results


def main():
    from cogview_tpu.generation.sampling import SamplingParams, compile_template, filling_sequence
    from cogview_tpu.models import gpt

    if os.environ.get("COGVIEW_BENCH_AOT_CHILD") == "1":
        _aot_child()
        return

    mode = os.environ.get("COGVIEW_BENCH_MODE", "decode")
    # restart probe (VERDICT r3 item 5) runs FIRST — before this process's
    # first jax.devices() call attaches to the tunneled chip — so exactly
    # one process holds the TPU at any time (see _aot_restart_probe doc).
    # The backend check must likewise stay out of this process: a tiny
    # subprocess answers it (~seconds), so a CPU-only box skips the probe
    # instead of grinding a batch-8 interpret-mode decode to its timeout.
    aot_probe = None
    if mode == "decode" and os.environ.get("COGVIEW_BENCH_AOT", "1") == "1":
        if _subprocess_backend() == "cpu":
            aot_probe = {"skipped": "cpu backend"}
        else:
            aot_probe = _aot_restart_probe()

    cfg, preset = pick_cfg()
    if mode != "decode":
        reps = int(os.environ.get("COGVIEW_BENCH_REPS", "3"))
        # measured-best defaults (v5e): train peaks at batch 16 (40.8k
        # tok/s vs 32k at 8, 39.5k at 32; no-remat OOMs at 16); vq batch 32
        # amortizes the ~50ms per-call dispatch latency of this runtime;
        # sr batch 16 = 6.9 s/img (r3 live-window kernel; r2: 7.1) vs 9.8 at 8 (weights amortize across the
        # windowed decodes)
        defaults = {"train": "16", "vq": "32", "sr": "16"}
        batch = int(os.environ.get(
            "COGVIEW_BENCH_BATCH", defaults.get(mode, "8")))
        if mode == "vq":
            result = bench_vq(reps, batch)
        elif mode == "score":
            result = bench_score(cfg, reps)
        elif mode == "sr":
            result = bench_sr(cfg, max(1, reps // 3), batch)
        elif mode == "train":
            tcfg, _ = pick_cfg()
            from cogview_tpu.config import cogview_tutorial, smoke
            tcfg = cogview_tutorial() if preset == "base" else smoke()
            result = bench_train(tcfg, reps * 3, batch)
        else:
            raise ValueError(mode)
        print(json.dumps(result))
        return
    kv = os.environ.get("COGVIEW_BENCH_KV", "int8")
    wdt = os.environ.get("COGVIEW_BENCH_WEIGHTS", "int8")
    if kv not in ("bfloat16", "int8", "int4"):
        raise SystemExit(f"COGVIEW_BENCH_KV={kv!r}: use bfloat16|int8|int4")
    if wdt not in ("bfloat16", "int8"):
        raise SystemExit(f"COGVIEW_BENCH_WEIGHTS={wdt!r}: use bfloat16|int8")
    cfg = cfg.replace(kv_cache_dtype=kv)
    if kv == "bfloat16":
        default_batch = "8"
    elif kv == "int4":
        # measured best 64 (2.22 img/s live-window r3; r2 full-Tp kernel
        # gave 1.81 at 64, 1.63 at 40); bf16 weights need the
        # same 3.8GB back that int8 weights free up
        default_batch = "64" if wdt == "int8" else "40"
    else:
        default_batch = "40" if wdt == "int8" else "24"
    batch = int(os.environ.get("COGVIEW_BENCH_BATCH", default_batch))
    reps = int(os.environ.get("COGVIEW_BENCH_REPS", "3"))

    params = gpt.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    if wdt == "int8":
        params = jax.jit(gpt.quantize_weights, donate_argnums=0)(params)

    # text2image template: '[ROI1] <text> [BASE] [BOI1] [MASK]*1024'
    tpl = _decode_template(cfg)
    sp = SamplingParams(temperature=1.0, top_k=200, seed=0)

    # warmup / compile, phase-separated (generation/sampling.py
    # filling_sequence_cold_start): trace vs backend-compile (persistent-
    # cache-served when warm) vs first execution (remote program load on
    # the tunneled runtime — outside any cache's reach)
    from cogview_tpu.generation.sampling import filling_sequence_cold_start
    t0 = time.time()
    (tokens, _), cold = filling_sequence_cold_start(params, cfg, tpl, batch, sp)
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(reps):
        tokens, _ = filling_sequence(
            params, cfg, tpl, batch, sp, rng=jax.random.PRNGKey(i + 1)
        )
    np.asarray(tokens)
    dt = time.time() - t0

    n_images = reps * batch
    images_per_sec = n_images / dt
    tokens_per_sec = images_per_sec * 1024
    result = {
        "metric": "images/sec/chip 256x256 text2image (1024-token AR decode)",
        "value": round(images_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / V100_BASELINE_IMAGES_PER_SEC, 2),
        "extra": {
            "preset": preset,
            "batch": batch,
            "kv_cache": kv,
            "weights": wdt,
            "reps": reps,
            "image_tokens_per_sec": round(tokens_per_sec, 1),
            "seconds_per_image": round(1.0 / images_per_sec, 3),
            "compile_seconds": round(compile_s, 1),
            "cold_start": cold,
            "device": str(jax.devices()[0]),
            # measured by scripts/kv_quality_check.py on the r5
            # seal-group kernel (tutorial model, batch 4, 256
            # teacher-forced steps, v5e; README "KV cache quality"):
            # per-step KL(bf16||quant) and sampled-token flip rate vs the
            # exact bf16 cache under shared gumbel noise
            "kv_quality": {
                "int8": {"kl_mean_nats": 2.3e-5, "sampled_flip_rate": 0.0020},
                "int4": {"kl_mean_nats": 1.1e-3, "sampled_flip_rate": 0.026},
            }.get(kv),
        },
    }
    if aot_probe is not None:
        result["extra"]["cold_start_warm"] = aot_probe
    print(json.dumps(result))


if __name__ == "__main__":
    main()
