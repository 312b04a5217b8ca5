"""Model/run configuration dataclasses and released-model presets.

Hyperparameters follow the reference launch scripts (SURVEY.md §2.4):
released cogview models are 48L x 2560H x 40 heads over a 58240-padded
vocabulary with 1089 positions (1345 for super-resolution finetunes); the
tutorial config is 12L/1024H/16.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def pad_vocab_size(n: int, model_parallel: int = 1, multiple: int = 128) -> int:
    """Pad vocab to a multiple of 128*mp (reference pretrain_gpt2.py:690-698).

    128 also keeps the embedding matmul lane-aligned on the MXU.
    """
    m = multiple * model_parallel
    return ((n + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    num_layers: int
    hidden_size: int
    num_heads: int
    vocab_size: int
    max_position_embeddings: int = 1089
    layernorm_epsilon: float = 1e-5
    embedding_dropout: float = 0.1
    attention_dropout: float = 0.1
    output_dropout: float = 0.1
    sandwich_ln: bool = True  # third/fourth layernorm (Sandwich-LN)
    # PB-relax LN prescale (reference sparse_transformer.py:40-44); folded
    # into eps — see ops/layernorm.py.  Keep True for released-checkpoint
    # faithfulness; False gives the cleaner scale-invariant LN.
    pb_relax: bool = True
    init_std: float = 0.02
    scaled_output_init: bool = True  # N(0, std/sqrt(2L)) for output mats
    # sparse attention (pivot + window) hyperparameters
    query_window: int = 128
    key_window_times: int = 6
    num_pivot: int = 768
    # flash (Pallas) attention for causal training/prefill paths, with
    # in-kernel hash-PRNG attention dropout.  Measured on v5e (tutorial
    # width, remat, dropout 0.1): at S=1089 XLA dense is ~18% faster at
    # every batch that fits, but at S=4096 flash is 1.53x faster AND
    # trains 2x the batch (dense's [B,N,S,S] fp32 scores OOM at batch 8;
    # flash runs it).  "auto" (default) picks flash iff the sequence
    # length >= flash_min_seq; True/False force it.
    use_flash_attention: "bool | str" = "auto"
    # flash wins the full train step from ~1k tokens once block_k is
    # pad-aware (measured S=1089 b16: flash bk=576 45.9k tok/s > dense
    # 42.2k > flash bk=128 38.1k); below that dense stays cheaper
    flash_min_seq: int = 1024
    # flash kernel tile sizes; None = auto (largest block with minimal
    # S-padding, ops/flash_attention.py pick_flash_blocks)
    flash_block_q: "int | None" = 128
    flash_block_k: "int | None" = None
    # compute precision: params live in fp32; matmuls run in compute_dtype
    compute_dtype: jnp.dtype = jnp.bfloat16
    # training CE: the vocab projection is fused into a remat'd scan over
    # sequence chunks of (the largest divisor of S <=) this many tokens, so
    # the [B,S,V] fp32 logits never materialize (training/losses.py
    # cross_entropy_hidden).  >= S forces one full-logits step; 0 = auto:
    # full logits while they fit in ~4.5 GiB, chunked above.  Measured on v5e
    # (tutorial 12L/1024H, b16, S=1089, 2026-08-18): full-logits 45.9k
    # tok/s vs chunked 43.5-44.3k (chunk 136-544) — XLA already streams
    # the CE reductions through the vocab matmul, so chunking only adds
    # recompute; its value is the ~8 GB peak-memory cut at bigger configs.
    ce_chunk_target: int = 0
    # autoregressive KV cache storage: "bfloat16" (exact, XLA attention),
    # "int8" (per-(head,token)-scaled, fused Pallas decode kernel — half the
    # cache HBM traffic and footprint, so ~2x the decode batch per chip), or
    # "int4" (two values per byte, absmax/7 scales — halves the cache again;
    # OPT-IN: ~16x the int8 rounding error, see ops/decode_attention.py).
    # Single-chip by default; set decode_shard_axis to a mesh axis name
    # (usually 'data') to run the quantized-decode Pallas kernel per
    # data-parallel shard of an ambient mesh (batch rows attend only to
    # their own cache, so the kernel needs no collectives).  bfloat16
    # caches shard through plain pjit without this.
    kv_cache_dtype: str = "bfloat16"
    decode_shard_axis: "str | None" = None
    # and/or TP: heads sharded over this mesh axis (attention is head-local)
    decode_head_axis: "str | None" = None
    # sequence/context parallelism for long-context TRAINING (beyond the
    # reference, whose only long-context answer is the sparse pattern):
    # shard the sequence dim over mesh axis ``sp_axis`` and run ring
    # attention (ops/ring_attention.py) — K/V blocks rotate over ICI with
    # ppermute while everything else stays sequence-local, so context
    # length scales with chips.  Applies when the mask is exactly
    # causal+sep and no KV cache / sparse spec / mems are in play.
    # ``sp_num_shards`` is the static ring size (== mesh.shape[sp_axis]).
    sp_axis: "str | None" = None
    sp_num_shards: int = 1
    sp_data_axis: "str | None" = None  # batch axis inside the shard_map
    sp_head_axis: "str | None" = None  # head axis inside the shard_map
    # pipeline parallelism (parallel/pipeline.py): layers shard over mesh
    # axis ``pp_axis`` (the stacked [L,...] param layout is the stage
    # decomposition) and a GPipe schedule runs ``pp_microbatches``
    # microbatches through the stages.  num_layers % pp_num_stages == 0
    # and batch % pp_microbatches == 0.  Composes with DP/TP/FSDP (the
    # shard_map is manual over 'pipe' only); not with sp_axis or sparse.
    pp_axis: "str | None" = None
    pp_num_stages: int = 1
    pp_microbatches: int = 0  # 0 -> pp_num_stages

    def __post_init__(self):
        assert self.hidden_size % self.num_heads == 0
        # every entry point (bench modes, CLIs, tests) funnels through this
        # config, so a typo like "int08" fails here instead of silently
        # falling through init_cache's else-branch to a bfloat16 cache
        assert self.kv_cache_dtype in ("bfloat16", "int8", "int4"), (
            f"kv_cache_dtype={self.kv_cache_dtype!r}: use bfloat16|int8|int4")

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def mlp_hidden(self) -> int:
        return 4 * self.hidden_size

    def replace(self, **kw) -> "GPTConfig":
        return dataclasses.replace(self, **kw)


# unified vocab: 8192 image + 50000 text + 27 command = 58219 -> pad 58240
UNIFIED_VOCAB_RAW = 58219


def cogview_base(**kw) -> GPTConfig:
    """Released cogview-base / -caption / -sr scale (scripts/text2image.sh:9-11)."""
    cfg = GPTConfig(
        num_layers=48,
        hidden_size=2560,
        num_heads=40,
        vocab_size=pad_vocab_size(UNIFIED_VOCAB_RAW),
    )
    return cfg.replace(**kw) if kw else cfg


def cogview_tutorial(**kw) -> GPTConfig:
    """Tutorial pretraining scale (scripts/pretrain_single_node.sh:26-29)."""
    cfg = GPTConfig(
        num_layers=12,
        hidden_size=1024,
        num_heads=16,
        vocab_size=pad_vocab_size(UNIFIED_VOCAB_RAW),
    )
    return cfg.replace(**kw) if kw else cfg


def cogview_sr(**kw) -> GPTConfig:
    """Super-resolution finetune: 1345 positions (scripts/super_resolution.sh:8)."""
    return cogview_base(max_position_embeddings=1345, **kw)


def smoke(**kw) -> GPTConfig:
    """Tiny dims over the REAL unified vocab: lets the full CLI/tooling run
    end-to-end without released weights (random init)."""
    cfg = GPTConfig(
        num_layers=2,
        hidden_size=64,
        num_heads=4,
        vocab_size=pad_vocab_size(UNIFIED_VOCAB_RAW),
        embedding_dropout=0.0,
        attention_dropout=0.0,
        output_dropout=0.0,
    )
    return cfg.replace(**kw) if kw else cfg


def tiny_test(**kw) -> GPTConfig:
    """Small config for unit tests (divisible by an 8-way model axis)."""
    cfg = GPTConfig(
        num_layers=2,
        hidden_size=64,
        num_heads=8,
        vocab_size=128,
        max_position_embeddings=64,
        embedding_dropout=0.0,
        attention_dropout=0.0,
        output_dropout=0.0,
        compute_dtype=jnp.float32,
    )
    return cfg.replace(**kw) if kw else cfg
