"""Import the reference torch implementation as a CPU numerical oracle.

The reference needs apex/deepspeed (CUDA-only) and an old torch API; this
installs minimal stubs so its pure math runs on CPU.  Oracle use only —
nothing from /root/reference ships in the framework.
"""

from __future__ import annotations

import contextlib
import math
import sys
import types

_BOOTSTRAPPED = False


def bootstrap_reference():
    global _BOOTSTRAPPED
    if _BOOTSTRAPPED:
        return
    import torch

    # torch's OpenMP pool fights XLA's thread pool for cores; the oracle
    # models are tiny, so single-thread torch keeps the suite fast.
    torch.set_num_threads(1)

    six = types.ModuleType("torch._six")
    six.inf = math.inf
    sys.modules.setdefault("torch._six", six)

    apex = types.ModuleType("apex")
    norm = types.ModuleType("apex.normalization")
    fln = types.ModuleType("apex.normalization.fused_layer_norm")

    class FusedLayerNorm(torch.nn.LayerNorm):
        pass

    fln.FusedLayerNorm = FusedLayerNorm
    norm.fused_layer_norm = fln
    apex.normalization = norm
    sys.modules.setdefault("apex", apex)
    sys.modules.setdefault("apex.normalization", norm)
    sys.modules.setdefault("apex.normalization.fused_layer_norm", fln)

    ds = types.ModuleType("deepspeed")
    ckpt = types.ModuleType("deepspeed.checkpointing")
    ckpt.is_configured = lambda: False
    ds.checkpointing = ckpt
    sys.modules.setdefault("deepspeed", ds)
    sys.modules.setdefault("deepspeed.checkpointing", ckpt)

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    import torch.distributed as dist

    if not dist.is_initialized():
        dist.init_process_group(
            "gloo", rank=0, world_size=1, init_method="tcp://127.0.0.1:29531"
        )
    import mpu
    import mpu.sparse_transformer as st

    class _DummyTracker:
        @contextlib.contextmanager
        def fork(self):
            yield

    st.get_cuda_rng_tracker = lambda: _DummyTracker()
    try:
        mpu.initialize_model_parallel(1)
    except AssertionError:
        pass  # already initialized
    _BOOTSTRAPPED = True


def make_reference_gpt(num_layers=2, vocab=128, hidden=64, heads=4, max_seq=64,
                       max_memory_length=0):
    bootstrap_reference()
    import torch

    from model.gpt2_modeling import GPT2Model

    torch.manual_seed(0)
    m = GPT2Model(
        num_layers=num_layers,
        vocab_size=vocab,
        hidden_size=hidden,
        num_attention_heads=heads,
        embedding_dropout_prob=0.0,
        attention_dropout_prob=0.0,
        output_dropout_prob=0.0,
        max_sequence_length=max_seq,
        max_memory_length=max_memory_length,
        checkpoint_activations=False,
        parallel_output=False,
    )
    m.eval()
    return m
