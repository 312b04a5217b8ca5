"""Checkpoint converters: released ``.pt`` layouts -> cogview_tpu pytrees.

Handles the two public artifact families:
  * VQ-VAE (``vqvae_hard_biggerset_011.pt``: a bare state_dict, possibly
    ``module.``-prefixed — reference strips it at vqvae_tokenizer.py:44-46)
  * CogView GPT DeepSpeed checkpoints (``mp_rank_0X_model_states.pt``),
    handled in :func:`gpt_from_torch` / :func:`load_gpt_checkpoint`.

torch is only used host-side to deserialize; everything lands in numpy and
is laid out TPU-native (NHWC activations / HWIO kernels for convs,
[in, out] matrices for linears).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    import torch

    if isinstance(t, torch.Tensor):
        return t.detach().to(torch.float32).cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _np_keep(t) -> np.ndarray:
    """Tensor -> numpy PRESERVING dtype (fp16 stays fp16; bf16 crosses via
    a bit-pattern view into ml_dtypes.bfloat16, which numpy lacks).  At 4B
    scale the fp32 round-trip of ``_np`` alone doubles peak host RSS."""
    import torch

    if not isinstance(t, torch.Tensor):
        return np.asarray(t)
    t = t.detach().cpu()
    if t.dtype == torch.bfloat16:
        import ml_dtypes

        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
    return t.numpy()


def strip_module_prefix(sd: Mapping[str, Any]) -> Dict[str, Any]:
    if sd and next(iter(sd)).startswith("module."):
        return {k[len("module.") :]: v for k, v in sd.items()}
    return dict(sd)


# --------------------------------------------------------------------- #
# VQ-VAE
# --------------------------------------------------------------------- #

def _conv_w(t) -> np.ndarray:
    """torch Conv2d [O,I,kh,kw] -> HWIO."""
    return _np(t).transpose(2, 3, 1, 0)


def _convt_w(t) -> np.ndarray:
    """torch ConvTranspose2d [I,O,kh,kw] -> [kh,kw,O,I] (HWIO for
    lax.conv_transpose with transpose_kernel=True)."""
    return _np(t).transpose(2, 3, 1, 0)


def vqvae_from_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    sd = strip_module_prefix(sd)

    def conv(prefix):
        return {"w": _conv_w(sd[f"{prefix}.weight"]), "b": _np(sd[f"{prefix}.bias"])}

    def convt(prefix):
        return {"w": _convt_w(sd[f"{prefix}.weight"]), "b": _np(sd[f"{prefix}.bias"])}

    return {
        "encoder": {
            "conv0": conv("enc_b.blocks.0"),
            "conv1": conv("enc_b.blocks.2"),
            "conv2": conv("enc_b.blocks.4"),
            "proj": conv("enc_b.blocks.6"),
        },
        "quantize": {
            "embed": _np(sd["quantize_t.embed"]),
            "cluster_size": _np(sd["quantize_t.cluster_size"]),
            "embed_avg": _np(sd["quantize_t.embed_avg"]),
        },
        "decoder": {
            "convt0": convt("dec.blocks.0"),
            "convt1": convt("dec.blocks.2"),
            "convt2": convt("dec.blocks.4"),
            "proj": conv("dec.blocks.6"),
        },
    }


def load_vqvae_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return vqvae_from_state_dict(ckpt)


# --------------------------------------------------------------------- #
# GPT (CogView transformer)
# --------------------------------------------------------------------- #

def gpt_from_state_dict(
    sd: Mapping[str, Any], num_layers: int, num_heads: int,
    dtype=None, consume: bool = False,
) -> Dict[str, Any]:
    """Megatron-style GPT2Model state_dict -> cogview_tpu GPT params,
    converted one tensor at a time with the STORED precision preserved.

    Source layout (model/gpt2_modeling.py + mpu/sparse_transformer.py):
      word_embeddings.weight                     [V, H]
      transformer.position_embeddings.weight     [P, H]
      transformer.layers.{i}.input_layernorm.{weight,bias}
      transformer.layers.{i}.attention.query_key_value.{weight,bias} [3H, H]
      transformer.layers.{i}.attention.dense.{weight,bias}           [H, H]
      transformer.layers.{i}.post_attention_layernorm.*
      transformer.layers.{i}.third_layernorm.* / fourth_layernorm.*
      transformer.layers.{i}.mlp.dense_h_to_4h.* [4H, H] / dense_4h_to_h.* [H, 4H]
      transformer.final_layernorm.*

    Target: stacked [L, ...] arrays (scan-over-layers), matrices as
    [in, out], fused qkv as [H, 3, H] so head-sharding slices the last dim.

    Memory contract (the released 4B ``.pt`` is 7.8 GB fp16): each stacked
    leaf is PREALLOCATED in the stored dtype and filled layer by layer;
    with ``consume=True`` every source tensor is dropped from ``sd`` the
    moment it is copied, so peak host RSS stays ~= one copy of the weights
    plus a single layer slice (<= ~1.2x the file with a mmap'd
    ``torch.load``; the old fp32 np.stack built a second, DOUBLE-width
    tree on top of torch's copy — ~24 GB transient).  ``dtype`` forces a
    target dtype (e.g. np.float32 for fp32 tooling); default keeps fp16
    fp16.
    """
    if consume and isinstance(sd, dict):
        # re-key IN PLACE: a stripped copy would keep every tensor alive
        # through the caller's dict, defeating the per-tensor free
        if sd and next(iter(sd)).startswith("module."):
            for k in list(sd.keys()):
                sd[k[len("module."):]] = sd.pop(k)
    else:
        sd = strip_module_prefix(sd)
    cast = (lambda a: a) if dtype is None else (lambda a: a.astype(dtype))

    def take(key):
        t = cast(_np_keep(sd[key]))
        if consume:
            del sd[key]
        return t

    word = take("word_embeddings.weight")
    hidden = word.shape[1]

    def stack(fmt, transform):
        """Preallocate [L, ...] and fill per layer (no 48-tensor staging)."""
        first = transform(take(fmt.format(0)))
        out = np.empty((num_layers,) + first.shape, first.dtype)
        out[0] = first
        del first
        for i in range(1, num_layers):
            out[i] = transform(take(fmt.format(i)))
        return out

    def lin_w(a):  # torch Linear [out, in] -> [in, out]
        return a.T

    def qkv_w(a):
        # ColumnParallelLinear(3H, stride=3) at mp=1 stores rows as
        # [q(H); k(H); v(H)] along the output dim -> [in=H, 3, H]
        return a.T.reshape(hidden, 3, hidden)

    def qkv_b(a):
        return a.reshape(3, hidden)

    ident = lambda a: a
    L = "transformer.layers.{}"
    params = {
        "embed": {"word": word,
                  "pos": take("transformer.position_embeddings.weight")},
        "layers": {
            "ln_in": {
                "g": stack(L + ".input_layernorm.weight", ident),
                "b": stack(L + ".input_layernorm.bias", ident),
            },
            "qkv": {
                "w": stack(L + ".attention.query_key_value.weight", qkv_w),
                "b": stack(L + ".attention.query_key_value.bias", qkv_b),
            },
            "attn_out": {
                "w": stack(L + ".attention.dense.weight", lin_w),
                "b": stack(L + ".attention.dense.bias", ident),
            },
            "ln_attn": {  # third_layernorm (sandwich, after attention)
                "g": stack(L + ".third_layernorm.weight", ident),
                "b": stack(L + ".third_layernorm.bias", ident),
            },
            "ln_post": {
                "g": stack(L + ".post_attention_layernorm.weight", ident),
                "b": stack(L + ".post_attention_layernorm.bias", ident),
            },
            "mlp_in": {
                "w": stack(L + ".mlp.dense_h_to_4h.weight", lin_w),
                "b": stack(L + ".mlp.dense_h_to_4h.bias", ident),
            },
            "mlp_out": {
                "w": stack(L + ".mlp.dense_4h_to_h.weight", lin_w),
                "b": stack(L + ".mlp.dense_4h_to_h.bias", ident),
            },
            "ln_mlp": {  # fourth_layernorm (sandwich, after MLP)
                "g": stack(L + ".fourth_layernorm.weight", ident),
                "b": stack(L + ".fourth_layernorm.bias", ident),
            },
        },
        "ln_final": {
            "g": take("transformer.final_layernorm.weight"),
            "b": take("transformer.final_layernorm.bias"),
        },
    }
    return params


def load_gpt_checkpoint(path: str, num_layers: int, num_heads: int,
                        dtype=None) -> Dict[str, Any]:
    """Load a DeepSpeed mp_rank_00_model_states.pt (generate_samples.py:56-61)
    or a plain module checkpoint (utils.py:203-220).

    Streams: ``torch.load(mmap=True)`` where the zip format allows (tensor
    pages fault in on first touch and are dropped after the per-tensor
    copy), every tensor is consumed out of the state_dict as it converts,
    and the stored dtype is preserved — peak RSS <= ~1.2x the file size
    for the 4B fp16 artifact instead of the old ~3x fp32 round-trip."""
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=False,
                          mmap=True)
    except (TypeError, RuntimeError):
        # legacy (non-zip) serialization has no mmap path
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("module", "model"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    return gpt_from_state_dict(ckpt, num_layers, num_heads, dtype=dtype,
                               consume=True)
