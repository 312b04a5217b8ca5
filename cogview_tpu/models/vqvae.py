"""VQ-VAE image tokenizer, functional JAX, NHWC.

Re-implements the behavior of the reference tokenizer model
(vqvae/vqvae_zc.py, hyperparameters fixed at vqvae/api.py:16-19: channel
512, no res-blocks, embed_dim 256, n_embed 8192, stride 6 i.e. three
stride-2 4x4 convs, "simple" variant) as pure functions over a params
pytree.  Differences from the reference are layout-only: activations are
NHWC (TPU-native) and conv kernels HWIO; the checkpoint converter in
:mod:`cogview_tpu.models.convert` transposes the released ``.pt`` weights.

Encoding 256x256 px -> 32x32 codes; codebook lookup is expressed as one
[N,256]x[256,8192] matmul + argmin so the hot path rides the MXU with fp32
accumulation (ties break to the lowest index, matching torch argmax-of-neg
semantics).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.precision import dot_precision

Params = Dict[str, Any]

# Dataset normalization constants (vqvae_tokenizer.py:81, vqvae/api.py:43).
IMG_MEAN = (0.79093, 0.76271, 0.75340)
IMG_STD = (0.30379, 0.32279, 0.32800)


@dataclasses.dataclass(frozen=True)
class VQVAEConfig:
    in_channel: int = 3
    channel: int = 512
    n_res_block: int = 0
    n_res_channel: int = 32
    embed_dim: int = 256
    n_embed: int = 8192
    stride: int = 6  # => 3 stride-2 convs, spatial /8
    simple: bool = True
    decay: float = 0.99
    eps: float = 1e-5

    @property
    def downscale(self) -> int:
        return 8

    def code_side(self, img_size: int) -> int:
        return img_size // self.downscale


# --------------------------------------------------------------------- #
# initialization
# --------------------------------------------------------------------- #


def _conv_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    """Kaiming-uniform fan-in init (torch Conv2d default) for test realism."""
    wkey, bkey = jax.random.split(key)
    fan_in = cin * kh * kw
    bound = math.sqrt(1.0 / fan_in)
    w = jax.random.uniform(
        wkey, (kh, kw, cin, cout), dtype, -math.sqrt(3.0) * bound, math.sqrt(3.0) * bound
    )
    b = jax.random.uniform(bkey, (cout,), dtype, -bound, bound)
    return {"w": w, "b": b}


def _convt_init(key, kh, kw, cin, cout, dtype=jnp.float32):
    """ConvTranspose kernel stored [kh, kw, cout, cin] (see _conv_transpose);
    fan_in convention matches torch ConvTranspose2d (cin * kh * kw // stride^2
    is torch's actual fan-in via [in,out,...] layout — we use cin*kh*kw)."""
    p = _conv_init(key, kh, kw, cin, cout, dtype)
    return {"w": jnp.swapaxes(p["w"], 2, 3), "b": p["b"]}


def init_params(key: jax.Array, cfg: VQVAEConfig = VQVAEConfig()) -> Params:
    assert cfg.stride == 6 and cfg.n_res_block == 0 and cfg.simple, (
        "only the released cogview configuration is implemented"
    )
    keys = jax.random.split(key, 16)
    c = cfg.channel
    enc = {
        "conv0": _conv_init(keys[0], 4, 4, cfg.in_channel, c),
        "conv1": _conv_init(keys[1], 4, 4, c, c),
        "conv2": _conv_init(keys[2], 4, 4, c, c),
        "proj": _conv_init(keys[3], 1, 1, c, cfg.embed_dim),
    }
    dec = {
        "convt0": _convt_init(keys[4], 4, 4, cfg.embed_dim, c),
        "convt1": _convt_init(keys[5], 4, 4, c, c),
        "convt2": _convt_init(keys[6], 4, 4, c, c),
        "proj": _conv_init(keys[7], 1, 1, c, cfg.in_channel),
    }
    embed = jax.random.normal(keys[8], (cfg.embed_dim, cfg.n_embed), jnp.float32)
    # xavier_uniform with tanh gain, as the reference initializes its codebook
    gain = 5.0 / 3.0
    bound = gain * math.sqrt(6.0 / (cfg.embed_dim + cfg.n_embed))
    embed = jax.random.uniform(
        keys[8], (cfg.embed_dim, cfg.n_embed), jnp.float32, -bound, bound
    )
    quant = {
        "embed": embed,
        "cluster_size": jnp.zeros((cfg.n_embed,), jnp.float32),
        # distinct buffer: embed/embed_avg must be separately donatable
        "embed_avg": embed + jnp.zeros_like(embed),
    }
    return {"encoder": enc, "quantize": quant, "decoder": dec}


# --------------------------------------------------------------------- #
# conv helpers (NHWC / HWIO)
# --------------------------------------------------------------------- #


def _conv(x, p, stride, pad):
    y = jax.lax.conv_general_dilated(
        x,
        p["w"],
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=dot_precision(x, p["w"]),
    )
    return y + p["b"]


def _conv_transpose(x, p, stride, pad):
    """torch ConvTranspose2d(k,s,p) equivalent; weight stored
    [kh, kw, out, in] (torch's [in,out,kh,kw] reordered).

    The k=4/s=2/p=1 case every decoder layer uses runs as a SUB-PIXEL
    conv: XLA lowers conv_transpose to an input-dilated conv whose
    zero-interleaved operand the TPU backend executes at ~1 TFLOP/s
    (measured: 327 ms for a batch-32 decode that is ~10 ms of dense-conv
    work).  Decomposing by output parity — out[2q+r, 2p+c] touches only
    kernel taps with (ky, kx) == (r, c) + 1 mod 2 — turns it into ONE
    stride-1 VALID conv with a [2, 2, in, 4*out] tap bank over the
    1-padded input, plus a pixel-shuffle reshape: all dense MXU work
    (measured: 12x faster at batch 32).  Other (k, s, p) fall back to
    lax.conv_transpose.
    """
    kh = p["w"].shape[0]
    if (kh, stride, pad) == (4, 2, 1):
        return _conv_transpose_421(x, p)
    eff = kh - 1 - pad
    y = jax.lax.conv_transpose(
        x,
        p["w"],
        strides=(stride, stride),
        padding=((eff, eff), (eff, eff)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
        precision=dot_precision(x, p["w"]),
    )
    return y + p["b"]


def _conv_transpose_421(x, p):
    """Sub-pixel form of ConvTranspose2d(4, stride=2, padding=1).

    out[2q+ry, 2p+rx, o] = sum over the two input rows/cols whose taps
    land on that output parity:
      ry=0: x[q-1]*W[ky=3] + x[q]*W[ky=1];  ry=1: x[q]*W[ky=2] + x[q+1]*W[ky=0]
    (same per column).  With the input padded by 1, each parity is a
    VALID 2x2-kernel conv anchored at (q+ry, p+rx); the four parities run
    as one conv over a concatenated [2,2,in,4*out] bank, then interleave.
    """
    w = p["w"]  # [4, 4, O, I]
    O = w.shape[2]
    banks = []
    for ry in (0, 1):
        kys = (3, 1) if ry == 0 else (2, 0)
        for rx in (0, 1):
            kxs = (3, 1) if rx == 0 else (2, 0)
            sub = w[np.array(kys)][:, np.array(kxs)]  # [2, 2, O, I]
            banks.append(jnp.transpose(sub, (0, 1, 3, 2)))  # HWIO
    K = jnp.concatenate(banks, axis=-1)  # [2, 2, I, 4O]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, K, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=dot_precision(x, K),
    )  # [B, H+1, W+1, 4O]
    B, Hp1, Wp1, _ = y.shape
    H, W = Hp1 - 1, Wp1 - 1
    ys = [y[:, ry:ry + H, rx:rx + W, g * O:(g + 1) * O]
          for g, (ry, rx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)])]
    t = jnp.stack([jnp.stack(ys[0:2], axis=3),
                   jnp.stack(ys[2:4], axis=3)], axis=2)  # [B,H,2,W,2,O]
    return t.reshape(B, 2 * H, 2 * W, O) + p["b"]


# --------------------------------------------------------------------- #
# model functions
# --------------------------------------------------------------------- #


def encode_features(params: Params, img: jax.Array) -> jax.Array:
    """img [b,256,256,3] (normalized) -> pre-quantization features [b,32,32,D]."""
    e = params["encoder"]
    x = _conv(img, e["conv0"], 2, 1)
    x = jax.nn.relu(x)
    x = _conv(x, e["conv1"], 2, 1)
    x = jax.nn.relu(x)
    x = _conv(x, e["conv2"], 2, 1)
    x = jax.nn.relu(x)
    x = _conv(x, e["proj"], 1, 0)
    return x


def nearest_code(embed: jax.Array, z: jax.Array) -> jax.Array:
    """argmin_j ||z - e_j||^2 via one MXU matmul, fp32 accumulation.

    embed: [D, K]; z: [..., D] -> int32 codes [...].  ||z||^2 is constant
    per row and dropped; ties resolve to the lowest index (jnp.argmin),
    matching the reference's first-max-of-negative-distance behavior.
    """
    flat = z.reshape(-1, z.shape[-1]).astype(jnp.float32)
    scores = jnp.dot(
        flat, embed.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=dot_precision(flat),
    )
    dist = jnp.sum(embed.astype(jnp.float32) ** 2, axis=0)[None, :] - 2.0 * scores
    idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)
    return idx.reshape(z.shape[:-1])


def lookup_code(embed: jax.Array, codes: jax.Array) -> jax.Array:
    """codes [...] int -> embeddings [..., D] (embed is [D, K])."""
    return jnp.take(embed.T, codes, axis=0)


def img2code(params: Params, img: jax.Array, *, dtype=None) -> jax.Array:
    """Normalized image batch [b,h,w,3] -> flat codes [b, (h/8)*(w/8)] int32.

    Default fp32 HIGHEST convs reproduce the reference's token ids BIT
    EXACTLY (the north-star constraint; tests/test_vqvae.py oracle match).
    ``dtype=jnp.bfloat16`` runs the encoder in native-MXU bf16 (~4x
    throughput) at the cost of a small code-flip rate near quantization
    ties — ids are then self-consistent but no longer guaranteed identical
    to reference-tokenized corpora; use only when tokenizing a corpus from
    scratch.  The codebook argmin always runs fp32."""
    enc = params["encoder"]
    if dtype is not None:
        enc = jax.tree.map(lambda x: x.astype(dtype), enc)
        img = img.astype(dtype)
    z = encode_features({"encoder": enc}, img)
    codes = nearest_code(params["quantize"]["embed"], z)
    return codes.reshape(img.shape[0], -1)


def decode_features(params: Params, quant: jax.Array) -> jax.Array:
    d = params["decoder"]
    x = _conv_transpose(quant, d["convt0"], 2, 1)
    x = jax.nn.relu(x)
    x = _conv_transpose(x, d["convt1"], 2, 1)
    x = jax.nn.relu(x)
    x = _conv_transpose(x, d["convt2"], 2, 1)
    x = jax.nn.relu(x)
    x = _conv(x, d["proj"], 1, 0)
    return x


def code2img(params: Params, codes: jax.Array, *, dtype=None) -> jax.Array:
    """codes [b, s*s] or [b,s,s] -> de-normalized fp32 image [b, 8s, 8s, 3].

    ``dtype=jnp.bfloat16`` runs the decoder convs in bf16 (native MXU mode
    instead of the 6-pass fp32 HIGHEST the bit-parity ENCODE path needs).
    Pixels are clipped to 8 bits downstream, so bf16's ~3 decimal digits
    are invisible in the saved images (max abs error ~1e-2 of the 0..1
    range, tests/test_vqvae.py); decode throughput roughly triples."""
    if codes.ndim == 2:
        side = int(math.isqrt(codes.shape[-1]))
        codes = codes.reshape(codes.shape[0], side, side)
    dec, embed = params["decoder"], params["quantize"]["embed"]
    if dtype is not None:
        dec = jax.tree.map(lambda x: x.astype(dtype), dec)
        embed = embed.astype(dtype)
    quant = lookup_code(embed, codes)
    out = decode_features({"decoder": dec}, quant)
    mean = jnp.asarray(IMG_MEAN, out.dtype)
    std = jnp.asarray(IMG_STD, out.dtype)
    return (out * std + mean).astype(jnp.float32)


# --------------------------------------------------------------------- #
# training forward (straight-through + EMA codebook update)
# --------------------------------------------------------------------- #


def quantize_st(
    params: Params, z: jax.Array, train: bool = False
) -> Tuple[jax.Array, jax.Array, jax.Array, Params]:
    """Straight-through quantization.

    Returns (quantized, codes, commitment_mse, new_quantize_state).  The EMA
    codebook update (decay 0.99, Laplace-smoothed cluster sizes) runs under
    stop_gradient when train=True; in an SPMD training step the onehot
    statistics must be psum-ed over the data axis by the caller before
    applying — see training.vqvae_train.
    """
    q = params["quantize"]
    codes = nearest_code(q["embed"], z)
    quant = lookup_code(q["embed"], codes)
    diff = jnp.mean((jax.lax.stop_gradient(quant) - z) ** 2)
    quant_st = z + jax.lax.stop_gradient(quant - z)
    if not train:
        return quant_st, codes, diff, q
    new_q = ema_codebook_update(q, z, codes)
    return quant_st, codes, diff, new_q


def quantize_gumbel(
    params: Params,
    z: jax.Array,
    rng: jax.Array,
    temperature: float = 1.0,
    hard: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Gumbel-softmax relaxed quantization (reference vqvae_zc.py:55-65,
    284-346): logits = -distance; soft mode returns the softmax-weighted
    codebook mixture; hard mode a pure hard codebook lookup (the reference's
    ``embed_code(embed_ind)`` — encoder gradients flow only through the KL
    term there, not through quantize).  Both relaxed modes return the
    KL(q || uniform) regularizer as ``diff`` (vqvae_zc.py:88-90), and in
    hard mode the reference additionally runs the EMA codebook update
    (vqvae_zc.py:67-83) — callers get the identical statistics from
    ``codebook_stats(z, codes, K)`` / ``ema_codebook_update`` (the ST
    one-hot it feeds is numerically the plain one-hot of ``codes``).

    Returns (quantized [..., D], kl, codes [...]).
    """
    q = params["quantize"]
    embed = q["embed"].astype(jnp.float32)  # [D, K]
    flat = z.reshape(-1, z.shape[-1]).astype(jnp.float32)
    scores = jnp.dot(flat, embed, preferred_element_type=jnp.float32,
                     precision=dot_precision(flat))
    dist = (
        jnp.sum(flat**2, axis=-1, keepdims=True)
        - 2.0 * scores
        + jnp.sum(embed**2, axis=0)[None, :]
    )
    logits = -dist
    g = jax.random.gumbel(rng, logits.shape, jnp.float32)
    y_soft = jax.nn.softmax((logits + g) / temperature, axis=-1)
    codes = jnp.argmax(y_soft, axis=-1).astype(jnp.int32)
    qy = jax.nn.softmax(logits, axis=-1)
    kl = jnp.mean(jnp.sum(qy * jnp.log(qy * embed.shape[1] + 1e-20), axis=-1))
    if hard:
        y = jax.lax.stop_gradient(jax.nn.one_hot(codes, embed.shape[1],
                                                 dtype=y_soft.dtype))
    else:
        y = y_soft
    quant = jnp.dot(y, embed.T, preferred_element_type=jnp.float32,
                    precision=dot_precision(y))
    return (
        quant.reshape(z.shape).astype(z.dtype),
        kl,
        codes.reshape(z.shape[:-1]),
    )


def codebook_stats(z: jax.Array, codes: jax.Array, n_embed: int):
    """Sufficient statistics for the EMA update (psum these across DP)."""
    flat = jax.lax.stop_gradient(z).reshape(-1, z.shape[-1])
    onehot = jax.nn.one_hot(codes.reshape(-1), n_embed, dtype=flat.dtype)
    onehot_sum = jnp.sum(onehot, axis=0)
    embed_sum = jnp.dot(flat.T, onehot, preferred_element_type=jnp.float32)
    return onehot_sum, embed_sum


def apply_ema(q: Params, onehot_sum, embed_sum, decay=0.99, eps=1e-5) -> Params:
    cluster_size = q["cluster_size"] * decay + onehot_sum * (1 - decay)
    embed_avg = q["embed_avg"] * decay + embed_sum * (1 - decay)
    n = jnp.sum(cluster_size)
    n_embed = cluster_size.shape[0]
    smoothed = (cluster_size + eps) / (n + n_embed * eps) * n
    embed = embed_avg / smoothed[None, :]
    return {"embed": embed, "cluster_size": cluster_size, "embed_avg": embed_avg}


def ema_codebook_update(q: Params, z: jax.Array, codes: jax.Array) -> Params:
    onehot_sum, embed_sum = codebook_stats(z, codes, q["embed"].shape[1])
    return apply_ema(q, onehot_sum, embed_sum)


# --------------------------------------------------------------------- #
# host-side image IO (reference read_img, vqvae_tokenizer.py:72-84)
# --------------------------------------------------------------------- #


def read_img(path: str, img_size: int = 256) -> np.ndarray:
    """PIL load -> resize short side -> center crop -> normalize. [1,h,w,3]."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    if w < h:
        nw, nh = img_size, max(1, round(h * img_size / w))
    else:
        nw, nh = max(1, round(w * img_size / h)), img_size
    img = img.resize((nw, nh), Image.BILINEAR)
    left = (nw - img_size) // 2
    top = (nh - img_size) // 2
    img = img.crop((left, top, left + img_size, top + img_size))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    arr = (arr - np.asarray(IMG_MEAN, np.float32)) / np.asarray(IMG_STD, np.float32)
    return arr[None]
