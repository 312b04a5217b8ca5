"""InceptionV3 feature extractor in JAX — the real-FID backbone.

The reference wraps torchvision's pretrained InceptionV3
(``/root/reference/eval_utils/inception.py:1-141``) and taps four blocks
(64/192/768/2048-d features; FID uses block 3, the 2048-d final-avgpool
"pool3" features).  This reimplements that network — torchvision's
``inception_v3`` architecture (BasicConv2d = conv/no-bias + BN(eps 1e-3) +
ReLU; InceptionA/B/C/D/E mixes) — as pure JAX functions over a params
pytree, NHWC/HWIO, with

* ``params_from_torch_state_dict``: loads the standard torchvision
  ``.pth`` checkpoint layout (``Conv2d_1a_3x3.conv.weight`` …
  ``Mixed_7c.branch_pool.bn.running_var``, ``fc.weight``) so the published
  FID weights slot in unchanged the moment they are present in the
  environment (no torchvision needed — just ``torch.load``);
* ``init_params``: random init with the exact same tree structure, for
  architecture/converter tests while pretrained weights are absent;
* the reference's preprocessing reproduced exactly: bilinear resize to
  299x299 with align_corners=True (inception.py:125) and the
  0.5->ImageNet channel renormalization (inception.py:129-131);
* ``logits`` (fc head) for the Inception Score path
  (inception_score.py:34-41, align_corners=False upsample there).

All convs run through XLA onto the MXU; the whole extractor jits to a
single fused program per batch shape.
"""

from __future__ import annotations


import math
from typing import Any, Dict, List, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]

BLOCK_INDEX_BY_DIM = {64: 0, 192: 1, 768: 2, 2048: 3}
DEFAULT_BLOCK_INDEX = 3
BN_EPS = 1e-3  # torchvision BasicConv2d BatchNorm2d(eps=0.001)


# --------------------------------------------------------------------- #
# primitive layers
# --------------------------------------------------------------------- #


def _conv_bn_relu(x: jax.Array, p: Params, stride=(1, 1), padding=((0, 0), (0, 0))):
    """BasicConv2d: conv (no bias) -> BN (running stats, eval mode) -> relu."""
    y = lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    bn = p["bn"]
    inv = lax.rsqrt(bn["var"] + BN_EPS)
    y = (y - bn["mean"]) * inv * bn["scale"] + bn["bias"]
    return jax.nn.relu(y)


def _max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _avg_pool_3x3_s1_p1(x: jax.Array) -> jax.Array:
    """torch F.avg_pool2d(k=3, s=1, pad=1, count_include_pad=True): the
    divisor is always 9, including at borders."""
    s = lax.reduce_window(
        x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return s / 9.0


def bilinear_resize(x: jax.Array, size: int, align_corners: bool) -> jax.Array:
    """[B,H,W,C] -> [B,size,size,C] separable bilinear, matching torch's
    F.interpolate semantics for both align_corners settings.  Implemented
    as two dense [out,in] interpolation matmuls (exact, MXU-friendly)."""

    def weights(n_in: int, n_out: int) -> jnp.ndarray:
        if n_in == n_out:
            return jnp.eye(n_out, dtype=jnp.float32)
        out = np.arange(n_out, dtype=np.float64)
        if align_corners:
            src = out * (n_in - 1) / (n_out - 1) if n_out > 1 else np.zeros_like(out)
        else:
            src = np.clip((out + 0.5) * n_in / n_out - 0.5, 0.0, n_in - 1)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        frac = src - lo
        w = np.zeros((n_out, n_in))
        w[np.arange(n_out), lo] += 1.0 - frac
        w[np.arange(n_out), hi] += frac
        return jnp.asarray(w, jnp.float32)

    wh = weights(x.shape[1], size)
    ww = weights(x.shape[2], size)
    y = jnp.einsum("oh,bhwc->bowc", wh, x.astype(jnp.float32))
    return jnp.einsum("ow,bhwc->bhoc", ww, y)


# --------------------------------------------------------------------- #
# inception mixes (torchvision InceptionA..E)
# --------------------------------------------------------------------- #

P0 = ((0, 0), (0, 0))
P1 = ((1, 1), (1, 1))
P2 = ((2, 2), (2, 2))
P_1x7 = ((0, 0), (3, 3))  # kernel (1,7): pad (0,3)
P_7x1 = ((3, 3), (0, 0))  # kernel (7,1): pad (3,0)
P_1x3 = ((0, 0), (1, 1))
P_3x1 = ((1, 1), (0, 0))


def _inception_a(x, p):
    b1 = _conv_bn_relu(x, p["branch1x1"])
    b5 = _conv_bn_relu(x, p["branch5x5_1"])
    b5 = _conv_bn_relu(b5, p["branch5x5_2"], padding=P2)
    bd = _conv_bn_relu(x, p["branch3x3dbl_1"])
    bd = _conv_bn_relu(bd, p["branch3x3dbl_2"], padding=P1)
    bd = _conv_bn_relu(bd, p["branch3x3dbl_3"], padding=P1)
    bp = _conv_bn_relu(_avg_pool_3x3_s1_p1(x), p["branch_pool"])
    return jnp.concatenate([b1, b5, bd, bp], axis=-1)


def _inception_b(x, p):
    b3 = _conv_bn_relu(x, p["branch3x3"], stride=(2, 2))
    bd = _conv_bn_relu(x, p["branch3x3dbl_1"])
    bd = _conv_bn_relu(bd, p["branch3x3dbl_2"], padding=P1)
    bd = _conv_bn_relu(bd, p["branch3x3dbl_3"], stride=(2, 2))
    bp = _max_pool_3x3_s2(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _inception_c(x, p):
    b1 = _conv_bn_relu(x, p["branch1x1"])
    b7 = _conv_bn_relu(x, p["branch7x7_1"])
    b7 = _conv_bn_relu(b7, p["branch7x7_2"], padding=P_1x7)
    b7 = _conv_bn_relu(b7, p["branch7x7_3"], padding=P_7x1)
    bd = _conv_bn_relu(x, p["branch7x7dbl_1"])
    bd = _conv_bn_relu(bd, p["branch7x7dbl_2"], padding=P_7x1)
    bd = _conv_bn_relu(bd, p["branch7x7dbl_3"], padding=P_1x7)
    bd = _conv_bn_relu(bd, p["branch7x7dbl_4"], padding=P_7x1)
    bd = _conv_bn_relu(bd, p["branch7x7dbl_5"], padding=P_1x7)
    bp = _conv_bn_relu(_avg_pool_3x3_s1_p1(x), p["branch_pool"])
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _inception_d(x, p):
    b3 = _conv_bn_relu(x, p["branch3x3_1"])
    b3 = _conv_bn_relu(b3, p["branch3x3_2"], stride=(2, 2))
    b7 = _conv_bn_relu(x, p["branch7x7x3_1"])
    b7 = _conv_bn_relu(b7, p["branch7x7x3_2"], padding=P_1x7)
    b7 = _conv_bn_relu(b7, p["branch7x7x3_3"], padding=P_7x1)
    b7 = _conv_bn_relu(b7, p["branch7x7x3_4"], stride=(2, 2))
    bp = _max_pool_3x3_s2(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _inception_e(x, p):
    b1 = _conv_bn_relu(x, p["branch1x1"])
    b3 = _conv_bn_relu(x, p["branch3x3_1"])
    b3 = jnp.concatenate([
        _conv_bn_relu(b3, p["branch3x3_2a"], padding=P_1x3),
        _conv_bn_relu(b3, p["branch3x3_2b"], padding=P_3x1),
    ], axis=-1)
    bd = _conv_bn_relu(x, p["branch3x3dbl_1"])
    bd = _conv_bn_relu(bd, p["branch3x3dbl_2"], padding=P1)
    bd = jnp.concatenate([
        _conv_bn_relu(bd, p["branch3x3dbl_3a"], padding=P_1x3),
        _conv_bn_relu(bd, p["branch3x3dbl_3b"], padding=P_3x1),
    ], axis=-1)
    bp = _conv_bn_relu(_avg_pool_3x3_s1_p1(x), p["branch_pool"])
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


# --------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------- #


def features(
    params: Params,
    x: jax.Array,
    output_blocks: Sequence[int] = (DEFAULT_BLOCK_INDEX,),
    resize_input: bool = True,
    normalize_input: bool = True,
) -> List[jax.Array]:
    """x: [B,H,W,3] in (0,1).  Returns the selected block outputs, NHWC
    (block 3 is [B,2048]).  Matches reference inception.py:107-141."""
    output_blocks = sorted(output_blocks)
    last = max(output_blocks)
    assert last <= 3
    x = x.astype(jnp.float32)
    if resize_input:
        x = bilinear_resize(x, 299, align_corners=True)
    if normalize_input:
        # (0,1) input renormalized from 0.5/0.5 to ImageNet stats
        # (reference inception.py:129-131)
        scale = jnp.asarray([0.229, 0.224, 0.225], jnp.float32) / 0.5
        shift = (jnp.asarray([0.485, 0.456, 0.406], jnp.float32) - 0.5) / 0.5
        x = x * scale + shift

    out = []
    # block 0: stem to first maxpool
    x = _conv_bn_relu(x, params["Conv2d_1a_3x3"], stride=(2, 2))
    x = _conv_bn_relu(x, params["Conv2d_2a_3x3"])
    x = _conv_bn_relu(x, params["Conv2d_2b_3x3"], padding=P1)
    x = _max_pool_3x3_s2(x)
    if 0 in output_blocks:
        out.append(x)
    if last == 0:
        return out
    # block 1: to second maxpool
    x = _conv_bn_relu(x, params["Conv2d_3b_1x1"])
    x = _conv_bn_relu(x, params["Conv2d_4a_3x3"])
    x = _max_pool_3x3_s2(x)
    if 1 in output_blocks:
        out.append(x)
    if last == 1:
        return out
    # block 2: to the aux-classifier tap
    x = _inception_a(x, params["Mixed_5b"])
    x = _inception_a(x, params["Mixed_5c"])
    x = _inception_a(x, params["Mixed_5d"])
    x = _inception_b(x, params["Mixed_6a"])
    x = _inception_c(x, params["Mixed_6b"])
    x = _inception_c(x, params["Mixed_6c"])
    x = _inception_c(x, params["Mixed_6d"])
    x = _inception_c(x, params["Mixed_6e"])
    if 2 in output_blocks:
        out.append(x)
    if last == 2:
        return out
    # block 3: to the final avgpool (pool3, 2048-d)
    x = _inception_a7(x, params)
    pooled = jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
    if 3 in output_blocks:
        out.append(pooled)
    return out


def _inception_a7(x, params):
    x = _inception_d(x, params["Mixed_7a"])
    x = _inception_e(x, params["Mixed_7b"])
    x = _inception_e(x, params["Mixed_7c"])
    return x


def pool3_features(params: Params, x: jax.Array) -> jax.Array:
    """FID's 2048-d activations (fid_score.py:69)."""
    return features(params, x, (3,))[0]


def logits(params: Params, x: jax.Array, resize_input: bool = False) -> jax.Array:
    """Classifier logits [B,1000] for the Inception Score path
    (inception_score.py:34-41: images already in (-1,1), optional
    align_corners=False upsample, transform_input=False)."""
    x = x.astype(jnp.float32)
    if resize_input:
        x = bilinear_resize(x, 299, align_corners=False)
    # the trunk runs directly on x (no (0,1) renormalization: IS feeds
    # (-1,1) tensors straight in, transform_input=False)
    y = _conv_bn_relu(x, params["Conv2d_1a_3x3"], stride=(2, 2))
    y = _conv_bn_relu(y, params["Conv2d_2a_3x3"])
    y = _conv_bn_relu(y, params["Conv2d_2b_3x3"], padding=P1)
    y = _max_pool_3x3_s2(y)
    y = _conv_bn_relu(y, params["Conv2d_3b_1x1"])
    y = _conv_bn_relu(y, params["Conv2d_4a_3x3"])
    y = _max_pool_3x3_s2(y)
    y = _inception_a(y, params["Mixed_5b"])
    y = _inception_a(y, params["Mixed_5c"])
    y = _inception_a(y, params["Mixed_5d"])
    y = _inception_b(y, params["Mixed_6a"])
    y = _inception_c(y, params["Mixed_6b"])
    y = _inception_c(y, params["Mixed_6c"])
    y = _inception_c(y, params["Mixed_6d"])
    y = _inception_c(y, params["Mixed_6e"])
    y = _inception_a7(y, params)
    pooled = jnp.mean(y, axis=(1, 2))
    return pooled @ params["fc"]["w"] + params["fc"]["b"]


# --------------------------------------------------------------------- #
# params: architecture table, random init, torchvision converter
# --------------------------------------------------------------------- #


def _arch() -> Dict[str, Dict[str, tuple]]:
    """module -> {conv_name: (kh, kw, cin, cout)}; mirrors torchvision."""
    def A(cin, pf):
        return {
            "branch1x1": (1, 1, cin, 64),
            "branch5x5_1": (1, 1, cin, 48), "branch5x5_2": (5, 5, 48, 64),
            "branch3x3dbl_1": (1, 1, cin, 64), "branch3x3dbl_2": (3, 3, 64, 96),
            "branch3x3dbl_3": (3, 3, 96, 96),
            "branch_pool": (1, 1, cin, pf),
        }

    def B(cin):
        return {
            "branch3x3": (3, 3, cin, 384),
            "branch3x3dbl_1": (1, 1, cin, 64), "branch3x3dbl_2": (3, 3, 64, 96),
            "branch3x3dbl_3": (3, 3, 96, 96),
        }

    def C(cin, c7):
        return {
            "branch1x1": (1, 1, cin, 192),
            "branch7x7_1": (1, 1, cin, c7), "branch7x7_2": (1, 7, c7, c7),
            "branch7x7_3": (7, 1, c7, 192),
            "branch7x7dbl_1": (1, 1, cin, c7), "branch7x7dbl_2": (7, 1, c7, c7),
            "branch7x7dbl_3": (1, 7, c7, c7), "branch7x7dbl_4": (7, 1, c7, c7),
            "branch7x7dbl_5": (1, 7, c7, 192),
            "branch_pool": (1, 1, cin, 192),
        }

    def D(cin):
        return {
            "branch3x3_1": (1, 1, cin, 192), "branch3x3_2": (3, 3, 192, 320),
            "branch7x7x3_1": (1, 1, cin, 192), "branch7x7x3_2": (1, 7, 192, 192),
            "branch7x7x3_3": (7, 1, 192, 192), "branch7x7x3_4": (3, 3, 192, 192),
        }

    def E(cin):
        return {
            "branch1x1": (1, 1, cin, 320),
            "branch3x3_1": (1, 1, cin, 384), "branch3x3_2a": (1, 3, 384, 384),
            "branch3x3_2b": (3, 1, 384, 384),
            "branch3x3dbl_1": (1, 1, cin, 448), "branch3x3dbl_2": (3, 3, 448, 384),
            "branch3x3dbl_3a": (1, 3, 384, 384), "branch3x3dbl_3b": (3, 1, 384, 384),
            "branch_pool": (1, 1, cin, 192),
        }

    return {
        "Conv2d_1a_3x3": {"": (3, 3, 3, 32)},
        "Conv2d_2a_3x3": {"": (3, 3, 32, 32)},
        "Conv2d_2b_3x3": {"": (3, 3, 32, 64)},
        "Conv2d_3b_1x1": {"": (1, 1, 64, 80)},
        "Conv2d_4a_3x3": {"": (3, 3, 80, 192)},
        "Mixed_5b": A(192, 32), "Mixed_5c": A(256, 64), "Mixed_5d": A(288, 64),
        "Mixed_6a": B(288),
        "Mixed_6b": C(768, 128), "Mixed_6c": C(768, 160),
        "Mixed_6d": C(768, 160), "Mixed_6e": C(768, 192),
        "Mixed_7a": D(768), "Mixed_7b": E(1280), "Mixed_7c": E(2048),
    }


def init_params(rng: jax.Array, with_fc: bool = True) -> Params:
    """Random init with the exact converter tree structure (for tests)."""
    params: Params = {}
    keys = jax.random.split(rng, 64)
    ki = 0

    def conv(shape):
        nonlocal ki
        kh, kw, cin, cout = shape
        fan_in = kh * kw * cin
        # He gain: without the sqrt(2) the ~94 relu layers attenuate
        # activations to ~2^-47 and every random-init feature collapses to 0
        w = jax.random.truncated_normal(
            keys[ki % 64], -2, 2, (kh, kw, cin, cout)
        ) * math.sqrt(2.0 / fan_in)
        ki += 1
        return {
            "w": w.astype(jnp.float32),
            "bn": {
                "scale": jnp.ones(cout),
                "bias": 0.1 * jax.random.normal(keys[(ki * 5) % 64], (cout,)),
                "mean": jnp.zeros(cout),
                "var": jnp.abs(jax.random.normal(keys[(ki * 7) % 64], (cout,))) + 0.5,
            },
        }

    for mod, convs in _arch().items():
        if list(convs) == [""]:
            params[mod] = conv(convs[""])
        else:
            params[mod] = {name: conv(shape) for name, shape in convs.items()}
    if with_fc:
        params["fc"] = {
            "w": jax.random.normal(keys[63], (2048, 1000)) * 0.01,
            "b": jnp.zeros(1000),
        }
    return params


def params_from_torch_state_dict(sd: Dict[str, Any]) -> Params:
    """torchvision ``inception_v3`` state_dict -> params pytree.

    Accepts torch tensors or numpy arrays.  Keys follow torchvision:
    ``<Module>.conv.weight`` (OIHW), ``<Module>.bn.{weight,bias,
    running_mean,running_var}``, branch convs as
    ``Mixed_5b.branch1x1.conv.weight`` etc., plus ``fc.{weight,bias}``.
    AuxLogits.* entries are ignored (eval-time network).
    """

    def arr(v) -> np.ndarray:
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    def conv(prefix: str, shape) -> Params:
        w = arr(sd[f"{prefix}.conv.weight"])  # OIHW
        assert w.shape == (shape[3], shape[2], shape[0], shape[1]), (
            prefix, w.shape, shape)
        return {
            "w": jnp.asarray(w.transpose(2, 3, 1, 0)),  # -> HWIO
            "bn": {
                "scale": jnp.asarray(arr(sd[f"{prefix}.bn.weight"])),
                "bias": jnp.asarray(arr(sd[f"{prefix}.bn.bias"])),
                "mean": jnp.asarray(arr(sd[f"{prefix}.bn.running_mean"])),
                "var": jnp.asarray(arr(sd[f"{prefix}.bn.running_var"])),
            },
        }

    params: Params = {}
    for mod, convs in _arch().items():
        if list(convs) == [""]:
            params[mod] = conv(mod, convs[""])
        else:
            params[mod] = {
                name: conv(f"{mod}.{name}", shape) for name, shape in convs.items()
            }
    if "fc.weight" in sd:
        params["fc"] = {
            "w": jnp.asarray(arr(sd["fc.weight"]).T),  # [1000,2048] -> [2048,1000]
            "b": jnp.asarray(arr(sd["fc.bias"])),
        }
    return params


def load_params(path: str) -> Params:
    """Load a torchvision ``.pth``/``.pt`` state dict (or an
    ``{'state_dict': ...}`` wrapper) from disk via torch.load."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return params_from_torch_state_dict(sd)


def num_params(params: Params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))
