"""InceptionV3 JAX port: primitive oracles vs torch, architecture shapes,
torchvision-layout converter, and FID-of-identical-folders == 0.

No torchvision/pretrained weights exist in this environment; the
architecture constants (stem/mix output dims 64/192/768/2048, torchvision
state-dict key layout) are pinned here so converted published weights slot
in unchanged.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # InceptionV3 oracle parity + FID (~2 min incl. torch setup)

import jax
import jax.numpy as jnp

from cogview_tpu.eval_utils import inception
from cogview_tpu.eval_utils.fid import InceptionFeatures, fid_from_images


@pytest.fixture(scope="module")
def params():
    return inception.init_params(jax.random.PRNGKey(0))


# ------------------------------------------------------------------ #
# primitives vs torch oracles
# ------------------------------------------------------------------ #


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("hw,size", [((17, 23), 299), ((64, 64), 299), ((8, 8), 5)])
def test_bilinear_resize_matches_torch(align_corners, hw, size):
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(0).randn(2, *hw, 3).astype(np.float32)
    got = np.asarray(inception.bilinear_resize(jnp.asarray(x), size, align_corners))
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.interpolate(tx, size=(size, size), mode="bilinear",
                         align_corners=align_corners)
    want = want.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_avg_pool_count_include_pad_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(1).randn(2, 9, 9, 4).astype(np.float32)
    got = np.asarray(inception._avg_pool_3x3_s1_p1(jnp.asarray(x)))
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.avg_pool2d(tx, 3, stride=1, padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_max_pool_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.RandomState(2).randn(2, 15, 15, 4).astype(np.float32)
    got = np.asarray(inception._max_pool_3x3_s2(jnp.asarray(x)))
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    want = F.max_pool2d(tx, 3, stride=2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=0)


def test_conv_bn_relu_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    x = rng.randn(2, 11, 11, 5).astype(np.float32)
    w = (rng.randn(7, 5, 3, 3) * 0.1).astype(np.float32)  # OIHW
    scale = rng.rand(7).astype(np.float32) + 0.5
    bias = rng.randn(7).astype(np.float32)
    mean = rng.randn(7).astype(np.float32)
    var = (rng.rand(7).astype(np.float32) + 0.2)

    p = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
         "bn": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias),
                "mean": jnp.asarray(mean), "var": jnp.asarray(var)}}
    got = np.asarray(inception._conv_bn_relu(jnp.asarray(x), p, padding=inception.P1))

    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    y = F.conv2d(tx, torch.from_numpy(w), padding=1)
    y = F.batch_norm(y, torch.from_numpy(mean), torch.from_numpy(var),
                     torch.from_numpy(scale), torch.from_numpy(bias),
                     training=False, eps=1e-3)
    want = F.relu(y).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-4)


# ------------------------------------------------------------------ #
# architecture
# ------------------------------------------------------------------ #


def test_block_shapes_and_dims(params):
    """The four taps of reference inception.py (BLOCK_INDEX_BY_DIM
    64/192/768/2048) with the canonical 299-input spatial sizes."""
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    b0, b1, b2, b3 = inception.features(params, x, (0, 1, 2, 3))
    assert b0.shape == (1, 73, 73, 64)
    assert b1.shape == (1, 35, 35, 192)
    assert b2.shape == (1, 17, 17, 768)
    assert b3.shape == (1, 2048)
    assert np.isfinite(np.asarray(b3)).all()


def test_logits_shape(params):
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3) * 2 - 1, jnp.float32)
    lg = inception.logits(params, x, resize_input=True)
    assert lg.shape == (2, 1000)
    assert np.isfinite(np.asarray(lg)).all()


def test_converter_roundtrip_torchvision_layout(params):
    """A state dict in the exact torchvision key/shape layout converts to
    the same outputs as the source params (OIHW->HWIO transpose checked
    end-to-end through the network)."""
    sd = {}
    for mod, convs in inception._arch().items():
        for name, (kh, kw, cin, cout) in convs.items():
            prefix = mod if name == "" else f"{mod}.{name}"
            src = params[mod] if name == "" else params[mod][name]
            sd[f"{prefix}.conv.weight"] = np.asarray(src["w"]).transpose(3, 2, 0, 1)
            sd[f"{prefix}.bn.weight"] = np.asarray(src["bn"]["scale"])
            sd[f"{prefix}.bn.bias"] = np.asarray(src["bn"]["bias"])
            sd[f"{prefix}.bn.running_mean"] = np.asarray(src["bn"]["mean"])
            sd[f"{prefix}.bn.running_var"] = np.asarray(src["bn"]["var"])
    sd["fc.weight"] = np.asarray(params["fc"]["w"]).T
    sd["fc.bias"] = np.asarray(params["fc"]["b"])
    # a couple of well-known torchvision shapes pinned explicitly
    assert sd["Conv2d_1a_3x3.conv.weight"].shape == (32, 3, 3, 3)
    assert sd["Mixed_5b.branch_pool.conv.weight"].shape == (32, 192, 1, 1)
    assert sd["Mixed_6b.branch7x7_2.conv.weight"].shape == (128, 128, 1, 7)
    assert sd["Mixed_7c.branch3x3dbl_3b.conv.weight"].shape == (384, 384, 3, 1)
    assert sd["fc.weight"].shape == (1000, 2048)

    conv = inception.params_from_torch_state_dict(sd)
    x = jnp.asarray(np.random.RandomState(5).rand(1, 37, 41, 3), jnp.float32)
    want = inception.features(params, x, (3,))[0]
    got = inception.features(conv, x, (3,))[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_aux_keys_ignored(params):
    """AuxLogits.* and num_batches_tracked entries must not break the
    converter (present in real torchvision checkpoints)."""
    sd = {}
    for mod, convs in inception._arch().items():
        for name, _ in convs.items():
            prefix = mod if name == "" else f"{mod}.{name}"
            src = params[mod] if name == "" else params[mod][name]
            sd[f"{prefix}.conv.weight"] = np.asarray(src["w"]).transpose(3, 2, 0, 1)
            sd[f"{prefix}.bn.weight"] = np.asarray(src["bn"]["scale"])
            sd[f"{prefix}.bn.bias"] = np.asarray(src["bn"]["bias"])
            sd[f"{prefix}.bn.running_mean"] = np.asarray(src["bn"]["mean"])
            sd[f"{prefix}.bn.running_var"] = np.asarray(src["bn"]["var"])
            sd[f"{prefix}.bn.num_batches_tracked"] = np.int64(100)
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1), np.float32)
    out = inception.params_from_torch_state_dict(sd)
    assert "AuxLogits" not in out and "fc" not in out


# ------------------------------------------------------------------ #
# FID wiring
# ------------------------------------------------------------------ #


def test_fid_identical_folders_is_zero():
    imgs = np.random.RandomState(0).rand(6, 32, 32, 3).astype(np.float32)
    ex = InceptionFeatures()  # random-init net; flagged
    assert ex.pretrained is False
    fid = fid_from_images(imgs, imgs.copy(), ex, batch_size=3)
    assert abs(fid) < 1e-3, fid


def test_fid_separates_distributions():
    rng = np.random.RandomState(0)
    a = rng.rand(6, 32, 32, 3).astype(np.float32)
    b = np.clip(a + 0.5 * rng.rand(6, 32, 32, 3), 0, 1).astype(np.float32)
    ex = InceptionFeatures()
    same = fid_from_images(a, a.copy(), ex, batch_size=3)
    diff = fid_from_images(a, b, ex, batch_size=3)
    # a random-init trunk is weakly discriminative; the claim is ordering,
    # several orders of magnitude apart, not calibrated FID values
    assert abs(same) < 1e-6
    assert diff > 1e-4 and diff > abs(same) * 1e3
