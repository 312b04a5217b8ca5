"""VQ-VAE parity: JAX NHWC implementation vs the reference torch model.

The reference vqvae_zc.VQVAE (imported read-only as a numerical oracle,
never shipped) is run with random weights on CPU; the converter maps its
state_dict into our pytree and codes/pixels must agree.
"""

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cogview_tpu.models import vqvae  # noqa: E402
from cogview_tpu.models.convert import vqvae_from_state_dict  # noqa: E402

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def oracle():
    from vqvae.vqvae_zc import VQVAE

    torch.manual_seed(0)
    m = VQVAE(
        channel=512, n_res_block=0, n_res_channel=32,
        embed_dim=256, n_embed=8192, stride=6,
    )
    m.eval()
    return m


@pytest.fixture(scope="module")
def params(oracle):
    return jax.tree.map(jnp.asarray, vqvae_from_state_dict(oracle.state_dict()))


@pytest.fixture(scope="module")
def image():
    rng = np.random.RandomState(42)
    return rng.randn(1, 3, 32, 32).astype(np.float32)  # small for CPU speed


def test_encode_codes_bitmatch(oracle, params, image):
    with torch.no_grad():
        _, _, id_t = oracle.encode(torch.from_numpy(image))
    ref_codes = id_t.reshape(1, -1).numpy()

    codes = vqvae.img2code(params, jnp.asarray(image.transpose(0, 2, 3, 1)))
    codes = np.asarray(codes)
    assert codes.shape == ref_codes.shape == (1, 16)
    mismatch = (codes != ref_codes).mean()
    assert mismatch == 0.0, f"code mismatch rate {mismatch}"


def test_encoder_features_close(oracle, params, image):
    with torch.no_grad():
        ref = oracle.enc_b(torch.from_numpy(image)).numpy()  # [b,h,w,c]
    got = np.asarray(vqvae.encode_features(params, jnp.asarray(image.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_decode_pixels_close(oracle, params):
    rng = np.random.RandomState(7)
    codes = rng.randint(0, 8192, size=(1, 4, 4)).astype(np.int64)
    with torch.no_grad():
        ref = oracle.decode_code(torch.from_numpy(codes)).numpy()  # [b,3,h,w]
    got = np.asarray(vqvae.decode_features(
        params, vqvae.lookup_code(params["quantize"]["embed"], jnp.asarray(codes))
    ))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=2e-3)


def test_code2img_denormalization(params):
    codes = jnp.zeros((1, 16), jnp.int32)
    img = np.asarray(vqvae.code2img(params, codes))
    assert img.shape == (1, 32, 32, 3)


def test_roundtrip_stability(params):
    """encode(decode(codes)) must be deterministic and in range."""
    rng = np.random.RandomState(3)
    codes = jnp.asarray(rng.randint(0, 8192, size=(1, 16)))
    img = vqvae.code2img(params, codes)
    img_norm = (img - jnp.asarray(vqvae.IMG_MEAN)) / jnp.asarray(vqvae.IMG_STD)
    codes2 = vqvae.img2code(params, img_norm)
    codes3 = vqvae.img2code(params, img_norm)
    assert np.array_equal(np.asarray(codes2), np.asarray(codes3))
    assert int(codes2.max()) < 8192 and int(codes2.min()) >= 0


def test_ema_update_moves_codebook(params):
    rng = jax.random.PRNGKey(0)
    z = jax.random.normal(rng, (4, 8, 8, 256))
    quant, codes, diff, new_q = vqvae.quantize_st(params, z, train=True)
    assert quant.shape == z.shape
    assert float(diff) > 0
    assert not np.allclose(
        np.asarray(new_q["cluster_size"]), np.asarray(params["quantize"]["cluster_size"])
    )


def test_straight_through_gradient(params):
    """d quantize_st / dz == identity (straight-through estimator)."""

    def f(z):
        quant, *_ = vqvae.quantize_st(params, z)
        return jnp.sum(quant * 3.0)

    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 256))
    g = jax.grad(f)(z)
    np.testing.assert_allclose(np.asarray(g), 3.0 * np.ones_like(g), rtol=1e-6)


@pytest.mark.slow
def test_code2img_bf16_decode_close(params):
    """The bf16 decode fast path (code2img(dtype=bfloat16)) must stay
    visually identical to the fp32 HIGHEST path: pixels are clipped to
    8 bits downstream, so < ~1.5e-2 absolute error on the 0..1 range is
    invisible in saved images."""
    rng = np.random.RandomState(7)
    codes = jnp.asarray(rng.randint(0, 8192, (2, 16)))
    full = np.asarray(vqvae.code2img(params, codes), np.float32)
    fast = np.asarray(
        vqvae.code2img(params, codes, dtype=jnp.bfloat16), np.float32)
    assert fast.dtype == np.float32 and fast.shape == full.shape
    err = np.abs(fast - full).max()
    assert err < 1.5e-2, f"bf16 decode max abs err {err}"


def test_img2code_bf16_encode_mostly_agrees(params):
    """The opt-in bf16 encoder (img2code(dtype=bfloat16)) is documented as
    self-consistent-but-not-bit-parity: the code flip rate vs the fp32
    path must stay small (flips happen only near quantization ties)."""
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    exact = np.asarray(vqvae.img2code(params, img))
    fast = np.asarray(vqvae.img2code(params, img, dtype=jnp.bfloat16))
    assert exact.shape == fast.shape
    flip = (exact != fast).mean()
    assert flip < 0.05, f"bf16 encode flips {flip:.3%} of codes"


@pytest.mark.slow
def test_subpixel_convt_matches_lax_conv_transpose():
    """The decoder's k4/s2/p1 ConvTranspose runs as a sub-pixel conv (see
    vqvae._conv_transpose_421); it must equal the lax.conv_transpose
    lowering bit-closely, forward and gradient."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 6, 6, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, 12, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(12).astype(np.float32))

    def ref(w):
        return jax.lax.conv_transpose(
            x, w, strides=(2, 2), padding=((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
            precision=jax.lax.Precision.HIGHEST) + b

    got = vqvae._conv_transpose_421(x, {"w": w, "b": b})
    want = ref(w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.grad(lambda w: jnp.sum(
        vqvae._conv_transpose_421(x, {"w": w, "b": b}) ** 2))(w)
    g2 = jax.grad(lambda w: jnp.sum(ref(w) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)
