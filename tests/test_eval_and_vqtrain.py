"""Eval harness math, VQ-VAE trainer, and the fp16 loss-scale shim."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # VQ training loops (~40s)

import jax
import jax.numpy as jnp

from cogview_tpu.eval_utils.fid import (
    compute_statistics,
    fid_from_features,
    frechet_distance,
)
from cogview_tpu.eval_utils.inception_score import inception_score_from_probs
from cogview_tpu.training.loss_scaler import (
    init_loss_scale,
    scale_loss,
    unscale_grads,
    update_loss_scale,
)


def test_frechet_identity_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(500, 16)
    mu, s = compute_statistics(f)
    assert abs(frechet_distance(mu, s, mu, s)) < 1e-6


def test_frechet_known_gaussians():
    """Diagonal Gaussians: FID = ||dmu||^2 + sum (sqrt(s1)-sqrt(s2))^2."""
    d = 4
    mu1, mu2 = np.zeros(d), np.ones(d) * 2.0
    s1, s2 = np.eye(d) * 4.0, np.eye(d) * 1.0
    want = float(np.sum((mu1 - mu2) ** 2) + d * (2.0 - 1.0) ** 2)
    got = frechet_distance(mu1, s1, mu2, s2)
    assert abs(got - want) < 1e-8


def test_fid_sensitivity():
    rng = np.random.RandomState(0)
    a = rng.randn(800, 8)
    b = rng.randn(800, 8)
    c = rng.randn(800, 8) + 3.0
    near = fid_from_features(a, b)
    far = fid_from_features(a, c)
    assert near < 1.0 < far


def test_inception_score_bounds():
    n, c = 500, 10
    uniform = np.full((n, c), 1.0 / c)
    mean_u, _ = inception_score_from_probs(uniform)
    assert abs(mean_u - 1.0) < 1e-6  # uniform conditionals -> IS = 1
    onehot = np.eye(c)[np.random.RandomState(0).randint(0, c, n)]
    mean_o, _ = inception_score_from_probs(onehot * 0.999 + 1e-4)
    assert mean_o > 5.0  # confident + diverse -> high IS


def test_vq_encoder_feature_extractor():
    from cogview_tpu.eval_utils.fid import VQEncoderFeatures
    from cogview_tpu.models import vqvae

    params = vqvae.init_params(jax.random.PRNGKey(0))
    ex = VQEncoderFeatures(params)
    imgs = np.random.RandomState(0).rand(3, 32, 32, 3).astype(np.float32)
    feats = ex(imgs)
    assert feats.shape == (3, 256)
    assert np.isfinite(feats).all()


def test_vqvae_training_reduces_loss():
    import optax

    from cogview_tpu.models import vqvae
    from cogview_tpu.training.vqvae_train import (
        init_vqvae_train_state,
        make_vqvae_train_step,
    )

    params = vqvae.init_params(jax.random.PRNGKey(0))
    embed0 = np.asarray(params["quantize"]["embed"])  # donated below
    tx = optax.adam(3e-4)
    state = init_vqvae_train_state(params, tx)
    step = make_vqvae_train_step(tx)
    batch = jnp.asarray(
        np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32)
    )
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert 0.0 < float(metrics["codebook_usage"]) <= 1.0
    # codebook actually moved (EMA)
    assert not np.allclose(
        np.asarray(state["params"]["quantize"]["embed"]), embed0
    )


def test_loss_scaler_dynamics():
    st = init_loss_scale(init_scale=1024.0, hysteresis=2)
    # overflow twice: first consumes hysteresis, second lowers the scale
    st, ok = update_loss_scale(st, jnp.bool_(True), scale_window=4)
    assert not bool(ok) and float(st.scale) == 1024.0
    st, ok = update_loss_scale(st, jnp.bool_(True), scale_window=4)
    assert float(st.scale) == 512.0
    # four good steps -> doubles
    for _ in range(4):
        st, ok = update_loss_scale(st, jnp.bool_(False), scale_window=4)
    assert bool(ok) and float(st.scale) == 1024.0
    # scaling helpers round-trip
    g = {"w": jnp.ones(3)}
    assert float(scale_loss(jnp.float32(2.0), st)) == 2.0 * 1024.0
    back = unscale_grads(jax.tree.map(lambda x: x * st.scale, g), st)
    np.testing.assert_allclose(np.asarray(back["w"]), 1.0, rtol=1e-6)


def test_gumbel_quantize_modes():
    from cogview_tpu.models import vqvae

    params = vqvae.init_params(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 256))

    soft, kl, codes = vqvae.quantize_gumbel(params, z, jax.random.PRNGKey(2),
                                            temperature=1.0, hard=False)
    assert soft.shape == z.shape and codes.shape == (2, 4, 4)
    assert np.isfinite(float(kl))

    hard, kl_h, codes_h = vqvae.quantize_gumbel(params, z, jax.random.PRNGKey(2),
                                                temperature=1.0, hard=True)
    # hard mode still returns the KL regularizer (reference vqvae_zc.py:88-90
    # computes diff=KL for both relaxed modes), identical to the soft one
    np.testing.assert_allclose(float(kl_h), float(kl), rtol=1e-6)
    # hard output is an exact codebook vector per position
    emb = np.asarray(params["quantize"]["embed"]).T  # [K, D]
    got = np.asarray(hard)[0, 0, 0]
    want = emb[int(np.asarray(codes_h)[0, 0, 0])]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # same rng -> same codes (temperature scales after the gumbel add,
    # reference vqvae_zc.py:333, so codes are a softmax(logits) sample,
    # not the argmin — determinism is the testable contract)
    _, _, codes_again = vqvae.quantize_gumbel(params, z, jax.random.PRNGKey(2),
                                              temperature=1.0, hard=True)
    np.testing.assert_array_equal(np.asarray(codes_h), np.asarray(codes_again))
    assert int(np.asarray(codes_h).min()) >= 0
    assert int(np.asarray(codes_h).max()) < 8192


def test_gumbel_soft_gradient_flows():
    from cogview_tpu.models import vqvae

    params = vqvae.init_params(jax.random.PRNGKey(0))

    def f(z):
        qz, kl, _ = vqvae.quantize_gumbel(params, z, jax.random.PRNGKey(2))
        return jnp.sum(qz**2) + kl

    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 256))
    g = jax.grad(f)(z)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_gumbel_trainer_hard_updates_codebook():
    """Hard-mode gumbel trainer: loss finite, EMA codebook moves (the
    reference runs the EMA update in continuous_relax+hard training,
    vqvae_zc.py:67-83), temperature traced (no recompile to anneal)."""
    import optax
    from cogview_tpu.models import vqvae
    from cogview_tpu.training.vqvae_train import (
        init_vqvae_train_state, make_vqvae_gumbel_train_step)

    params = vqvae.init_params(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    state = init_vqvae_train_state(params, tx)
    step = make_vqvae_gumbel_train_step(tx, hard=True)
    batch = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    embed0 = np.asarray(params["quantize"]["embed"])
    for i, temp in enumerate([1.0, 0.9]):
        state, metrics = step(state, batch, jax.random.PRNGKey(10 + i),
                              jnp.float32(temp))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["kl"]))
    embed1 = np.asarray(state["params"]["quantize"]["embed"])
    assert np.abs(embed1 - embed0).max() > 0  # EMA moved the codebook


@pytest.mark.slow
def test_vqtrain_cli_end_to_end(tmp_path):
    """cli/vqtrain end-to-end over a folder of images (the stage-1
    trainer the reference README documents but never shipped,
    vqvae/README.md:20-24): 2 iters on the 8-device conftest mesh,
    checkpoint written, metrics JSONL emitted."""
    from PIL import Image

    from cogview_tpu.cli.vqtrain import main

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(10):
        Image.fromarray(rng.randint(0, 255, (20, 20, 3), np.uint8)).save(
            img_dir / f"{i}.png")

    save_dir = tmp_path / "ckpt"
    rc = main([
        "--data", str(img_dir), "--img-size", "16",
        # batch must divide the 8-device conftest mesh's data axis
        "--batch-size", "8", "--train-iters", "2",
        "--channel", "8", "--embed-dim", "8", "--n-embed", "16",
        "--save", str(save_dir), "--save-interval", "2",
        "--log-interval", "1", "--summary-dir", str(tmp_path / "logs"),
    ])
    assert rc == 0
    assert (save_dir / "2").exists()
    assert (tmp_path / "logs" / "vqtrain.metrics.jsonl").exists()


@pytest.mark.slow
def test_vqtrain_cli_gumbel_mode(tmp_path):
    from PIL import Image

    from cogview_tpu.cli.vqtrain import main

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    for i in range(8):
        Image.fromarray(rng.randint(0, 255, (16, 16, 3), np.uint8)).save(
            img_dir / f"{i}.png")

    rc = main([
        "--data", str(img_dir), "--img-size", "16",
        "--batch-size", "8", "--train-iters", "2",
        "--channel", "8", "--embed-dim", "8", "--n-embed", "16",
        "--gumbel", "--gumbel-hard", "--log-interval", "1",
    ])
    assert rc == 0
