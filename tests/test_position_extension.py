"""Position-embedding extension for SR finetuning (reference
utils.py:283-287) + one dual-positions finetune step at the extended
length."""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from cogview_tpu.config import tiny_test
from cogview_tpu.models import gpt


def test_extend_tiles_reference_semantics():
    """Divisible case == the reference's expand+reshape tiling."""
    w = jnp.asarray(np.random.RandomState(0).randn(8, 4).astype(np.float32))
    out = gpt.extend_position_embedding(w, 24)
    assert out.shape == (24, 4)
    want = np.tile(np.asarray(w), (3, 1))
    np.testing.assert_array_equal(np.asarray(out), want)


def test_extend_non_divisible_truncates_tiling():
    """1089 -> 1345-style: the tail reuses the table from row 0."""
    w = jnp.asarray(np.random.RandomState(1).randn(1089, 4).astype(np.float32))
    out = gpt.extend_position_embedding(w, 1345)
    assert out.shape == (1345, 4)
    np.testing.assert_array_equal(np.asarray(out[:1089]), np.asarray(w))
    np.testing.assert_array_equal(np.asarray(out[1089:]), np.asarray(w[:256]))


def test_adapt_noop_and_truncate():
    cfg = tiny_test()
    params = gpt.init_params(jax.random.PRNGKey(0), cfg)
    assert gpt.adapt_position_embeddings(params, cfg) is params  # no-op
    shorter = gpt.adapt_position_embeddings(params, cfg.replace(
        max_position_embeddings=cfg.max_position_embeddings - 16))
    assert shorter["embed"]["pos"].shape[0] == cfg.max_position_embeddings - 16


@pytest.mark.slow
def test_sr_finetune_step_at_extended_length():
    """Load a 'base' checkpoint's params into an extended-positions config
    and run one dual-positions train step at the full extended length —
    the cli/pretrain --preset cogview-sr --load <base> --finetune flow in
    miniature (64 -> 80 positions, like 1089 -> 1345)."""
    from cogview_tpu.training.train_loop import init_train_state, make_train_step

    base_cfg = tiny_test()  # 64 positions
    sr_cfg = base_cfg.replace(max_position_embeddings=80)
    base_params = gpt.init_params(jax.random.PRNGKey(0), base_cfg)

    params = gpt.adapt_position_embeddings(base_params, sr_cfg)
    assert params["embed"]["pos"].shape[0] == 80
    # everything but the position table is untouched (finetune start point)
    np.testing.assert_array_equal(
        np.asarray(params["embed"]["word"]),
        np.asarray(base_params["embed"]["word"]),
    )

    roi2 = 100  # an id < vocab_size acting as [ROI2]
    tx = optax.adam(1e-3)
    step = make_train_step(sr_cfg, tx, img_vocab=64, donate=False,
                           dual_positions_roi2=roi2)
    S = 80
    rng = np.random.RandomState(0)
    text = rng.randint(0, sr_cfg.vocab_size, (2, S + 1)).astype(np.int32)
    text[:, 40] = roi2  # second segment restarts here
    batch = {"text": text, "loss_mask": np.ones((2, S + 1), np.float32)}
    state = init_train_state(params, tx)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["lm_loss"]))
    assert int(metrics["skipped"]) == 0


def test_pretrain_cli_shape_mismatch_load(tmp_path):
    """checkpoint saved at one position length restores into a config with
    another (the cli try/except fallback path) and trains."""
    from cogview_tpu.training import checkpointing

    base_cfg = tiny_test()
    params = gpt.init_params(jax.random.PRNGKey(0), base_cfg)
    host = {"params": jax.tree.map(np.asarray, params), "iteration": 0}
    checkpointing.save_checkpoint(str(tmp_path / "ck"), 0, host)

    loaded = checkpointing.load_latest(str(tmp_path / "ck"), target=None)
    sr_cfg = base_cfg.replace(max_position_embeddings=96)
    adapted = gpt.adapt_position_embeddings(
        jax.tree.map(jnp.asarray, loaded["params"]), sr_cfg)
    out = gpt.forward(adapted, sr_cfg,
                      jnp.zeros((1, 96), jnp.int32))
    assert out.shape == (1, 96, base_cfg.vocab_size)
