"""fp16 dynamic-loss-scale training end-to-end + bit-deterministic resume.

VERDICT r1 items 4 & 6: the fp16 step must train (loss decreasing, scale
moving both directions), and train-10 must bit-equal train-5 / save /
restore / train-5 (rng + dataloader position + scaler state all live in
the checkpoint, reference utils.py:203-220).
"""

import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow  # multi-step train/resume loops (~30s)

import jax
import jax.numpy as jnp

from cogview_tpu.config import tiny_test
from cogview_tpu.data.loader import BatchIterator
from cogview_tpu.training import checkpointing
from cogview_tpu.training.train_loop import (
    init_fp16_train_state,
    init_train_state,
    make_fp16_train_step,
    make_train_step,
)

CFG = tiny_test()
IMG_VOCAB = 64


def _dataset(n=64, seed=0):
    rng = np.random.RandomState(seed)
    S = CFG.max_position_embeddings
    return [
        {
            "text": rng.randint(0, CFG.vocab_size, S + 1).astype(np.int32),
            "loss_mask": np.ones(S + 1, np.float32),
        }
        for _ in range(n)
    ]


def test_fp16_step_trains_and_scale_moves_both_ways():
    """50+ fp16 steps on the tiny config: loss decreases, and the dynamic
    scale is observed to both shrink (overflow) and grow (scale_window)."""
    ds = _dataset()
    tx = optax.adam(1e-3)
    params = jax.tree.map(
        lambda x: x, __import__("cogview_tpu.models.gpt", fromlist=["gpt"]).init_params(
            jax.random.PRNGKey(0), CFG
        )
    )
    state = init_fp16_train_state(params, tx, init_scale=2.0 ** 24, hysteresis=1)
    step = make_fp16_train_step(
        CFG, tx, img_vocab=IMG_VOCAB, scale_window=6, hysteresis=1, donate=False
    )
    batch = {k: np.stack([ds[i][k] for i in range(4)]) for k in ds[0]}

    losses, scales = [], [float(state["loss_scale"].scale)]
    rng = jax.random.PRNGKey(1)
    for i in range(60):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["lm_loss"]))
        scales.append(float(metrics["loss_scale"]))

    diffs = np.diff(scales)
    assert (diffs < 0).any(), f"scale never shrank: {scales[:10]}..."
    assert (diffs > 0).any(), f"scale never grew: {scales[-10:]}"
    assert int(state["skipped"]) > 0  # the overflow steps were skipped
    # trained steps happened and learning occurred on the fixed batch
    assert int(state["step"]) >= 20
    assert losses[-1] < losses[0] - 0.1, (losses[0], losses[-1])
    assert np.isfinite(losses).all()


@pytest.mark.parametrize("fp16", [False, True])
def test_bit_deterministic_resume(tmp_path, fp16):
    """train 10 == train 5 / save / restore / train 5, bit-equal losses —
    exercising exactly what cli/pretrain checkpoints: params, opt state,
    training rng, loader position, and (fp16) the loss-scaler state."""
    from cogview_tpu.models import gpt
    from cogview_tpu.training.loss_scaler import LossScaleState

    ds = _dataset()
    tx = optax.adam(1e-3)

    def fresh():
        params = gpt.init_params(jax.random.PRNGKey(0), CFG)
        if fp16:
            return init_fp16_train_state(params, tx, init_scale=2.0 ** 16)
        return init_train_state(params, tx)

    mk = make_fp16_train_step if fp16 else make_train_step
    step = mk(CFG, tx, img_vocab=IMG_VOCAB, donate=False)

    def run(state, it, rng, n):
        data = iter(it)
        losses = []
        for _ in range(n):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, {k: v for k, v in next(data).items()}, sub)
            losses.append(np.float32(metrics["lm_loss"]))
        return state, rng, losses

    # ---- straight-through run: 10 steps
    it_a = BatchIterator(ds, 4, seed=3, prefetch=0)
    _, _, losses_a = run(fresh(), it_a, jax.random.PRNGKey(9), 10)

    # ---- 5 steps, checkpoint (as cli/pretrain does), restore, 5 more
    it_b = BatchIterator(ds, 4, seed=3, prefetch=0)
    state_b, rng_b, losses_b1 = run(fresh(), it_b, jax.random.PRNGKey(9), 5)
    host = {
        "params": state_b["params"],
        "opt_state": state_b["opt_state"],
        "iteration": 5,
        "rng": rng_b,
        "loader_consumed": 5,
    }
    if fp16:
        host["loss_scale"] = state_b["loss_scale"]._asdict()
    checkpointing.save_checkpoint(
        str(tmp_path / "ck"), 5, jax.tree.map(np.asarray, host)
    )

    state_c = fresh()  # fresh process: re-init everything, then restore
    target = jax.tree.map(
        np.asarray,
        {
            "params": state_c["params"],
            "opt_state": state_c["opt_state"],
            "iteration": 0,
            "rng": jax.random.PRNGKey(0),
            "loader_consumed": 0,
        },
    )
    if fp16:
        target["loss_scale"] = jax.tree.map(np.asarray, state_c["loss_scale"]._asdict())
    loaded = checkpointing.load_latest(str(tmp_path / "ck"), target=target)
    state_c["params"] = jax.tree.map(jnp.asarray, loaded["params"])
    state_c["opt_state"] = jax.tree.map(jnp.asarray, loaded["opt_state"])
    if fp16:
        state_c["loss_scale"] = LossScaleState(
            **jax.tree.map(jnp.asarray, loaded["loss_scale"])
        )
    rng_c = jnp.asarray(loaded["rng"])
    it_c = BatchIterator(ds, 4, seed=3, prefetch=0)
    it_c.fast_forward(int(loaded["loader_consumed"]))
    _, _, losses_c = run(state_c, it_c, rng_c, 5)

    np.testing.assert_array_equal(
        np.asarray(losses_b1 + losses_c), np.asarray(losses_a),
        err_msg="resume is not bit-deterministic",
    )
