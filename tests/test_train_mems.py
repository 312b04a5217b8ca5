"""--max-memory-length through the training driver (VERDICT r2 item 4).

The reference threads transformer-XL mems across training iterations
(pretrain_gpt2.py:292-341 forward_step takes and returns mems; train at
:497-513 carries them between train_steps; flag arguments.py:268).  The
model-level mechanism (gpt.forward_with_mems) already has torch-oracle
parity coverage in test_gpt_forward.py; these tests cover the driver path:
make_train_step(max_memory_length>0) threading, loss equivalence with a
manual forward_with_mems computation, mems advancing on skipped steps, and
the pretrain CLI flag end-to-end.
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp

from cogview_tpu.config import tiny_test
from cogview_tpu.models import gpt
from cogview_tpu.training.losses import lm_loss_with_mems
from cogview_tpu.training.train_loop import (
    init_fp16_train_state,
    init_train_state,
    make_fp16_train_step,
    make_train_step,
)

CFG = tiny_test()
IMG_VOCAB = 64
MEM_LEN = 80  # > S=64 (the tiny config's seq), so growth takes 2 segments


def _batches(n, batch=2, seed=0):
    rng = np.random.RandomState(seed)
    S = CFG.max_position_embeddings
    return [
        {
            "text": rng.randint(0, CFG.vocab_size, (batch, S + 1)).astype(np.int32),
            "loss_mask": np.ones((batch, S + 1), np.float32),
        }
        for _ in range(n)
    ]


def test_train_step_threads_mems_across_segments():
    """3 mems-enabled train steps: finite losses, mems grow to the cap
    with the documented [L+1, B, M, H] shape, and segment-2's loss equals
    a manual lm_loss_with_mems evaluation on the pre-step params."""
    S = CFG.max_position_embeddings
    params = gpt.init_params(jax.random.PRNGKey(0), CFG)
    tx = optax.adam(1e-3)
    state = init_train_state(params, tx)
    step = make_train_step(CFG, tx, img_vocab=IMG_VOCAB, donate=False,
                           max_memory_length=MEM_LEN)
    batches = _batches(3)
    rng = jax.random.PRNGKey(1)

    mems = None
    seen_shapes = []
    losses = []
    for i, batch in enumerate(batches):
        rng, sub = jax.random.split(rng)
        if i == 1:
            # manual check against the loss path on the same inputs
            params_before = state["params"]
            want, (_, want_mems) = lm_loss_with_mems(
                params_before, CFG, jax.tree.map(jnp.asarray, batch), mems,
                max_memory_length=MEM_LEN, img_vocab=IMG_VOCAB,
                train=False, remat=False,
            )
        state, metrics, mems = step(state, batch, sub, mems)
        losses.append(float(metrics["lm_loss"]))
        seen_shapes.append(tuple(mems.shape))

    assert np.isfinite(losses).all(), losses
    L, B = CFG.num_layers, batches[0]["text"].shape[0]
    # growth: min(MEM_LEN, S) after seg 1, then capped at MEM_LEN
    assert seen_shapes[0] == (L + 1, B, min(MEM_LEN, S), CFG.hidden_size)
    assert seen_shapes[-1] == (L + 1, B, MEM_LEN, CFG.hidden_size)
    # train=True uses dropout-free tiny config? tiny_test has dropout 0 ->
    # the manual eval-mode loss must match the step's segment-2 loss
    np.testing.assert_allclose(losses[1], float(want), rtol=2e-5)


def test_mems_advance_even_on_skipped_step():
    """A batch with an out-of-vocab token id NaNs the loss: the update is
    skipped (reference NaN guard) but the mems still advance — matching
    forward_step returning mems before the skip decision."""
    params = gpt.init_params(jax.random.PRNGKey(0), CFG)
    tx = optax.adam(1e-3)
    state = init_train_state(params, tx)
    step = make_train_step(CFG, tx, img_vocab=IMG_VOCAB, donate=False,
                           max_memory_length=MEM_LEN)
    (bad,) = _batches(1)
    bad["text"][:, 3] = CFG.vocab_size + 7  # out of range -> NaN loss
    rng = jax.random.PRNGKey(2)
    state, metrics, mems = step(state, bad, rng, None)
    assert int(metrics["skipped"]) == 1
    # mems advanced (the reference returns them from forward_step before
    # the skip decision; like the reference it does NOT sanitize them —
    # the poisoned row's NaNs ride along, params/opt state are protected)
    assert mems is not None and mems.shape[2] == min(
        MEM_LEN, CFG.max_position_embeddings)
    ok = jax.tree.map(lambda a, b: bool(jnp.all(a == b)),
                      state["params"], gpt.init_params(jax.random.PRNGKey(0), CFG))
    assert all(jax.tree.leaves(ok)), "skipped step must not touch params"


def test_fp16_step_threads_mems():
    params = gpt.init_params(jax.random.PRNGKey(0), CFG)
    tx = optax.adam(1e-3)
    state = init_fp16_train_state(params, tx, init_scale=2.0 ** 10)
    step = make_fp16_train_step(CFG, tx, img_vocab=IMG_VOCAB, donate=False,
                                max_memory_length=MEM_LEN)
    batches = _batches(2, seed=3)
    rng = jax.random.PRNGKey(3)
    mems = None
    for batch in batches:
        rng, sub = jax.random.split(rng)
        state, metrics, mems = step(state, batch, sub, mems)
        assert np.isfinite(float(metrics["lm_loss"]))
    assert mems.shape[2] == MEM_LEN


def test_sparse_plus_mems_rejected():
    tx = optax.adam(1e-3)
    with pytest.raises(AssertionError):
        make_train_step(CFG, tx, is_sparse=True, max_memory_length=4)


@pytest.mark.slow
def test_pretrain_cli_max_memory_length(tmp_path):
    """pretrain CLI end-to-end with --max-memory-length (smoke preset:
    real unified vocab over 2 tiny layers; reference CompactBinaryDataset
    row format)."""
    from cogview_tpu.cli.pretrain import main

    rng = np.random.RandomState(0)
    rows = np.full((16, 64 + 1024), -1, np.int32)
    rows[:, :8] = rng.randint(8192, 58192, size=(16, 8))
    rows[:, 64:] = rng.randint(0, 8192, size=(16, 1024))
    path = str(tmp_path / "mems_t2i.bin")
    rows.tofile(path)

    rc = main([
        # batch must divide the 8-device conftest mesh's data axis
        "--preset", "smoke", "--train-data", path,
        "--train-iters", "2", "--batch-size", "8",
        "--max-memory-length", "128",
        "--log-interval", "1", "--eval-interval", "100",
        "--split", "1.0,0.0,0.0",
    ])
    assert rc == 0


def test_pretrain_cli_rejects_indivisible_batch(tmp_path):
    """A batch size that does not divide the mesh's data axis fails fast
    with a readable message, not a device_put sharding error mid-step."""
    from cogview_tpu.cli.pretrain import main

    rows = np.full((8, 64 + 1024), -1, np.int32)
    rows[:, 64:] = 0
    path = str(tmp_path / "tiny_t2i.bin")
    rows.tofile(path)
    with pytest.raises(SystemExit, match="divisible by the data axis"):
        main(["--preset", "smoke", "--train-data", path,
              "--train-iters", "1", "--batch-size", "2",
              "--split", "1.0,0.0,0.0"])
