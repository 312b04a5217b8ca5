"""Counter-hash PRNG (ops/hash_prng.py): uniform bounds (the f32
round-to-one regression), dropout statistics, and the gumbel-max masked-
token regression the bound bug caused."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from cogview_tpu.ops.hash_prng import (
    hash_dropout, hash_u32, hash_uniform, seed_from_key)

NEG_INF = -1e9


@pytest.mark.slow
def test_uniform_strictly_inside_unit_interval():
    """(bits + 0.5) * 2^-24 rounds to exactly 1.0f at bits == 2^24 - 1
    (round-to-even on the halfway point); the clamp must keep every value
    strictly below 1 so -log(-log(u)) stays finite."""
    n = 1 << 22
    hi = jnp.float32(1.0 - 2.0 ** -24)
    seen_top = False
    for chunk in range(16):  # 2^26 draws: top value hit w.p. ~98%
        c0 = lax.broadcasted_iota(jnp.uint32, (n, 1), 0)[:, 0] + jnp.uint32(chunk * n)
        u = hash_uniform(jnp.uint32(123), c0, jnp.uint32(chunk), jnp.uint32(7))
        g = -jnp.log(-jnp.log(u))
        assert float(jnp.max(u)) < 1.0
        assert float(jnp.min(u)) > 0.0
        assert bool(jnp.all(jnp.isfinite(g)))
        seen_top = seen_top or bool(jnp.any(u == hi))
    # statistical sanity on the last chunk
    assert abs(float(jnp.mean(u)) - 0.5) < 0.01
    assert seen_top, "sweep never reached the clamped top value (weak test)"


def test_gumbel_max_never_picks_masked_token():
    """The sampler regression: a +inf gumbel on a -1e9-masked logit let
    ~1 invalid token through per generated image before the clamp."""
    V, steps, allowed = 8192, 4096, 512
    logits = jnp.where(
        lax.broadcasted_iota(jnp.int32, (1, V), 1) < allowed, 0.0, NEG_INF)
    hit_bad = 0
    for t0 in range(0, steps, 256):
        rows = lax.broadcasted_iota(jnp.uint32, (256, V), 0) + jnp.uint32(t0)
        cols = lax.broadcasted_iota(jnp.uint32, (256, V), 1)
        u = hash_uniform(jnp.uint32(99), rows, cols, jnp.uint32(1))
        g = -jnp.log(-jnp.log(u))
        picks = jnp.argmax(logits + g, axis=-1)
        hit_bad += int(jnp.sum(picks >= allowed))
    assert hit_bad == 0, f"{hit_bad} masked tokens sampled"


def test_hash_dropout_statistics_and_determinism():
    x = jnp.ones((64, 257))
    for rate in (0.1, 0.5):
        y = hash_dropout(x, rate, jnp.uint32(5), salt=1)
        keep = float(jnp.mean((np.asarray(y) != 0)))
        assert abs(keep - (1 - rate)) < 0.02, (rate, keep)
        # inverted scaling on the kept elements
        vals = np.asarray(y)[np.asarray(y) != 0]
        np.testing.assert_allclose(vals, 1.0 / (1 - rate), rtol=1e-6)
    a = hash_dropout(x, 0.3, jnp.uint32(5), salt=1)
    b = hash_dropout(x, 0.3, jnp.uint32(5), salt=1)
    c = hash_dropout(x, 0.3, jnp.uint32(5), salt=2)
    d = hash_dropout(x, 0.3, jnp.uint32(6), salt=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert (np.asarray(a) != np.asarray(c)).any()
    assert (np.asarray(a) != np.asarray(d)).any()


def test_seed_from_key_variants():
    k1 = jax.random.key(3, impl="rbg")
    k2 = jax.random.key(4, impl="rbg")
    s1, s2 = seed_from_key(k1), seed_from_key(k2)
    assert s1.dtype == jnp.uint32 and int(s1) != int(s2)
    legacy = jnp.asarray([1, 2], jnp.uint32)
    assert seed_from_key(legacy).dtype == jnp.uint32


def test_hash_u32_mixes_coordinates():
    n = 4096
    c = lax.broadcasted_iota(jnp.uint32, (n, 1), 0)[:, 0]
    h1 = np.asarray(hash_u32(jnp.uint32(0), c, jnp.uint32(0), jnp.uint32(0)))
    h2 = np.asarray(hash_u32(jnp.uint32(0), c + jnp.uint32(1), jnp.uint32(0), jnp.uint32(0)))
    # adjacent counters decorrelate: ~half the bits flip on average
    flips = np.unpackbits(
        (h1 ^ h2).view(np.uint8)).mean()
    assert 0.45 < flips < 0.55
    assert len(np.unique(h1)) == n  # no collisions in a small sweep
