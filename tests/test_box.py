"""Box/PBC math unit tests (SURVEY.md §6.2: min-image identities, wrap
idempotence)."""

import jax.numpy as jnp
import numpy as np

from md_neighbor_list_tpu.core.box import Box


def test_wrap_into_range(rng):
    box = Box(10.0)
    pos = jnp.asarray(rng.uniform(-50, 50, (1000, 3)), jnp.float32)
    w = box.wrap(pos)
    assert np.all(np.asarray(w) >= 0.0)
    assert np.all(np.asarray(w) < 10.0)


def test_wrap_idempotent(rng):
    box = Box(7.3)
    pos = jnp.asarray(rng.uniform(-30, 30, (500, 3)), jnp.float32)
    w1 = box.wrap(pos)
    w2 = box.wrap(w1)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_min_image_bound(rng):
    box = Box(12.0)
    dr = jnp.asarray(rng.uniform(-60, 60, (2000, 3)), jnp.float32)
    mi = np.asarray(box.min_image(dr))
    assert np.all(np.abs(mi) <= 6.0 + 1e-4)


def test_min_image_antisymmetric(rng):
    box = Box(9.0)
    a = jnp.asarray(rng.uniform(0, 9, (300, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 9, (300, 3)), jnp.float32)
    ab = np.asarray(box.min_image(a - b))
    ba = np.asarray(box.min_image(b - a))
    np.testing.assert_allclose(ab, -ba, atol=1e-5)


def test_min_image_matches_naive(rng):
    """Min image of wrapped points equals the true nearest periodic image."""
    box = Box(5.0)
    a = np.asarray(rng.uniform(0, 5, (200, 3)))
    b = np.asarray(rng.uniform(0, 5, (200, 3)))
    mi = np.asarray(box.min_image(jnp.asarray(a - b, jnp.float32)))
    # exhaustive over 27 images
    best = None
    shifts = np.array(
        [[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)]
    ) * 5.0
    d = a[:, None, :] - b[:, None, :] + shifts[None, :, :]
    norms = np.sum(d * d, axis=-1)
    best = np.min(norms, axis=1)
    np.testing.assert_allclose(np.sum(mi * mi, axis=-1), best, rtol=1e-4)
