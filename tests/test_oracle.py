"""Oracle self-checks: the JAX brute-force oracle vs an independent numpy
implementation, plus physics identities of the exact forces.

The oracle is the root of the parity chain (SURVEY.md §0 item 4: with the
reference mount empty, "matches the reference" is operationalized as
"matches the brute-force oracle"), so the oracle itself is cross-checked
against a second, independently written O(N^2) path."""

import jax
import jax.numpy as jnp
import numpy as np

from md_neighbor_list_tpu.core.box import Box
from md_neighbor_list_tpu.ops import oracle
from tests.util import numpy_pairs, pairs_from_rows


def _random(rng, n, rho=1.0):
    box = Box.from_density(n, rho)
    pos = jnp.asarray(rng.uniform(0, box.L, (n, 3)), jnp.float32)
    return pos, box


def test_pair_count_vs_numpy(rng):
    for n in (64, 500, 1500):
        pos, box = _random(rng, n)
        want = len(numpy_pairs(np.asarray(pos), box.L, 2.8))
        got = int(oracle.pair_count(pos, box, 2.8))
        assert got == want


def test_neighbors_pair_set_vs_numpy(rng):
    pos, box = _random(rng, 800)
    want = numpy_pairs(np.asarray(pos), box.L, 2.8)
    idx, cnt = oracle.neighbors(pos, box, 2.8, k_cap=256, half=True)
    got = pairs_from_rows(np.asarray(idx), half=True)
    assert got == want
    assert int(jnp.max(cnt)) <= 256


def test_neighbors_full_is_symmetric(rng):
    pos, box = _random(rng, 400)
    idx, _ = oracle.neighbors(pos, box, 2.8, k_cap=256, half=False)
    full = pairs_from_rows(np.asarray(idx), half=False)
    half_idx, _ = oracle.neighbors(pos, box, 2.8, k_cap=256, half=True)
    half = pairs_from_rows(np.asarray(half_idx), half=True)
    assert full == half  # canonicalized sets coincide


def test_forces_momentum_and_symmetry(rng):
    pos, box = _random(rng, 600)
    f, u = oracle.forces_energy(pos, box, 2.5)
    f = np.asarray(f)
    # Newton's 3rd law => zero net force (fp32 roundoff scale)
    assert np.abs(f.sum(axis=0)).max() < 1e-1 * np.abs(f).max() * 1e-3 + 1.0
    assert np.isfinite(np.asarray(u))


def test_forces_match_numerical_gradient(rng):
    """F = -dU/dx, finite-difference check on a few coordinates (f64 numpy
    potential to avoid fp32 differencing noise). Uses a perturbed lattice:
    uniform-random points contain near-overlaps whose ~1e11 potential terms
    make finite differencing catastrophically ill-conditioned."""
    from md_neighbor_list_tpu.core.system import init_lattice

    n = 64
    system, box = init_lattice(n, 0.8)
    pos = np.asarray(system.pos, np.float64)
    pos += rng.uniform(-0.05, 0.05, pos.shape)
    rc = 2.5

    def potential(p):
        dr = p[:, None, :] - p[None, :, :]
        dr -= box.L * np.round(dr / box.L)
        r2 = np.sum(dr * dr, axis=-1)
        iu = np.triu_indices(n, k=1)
        r2p = r2[iu]
        m = r2p < rc * rc
        s6 = (1.0 / r2p[m]) ** 3
        s6c = (1.0 / rc**2) ** 3
        return np.sum(4 * (s6 * s6 - s6) - 4 * (s6c * s6c - s6c))

    f, _ = oracle.forces_energy(jnp.asarray(pos, jnp.float32), box, rc)
    f = np.asarray(f)
    h = 1e-5
    for (i, d) in [(0, 0), (3, 1), (10, 2)]:
        pp = pos.copy()
        pp[i, d] += h
        um = potential(pp)
        pp[i, d] -= 2 * h
        up = potential(pp)
        fd = -(um - up) / (2 * h)
        assert abs(fd - f[i, d]) < 2e-2 * max(1.0, abs(fd))
