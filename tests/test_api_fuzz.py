"""Adversarial-geometry fuzz of the one-call API (api.py).

The structured tests (test_api.py, test_pairlist.py) cover the designed
regimes; this file hammers the front door with the geometries users
actually produce — coincident particles, coordinates pinned to the box
faces (where f32 `x/cell` can round the cell index to mc), irregular prime
N, and randomized (n, rho, rs) draws spanning the oracle-fallback,
minimum-grid (mc=3), and normal cell-list regimes — and checks the exact
pair set against the independent numpy O(N²) reference every time
(SURVEY.md §6.2 "multiple RNG seeds and densities")."""

import numpy as np
import pytest

import md_neighbor_list_tpu as mdnl
from tests.util import numpy_pairs


def _api_pairs(pos, L, rs, **kw):
    i, j = mdnl.pair_list(pos, L, rs, **kw)
    got = set(zip(i.tolist(), j.tolist()))
    assert len(got) == len(i), "duplicate pairs emitted"
    return got


def test_coincident_particles_pair_once():
    # dr == 0 is a valid pair (i < j), not a self-pair: exclusion must be
    # by index, never by distance.
    L = 10.0
    pos = np.array(
        [[1.0, 1.0, 1.0], [1.0, 1.0, 1.0], [5.0, 5.0, 5.0]], np.float32
    )
    got = _api_pairs(pos, L, 2.8)
    assert got == {(0, 1)}


def test_box_face_coordinates():
    # Coordinates at exactly 0, L, and one-ulp-below-L: wrap must land all
    # of them inside [0, L) and binning must not emit cell index mc.
    L = np.float32(8.5)
    below = np.nextafter(L, np.float32(0.0))
    pos = np.array(
        [
            [0.0, 0.0, 0.0],
            [L, L, L],            # wraps to the origin cell -> pair with 0
            [below, below, below],
            [L / 2, 0.0, L],
            [0.0, L / 2, below],
        ],
        np.float32,
    )
    got = _api_pairs(pos, float(L), 2.8)
    want = numpy_pairs(
        np.asarray(pos) % float(L), float(L), 2.8
    )
    assert got == want
    assert (0, 1) in got  # x=L is the same point as x=0 under PBC


@pytest.mark.parametrize("seed", range(8))
def test_randomized_geometries(seed):
    # Random regime draw: n prime-ish and small enough for the numpy
    # reference; rho spans dilute (oracle fallback / mc=3 minimum grids)
    # to dense (capacity growth); rs drawn independently of rho.
    rng = np.random.default_rng(seed)
    n = int(rng.integers(2, 700))
    rho = float(rng.uniform(0.05, 1.5))
    rs = float(rng.uniform(1.2, 3.5))
    L = (n / rho) ** (1 / 3)
    pos = rng.uniform(0.0, L, (n, 3)).astype(np.float32)
    # sprinkle a tight cluster to stress per-cell capacity
    if n >= 50:
        pos[:10] = pos[10] + rng.normal(0.0, 0.05, (10, 3)).astype(np.float32)
    got = _api_pairs(pos, L, rs)
    want = numpy_pairs(np.asarray(pos) % L, L, rs)
    assert got == want, (
        f"pair-set mismatch at n={n} rho={rho:.3f} rs={rs:.3f}: "
        f"{len(got)} vs {len(want)} pairs"
    )


def test_single_particle_and_pair():
    assert _api_pairs(np.zeros((1, 3), np.float32), 5.0, 2.8) == set()
    pos = np.array([[0.2, 0.2, 0.2], [4.9, 0.2, 0.2]], np.float32)
    # min-image distance 0.3 across the x face
    assert _api_pairs(pos, 5.0, 2.8) == {(0, 1)}
