"""Binning invariants (SURVEY.md §6.2): Morton round-trip, table partition,
key/cell consistency, capacity estimator sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from md_neighbor_list_tpu.core.box import Box
from md_neighbor_list_tpu.core.capacity import estimate
from md_neighbor_list_tpu.ops.binning import (bin_particles, cell_coords,
                                              make_grid, morton_decode,
                                              morton_key, rowmajor_key)


def test_morton_roundtrip(rng):
    coords = jnp.asarray(rng.integers(0, 1024, (5000, 3)), jnp.int32)
    back = morton_decode(morton_key(coords))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(coords))


def test_morton_orders_locally():
    """Adjacent coords differ by small morton distance vs far coords (weak
    locality smoke check)."""
    a = morton_key(jnp.array([[1, 1, 1]], jnp.int32))[0]
    b = morton_key(jnp.array([[1, 1, 2]], jnp.int32))[0]
    c = morton_key(jnp.array([[512, 512, 512]], jnp.int32))[0]
    assert abs(int(b) - int(a)) < abs(int(c) - int(a))


def _random_system(rng, n, rho=1.0):
    box = Box.from_density(n, rho)
    pos = jnp.asarray(rng.uniform(0, box.L, (n, 3)), jnp.float32)
    return pos, box


def _check_bins(pos, box, layout):
    grid = make_grid(box, 2.8)
    assert grid.usable
    bins = bin_particles(pos, grid, cell_cap=64, layout=layout)
    n = pos.shape[0]

    # perm is a permutation
    perm = np.asarray(bins.perm)
    assert sorted(perm.tolist()) == list(range(n))

    # table holds every sorted particle exactly once
    table = np.asarray(bins.table)
    entries = table[table < n]
    assert sorted(entries.tolist()) == list(range(n))

    # each table row's particles actually live in that cell
    pos_s = np.asarray(pos)[perm]
    coords = np.asarray(cell_coords(jnp.asarray(pos_s), grid))
    cells = np.asarray(rowmajor_key(jnp.asarray(coords), grid.mc))
    for c in range(table.shape[0]):
        for p in table[c][table[c] < n]:
            assert cells[p] == c

    # sorted coords stored in BinData match recomputed ones
    np.testing.assert_array_equal(np.asarray(bins.coords), coords)
    assert not bool(bins.overflow)


def test_bin_invariants_rowmajor(rng):
    pos, box = _random_system(rng, 2000)
    _check_bins(pos, box, "rowmajor")


def test_bin_invariants_morton(rng):
    pos, box = _random_system(rng, 2000)
    _check_bins(pos, box, "morton")


def test_cell_overflow_detected():
    """All particles in one cell must trip the overflow flag, not truncate
    silently (SURVEY.md §7.2)."""
    n = 200
    box = Box.from_density(n, 1.0)
    pos = jnp.full((n, 3), 0.1, jnp.float32)
    grid = make_grid(box, 2.8)
    bins = bin_particles(pos, grid, cell_cap=32, layout="rowmajor")
    assert bool(bins.overflow)
    assert int(bins.cell_max) == n


def test_capacity_estimator_covers_measured(rng):
    """Estimator must upper-bound the realized max cell occupancy and
    neighbor count for a random ideal-gas configuration (SURVEY.md §6.2)."""
    n = 4096
    pos, box = _random_system(rng, n)
    grid = make_grid(box, 2.8)
    cap = estimate(rho=1.0, rs=2.8, cell_size=grid.cell_size, half_list=True)
    bins = bin_particles(pos, grid, cap.cell, "morton")
    assert int(bins.cell_max) <= cap.cell


def test_hierarchical_count_less_matches_numpy():
    """dense_cells._count_less (the hierarchical row-start search) ==
    numpy searchsorted-left across sizes spanning its recursion levels,
    including out-of-range queries on both sides."""
    import numpy as np
    import jax.numpy as jnp

    from md_neighbor_list_tpu.ops.dense_cells import _count_less

    rng = np.random.default_rng(7)
    for size in (64, 8192, 50_000, 1_200_000):
        keys = np.sort(rng.integers(0, 40_000, size).astype(np.int32))
        q = np.unique(rng.integers(-10, 40_010, 257).astype(np.int32))
        q = np.concatenate([
            q, [keys[0] - 1, keys[0], keys[-1], keys[-1] + 1, 2**31 - 1]
        ]).astype(np.int32)
        want = np.searchsorted(keys, q, side="left")
        got = np.asarray(_count_less(jnp.asarray(keys), jnp.asarray(q)))
        np.testing.assert_array_equal(got, want)


def test_row_starts_matches_numpy():
    """dense_cells._row_starts (the 2-row-gather search adopted round 4)
    == numpy searchsorted-left on the production query grid, across
    stream sizes (incl. non-128-multiples, which exercise the guard pad),
    key distributions with empty rows, and the slab key_base offset."""
    import numpy as np
    import jax.numpy as jnp

    from md_neighbor_list_tpu.ops.dense_cells import _row_starts

    class FakeSpec:
        def __init__(self, mc, rows):
            self.mc = mc
            self.rows = rows

    rng = np.random.default_rng(11)
    for size, mc, rows, key_base in (
        (64, 3, 9, 0),            # tiny box
        (8192, 9, 81, 0),         # single coarse tile
        (50_001, 16, 256, 0),     # non-128-multiple stream
        (1_715_000, 35, 1225, 0),  # the N=1M production shape
        (40_000, 16, 48, 256),    # slab layout: emigrants below key_base
    ):
        hi = key_base + rows * mc + 5  # includes parked/foreign keys
        keys = np.sort(rng.integers(0, hi, size).astype(np.int32))
        spec = FakeSpec(mc, rows)
        q = key_base + np.arange(rows + 1, dtype=np.int64) * mc
        want = np.searchsorted(keys, q, side="left").astype(np.int32)
        got = np.asarray(_row_starts(jnp.asarray(keys), spec, key_base))
        np.testing.assert_array_equal(got, want)
