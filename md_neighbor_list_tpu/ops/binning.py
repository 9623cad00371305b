"""Sort-based cell binning: spatial keys + per-cell segment offsets (R4).

Reference capability (SURVEY.md §3 R4; BASELINE.json:5): the reference bins
particles with a counting sort into cells (counts -> prefix-sum pointers ->
scatter). The TPU-native equivalent mandated by the north star is a
*sort-based spatial hash*: one key per particle (row-major cell id or Morton
code), ``lax.sort_key_val`` to put particles in spatial order, and
``searchsorted`` segment offsets — every step is an XLA-native, fusible,
static-shape primitive (no host-side counting loops).

Two key spaces coexist deliberately (SURVEY.md §4.2):
  - the *sort key* (Morton or row-major) fixes the particle memory order —
    Morton order gives the C4 "sorted SoA" locality;
  - the *cell id* (always row-major) indexes the dense ``(mc^3, cap)`` cell
    table, so the 27-neighbor lookup is a trivial arithmetic neighborhood.
Both are functions of the same integer cell coordinates, so they group
particles identically; only the order of cells differs.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from md_neighbor_list_tpu.core.box import Box


@dataclasses.dataclass(frozen=True)
class CellGrid:
    """Static cell-grid geometry: ``mc`` cells per dim of edge ``cell_size``
    >= the search radius, so all neighbors of a particle live in the 27
    surrounding cells (SURVEY.md §4.2)."""

    mc: int
    cell_size: float
    L: float

    @property
    def ncells(self) -> int:
        return self.mc**3

    @property
    def usable(self) -> bool:
        """27-sweep needs mc >= 3 or neighbor cells alias (double-counted
        pairs); smaller boxes fall back to the all-pairs path."""
        return self.mc >= 3


def make_grid(box: Box, rs: float) -> CellGrid:
    mc = max(int(box.L / rs), 1)
    return CellGrid(mc=mc, cell_size=box.L / mc, L=box.L)


def cell_coords(pos: jnp.ndarray, grid: CellGrid) -> jnp.ndarray:
    """(N, 3) integer cell coordinates in [0, mc). Clipped for fp-edge
    safety (a wrapped coordinate can round to exactly L)."""
    c = jnp.floor(pos * jnp.float32(1.0 / grid.cell_size)).astype(jnp.int32)
    return jnp.clip(c, 0, grid.mc - 1)


def rowmajor_key(coords: jnp.ndarray, mc: int) -> jnp.ndarray:
    """c = ix + mc*(iy + mc*iz) — the dense cell id (SURVEY.md §4.2)."""
    return coords[..., 0] + mc * (coords[..., 1] + mc * coords[..., 2])


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so bit k lands at position 3k."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def morton_key(coords: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton (Z-order) code from 3x10-bit cell coordinates — the C4
    space-filling-curve layout (BASELINE.json:10; cf. PAPERS.md:7). Supports
    mc up to 1024 (mc=35 at N=1M, so ample headroom)."""
    return (
        _part1by2(coords[..., 0])
        | (_part1by2(coords[..., 1]) << 1)
        | (_part1by2(coords[..., 2]) << 2)
    )


def morton_decode(key: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`morton_key` (round-trip tested, SURVEY.md §6.2)."""

    def compact(x):
        x = x & 0x09249249
        x = (x | (x >> 2)) & 0x030C30C3
        x = (x | (x >> 4)) & 0x0300F00F
        x = (x | (x >> 8)) & 0x030000FF
        x = (x | (x >> 16)) & 0x000003FF
        return x

    return jnp.stack(
        [compact(key), compact(key >> 1), compact(key >> 2)], axis=-1
    )


class BinData(NamedTuple):
    """Result of binning N particles.

    All particle-indexed fields are in *sorted order*; ``perm[s]`` is the
    pre-sort row of the particle now in slot ``s`` (gather ``x[perm]`` to
    reorder any per-particle array)."""

    perm: jnp.ndarray  # (N,)  i32
    coords: jnp.ndarray  # (N, 3) i32 cell coordinates, sorted order
    table: jnp.ndarray  # (ncells, cell_cap) i32 sorted-particle indices, pad N
    cell_max: jnp.ndarray  # ()  i32 max particles observed in any cell
    overflow: jnp.ndarray  # ()  bool cell table overflow (cell_max > cap)
    active: jnp.ndarray | None = None  # (N,) bool sorted order; None = all


def bin_particles(pos: jnp.ndarray, grid: CellGrid, cell_cap: int,
                  layout: str = "morton",
                  active: jnp.ndarray | None = None) -> BinData:
    """Sort particles spatially and build the dense cell->particles table.

    The rank of a particle within its cell is ``row - first_row_with_same
    key`` (a vectorized ``searchsorted`` of the sorted keys against
    themselves), replacing the reference's counting-sort prefix pointers
    with pure XLA ops. Ranks >= cell_cap are dropped by the scatter and
    reported via ``cell_max`` for the overflow/re-jit protocol
    (SURVEY.md §4.3).

    ``active``: optional validity mask for fixed-capacity slot arrays (the
    slab-decomposition path, SURVEY.md §4.6, keeps empty slots). Inactive
    particles sort to the end (key INT32_MAX) and never enter the table, so
    they can never appear as pair candidates."""
    if layout not in ("morton", "rowmajor"):
        raise ValueError(f"unknown layout {layout!r}")
    n = pos.shape[0]
    coords = cell_coords(pos, grid)
    cell = rowmajor_key(coords, grid.mc)
    sort_key = morton_key(coords) if layout == "morton" else cell
    if active is not None:
        sort_key = jnp.where(active, sort_key, jnp.int32(0x7FFFFFFF))

    iota = jnp.arange(n, dtype=jnp.int32)
    sorted_key, perm = lax.sort_key_val(sort_key, iota)
    coords_s = coords[perm]
    cell_s = cell[perm]
    active_s = None if active is None else active[perm]

    from md_neighbor_list_tpu.ops.common import run_first_index

    rank = iota - run_first_index(sorted_key)
    if active_s is None:
        cell_max = jnp.max(rank) + 1
    else:
        cell_s = jnp.where(active_s, cell_s, grid.ncells)  # scatter-dropped
        cell_max = jnp.max(jnp.where(active_s, rank, -1)) + 1

    table = jnp.full((grid.ncells, cell_cap), n, dtype=jnp.int32)
    table = table.at[cell_s, jnp.minimum(rank, cell_cap)].set(iota, mode="drop")
    return BinData(
        perm=perm,
        coords=coords_s,
        table=table,
        cell_max=cell_max,
        overflow=cell_max > cell_cap,
        active=active_s,
    )


# Static 27-neighborhood offset table, shared by every sweep implementation.
# numpy on purpose: a module-level jnp.array would initialize the backend
# (and pay the axon relay's device grant) at IMPORT time; as numpy it is
# committed to the device only where it is traced into a jitted sweep.
NEIGHBOR_OFFSETS = np.array(
    [[dx, dy, dz] for dz in (-1, 0, 1) for dy in (-1, 0, 1) for dx in (-1, 0, 1)],
    dtype=np.int32,
)  # (27, 3)
