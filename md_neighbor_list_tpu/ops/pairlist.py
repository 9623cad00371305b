"""27-cell pair sweep -> fixed-capacity padded neighbor lists (R5-R8).

Reference capability (SURVEY.md §3 R5-R8; BASELINE.json:5,8): visit the 27
cells around each particle's cell (PBC-wrapped), test every candidate against
the search radius, and emit per-particle neighbor rows; half lists drop
Newton-3 duplicates. The reference does this with scalar loops, AVX2/AVX-512
compress-stores, and CUDA kernels; this module is the pure-XLA expression of
the same contract — gathers from the dense cell table, one fused distance
mask, and cumsum-based compaction (no data-dependent shapes anywhere).

This XLA path is the *correctness* implementation (and the one the CPU
fallback uses); the performance path is the dense cell-block engine
(``ops/dense_cells.py`` + ``ops/pallas_force.py``). Both express the same
pair set and are differentially tested against each other and the O(N^2)
oracle (SURVEY.md §6.2).

Memory discipline: the (chunk, 27*cell_cap) candidate tile is the only large
intermediate; rows are processed in chunks under ``lax.map`` so peak memory is
O(chunk * cell_cap), never O(N * cell_cap).

Chunk-size ablation on the real chip (round 5, N=1M warm, one-shot
neighbor_list(backend="xla")): chunk 2048 / 8192 / 32768 run 21.6 / 26.1 /
33.7 s — the default 2048 is already the fastest (the per-row candidate
GATHER dominates; bigger tiles only add VMEM pressure), while larger
chunks compile faster cold (146 vs 59 s) because the scan has fewer
steps. The default stays 2048: this path's users are CPU runs and small
N, where compile time is small anyway.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from md_neighbor_list_tpu.core.box import Box
from md_neighbor_list_tpu.ops import oracle
from md_neighbor_list_tpu.ops.binning import (NEIGHBOR_OFFSETS, BinData,
                                              CellGrid, bin_particles,
                                              rowmajor_key)
from md_neighbor_list_tpu.ops.common import compact_rows


class NeighborLists(NamedTuple):
    """Padded neighbor lists over *sorted* particle order.

    ``idx[i, :]`` holds sorted-space neighbor indices of sorted particle i,
    padded with sentinel N; ``perm`` maps sorted slot -> pre-sweep row so
    callers can reorder their own per-particle state to match."""

    idx: jnp.ndarray  # (N, K) i32
    count: jnp.ndarray  # (N,)  i32 true neighbor count (may exceed K!)
    perm: jnp.ndarray  # (N,)  i32
    max_count: jnp.ndarray  # () i32  max over particles of count
    cell_max: jnp.ndarray  # () i32  max particles in any cell
    overflow: jnp.ndarray  # () bool  any capacity exceeded


def sweep_from_bins(pos_sorted: jnp.ndarray, bins: BinData, box: Box,
                    grid: CellGrid, radius: float, k_cap: int, half: bool,
                    chunk: int = 2048) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Core sweep: for each sorted particle, gather the 27 neighbor cells'
    candidates from the table and compact the in-range ones into K slots.

    Returns (idx (N, K), count (N,)). Candidate validity is an explicit
    ``cand < N`` mask — padding never relies on sentinel coordinates
    (SURVEY.md §4.3). Half lists keep ``cand > i`` in sorted order, the
    layout-friendly Newton-3 dedup rule."""
    n = pos_sorted.shape[0]
    cell_cap = bins.table.shape[1]
    npad = ((n + chunk - 1) // chunk) * chunk
    coords_pad = jnp.pad(bins.coords, ((0, npad - n), (0, 0)))
    pos_pad = jnp.pad(pos_sorted, ((0, npad - n), (0, 0)))
    active_pad = (
        None if bins.active is None
        else jnp.pad(bins.active, (0, npad - n))
    )
    pos_gather = jnp.concatenate(
        [pos_sorted, jnp.zeros((1, 3), pos_sorted.dtype)], axis=0
    )  # sentinel row keeps gathers in-bounds; masked out via cand < n
    r2cut = jnp.float32(radius * radius)

    def body(start):
        c = lax.dynamic_slice_in_dim(coords_pad, start, chunk)  # (B, 3)
        my_pos = lax.dynamic_slice_in_dim(pos_pad, start, chunk)  # (B, 3)
        i_sorted = start + jnp.arange(chunk, dtype=jnp.int32)

        nbr_coords = jnp.mod(c[:, None, :] + NEIGHBOR_OFFSETS[None], grid.mc)
        nbr_cell = rowmajor_key(nbr_coords, grid.mc)  # (B, 27)
        cand = bins.table[nbr_cell].reshape(chunk, 27 * cell_cap)

        cpos = pos_gather[jnp.minimum(cand, n)]  # (B, C, 3)
        dr = box.min_image(my_pos[:, None, :] - cpos)
        r2 = jnp.sum(dr * dr, axis=-1)

        mask = (cand < n) & (r2 < r2cut) & (cand != i_sorted[:, None])
        if half:
            mask &= cand > i_sorted[:, None]
        if active_pad is not None:
            # inactive rows emit empty lists (candidates are already clean:
            # inactive particles never enter the cell table)
            mask &= lax.dynamic_slice_in_dim(active_pad, start, chunk)[:, None]
        return compact_rows(cand, mask, k_cap, fill=n)

    starts = jnp.arange(0, npad, chunk, dtype=jnp.int32)
    idx, cnt = lax.map(body, starts)
    return idx.reshape(npad, k_cap)[:n], cnt.reshape(npad)[:n]


def build_neighbor_lists(pos: jnp.ndarray, box: Box, grid: CellGrid,
                         radius: float, k_cap: int, cell_cap: int,
                         half: bool, layout: str = "morton",
                         chunk: int = 2048) -> tuple[jnp.ndarray, NeighborLists]:
    """Bin + sweep. Returns (pos_sorted, NeighborLists).

    Falls back to the all-pairs oracle path when the box is too small for a
    27-sweep (grid.mc < 3) — same output contract, so tiny test systems and
    production systems share every downstream consumer."""
    n = pos.shape[0]
    if not grid.usable:
        idx, cnt = oracle.neighbors(pos, box, radius, k_cap, half)
        perm = jnp.arange(n, dtype=jnp.int32)
        mx = jnp.max(cnt)
        return pos, NeighborLists(
            idx=idx, count=cnt, perm=perm, max_count=mx,
            cell_max=jnp.zeros((), jnp.int32), overflow=mx > k_cap,
        )

    bins = bin_particles(pos, grid, cell_cap, layout)
    pos_sorted = pos[bins.perm]
    idx, cnt = sweep_from_bins(
        pos_sorted, bins, box, grid, radius, k_cap, half, chunk
    )
    mx = jnp.max(cnt)
    return pos_sorted, NeighborLists(
        idx=idx,
        count=cnt,
        perm=bins.perm,
        max_count=mx,
        cell_max=bins.cell_max,
        overflow=(mx > k_cap) | bins.overflow,
    )


def build_neighbor_lists_stable(pos: jnp.ndarray, box: Box, grid: CellGrid,
                                radius: float, k_cap: int, cell_cap: int,
                                half: bool, layout: str = "morton",
                                active: jnp.ndarray | None = None,
                                chunk: int = 2048) -> NeighborLists:
    """Sweep that leaves particle order untouched: rows and entries of the
    returned ``idx`` are in the *caller's* slot order.

    Used by the slab-decomposition path (SURVEY.md §4.6), where slot
    identity must stay stable between rebuilds (halo send-index lists and
    per-device ownership reference fixed slots). Internally bins/sorts like
    the fast path, then translates both row order and entry values back
    through the permutation."""
    n = pos.shape[0]
    if not grid.usable:
        raise ValueError(
            "cell grid too small for 27-sweep (mc < 3); stable builds are "
            "only used by the DD path, which requires a usable grid"
        )
    bins = bin_particles(pos, grid, cell_cap, layout, active)
    pos_sorted = pos[bins.perm]
    idx_s, cnt_s = sweep_from_bins(
        pos_sorted, bins, box, grid, radius, k_cap, half, chunk
    )
    # Translate sorted-space entries -> original slots (sentinel n -> n).
    perm_ext = jnp.concatenate(
        [bins.perm, jnp.array([n], jnp.int32)]
    )
    entries = perm_ext[jnp.minimum(idx_s, n)]
    idx = jnp.zeros_like(idx_s).at[bins.perm].set(entries)
    cnt = jnp.zeros_like(cnt_s).at[bins.perm].set(cnt_s)
    mx = jnp.max(cnt)
    return NeighborLists(
        idx=idx,
        count=cnt,
        perm=jnp.arange(n, dtype=jnp.int32),
        max_count=mx,
        cell_max=bins.cell_max,
        overflow=(mx > k_cap) | bins.overflow,
    )
