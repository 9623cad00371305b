"""Brute-force O(N^2) pair search and LJ evaluation — the correctness oracle.

Reference capability C1/R3 (BASELINE.json:7): "Brute-force O(N^2) pair search,
16k LJ particles in periodic cube, CPU-runnable reference". In the reference
family the brute-force path *is* the validation oracle for every fast variant
(SURVEY.md §6.1), and with the reference mount empty it is the only honest
parity target (SURVEY.md §0 item 4) — so this module is written for clarity
and runs tiled (never materializing the full (N, N) matrix) so it stays
CPU-runnable at 16k and TPU-runnable at 100k+.

Tiling: rows are processed in blocks of ``block`` particles via ``lax.map``;
each block computes a (block, N) distance tile — O(N) memory, O(N^2) work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from md_neighbor_list_tpu.core.box import Box
from md_neighbor_list_tpu.ops.common import (compact_rows, lj_force_scalar,
                                             lj_potential)


def _pad_rows(n: int, block: int) -> int:
    return ((n + block - 1) // block) * block


def _block_r2(pos: jnp.ndarray, block_pos: jnp.ndarray, box: Box) -> jnp.ndarray:
    """(B, N) squared min-image distances from block rows to all particles."""
    dr = box.min_image(block_pos[:, None, :] - pos[None, :, :])
    return jnp.sum(dr * dr, axis=-1)


def pair_count(pos: jnp.ndarray, box: Box, radius: float,
               block: int = 256) -> jnp.ndarray:
    """Number of unordered pairs (i < j) with min-image |dr| < radius."""
    n = pos.shape[0]
    npad = _pad_rows(n, block)
    pad_pos = jnp.pad(pos, ((0, npad - n), (0, 0)))
    r2cut = jnp.float32(radius * radius)

    def body(start):
        bpos = jax.lax.dynamic_slice_in_dim(pad_pos, start, block)
        r2 = _block_r2(pos, bpos, box)
        gi = start + jnp.arange(block, dtype=jnp.int32)  # global row ids
        gj = jnp.arange(n, dtype=jnp.int32)
        mask = (r2 < r2cut) & (gj[None, :] > gi[:, None]) & (gi[:, None] < n)
        return jnp.sum(mask.astype(jnp.int32))

    starts = jnp.arange(0, npad, block, dtype=jnp.int32)
    return jnp.sum(jax.lax.map(body, starts))


def neighbors(pos: jnp.ndarray, box: Box, radius: float, k_cap: int,
              half: bool, block: int = 256) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Padded neighbor rows by exhaustive search — same encoding as the
    engine (idx (N, K) int32, sentinel N) so pair sets compare directly.

    half=True keeps only j > i (Newton-3 dedup in *current array order*,
    matching the engine's sorted-order dedup rule, SURVEY.md §4.3)."""
    n = pos.shape[0]
    npad = _pad_rows(n, block)
    pad_pos = jnp.pad(pos, ((0, npad - n), (0, 0)))
    r2cut = jnp.float32(radius * radius)

    def body(start):
        bpos = jax.lax.dynamic_slice_in_dim(pad_pos, start, block)
        r2 = _block_r2(pos, bpos, box)
        gi = start + jnp.arange(block, dtype=jnp.int32)
        gj = jnp.arange(n, dtype=jnp.int32)
        mask = (r2 < r2cut) & (gj[None, :] != gi[:, None]) & (gi[:, None] < n)
        if half:
            mask &= gj[None, :] > gi[:, None]
        cand = jnp.broadcast_to(gj[None, :], mask.shape)
        return compact_rows(cand, mask, k_cap, fill=n)

    starts = jnp.arange(0, npad, block, dtype=jnp.int32)
    idx, cnt = jax.lax.map(body, starts)
    return idx.reshape(npad, k_cap)[:n], cnt.reshape(npad)[:n]


def forces_energy(pos: jnp.ndarray, box: Box, rc: float,
                  block: int = 256) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact LJ forces and total (shifted) potential energy by full O(N^2)
    sweep — the force-parity target (BASELINE.json:5 "forces within fp32
    tolerance"; SURVEY.md §5.5)."""
    n = pos.shape[0]
    npad = _pad_rows(n, block)
    pad_pos = jnp.pad(pos, ((0, npad - n), (0, 0)))
    r2cut = jnp.float32(rc * rc)

    def body(start):
        bpos = jax.lax.dynamic_slice_in_dim(pad_pos, start, block)
        dr = box.min_image(bpos[:, None, :] - pos[None, :, :])
        r2 = jnp.sum(dr * dr, axis=-1)
        gi = start + jnp.arange(block, dtype=jnp.int32)
        gj = jnp.arange(n, dtype=jnp.int32)
        mask = (r2 < r2cut) & (gj[None, :] != gi[:, None]) & (gi[:, None] < n)
        f = lj_force_scalar(r2, mask)
        fvec = jnp.sum(f[:, :, None] * dr, axis=1)  # (B, 3)
        u = 0.5 * jnp.sum(lj_potential(r2, mask, rc))  # halve double count
        return fvec, u

    starts = jnp.arange(0, npad, block, dtype=jnp.int32)
    fvec, u = jax.lax.map(body, starts)
    return fvec.reshape(npad, 3)[:n], jnp.sum(u)
