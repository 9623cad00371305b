"""Shared op-level primitives: LJ pair math and padded-row compaction.

These are the two leaf computations every layer reuses: the oracle (R3), the
XLA cell-list sweep (R5), the Pallas kernels (R5-R8, R10) and the force
evaluators all agree on exactly one LJ formula and one padded-list encoding,
so parity tests compare like against like (SURVEY.md §4.3, §4.5).

Padded-list encoding: a neighbor row is ``idx[i, 0:K]`` int32 where valid
entries are ``< N`` and padding slots hold the sentinel ``N`` (one past the
last particle). Consumers mask on ``idx < N`` — positions are never used to
encode validity (no sentinel-coordinate tricks; SURVEY.md §4.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lj_force_scalar(r2: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """LJ force magnitude over |dr|: F_vec = f * dr with
    f = 24 * (2*(1/r2)^6 - (1/r2)^3) / r2   (sigma = epsilon = 1).

    ``mask`` guards the reciprocal (padding rows carry r2 = 0); masked lanes
    return exactly 0. Matches SURVEY.md §4.5.
    """
    safe_r2 = jnp.where(mask, r2, 1.0)
    s2 = 1.0 / safe_r2
    s6 = s2 * s2 * s2
    f = 24.0 * s6 * (2.0 * s6 - 1.0) * s2
    return jnp.where(mask, f, 0.0)


def lj_pair_virial(r2: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Pair virial contribution w = dr . F_pair = f * r2 = 24*(2*s6^2 - s6)
    (the r2 cancels one power of s2 exactly) — the algebraic simplification
    keeps masked/padded lanes finite without a guarded divide. Total virial
    W = sum over unordered pairs; instantaneous pressure
    P = (2*KE + W) / (3*V) in reduced units (SURVEY.md §4.5's force
    formula contracted with dr)."""
    safe_r2 = jnp.where(mask, r2, 1.0)
    s2 = 1.0 / safe_r2
    s6 = s2 * s2 * s2
    return jnp.where(mask, 24.0 * s6 * (2.0 * s6 - 1.0), 0.0)


def lj_potential(r2: jnp.ndarray, mask: jnp.ndarray, rc: float) -> jnp.ndarray:
    """Pair potential 4*(s6^2 - s6), shifted so u(rc) = 0 (standard
    truncated-and-shifted LJ — keeps NVE energy continuous across the cutoff,
    which the energy-drift gate requires; SURVEY.md §6.2)."""
    safe_r2 = jnp.where(mask, r2, 1.0)
    s6 = (1.0 / safe_r2) ** 3
    rc2 = jnp.float32(rc * rc)
    s6c = (1.0 / rc2) ** 3
    u = 4.0 * (s6 * s6 - s6) - 4.0 * (s6c * s6c - s6c)
    return jnp.where(mask, u, 0.0)


def run_first_index(sorted_keys: jnp.ndarray) -> jnp.ndarray:
    """For each position of a sorted 1-D key array, the index of the first
    element of its equal-key run — the scatter-free replacement for
    searchsorted-against-self (a serialized binary search costs ~100x more
    on this chip). rank-within-run = iota - run_first_index(keys)."""
    n = sorted_keys.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_keys[1:] != sorted_keys[:-1]]
    )
    return jax.lax.associative_scan(
        jnp.maximum, jnp.where(boundary, iota, 0)
    )


def compact_rows(cand: jnp.ndarray, mask: jnp.ndarray, k_cap: int,
                 fill: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compress each row's masked candidates into the first slots of a
    fixed-capacity row.

    cand: (..., C) int32 candidate indices; mask: (..., C) bool.
    Returns (idx (..., K) int32 padded with ``fill``, count (...,) int32).

    TPU-native replacement for AVX-512 ``vcompressps`` (the reference's key
    compaction trick, SURVEY.md §9 "Compaction on TPU"): an exclusive cumsum
    gives each surviving candidate its output slot; a dropping scatter writes
    it. Candidates beyond K are dropped *and counted* so callers detect
    overflow instead of silently truncating (SURVEY.md §7.2).
    """
    slot = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1
    count = jnp.where(mask.shape[-1] > 0,
                      slot[..., -1] + 1, jnp.zeros(mask.shape[:-1], jnp.int32))
    # Invalid or overflowing candidates get slot K (dropped by mode="drop").
    slot = jnp.where(mask & (slot < k_cap), slot, k_cap)

    def one_row(c, s):
        out = jnp.full((k_cap,), fill, dtype=jnp.int32)
        return out.at[s].set(c.astype(jnp.int32), mode="drop")

    for _ in range(cand.ndim - 1):
        one_row = jax.vmap(one_row)
    return one_row(cand, slot), count
