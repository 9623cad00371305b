"""LJ force/energy evaluation over padded neighbor lists (R10).

Reference capability (SURVEY.md §3 R10, §4.5; BASELINE.json:5,10): for every
listed pair inside rc, accumulate ``f = 24(2 s6^2 - s6)/r^2 * dr``; half
lists apply Newton's 3rd law by scattering ``-f*dr`` to the partner.

TPU design: the i-side accumulation is a dense masked reduction over the
padded rows (pure VPU work, no scatter). The Newton-3 j-side is a
``segment_sum`` scatter-add — the known-risk op on TPU (SURVEY.md §9
"Scatter-add for Newton-3"); full lists (half_list=False) trade 2x pair
compute for zero scatter, and both variants are kept so the bench can pick
the winner empirically, as the reference family did across CPU vs GPU.

Rows are processed in fixed chunks inside ``lax.fori_loop`` so peak memory is
O(chunk * K), independent of N.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax, ops

from md_neighbor_list_tpu.core.box import Box
from md_neighbor_list_tpu.ops.common import (lj_force_scalar,
                                             lj_pair_virial, lj_potential)


def forces_energy(pos: jnp.ndarray, idx: jnp.ndarray, box: Box, rc: float,
                  half: bool, chunk: int = 8192,
                  energy_rows: jnp.ndarray | None = None,
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forces (N, 3) and total shifted potential energy from padded rows.

    ``idx`` rows index into ``pos`` (same ordering); sentinel entries == N
    are masked. Energy counts each pair once (half rows are unique pairs;
    full rows are halved). ``energy_rows`` optionally restricts which rows
    contribute potential energy — the slab-DD path passes its owned-slot
    mask so ghost rows don't double-count cross-slab pairs (each side then
    contributes the pair once, and the full-list 0.5 factor makes it exact;
    SURVEY.md §4.6)."""
    n, k = idx.shape
    npad = ((n + chunk - 1) // chunk) * chunk
    idx_pad = jnp.pad(idx, ((0, npad - n), (0, 0)), constant_values=n)
    pos_rows = jnp.pad(pos, ((0, npad - n), (0, 0)))
    erows_pad = (
        None if energy_rows is None else jnp.pad(energy_rows, (0, npad - n))
    )
    pos_gather = jnp.concatenate([pos, jnp.zeros((1, 3), pos.dtype)], axis=0)
    r2cut = jnp.float32(rc * rc)

    def body(ci, carry):
        force, energy = carry
        start = ci * chunk
        idx_c = lax.dynamic_slice_in_dim(idx_pad, start, chunk)  # (B, K)
        my_pos = lax.dynamic_slice_in_dim(pos_rows, start, chunk)  # (B, 3)

        jpos = pos_gather[jnp.minimum(idx_c, n)]  # (B, K, 3)
        dr = box.min_image(my_pos[:, None, :] - jpos)
        r2 = jnp.sum(dr * dr, axis=-1)
        mask = (idx_c < n) & (r2 < r2cut)
        fvec = lj_force_scalar(r2, mask)[..., None] * dr  # force on i from j

        fi = jnp.sum(fvec, axis=1)  # (B, 3)
        cur = lax.dynamic_slice_in_dim(force, start, chunk)
        force = lax.dynamic_update_slice_in_dim(force, cur + fi, start, axis=0)

        u_rows = jnp.sum(lj_potential(r2, mask, rc), axis=1)  # (B,)
        if erows_pad is not None:
            w = lax.dynamic_slice_in_dim(erows_pad, start, chunk)
            u_rows = u_rows * w.astype(u_rows.dtype)
        u = jnp.sum(u_rows)
        if half:
            # Newton-3 partner scatter: each listed pair pushes -f*dr onto j.
            fj = ops.segment_sum(
                (-fvec).reshape(chunk * k, 3),
                idx_c.reshape(chunk * k),
                num_segments=npad + 1,
            )
            force = force + fj
            energy = energy + u
        else:
            energy = energy + 0.5 * u
        return force, energy

    force0 = jnp.zeros((npad + 1, 3), pos.dtype)  # +1 row absorbs sentinels
    force, energy = lax.fori_loop(
        0, npad // chunk, body, (force0, jnp.float32(0.0))
    )
    return force[:n], energy


def pe_virial(pos: jnp.ndarray, idx: jnp.ndarray, box: Box, rc: float,
              half: bool, chunk: int = 8192,
              ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(total shifted PE, total pair virial W) from padded rows — the
    observables pass behind ``Simulator.thermo``. W = sum over unordered
    pairs of dr . F_pair; instantaneous pressure P = (2*KE + W) / (3*V).
    Same row chunking and pair-attribution rules as ``forces_energy``
    (half rows count each pair once, full rows are halved)."""
    n, k = idx.shape
    npad = ((n + chunk - 1) // chunk) * chunk
    idx_pad = jnp.pad(idx, ((0, npad - n), (0, 0)), constant_values=n)
    pos_rows = jnp.pad(pos, ((0, npad - n), (0, 0)))
    pos_gather = jnp.concatenate([pos, jnp.zeros((1, 3), pos.dtype)], axis=0)
    r2cut = jnp.float32(rc * rc)

    def body(ci, carry):
        energy, vir = carry
        start = ci * chunk
        idx_c = lax.dynamic_slice_in_dim(idx_pad, start, chunk)
        my_pos = lax.dynamic_slice_in_dim(pos_rows, start, chunk)
        jpos = pos_gather[jnp.minimum(idx_c, n)]
        dr = box.min_image(my_pos[:, None, :] - jpos)
        r2 = jnp.sum(dr * dr, axis=-1)
        mask = (idx_c < n) & (r2 < r2cut)
        u = jnp.sum(lj_potential(r2, mask, rc))
        w = jnp.sum(lj_pair_virial(r2, mask))
        scale = 1.0 if half else 0.5
        return energy + scale * u, vir + scale * w

    return lax.fori_loop(
        0, npad // chunk, body, (jnp.float32(0.0), jnp.float32(0.0))
    )
