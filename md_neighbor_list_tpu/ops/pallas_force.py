"""Pallas TPU kernels: direct cell-pair LJ forces and neighbor counting.

These are the performance kernels of the engine (SURVEY.md §3 R5-R8 + R10
collapsed into one kernel family; BASELINE.json:5 "27-cell pair sweep ...
as Pallas kernels"). Design (see dense_cells.py): the grid is one program
per (z, y) cell row; each program reads its row plus the 8 neighboring rows
(PBC-wrapped by the BlockSpec index_map), builds the 3-x-cell candidate
window via sublane rolls + lane concat, and evaluates all (cap x 3cap) pair
interactions per cell — pure VPU work, no gathers, no scatters, no
compaction. The AVX-512 compress-store of the reference is replaced by
masking over fixed lanes, the TPU-natural shape (SURVEY.md §9).

The same loop emits either forces+energy (rc cutoff) or neighbor counts and
cluster bitmasks (rs cutoff — the neighbor-list build artifact: bit j of
``masks[row, o, x, i]`` says slot j of neighbor-cell o interacts with slot i;
a complete, consumable pair list in cluster-compressed form, cf. GROMACS
cluster lists, PAPERS.md:9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from md_neighbor_list_tpu.ops.dense_cells import DenseSpec

OFFSETS9 = [(dz, dy) for dz in (-1, 0, 1) for dy in (-1, 0, 1)]


def _row_specs(spec: DenseSpec, leading: int):
    """Nine BlockSpecs fetching row (z+dz, y+dy) with periodic wrap, for an
    array of shape (leading, R, mc, cap) (leading=0 -> (R, mc, cap))."""
    mc = spec.mc
    specs = []
    for dz, dy in OFFSETS9:
        def imap(z, y, dz=dz, dy=dy):
            r = ((z + dz) % mc) * mc + ((y + dy) % mc)
            return (0, r, 0, 0) if leading else (r, 0, 0)
        shape = (leading, 1, mc, spec.cap) if leading else (1, mc, spec.cap)
        specs.append(
            pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)
        )
    return specs


def _pair_geometry(spec: DenseSpec, pos_ref, val_ref, dz: int, dy: int,
                   z, y):
    """Candidate window for one (dz, dy) neighbor row: returns
    (xj, yj, zj, vj) of shape (mc, 3*cap) — the dx=-1/0/+1 cells
    lane-concatenated — with all periodic image shifts applied."""
    mc, cap, L = spec.mc, spec.cap, spec.L
    fL = jnp.float32(L)

    zsh = jnp.where(z + dz >= mc, fL, jnp.where(z + dz < 0, -fL, 0.0))
    ysh = jnp.where(y + dy >= mc, fL, jnp.where(y + dy < 0, -fL, 0.0))

    xb = pos_ref[0, 0]  # (mc, cap)
    yb = pos_ref[1, 0] + ysh
    zb = pos_ref[2, 0] + zsh
    vb = val_ref[0]

    row = jax.lax.broadcasted_iota(jnp.int32, (mc, cap), 0)
    sh_m = jnp.where(row == 0, -fL, 0.0)  # roll(+1): row 0 got cell mc-1
    sh_p = jnp.where(row == mc - 1, fL, 0.0)  # roll(-1): last row got cell 0

    def window(b, shift_x: bool):
        left = pltpu.roll(b, 1, axis=0)
        right = pltpu.roll(b, mc - 1, axis=0)  # cyclic left-roll by 1
        if shift_x:
            left = left + sh_m
            right = right + sh_p
        return jnp.concatenate([left, b, right], axis=-1)  # (mc, 3cap)

    return window(xb, True), window(yb, False), window(zb, False), window(vb, False)


def _not_self(spec: DenseSpec):
    """(cap, 3cap) mask: False on the center-segment diagonal (slot i vs
    itself in its own cell)."""
    cap = spec.cap
    slot = jax.lax.broadcasted_iota(jnp.int32, (cap, 3 * cap), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (cap, 3 * cap), 1)
    return (lane - cap) != slot


def _force_kernel(*refs, spec: DenseSpec, rc: float):
    pos_refs = refs[:9]
    val_refs = refs[9:18]
    fx_ref, fy_ref, fz_ref, pe_ref = refs[18:22]
    mc, cap = spec.mc, spec.cap
    z = pl.program_id(0)
    y = pl.program_id(1)
    r2cut = jnp.float32(rc * rc)

    center = pos_refs[4]
    xi = center[0, 0][:, :, None]  # (mc, cap, 1)
    yi = center[1, 0][:, :, None]
    zi = center[2, 0][:, :, None]
    vi = (val_refs[4][0] > 0.5)[:, :, None]

    fx = jnp.zeros((mc, cap), jnp.float32)
    fy = jnp.zeros((mc, cap), jnp.float32)
    fz = jnp.zeros((mc, cap), jnp.float32)
    pe = jnp.zeros((mc, cap), jnp.float32)
    notself = _not_self(spec)[None]

    for k, (dz, dy) in enumerate(OFFSETS9):
        xj, yj, zj, vj = _pair_geometry(
            spec, pos_refs[k], val_refs[k], dz, dy, z, y
        )
        dxv = xi - xj[:, None, :]  # (mc, cap, 3cap)
        dyv = yi - yj[:, None, :]
        dzv = zi - zj[:, None, :]
        r2 = dxv * dxv + dyv * dyv + dzv * dzv
        mask = (r2 < r2cut) & (vj[:, None, :] > 0.5) & vi
        if (dz, dy) == (0, 0):
            mask &= notself

        # LJ force magnitude / |dr| — same formula as ops.common (R10)
        safe = jnp.where(mask, r2, 1.0)
        s2 = 1.0 / safe
        s6 = s2 * s2 * s2
        f = jnp.where(mask, 24.0 * s6 * (2.0 * s6 - 1.0) * s2, 0.0)
        fx = fx + jnp.sum(f * dxv, axis=-1)
        fy = fy + jnp.sum(f * dyv, axis=-1)
        fz = fz + jnp.sum(f * dzv, axis=-1)
        # shifted potential, counted once per pair by the 0.5 factor outside
        s6c = jnp.float32((1.0 / (rc * rc)) ** 3)
        u = jnp.where(mask, 4.0 * (s6 * s6 - s6) - 4.0 * (s6c * s6c - s6c), 0.0)
        pe = pe + jnp.sum(u, axis=-1)

    fx_ref[0] = fx
    fy_ref[0] = fy
    fz_ref[0] = fz
    pe_ref[0] = pe


def _count_kernel(*refs, spec: DenseSpec, radius: float, emit_masks: bool):
    pos_refs = refs[:9]
    val_refs = refs[9:18]
    cnt_ref = refs[18]
    mask_ref = refs[19] if emit_masks else None
    mc, cap = spec.mc, spec.cap
    z = pl.program_id(0)
    y = pl.program_id(1)
    r2cut = jnp.float32(radius * radius)

    center = pos_refs[4]
    xi = center[0, 0][:, :, None]
    yi = center[1, 0][:, :, None]
    zi = center[2, 0][:, :, None]
    vi = (val_refs[4][0] > 0.5)[:, :, None]
    cnt = jnp.zeros((mc, cap), jnp.int32)
    notself = _not_self(spec)[None]
    lane_in_cell = (
        jax.lax.broadcasted_iota(jnp.int32, (cap, 3 * cap), 1) % cap
    )[None]

    for k, (dz, dy) in enumerate(OFFSETS9):
        xj, yj, zj, vj = _pair_geometry(
            spec, pos_refs[k], val_refs[k], dz, dy, z, y
        )
        dxv = xi - xj[:, None, :]
        dyv = yi - yj[:, None, :]
        dzv = zi - zj[:, None, :]
        r2 = dxv * dxv + dyv * dyv + dzv * dzv
        mask = (r2 < r2cut) & (vj[:, None, :] > 0.5) & vi
        if (dz, dy) == (0, 0):
            mask &= notself
        cnt = cnt + jnp.sum(mask.astype(jnp.int32), axis=-1)
        if emit_masks:
            # bit j of word (k*3 + xseg) = interaction with slot j of that
            # neighbor cell; distinct powers of two, no carries.
            bits = jnp.where(mask, jnp.int32(1) << lane_in_cell, 0)
            for seg in range(3):
                w = jnp.sum(
                    bits[:, :, seg * cap : (seg + 1) * cap], axis=-1
                )
                mask_ref[0, k * 3 + seg] = w

    cnt_ref[0] = cnt


def _common_call(kernel, spec: DenseSpec, pos4, valid_f32, out_shapes,
                 out_specs, interpret: bool):
    mc, cap = spec.mc, spec.cap
    in_specs = _row_specs(spec, 3) + _row_specs(spec, 0)
    return pl.pallas_call(
        kernel,
        grid=(mc, mc),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*([pos4] * 9 + [valid_f32] * 9))


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def dense_forces(pos4: jnp.ndarray, valid_f32: jnp.ndarray, spec: DenseSpec,
                 rc: float, interpret: bool = False):
    """LJ forces (3, R, mc, cap) + per-slot shifted potential (R, mc, cap).

    Total PE = 0.5 * sum(pe * valid) (full symmetric accumulation counts
    each pair twice — the zero-scatter trade anticipated in SURVEY.md §9)."""
    mc, cap = spec.mc, spec.cap
    shapes = [
        jax.ShapeDtypeStruct((spec.rows, mc, cap), jnp.float32)
        for _ in range(4)
    ]
    specs = [
        pl.BlockSpec((1, mc, cap), lambda z, y: (z * mc + y, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    fx, fy, fz, pe = _common_call(
        functools.partial(_force_kernel, spec=spec, rc=rc),
        spec, pos4, valid_f32, shapes, specs, interpret,
    )
    return jnp.stack([fx, fy, fz]), pe


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def dense_counts(pos4: jnp.ndarray, valid_f32: jnp.ndarray, spec: DenseSpec,
                 radius: float, emit_masks: bool = False,
                 interpret: bool = False):
    """Per-slot neighbor counts within ``radius`` (and, when cap == 32, the
    cluster bitmask list — the explicit neighbor-list artifact timed by the
    bench). Pair count = sum(counts) / 2."""
    mc, cap = spec.mc, spec.cap
    if emit_masks and cap != 32:
        raise ValueError("bitmask emission requires cap == 32")
    shapes = [jax.ShapeDtypeStruct((spec.rows, mc, cap), jnp.int32)]
    specs = [
        pl.BlockSpec((1, mc, cap), lambda z, y: (z * mc + y, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    if emit_masks:
        shapes.append(
            jax.ShapeDtypeStruct((spec.rows, 27, mc, cap), jnp.int32)
        )
        specs.append(
            pl.BlockSpec((1, 27, mc, cap), lambda z, y: (z * mc + y, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
    out = _common_call(
        functools.partial(_count_kernel, spec=spec, radius=radius,
                          emit_masks=emit_masks),
        spec, pos4, valid_f32, shapes, specs, interpret,
    )
    return out if emit_masks else (out[0], None)
