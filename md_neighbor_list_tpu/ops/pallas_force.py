"""Pallas TPU kernels: direct cell-pair LJ forces and neighbor counting.

These are the performance kernels of the engine (SURVEY.md §3 R5-R8 + R10
collapsed into one kernel family; BASELINE.json:5 "27-cell pair sweep ...
as Pallas kernels"). Division of labor:

  XLA (per call): build the x-axis candidate WINDOW arrays — for every cell,
  the lane-concatenation of its dx=-1/0/+1 cells' data with the x-periodic
  image shifts baked in (XLA relayouts/concats freely; Mosaic cannot
  lane-concatenate vectors with mismatched offsets).

  Pallas: grid (z, y, k) — one program per cell-row per (dz, dy) neighbor
  offset. The k axis is a GRID dimension (not an unrolled in-kernel loop) so
  only one offset's (mc, cap, 3cap) temporaries are live at a time (the
  unrolled form exceeds the 16 MB VMEM stack once cap grows), and the
  output blocks' index_map ignores k, so Pallas keeps them resident in VMEM
  across the innermost grid steps — the canonical revisit-accumulate
  pattern. All pair math is masked VPU work: no gathers, no scatters, no
  compaction (the reference's AVX-512 compress-store becomes masking over
  fixed lanes, SURVEY.md §9).

The count kernel additionally emits cluster bitmasks — the neighbor-list
build artifact (bit j of word (k*3+seg)*words+w says slot 32w+j of that
neighbor cell interacts with slot i): a complete, consumable pair list in
cluster-compressed form (cf. GROMACS cluster lists, PAPERS.md:9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from md_neighbor_list_tpu.ops.dense_cells import DenseSpec


def mask_words(cap: int) -> int:
    """i32 words per (cell, neighbor-cell) bitmask row."""
    return (cap + 31) // 32


def make_windows(pos4: jnp.ndarray, valid_f32: jnp.ndarray,
                 spec: DenseSpec) -> jnp.ndarray:
    """(4, R, mc, 3cap) candidate windows: channels x, y, z, valid; lane
    segments [dx=-1 | dx=0 | dx=+1] with x-periodic image shifts applied."""
    mc, cap, L = spec.mc, spec.cap, spec.L
    w4 = jnp.concatenate([pos4, valid_f32[None]], axis=0)  # (4, R, mc, cap)

    left = jnp.roll(w4, 1, axis=2)  # cell ix holds ix-1's data
    right = jnp.roll(w4, -1, axis=2)
    xcell = jnp.arange(mc)
    sh_m = jnp.where(xcell == 0, -L, 0.0).astype(jnp.float32)[None, :, None]
    sh_p = jnp.where(xcell == mc - 1, L, 0.0).astype(jnp.float32)[None, :, None]
    left = left.at[0].add(sh_m)  # shift only the x channel
    right = right.at[0].add(sh_p)
    return jnp.concatenate([left, w4, right], axis=-1)  # (4, R, mc, 3cap)


def _win_specs(spec: DenseSpec):
    """(neighbor-row spec, own-row spec) for the (4, R, mc, 3cap) windows.
    The neighbor row follows the k-th (dz, dy) offset with periodic wrap;
    the own row ignores k so Pallas leaves it resident across k."""
    mc = spec.mc
    shape = (4, 1, mc, 3 * spec.cap)

    def nbr_map(z, y, k):
        dz = k // 3 - 1
        dy = k % 3 - 1
        return (0, ((z + dz) % mc) * mc + ((y + dy) % mc), 0, 0)

    def own_map(z, y, k):
        return (0, z * mc + y, 0, 0)

    return (
        pl.BlockSpec(shape, nbr_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(shape, own_map, memory_space=pltpu.VMEM),
    )


def _not_self(spec: DenseSpec):
    """(1, cap, 3cap) f32: 0.0 on the center-segment diagonal (slot i vs
    itself), 1.0 elsewhere. f32 because Mosaic cannot reshape/broadcast i1
    vectors along the minor dim."""
    cap = spec.cap
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 3 * cap), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 3 * cap), 2)
    return ((lane - cap) != slot).astype(jnp.float32)


def _pair_mask_r2(win_ref, own_ref, spec: DenseSpec, r2cut):
    """Shared geometry: (r2, mask, dxv, dyv, dzv) for the current program's
    (z, y, k) cell-row x neighbor-offset tile."""
    mc, cap = spec.mc, spec.cap
    z = pl.program_id(0)
    y = pl.program_id(1)
    k = pl.program_id(2)
    dz = k // 3 - 1
    dy = k % 3 - 1
    fL = jnp.float32(spec.L)
    zsh = jnp.where(z + dz >= mc, fL, jnp.where(z + dz < 0, -fL, 0.0))
    ysh = jnp.where(y + dy >= mc, fL, jnp.where(y + dy < 0, -fL, 0.0))

    xi = own_ref[0, 0, :, cap : 2 * cap][:, :, None]  # (mc, cap, 1)
    yi = own_ref[1, 0, :, cap : 2 * cap][:, :, None]
    zi = own_ref[2, 0, :, cap : 2 * cap][:, :, None]
    vi = own_ref[3, 0, :, cap : 2 * cap][:, :, None]

    xj = win_ref[0, 0][:, None, :]  # (mc, 1, 3cap)
    yj = win_ref[1, 0][:, None, :] + ysh
    zj = win_ref[2, 0][:, None, :] + zsh
    vj = win_ref[3, 0][:, None, :]

    dxv = xi - xj  # (mc, cap, 3cap)
    dyv = yi - yj
    dzv = zi - zj
    r2 = dxv * dxv + dyv * dyv + dzv * dzv
    vv = vi * vj
    # center offset (k == 4): exclude the self diagonal
    vv = vv * jnp.where(k == 4, _not_self(spec), 1.0)
    mask = (r2 < r2cut) & (vv > 0.5)
    return r2, mask, dxv, dyv, dzv


def _force_kernel(win_ref, own_ref, fx_ref, fy_ref, fz_ref, pe_ref, *,
                  spec: DenseSpec, rc: float):
    k = pl.program_id(2)
    r2, mask, dxv, dyv, dzv = _pair_mask_r2(
        win_ref, own_ref, spec, jnp.float32(rc * rc)
    )
    s6c = jnp.float32((1.0 / (rc * rc)) ** 3)
    ushift = 4.0 * (s6c * s6c - s6c)

    # LJ force magnitude / |dr| — same formula as ops.common (R10)
    safe = jnp.where(mask, r2, 1.0)
    s2 = 1.0 / safe
    s6 = s2 * s2 * s2
    f = jnp.where(mask, 24.0 * s6 * (2.0 * s6 - 1.0) * s2, 0.0)
    u = jnp.where(mask, 4.0 * (s6 * s6 - s6) - ushift, 0.0)

    @pl.when(k == 0)
    def _():
        fx_ref[0] = jnp.zeros_like(fx_ref[0])
        fy_ref[0] = jnp.zeros_like(fy_ref[0])
        fz_ref[0] = jnp.zeros_like(fz_ref[0])
        pe_ref[0] = jnp.zeros_like(pe_ref[0])

    fx_ref[0] += jnp.sum(f * dxv, axis=-1)
    fy_ref[0] += jnp.sum(f * dyv, axis=-1)
    fz_ref[0] += jnp.sum(f * dzv, axis=-1)
    pe_ref[0] += jnp.sum(u, axis=-1)


def _count_kernel(win_ref, own_ref, cnt_ref, *, spec: DenseSpec,
                  radius: float):
    k = pl.program_id(2)
    _, mask, _, _, _ = _pair_mask_r2(
        win_ref, own_ref, spec, jnp.float32(radius * radius)
    )

    @pl.when(k == 0)
    def _():
        cnt_ref[0] = jnp.zeros_like(cnt_ref[0])

    cnt_ref[0] += jnp.sum(mask.astype(jnp.int32), axis=-1)


def _mask_kernel(win_ref, own_ref, mask_ref, *, spec: DenseSpec,
                 radius: float):
    """Bitmask emission kept in its own kernel: every output block here is
    written exactly once per program (block index varies with k) — mixing a
    k-revisited accumulator output with k-varying outputs in one kernel
    crashes the Mosaic compiler."""
    cap = spec.cap
    _, mask, _, _, _ = _pair_mask_r2(
        win_ref, own_ref, spec, jnp.float32(radius * radius)
    )
    words = mask_words(cap)
    slot_in_cell = jnp.mod(
        jax.lax.broadcasted_iota(jnp.int32, (1, cap, 3 * cap), 2), cap
    )
    bits = jnp.where(mask, jnp.int32(1) << jnp.mod(slot_in_cell, 32), 0)
    word_of = slot_in_cell // 32
    for seg in range(3):
        sl = slice(seg * cap, (seg + 1) * cap)
        for w in range(words):
            word = jnp.sum(
                jnp.where(word_of[..., sl] == w, bits[..., sl], 0),
                axis=-1,
            )
            mask_ref[0, seg * words + w] = word


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def dense_forces(pos4: jnp.ndarray, valid_f32: jnp.ndarray, spec: DenseSpec,
                 rc: float, interpret: bool = False):
    """LJ forces (3, R, mc, cap) + per-slot shifted potential (R, mc, cap).

    Total PE = 0.5 * sum(pe * valid) (full symmetric accumulation counts
    each pair twice — the zero-scatter trade anticipated in SURVEY.md §9)."""
    mc, cap = spec.mc, spec.cap
    windows = make_windows(pos4, valid_f32, spec)
    shapes = [
        jax.ShapeDtypeStruct((spec.rows, mc, cap), jnp.float32)
        for _ in range(4)
    ]
    specs = [
        pl.BlockSpec((1, mc, cap), lambda z, y, k: (z * mc + y, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(4)
    ]
    fx, fy, fz, pe = pl.pallas_call(
        functools.partial(_force_kernel, spec=spec, rc=rc),
        grid=(mc, mc, 9),
        in_specs=list(_win_specs(spec)),
        out_specs=specs,
        out_shape=shapes,
        interpret=interpret,
    )(windows, windows)
    return jnp.stack([fx, fy, fz]), pe


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def dense_counts(pos4: jnp.ndarray, valid_f32: jnp.ndarray, spec: DenseSpec,
                 radius: float, emit_masks: bool = False,
                 interpret: bool = False):
    """Per-slot neighbor counts within ``radius`` and (optionally) the
    cluster bitmask list — the explicit neighbor-list artifact timed by the
    bench. Pair count = sum(counts) / 2."""
    mc, cap = spec.mc, spec.cap
    windows = make_windows(pos4, valid_f32, spec)
    counts = pl.pallas_call(
        functools.partial(_count_kernel, spec=spec, radius=radius),
        grid=(mc, mc, 9),
        in_specs=list(_win_specs(spec)),
        out_specs=pl.BlockSpec((1, mc, cap),
                               lambda z, y, k: (z * mc + y, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((spec.rows, mc, cap), jnp.int32),
        interpret=interpret,
    )(windows, windows)
    if not emit_masks or cap > 32:
        # words>1 mask packing crashes the Mosaic compiler (SIGABRT) on this
        # toolchain; the dense structure + counts remain the list artifact,
        # bitmasks are emitted when cap fits one word (cap <= 32).
        return counts, None
    words = mask_words(cap)
    masks = pl.pallas_call(
        functools.partial(_mask_kernel, spec=spec, radius=radius),
        grid=(mc, mc, 9),
        in_specs=list(_win_specs(spec)),
        out_specs=pl.BlockSpec(
            (1, 3 * words, mc, cap),
            lambda z, y, k: (z * mc + y, k, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (spec.rows, 27 * words, mc, cap), jnp.int32
        ),
        interpret=interpret,
    )(windows, windows)
    return counts, masks
