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
    """(R, 3, mc, 3cap) candidate windows: channels x, y, z; lane segments
    [dx=-1 | dx=0 | dx=+1] with x-periodic image shifts applied.

    Slot validity is folded into GEOMETRY: every invalid slot is parked at a
    far position, spaced 2*cell_size apart along the park line (all three
    components share the value, so consecutive parked slots sit sqrt(3)*2*
    cell apart — beyond every cutoff: no padding pair can ever hit, no two
    parked slots coincide, so forces/counts on invalid rows are exactly
    zero with no NaN hazard). This removes all validity-mask arithmetic
    from the kernels: ~4 fewer VPU ops per pair eval and 25% less fetch on
    a VPU-peak-bound kernel."""
    mc, cap, L = spec.mc, spec.cap, spec.L
    slot_id = jnp.arange(spec.slots, dtype=jnp.float32).reshape(
        spec.rows, mc, cap
    )
    park = 1.0e5 + slot_id * jnp.float32(2.0 * spec.cell_size)
    w3 = jnp.where(valid_f32[None] > 0.5, pos4, park[None])  # (3, R, mc, cap)

    left = jnp.roll(w3, 1, axis=2)  # cell ix holds ix-1's data
    right = jnp.roll(w3, -1, axis=2)
    xcell = jnp.arange(mc)
    sh_m = jnp.where(xcell == 0, -L, 0.0).astype(jnp.float32)[None, :, None]
    sh_p = jnp.where(xcell == mc - 1, L, 0.0).astype(jnp.float32)[None, :, None]
    left = left.at[0].add(sh_m)  # shift only the x channel
    right = right.at[0].add(sh_p)
    out = jnp.concatenate([left, w3, right], axis=-1)  # (3, R, mc, 3cap)
    # row-major channel layout: each per-row block fetch is ONE contiguous
    # HBM run (channel-leading layout costs strided DMA segments per fetch)
    return jnp.transpose(out, (1, 0, 2, 3))  # (R, 3, mc, 3cap)


def _win_specs(spec: DenseSpec):
    """(neighbor-row spec, own-row spec) for the (4, R, mc, 3cap) windows.
    The neighbor row follows the k-th (dz, dy) offset with periodic wrap;
    the own row ignores k so Pallas leaves it resident across k."""
    mc = spec.mc
    shape = (1, 3, mc, 3 * spec.cap)

    def nbr_map(z, y, k):
        dz = k // 3 - 1
        dy = k % 3 - 1
        return (((z + dz) % mc) * mc + ((y + dy) % mc), 0, 0, 0)

    def own_map(z, y, k):
        return (z * mc + y, 0, 0, 0)

    return (
        pl.BlockSpec(shape, nbr_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(shape, own_map, memory_space=pltpu.VMEM),
    )


def _win_specs3(spec: DenseSpec):
    """Specs for the merged grid (z, y, kdz): three dy = -1/0/+1 neighbor
    rows per program plus the own row. 3x fewer programs than the
    one-offset-per-program grid — per-program launch overhead (~2 us) was
    43% of the force step at N=1M."""
    mc = spec.mc
    shape = (1, 3, mc, 3 * spec.cap)
    specs = []
    for dy in (-1, 0, 1):
        def nbr_map(z, y, kdz, dy=dy):
            return (((z + kdz - 1) % mc) * mc + ((y + dy) % mc), 0, 0, 0)
        specs.append(pl.BlockSpec(shape, nbr_map, memory_space=pltpu.VMEM))

    def own_map(z, y, kdz):
        return (z * mc + y, 0, 0, 0)

    specs.append(pl.BlockSpec(shape, own_map, memory_space=pltpu.VMEM))
    return specs


def _not_self(spec: DenseSpec):
    """(1, cap, 3cap) f32: 0.0 on the center-segment diagonal (slot i vs
    itself), 1.0 elsewhere. f32 because Mosaic cannot reshape/broadcast i1
    vectors along the minor dim."""
    cap = spec.cap
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 3 * cap), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 3 * cap), 2)
    return ((lane - cap) != slot).astype(jnp.float32)


_PENALTY = 1.0e10  # pushes invalid/self pairs far beyond any cutoff


def _pair_r2p_dy(nbr_ref, own_ref, dy: int, spec: DenseSpec):
    """Geometry for one static-dy neighbor row on the merged (z, y, kdz)
    grid: returns (r2p, dxv, dyv, dzv) with validity/self folded into the
    distance penalty (see _pair_r2p)."""
    mc, cap = spec.mc, spec.cap
    z = pl.program_id(0)
    y = pl.program_id(1)
    kdz = pl.program_id(2)
    dz = kdz - 1
    fL = jnp.float32(spec.L)
    zsh = jnp.where(z + dz >= mc, fL, jnp.where(z + dz < 0, -fL, 0.0))
    ysh = jnp.where(y + dy >= mc, fL, jnp.where(y + dy < 0, -fL, 0.0))

    xi = own_ref[0, 0, :, cap : 2 * cap][:, :, None]
    yi = own_ref[0, 1, :, cap : 2 * cap][:, :, None]
    zi = own_ref[0, 2, :, cap : 2 * cap][:, :, None]

    xj = nbr_ref[0, 0][:, None, :]
    yj = nbr_ref[0, 1][:, None, :] + ysh
    zj = nbr_ref[0, 2][:, None, :] + zsh

    dxv = xi - xj
    dyv = yi - yj
    dzv = zi - zj
    r2p = dxv * dxv + dyv * dyv + dzv * dzv
    if dy == 0:
        # the self-pair (r2 = 0) is the only exclusion geometry can't carry:
        # add a big constant on the center-offset diagonal
        r2p = r2p + jnp.where(
            kdz == 1, (1.0 - _not_self(spec)) * jnp.float32(_PENALTY), 0.0
        )
    return r2p, dxv, dyv, dzv


def _pair_r2p(win_ref, own_ref, spec: DenseSpec):
    """Shared geometry for the (z, y, k) tile: returns (r2p, dxv, dyv, dzv)
    where r2p = |dr|^2 + penalty. The penalty ((1 - vi*vj[*notself]) * 1e10)
    folds slot validity AND self-exclusion into the distance itself, so a
    single cutoff comparison replaces the mask/select chain — for real pairs
    the added 0.0 is exact, so cutoff decisions match the reference
    bit-for-bit."""
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
    yi = own_ref[0, 1, :, cap : 2 * cap][:, :, None]
    zi = own_ref[0, 2, :, cap : 2 * cap][:, :, None]

    xj = win_ref[0, 0][:, None, :]  # (mc, 1, 3cap)
    yj = win_ref[0, 1][:, None, :] + ysh
    zj = win_ref[0, 2][:, None, :] + zsh

    dxv = xi - xj  # (mc, cap, 3cap)
    dyv = yi - yj
    dzv = zi - zj
    r2p = dxv * dxv + dyv * dyv + dzv * dzv
    r2p = r2p + jnp.where(
        k == 4, (1.0 - _not_self(spec)) * jnp.float32(_PENALTY), 0.0
    )
    return r2p, dxv, dyv, dzv


def _force_kernel(nm1_ref, n0_ref, np1_ref, own_ref, fx_ref, fy_ref, fz_ref,
                  *extra, spec: DenseSpec, rc: float, want_pe: bool):
    pe_ref = extra[0] if want_pe else None
    kdz = pl.program_id(2)
    r2cut = jnp.float32(rc * rc)
    s6c = jnp.float32((1.0 / (rc * rc)) ** 3)
    ushift = 4.0 * (s6c * s6c - s6c)

    @pl.when(kdz == 0)
    def _():
        fx_ref[0] = jnp.zeros_like(fx_ref[0])
        fy_ref[0] = jnp.zeros_like(fy_ref[0])
        fz_ref[0] = jnp.zeros_like(fz_ref[0])
        if want_pe:
            pe_ref[0] = jnp.zeros_like(pe_ref[0])

    for nbr_ref, dy in ((nm1_ref, -1), (n0_ref, 0), (np1_ref, 1)):
        r2p, dxv, dyv, dzv = _pair_r2p_dy(nbr_ref, own_ref, dy, spec)
        hit = r2p < r2cut
        # LJ force magnitude / |dr| — formula of ops.common (R10). Hot path:
        # hardware approximate reciprocal + one Newton step (~1e-5 relative,
        # far below the fp32 force-parity tolerance; the exact f32 divide is
        # the single most expensive VPU op here). Cutoff decisions use r2p
        # directly, so pair membership stays bit-exact. The diagnostics
        # variant (want_pe) keeps the exact divide so measured energies are
        # reference-exact.
        if want_pe:
            s2 = 1.0 / r2p
        else:
            s2 = pl.reciprocal(r2p, approx=True)
            s2 = s2 * (2.0 - r2p * s2)
        s6 = s2 * s2 * s2
        f = jnp.where(hit, 24.0 * s6 * (2.0 * s6 - 1.0) * s2, 0.0)
        fx_ref[0] += jnp.sum(f * dxv, axis=-1)
        fy_ref[0] += jnp.sum(f * dyv, axis=-1)
        fz_ref[0] += jnp.sum(f * dzv, axis=-1)
        if want_pe:
            u = jnp.where(hit, 4.0 * (s6 * s6 - s6) - ushift, 0.0)
            pe_ref[0] += jnp.sum(u, axis=-1)


def _count_kernel(nm1_ref, n0_ref, np1_ref, own_ref, cnt_ref, *,
                  spec: DenseSpec, radius: float):
    kdz = pl.program_id(2)
    r2cut = jnp.float32(radius * radius)

    @pl.when(kdz == 0)
    def _():
        cnt_ref[0] = jnp.zeros_like(cnt_ref[0])

    # accumulate in f32 (exact for counts < 2^24; i32 vector ops are slower
    # on the VPU), convert at the final consumer
    for nbr_ref, dy in ((nm1_ref, -1), (n0_ref, 0), (np1_ref, 1)):
        r2p, _, _, _ = _pair_r2p_dy(nbr_ref, own_ref, dy, spec)
        hit = r2p < r2cut
        cnt_ref[0] += jnp.where(hit, 1.0, 0.0).sum(axis=-1)


HALF_OFFSETS5 = [(0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]


def _win_specs_half(spec: DenseSpec):
    """Specs for the half-sweep count grid (z, y, k): the five (dz, dy)
    rows with (dz, dy) lexicographically >= (0, 0) — each unordered pair is
    visited exactly once (the center row additionally halves its x-window
    in-kernel). 5/9 of the fetches and ~half the pair evals of the full
    sweep; counts then need no /2."""
    mc = spec.mc
    shape = (1, 3, mc, 3 * spec.cap)

    def nbr_map(z, y, k):
        dz = jnp.where(k >= 2, 1, 0)
        dy = jnp.where(k == 0, 0, jnp.where(k == 1, 1, k - 3))
        return (((z + dz) % mc) * mc + ((y + dy) % mc), 0, 0, 0)

    def own_map(z, y, k):
        return (z * mc + y, 0, 0, 0)

    return (
        pl.BlockSpec(shape, nbr_map, memory_space=pltpu.VMEM),
        pl.BlockSpec(shape, own_map, memory_space=pltpu.VMEM),
    )


def _half_center_penalty(spec: DenseSpec):
    """(1, cap, 3cap) f32 penalty for the (0,0) offset of the half sweep:
    excludes the dx=-1 segment entirely and keeps only lane > slot in the
    center segment (same-cell Newton dedup). 0.0 where the pair is kept."""
    cap = spec.cap
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 3 * cap), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 3 * cap), 2)
    keep = (lane >= 2 * cap) | ((lane >= cap) & (lane - cap > slot))
    return jnp.where(keep, 0.0, jnp.float32(_PENALTY))


def _count_half_kernel(nbr_ref, own_ref, cnt_ref, *, spec: DenseSpec,
                       radius: float):
    mc, cap = spec.mc, spec.cap
    z = pl.program_id(0)
    y = pl.program_id(1)
    k = pl.program_id(2)
    dz = jnp.where(k >= 2, 1, 0)
    dy = jnp.where(k == 0, 0, jnp.where(k == 1, 1, k - 3))
    fL = jnp.float32(spec.L)
    zsh = jnp.where(z + dz >= mc, fL, 0.0)  # dz >= 0 here
    ysh = jnp.where(y + dy >= mc, fL, jnp.where(y + dy < 0, -fL, 0.0))

    xi = own_ref[0, 0, :, cap : 2 * cap][:, :, None]
    yi = own_ref[0, 1, :, cap : 2 * cap][:, :, None]
    zi = own_ref[0, 2, :, cap : 2 * cap][:, :, None]
    xj = nbr_ref[0, 0][:, None, :]
    yj = nbr_ref[0, 1][:, None, :] + ysh
    zj = nbr_ref[0, 2][:, None, :] + zsh

    dxv = xi - xj
    dyv = yi - yj
    dzv = zi - zj
    r2p = dxv * dxv + dyv * dyv + dzv * dzv
    r2p = r2p + jnp.where(k == 0, _half_center_penalty(spec), 0.0)

    @pl.when(k == 0)
    def _():
        cnt_ref[0] = jnp.zeros_like(cnt_ref[0])

    hit = r2p < jnp.float32(radius * radius)
    cnt_ref[0] += jnp.where(hit, 1.0, 0.0).sum(axis=-1)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def dense_counts_half(pos4: jnp.ndarray, valid_f32: jnp.ndarray,
                      spec: DenseSpec, radius: float,
                      interpret: bool = False):
    """Per-slot HALF neighbor counts (each unordered pair attributed once,
    to its lexicographically-lower cell/slot). Total pairs = sum(counts) —
    the fast list-build counting pass (nearly half the full sweep's work)."""
    mc, cap = spec.mc, spec.cap
    windows = make_windows(pos4, valid_f32, spec)
    counts = pl.pallas_call(
        functools.partial(_count_half_kernel, spec=spec, radius=radius),
        grid=(mc, mc, 5),
        in_specs=list(_win_specs_half(spec)),
        out_specs=pl.BlockSpec((1, mc, cap),
                               lambda z, y, k: (z * mc + y, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((spec.rows, mc, cap), jnp.float32),
        interpret=interpret,
    )(windows, windows).astype(jnp.int32)
    return counts


def _mask_kernel(win_ref, own_ref, mask_ref, *, spec: DenseSpec,
                 radius: float):
    """Bitmask emission kept in its own kernel: every output block here is
    written exactly once per program (block index varies with k) — mixing a
    k-revisited accumulator output with k-varying outputs in one kernel
    crashes the Mosaic compiler."""
    cap = spec.cap
    r2p, _, _, _ = _pair_r2p(win_ref, own_ref, spec)
    mask = r2p < jnp.float32(radius * radius)
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


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def dense_forces(pos4: jnp.ndarray, valid_f32: jnp.ndarray, spec: DenseSpec,
                 rc: float, interpret: bool = False, want_pe: bool = True):
    """LJ forces (3, R, mc, cap) and, when ``want_pe``, the per-slot shifted
    potential (R, mc, cap) — else None. The hot step loop skips PE (~15%
    fewer VPU ops); diagnostics request it.

    Total PE = 0.5 * sum(pe * valid) (full symmetric accumulation counts
    each pair twice — the zero-scatter trade anticipated in SURVEY.md §9)."""
    mc, cap = spec.mc, spec.cap
    windows = make_windows(pos4, valid_f32, spec)
    nout = 4 if want_pe else 3
    shapes = [
        jax.ShapeDtypeStruct((spec.rows, mc, cap), jnp.float32)
        for _ in range(nout)
    ]
    specs = [
        pl.BlockSpec((1, mc, cap), lambda z, y, k: (z * mc + y, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(nout)
    ]
    out = pl.pallas_call(
        functools.partial(_force_kernel, spec=spec, rc=rc, want_pe=want_pe),
        grid=(mc, mc, 3),
        in_specs=_win_specs3(spec),
        out_specs=specs,
        out_shape=shapes,
        interpret=interpret,
    )(windows, windows, windows, windows)
    force = jnp.stack(out[:3])
    return force, (out[3] if want_pe else None)


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
        grid=(mc, mc, 3),
        in_specs=_win_specs3(spec),
        out_specs=pl.BlockSpec((1, mc, cap),
                               lambda z, y, k: (z * mc + y, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((spec.rows, mc, cap), jnp.float32),
        interpret=interpret,
    )(windows, windows, windows, windows).astype(jnp.int32)
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
