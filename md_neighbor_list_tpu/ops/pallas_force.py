"""Pallas TPU kernels: direct cell-pair LJ forces and neighbor counting.

These are the performance kernels of the engine (SURVEY.md §3 R5-R8 + R10
collapsed into one kernel family; BASELINE.json:5 "27-cell pair sweep ...
as Pallas kernels"). Division of labor:

  XLA (per call): nothing. The state itself carries the park invariant
  (dense_cells.park_lattice: empty slots parked, zero velocity —
  established at rebuild, preserved exactly by the integrator), so the
  hot kernels read the engine state directly with no validity masks, no
  select pass, no relayout (round 3 first cut re-parked + transposed
  20.6 MB per pass; park_state remains for probes/diagnostics).

  Pallas: the HALF-SWEEP kernels (the hot path) run a MERGED grid (z, y)
  with all five (dz, dy) offset rows unrolled in-kernel — the per-program
  fixed cost (~2 us: launch + block bookkeeping) made the round-1
  one-offset-per-program grid pay ~10 ms of pure overhead per pass at
  N=1M. Each kernel fetches raw (3, mc, cap) state blocks and builds its
  dx=-1/0/+1 candidate WINDOWS in-kernel (_window_from_block: two sublane
  rolls + a lane concat in VMEM) — round 2 materialized an (R, 3, mc,
  3cap) window array per pass in XLA, paying a 2.6 ms transpose/concat
  pass and 3x the block DMA at N=1M. Intermediate temporaries are freed
  between unrolled rows because each row's outputs are written (or
  accumulated) before the next row starts. The FULL-sweep parity kernels
  keep the XLA make_windows path with k on the grid and k-revisited
  output blocks — they are untimed validation passes. All pair math is
  masked VPU work: no gathers, no scatters, no compaction (the
  reference's AVX-512 compress-store becomes masking over fixed lanes,
  SURVEY.md §9).

The half-sweep list kernel (dense_lists_half) emits packed cluster
bitmasks plus half counts in one pass — a complete, consumable pair list
in cluster-compressed form (cf. GROMACS cluster lists, PAPERS.md:9); the
half-sweep force kernel (dense_forces_half) evaluates each pair once and
writes the Newton-3 reaction AT the partner row via shifted output
BlockSpec index_maps (no scatter, no rolls — the caller just sums).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from md_neighbor_list_tpu.ops.dense_cells import DenseSpec


MASK_BITS = 32  # bits per packed i32 mask word (sum == OR: distinct bits)


def mask_words(cap: int) -> int:
    """Packed mask words per (window-lane, offset-row): one bit per OWN
    slot (cap bits), MASK_BITS bits per word — the slot axis is the packed
    one (see _list_half_kernel: packing over slots reduces over sublanes,
    which is the cheap direction)."""
    return (cap + MASK_BITS - 1) // MASK_BITS


def make_windows(pos4: jnp.ndarray, valid_f32: jnp.ndarray,
                 spec: DenseSpec) -> jnp.ndarray:
    """(R, 3, mc, 3cap) candidate windows: channels x, y, z; lane segments
    [dx=-1 | dx=0 | dx=+1] with x-periodic image shifts applied.

    Slot validity is folded into GEOMETRY: every invalid slot is parked at
    a far position so no padding pair can ever hit and forces/counts on
    invalid rows are exactly zero with no NaN hazard. This removes all
    validity-mask arithmetic from the kernels: ~4 fewer VPU ops per pair
    eval and 25% less fetch on a VPU-peak-bound kernel.

    The park is a 3-D LATTICE, not a 1-D line: the x channel separates
    slots within a cell row ((x*cap + slot) * 2*cell), the y channel
    separates cell rows (row * 2*cell), the z channel is constant. A
    single park line (1e5 + global_slot * 2*cell — round 2's layout)
    silently violates its own invariant at large slot counts: at N=8M
    (14.3M slots) the line tops out near 8e7 where the f32 ulp (8)
    exceeds the 5.6 spacing, so adjacent parked slots COLLIDE and emit
    phantom hits between two EMPTY slots (r2=0 -> masked-out NaN forces,
    phantom mask bits that crash ops/decode on invalid rows). Each
    lattice axis spans only O(10^4), where the ulp is ~0.01, so spacings
    are f32-exact at every supported shape; any two parked slots that
    can meet in a window differ by >= 2*cell in the x or y channel, and
    the kernels' +-L image shifts cannot alias a pair back under the
    cutoff (wrapped pairs sit ~mc*cap lanes resp. ~mc^2 rows apart — an
    alias would need a delta of mc/2)."""
    mc, cap, L = spec.mc, spec.cap, spec.L
    step = jnp.float32(2.0 * spec.cell_size)
    base = jnp.float32(1.0e5)
    lane_id = (jnp.arange(mc, dtype=jnp.float32)[None, :, None] * cap
               + jnp.arange(cap, dtype=jnp.float32)[None, None, :])
    row_id = jnp.arange(spec.rows, dtype=jnp.float32)[:, None, None]
    shape = (spec.rows, mc, cap)
    park3 = jnp.stack([
        jnp.broadcast_to(base + lane_id * step, shape),
        jnp.broadcast_to(base + row_id * step, shape),
        jnp.broadcast_to(base, shape),
    ])
    w3 = jnp.where(valid_f32[None] > 0.5, pos4, park3)  # (3, R, mc, cap)

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
    grid: returns (r2p, dxv, dyv, dzv) where r2p = |dr|^2 + penalty. The
    penalty folds slot validity (via parked positions, see make_windows)
    and self-exclusion into the distance itself, so a single cutoff
    comparison replaces the mask/select chain — for real pairs the added
    0.0 is exact, so cutoff decisions match the reference bit-for-bit."""
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
        # hardware approximate reciprocal + TWO Newton steps. One step left
        # ~1e-5 relative error in s2 which compounds through s6*s6*s2 into
        # ~1e-4-relative force error; the second step (2 VPU ops per pair)
        # brings the hot path inside the fp32 force-parity gate
        # (<= 2e-4*scale, BASELINE.json:5) with no measurable steps/s cost —
        # the exact f32 divide remains the most expensive VPU op here.
        # Cutoff decisions use r2p directly, so pair membership stays
        # bit-exact. The diagnostics variant (want_pe) keeps the exact
        # divide so measured energies are reference-exact.
        if want_pe:
            s2 = 1.0 / r2p
        else:
            s2 = pl.reciprocal(r2p, approx=True)
            s2 = s2 * (2.0 - r2p * s2)
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


def _win_specs_merged(spec: DenseSpec):
    """Input specs for the MERGED half-sweep grid (z, y): one block per
    half offset row, all five visited by ONE program (the (0, 0) block is
    also the own row). Round-1 kernels put k on the grid — (z, y, k) = 5x
    the programs; the measured fixed cost per program (~2 us: launch +
    block bookkeeping) made that 10 ms of pure overhead per pass at N=1M
    (counts pass: 16.9 ms on the k-grid vs 7.1 ms merged, same math)."""
    mc = spec.mc
    shape = (1, 3, mc, 3 * spec.cap)
    specs = []
    for dz, dy in HALF_OFFSETS5:
        def m(z, y, dz=dz, dy=dy):
            return (((z + dz) % mc) * mc + ((y + dy) % mc), 0, 0, 0)
        specs.append(pl.BlockSpec(shape, m, memory_space=pltpu.VMEM))
    return specs


def park_state(pos4: jnp.ndarray, valid_f32: jnp.ndarray,
               spec) -> jnp.ndarray:
    """(R, 3, mc, cap) row-major PARKED state: invalid slots moved to the
    park lattice (same lattice and guarantees as make_windows — see its
    docstring for the f32-exactness analysis). The half-sweep kernels
    fetch these blocks directly and build their x-windows IN-KERNEL
    (roll+concat on VMEM blocks, `_window_from_block`), which deletes the
    materialized (R, 3, mc, 3cap) window array: no transpose/concat XLA
    pass (2.6 ms/step at N=1M) and 3x less window DMA per program."""
    mc, cap, L = spec.mc, spec.cap, spec.L
    step = jnp.float32(2.0 * spec.cell_size)
    base = jnp.float32(1.0e5)
    lane_id = (jnp.arange(mc, dtype=jnp.float32)[None, :, None] * cap
               + jnp.arange(cap, dtype=jnp.float32)[None, None, :])
    row_id = jnp.arange(spec.rows, dtype=jnp.float32)[:, None, None]
    shape = (spec.rows, mc, cap)
    park3 = jnp.stack([
        jnp.broadcast_to(base + lane_id * step, shape),
        jnp.broadcast_to(base + row_id * step, shape),
        jnp.broadcast_to(base, shape),
    ])
    w3 = jnp.where(valid_f32[None] > 0.5, pos4, park3)
    return jnp.transpose(w3, (1, 0, 2, 3))


def _state_specs_merged(spec):
    """One (3, 1, mc, cap) state BlockSpec per half offset row on the
    merged (z, y) grid — the in-kernel-window twin of _win_specs_merged.
    The blocks read the engine's CHANNEL-LEADING (3, R, mc, cap) state
    directly (three strided DMA segments per fetch — measured +0.3 ms per
    pass vs contiguous row-major at N=1M, vs the 1.6 ms park/transpose
    pass the direct read deletes). Validity comes from the park invariant
    (dense_cells.park_lattice): empty slots are parked IN the state, so
    the kernels take no validity mask at all."""
    mc = spec.mc
    shape = (3, 1, mc, spec.cap)
    specs = []
    for dz, dy in HALF_OFFSETS5:
        def m(z, y, dz=dz, dy=dy):
            return (0, ((z + dz) % mc) * mc + ((y + dy) % mc), 0, 0)
        specs.append(pl.BlockSpec(shape, m, memory_space=pltpu.VMEM))
    return specs


WINDOW_SCRATCH = 2  # (mc, cap) VMEM scratch refs every half kernel carries


def _window_scratch(spec):
    """scratch_shapes entry for _window_from_block's layout round-trips."""
    shape = (spec.mc, spec.cap)
    return [pltpu.VMEM(shape, jnp.float32) for _ in range(WINDOW_SCRATCH)]


def _window_from_block(b3, spec, scr):
    """(3, mc, cap) parked-state block -> (wx, wy, wz) x-window rows of
    shape (mc, 3cap): lane segments [dx=-1 | dx=0 | dx=+1] via two
    x-cell (sublane) rolls + lane concat, with the +-L x-image shifts on
    the x channel at the wrap sublanes — bit-identical to make_windows'
    XLA rolls, built in VMEM per program instead of materialized in HBM.

    ``scr`` = two (mc, cap) VMEM scratch refs: each rolled segment
    round-trips through one before the concat, because tpu.concatenate
    cannot relayout inputs whose SUBLANE offsets disagree (pltpu.roll
    leaves a non-zero offset on the mc-1 shift; real Mosaic rejects the
    direct concat with "result/input offset mismatch on non-concat
    dimension" while interpret mode accepts it — a store normalizes the
    layout; of the three working constructions this one measured
    fastest, tools/tpu_concat_probe.py)."""
    mc, cap = spec.mc, spec.cap
    L = jnp.float32(spec.L)
    xcell = jax.lax.broadcasted_iota(jnp.int32, (mc, cap), 0)
    sh_m = jnp.where(xcell == 0, -L, 0.0)
    sh_p = jnp.where(xcell == mc - 1, L, 0.0)
    scr_l, scr_r = scr
    outs = []
    for c in range(3):
        b = b3[c]
        scr_l[...] = pltpu.roll(b, 1, axis=0)
        scr_r[...] = pltpu.roll(b, mc - 1, axis=0)
        left = scr_l[...]
        right = scr_r[...]
        if c == 0:
            left = left + sh_m
            right = right + sh_p
        outs.append(jnp.concatenate([left, b, right], axis=-1))
    return tuple(outs)


def _pair_geom_win(win, own, dz: int, dy: int, spec, zwrap: bool = True):
    """Value-based twin of _pair_geom_static: ``win`` = (wx, wy, wz)
    window rows from _window_from_block, ``own`` = the (3, mc, cap) own
    parked-state block. Same static periodic shifts, same center-row
    Newton dedup penalty, bit-identical r2p."""
    mc = spec.mc
    z = pl.program_id(0)
    y = pl.program_id(1)
    fL = jnp.float32(spec.L)
    xi = own[0][:, :, None]
    yi = own[1][:, :, None]
    zi = own[2][:, :, None]
    wx, wy, wz = win
    xj = wx[:, None, :]
    yj = wy[:, None, :]
    zj = wz[:, None, :]
    if dy == 1:
        yj = yj + jnp.where(y + 1 >= mc, fL, 0.0)
    elif dy == -1:
        yj = yj + jnp.where(y - 1 < 0, -fL, 0.0)
    if zwrap and dz == 1:
        zj = zj + jnp.where(z + 1 >= mc, fL, 0.0)

    dxv = xi - xj
    dyv = yi - yj
    dzv = zi - zj
    r2p = dxv * dxv + dyv * dyv + dzv * dzv
    if (dz, dy) == (0, 0):
        r2p = r2p + _half_center_penalty(spec)
    return r2p, dxv, dyv, dzv


def _half_center_penalty(spec: DenseSpec):
    """(1, cap, 3cap) f32 penalty for the (0,0) offset of the half sweep:
    excludes the dx=-1 segment entirely and keeps only lane > slot in the
    center segment (same-cell Newton dedup). 0.0 where the pair is kept."""
    cap = spec.cap
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 3 * cap), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 3 * cap), 2)
    keep = (lane >= 2 * cap) | ((lane >= cap) & (lane - cap > slot))
    return jnp.where(keep, 0.0, jnp.float32(_PENALTY))


# Input state blocks a y-grouped (z, gy) program fetches: (dz, dblock)
# with dblock the y-BLOCK shift whose rows the unrolled t-loop touches
# (own rows t in [0, G) plus the dy = -1/+1 spill rows -1 and G).
GROUP_BLOCKS = [(0, 0), (0, 1), (1, -1), (1, 0), (1, 1)]


def _state_specs_grouped(spec, G: int, nby: int | None = None):
    """Grouped twin of _state_specs_merged: grid (mc, nby), each program
    owning G consecutive y-rows at one z. Five (3, G, mc, cap) state
    blocks per program (GROUP_BLOCKS) — 5G rows fetched where the per-row
    grid fetches 6G — and G× fewer programs, attacking the ~2.5 us/program
    fixed cost that tools/tpu_launch_probe.py pinned as the launch floor.
    ``nby`` defaults to mc//G (the divisor grid); the ceil grid passes
    nby > mc/G and a y-PADDED state array (_pad_rows_y)."""
    mc = spec.mc
    if nby is None:
        nby = mc // G
    shape = (3, G, mc, spec.cap)
    specs = []
    for dz, db in GROUP_BLOCKS:
        def m(z, gy, dz=dz, db=db, nby=nby):
            return (0, ((z + dz) % mc) * nby + (gy + db) % nby, 0, 0)
        specs.append(pl.BlockSpec(shape, m, memory_space=pltpu.VMEM))
    return specs


def _pad_rows_y(windows: jnp.ndarray, spec, nbyG: int) -> jnp.ndarray:
    """Pad the y axis per z-plane for the ceil grouped grid:
    (3, mc^2, mc, cap) -> (3, mc*nbyG, mc, cap) with pad = nbyG - mc >= 2
    extra rows per z laid out [row-0 copy | far filler | row-(mc-1) copy].

    The two copies are the ONLY padded rows a kept own row ever reads
    (exhaustive case walk in lists_half_grouped's docstring): row mc
    serves as the +y periodic-wrap window of row mc-1 (the kernel's
    y+1 >= mc shift then matches the divisor grid's read of real row 0
    bitwise) and row nbyG-1 as the -y wrap window of row 0. Filler rows
    feed only computations whose output rows are sliced off; they sit at
    a far constant (coincident filler slots give r2=0 — harmless for the
    LIST kernels, which never divide; do NOT reuse this padding for a
    force kernel without distinct filler positions)."""
    mc, cap = spec.mc, spec.cap
    pad = nbyG - mc
    assert pad >= 2, "ceil grid needs the two wrap-copy rows distinct"
    nc = windows.shape[0]
    w5 = windows.reshape(nc, mc, mc, mc, cap)
    parts = [w5, w5[:, :, :1]]
    if pad > 2:
        parts.append(jnp.full((nc, mc, pad - 2, mc, cap),
                              jnp.float32(2.0e5)))
    parts.append(w5[:, :, mc - 1:mc])
    return jnp.concatenate(parts, axis=2).reshape(nc, mc * nbyG, mc, cap)


def _pair_geom_group(win, own, dz: int, dy: int, z, y, spec):
    """_pair_geom_win with (z, y) passed as values (on the grouped grid
    y = gy*G + t is not a bare program id). Same static shifts, same
    center-row penalty, same op order -> bit-identical r2p."""
    mc = spec.mc
    fL = jnp.float32(spec.L)
    xi = own[0][:, :, None]
    yi = own[1][:, :, None]
    zi = own[2][:, :, None]
    wx, wy, wz = win
    xj = wx[:, None, :]
    yj = wy[:, None, :]
    zj = wz[:, None, :]
    if dy == 1:
        yj = yj + jnp.where(y + 1 >= mc, fL, 0.0)
    elif dy == -1:
        yj = yj + jnp.where(y - 1 < 0, -fL, 0.0)
    if dz == 1:
        zj = zj + jnp.where(z + 1 >= mc, fL, 0.0)
    dxv = xi - xj
    dyv = yi - yj
    dzv = zi - zj
    r2p = dxv * dxv + dyv * dyv + dzv * dzv
    if (dz, dy) == (0, 0):
        r2p = r2p + _half_center_penalty(spec)
    return r2p, dxv, dyv, dzv


class _GroupWindows:
    """Per-program window cache for the grouped kernels: windows are built
    once per DISTINCT source row — 2G+3 builds per program where the
    per-row grid pays 5 per row (5G per G rows) — and cached as VMEM
    values across the unrolled t-loop."""

    def __init__(self, ins, spec, scr):
        self.ins = ins
        self.spec = spec
        self.scr = scr
        self.G = ins[0].shape[1]
        self.wins = {}

    def get(self, dz: int, lr: int):
        key = (dz, lr)
        if key not in self.wins:
            G = self.G
            if lr < 0:
                blk, row = self.ins[GROUP_BLOCKS.index((dz, -1))], lr + G
            elif lr >= G:
                blk, row = self.ins[GROUP_BLOCKS.index((dz, 1))], lr - G
            else:
                blk, row = self.ins[GROUP_BLOCKS.index((dz, 0))], lr
            self.wins[key] = _window_from_block(blk[:, row], self.spec,
                                                self.scr)
        return self.wins[key]


def _pair_geom_static(nbr_ref, own_ref, dz: int, dy: int, spec,
                      zwrap: bool = True):
    """Half-sweep pair geometry for ONE (dz, dy) offset row with the
    offsets STATIC (the kernels unroll their subset of ``HALF_OFFSETS5``,
    so every periodic shift is a compile-time select on the program ids
    only). Returns (r2p, dxv, dyv, dzv) with the same-cell Newton-3 dedup
    penalty folded in at (0, 0) (see _half_center_penalty). dz >= 0 for
    every half offset, so the z periodic shift is one-sided. zwrap=False
    is the slab-decomposition variant: the z axis never wraps locally
    (ghost layers pad the owned block, with the ring seam's +-L already
    baked into ghost positions by the receiver)."""
    mc, cap = spec.mc, spec.cap
    z = pl.program_id(0)
    y = pl.program_id(1)
    fL = jnp.float32(spec.L)
    xi = own_ref[0, 0, :, cap : 2 * cap][:, :, None]
    yi = own_ref[0, 1, :, cap : 2 * cap][:, :, None]
    zi = own_ref[0, 2, :, cap : 2 * cap][:, :, None]
    xj = nbr_ref[0, 0][:, None, :]
    yj = nbr_ref[0, 1][:, None, :]
    zj = nbr_ref[0, 2][:, None, :]
    if dy == 1:
        yj = yj + jnp.where(y + 1 >= mc, fL, 0.0)
    elif dy == -1:
        yj = yj + jnp.where(y - 1 < 0, -fL, 0.0)
    if zwrap and dz == 1:
        zj = zj + jnp.where(z + 1 >= mc, fL, 0.0)

    dxv = xi - xj
    dyv = yi - yj
    dzv = zi - zj
    r2p = dxv * dxv + dyv * dyv + dzv * dzv
    if (dz, dy) == (0, 0):
        r2p = r2p + _half_center_penalty(spec)
    return r2p, dxv, dyv, dzv


def _split_rows(spec, want_pe: bool = False, kind: str = "force") -> bool:
    """True when the 5-row merged COUNTS/LISTS kernel would blow the
    16 MB scoped-VMEM stack and each offset row must go in its OWN
    pallas_call (hard temporary isolation — Mosaic's scheduler overlaps
    the unrolled rows' temporaries regardless of source-level structure:
    an x-chunked variant of the merged kernel still demanded 29.4 MB at
    N=8M shapes). Measured live-set model, in (mc, cap, 3cap) f32
    intermediates: counts/lists <= 10 — their merged forms COMPILE AND
    WIN at the N=8M shape (mc=71, cap=40: counts 62 vs 150 ms split,
    lists 150 vs 163 — tools/tpu_split_probe.py; ADVICE r2 #4: round 2
    reused the force constant and paid the 5-launch split where merged
    fit). The FORCE kernels use the finer-grained ``_row_groups`` policy
    instead (``want_pe``/"force" kept for compatibility with existing
    monkeypatch-based tests)."""
    live = {"force": 29 if want_pe else 16, "counts": 10, "lists": 10,
            # pe_virial carries TWO per-slot output accumulators plus the
            # pe+virial pair math per unrolled row; the merged 5-row form
            # is rejected by the chip's compiler at the N=8M shape
            # (mc=71: round-5 compile gate, tpu_compile_helper abort)
            # where the counts model (10 units = 13.6 MB) still fits —
            # 16 units splits it there and keeps N=1M (10.7 MB) merged,
            # which compiles and runs on hardware
            "pe_virial": 16}[kind]
    return live * spec.mc * spec.cap * 3 * spec.cap * 4 > (14 << 20)


# Measured live-temporary model for force-kernel row GROUPS, in
# (mc, cap, 3cap) f32 intermediates (tools/tpu_split_probe.py --force,
# real-chip Mosaic at mc=71/cap=40 and mc=35/cap=40): a group of g offset
# rows keeps the 3-component accumulator plus ~2 rows of per-row
# temporaries live per unrolled row. Grouping exists because each
# pallas_call pays ~2 us of fixed cost PER PROGRAM: the 5-singleton split
# at N=8M runs 5*mc^2 programs — ~40 ms of pure launch overhead that a
# 2-call grouping halves while keeping each call's live set under the
# scoped-VMEM budget.
_FORCE_LIVE = {1: 8, 2: 10, 3: 13, 5: 16}
_FORCE_LIVE_PE = {1: 10, 2: 14, 3: 19, 5: 29}


def _row_groups(spec, want_pe: bool = False):
    """Partition of the five half-sweep offset rows into pallas_call
    groups: the largest group size whose modeled live set fits the 14 MB
    scoped-VMEM budget (merged = one group of five; N=8M force shapes get
    [(0,1,2), (3,4)] instead of round 2's five singleton calls)."""
    unit = spec.mc * spec.cap * 3 * spec.cap * 4
    live = _FORCE_LIVE_PE if want_pe else _FORCE_LIVE
    budget = 14 << 20
    for size, plan in ((5, [(0, 1, 2, 3, 4)]),
                       (3, [(0, 1, 2), (3, 4)]),
                       (2, [(0, 1), (2, 3), (4,)])):
        if live[size] * unit <= budget:
            return plan
    return [(0,), (1,), (2,), (3,), (4,)]


def _fold_rxn(r, mc: int, cap: int):
    """Window-lane reaction (mc, 3cap), already summed over own slots,
    -> partner-cell slots: own cell x's window segment seg holds partner
    cell x + seg - 1, so the reaction for partner cell xp gathers
    seg0[xp+1] + seg1[xp] + seg2[xp-1] — two static +-1 rolls along the
    x-cell (sublane) axis, circular because x is periodic (matching
    make_windows' circular rolls). pltpu.roll requires non-negative
    shifts: -1 == mc - 1."""
    s0 = r[:, :cap]
    s1 = r[:, cap : 2 * cap]
    s2_ = r[:, 2 * cap :]
    return pltpu.roll(s0, mc - 1, axis=0) + s1 + pltpu.roll(s2_, 1, axis=0)


def _force_half_kernel(*refs, spec, rc: float, want_pe: bool,
                       zwrap: bool = True, ks=(0, 1, 2, 3, 4)):
    """Half-sweep Newton-3 LJ forces for the offset rows in ``ks`` (any
    subset of the five — one group of a ``_row_groups`` plan): each
    unordered pair is EVALUATED once (5/9 of the full sweep's work) and
    contributes to both partners.

    Output layout, uniform across group sizes: out_refs[0] (3, 1, mc, cap)
    holds the own row's force from this group's rows, INCLUDING the (0,0)
    row's reaction when 0 is in ``ks`` (its partner row is the own row, so
    it folds in-kernel); then one (3, 1, mc, cap) ref per k != 0 in ``ks``
    order — the NEGATED reaction on the (z+dz, y+dy) partner row, already
    folded from window lanes to partner-cell x slots and written AT the
    partner row by the output BlockSpec index_map (an injection per
    offset, so no block is written twice); the once-per-pair potential
    last when ``want_pe``. Re-homing by output index_map replaces round
    2's caller-side (dz, dy) jnp.rolls — no rotated copies materialize,
    the caller only SUMS the arrays: measured 22.6 -> 18.9 ms/step at
    N=1M cap=40, bitwise-equal forces (tools/tpu_step_opt_probe.py). This
    is the TPU answer to the reference's Newton-3 scatter-add
    (SURVEY.md §9)."""
    n = len(ks)
    nbr_refs = refs[:n]
    own_ref = refs[n]
    out_refs = refs[n + 1:-WINDOW_SCRATCH]
    scr = refs[-WINDOW_SCRATCH:]
    mc, cap = spec.mc, spec.cap
    r2cut = jnp.float32(rc * rc)
    s6c = jnp.float32((1.0 / (rc * rc)) ** 3)
    ushift = 4.0 * (s6c * s6c - s6c)

    # Cross-lane reductions are the expensive VPU op (~log2(lanes)
    # rotate+add steps each); in the merged case the own-row force sum,
    # LINEAR in the raw (mc, cap, 3cap) products, is accumulated across
    # all five offset rows and reduced ONCE per component: 3 lane
    # reductions per program instead of 15 (measured 24.2 vs 25.0 ms at
    # N=1M). Newton-3 folds always reduce over SUBLANES (cheap adds)
    # into small (mc, 3cap) rows.
    own_blk = own_ref[:, 0]  # (3, mc, cap) parked-state block
    acc = None
    rxn_rows = []
    for i, k in enumerate(ks):
        dz, dy = HALF_OFFSETS5[k]
        win = _window_from_block(own_blk if k == 0 else nbr_refs[i][:, 0],
                                 spec, scr)
        r2p, dxv, dyv, dzv = _pair_geom_win(
            win, own_blk, dz, dy, spec, zwrap)
        hit = r2p < r2cut
        # LJ force magnitude / |dr| — formula of ops.common (R10). Hot
        # path: hardware approximate reciprocal + TWO Newton steps (one
        # step leaves ~1e-4-relative force error after s6*s6*s2; the
        # second brings the hot path inside the fp32 parity gate,
        # BASELINE.json:5, at 2 VPU ops per pair). Cutoff decisions use
        # r2p directly, so pair membership stays bit-exact. The
        # diagnostics variant (want_pe) keeps the exact divide.
        if want_pe:
            s2 = 1.0 / r2p
        else:
            s2 = pl.reciprocal(r2p, approx=True)
            s2 = s2 * (2.0 - r2p * s2)
            s2 = s2 * (2.0 - r2p * s2)
        s6 = s2 * s2 * s2
        f = jnp.where(hit, 24.0 * s6 * (2.0 * s6 - 1.0) * s2, 0.0)
        px = f * dxv  # (mc, cap, 3cap)
        py = f * dyv
        pz = f * dzv
        u = (jnp.where(hit, 4.0 * (s6 * s6 - s6) - ushift, 0.0)
             if want_pe else None)
        rxn_rows.append([jnp.sum(px, axis=1), jnp.sum(py, axis=1),
                         jnp.sum(pz, axis=1)])  # (mc, 3cap)
        if i == 0:
            acc = [px, py, pz] + ([u] if want_pe else [])
        else:
            acc = [a + p for a, p in zip(acc, [px, py, pz, u][: len(acc)])]

    own = [jnp.sum(a, axis=-1) for a in acc]  # fx, fy, fz (+ pe)
    if 0 in ks:
        k0 = ks.index(0)
        for c in range(3):
            out_refs[0][c, 0] = own[c] - _fold_rxn(rxn_rows[k0][c], mc, cap)
    else:
        for c in range(3):
            out_refs[0][c, 0] = own[c]
    ri = 1
    for j, k in enumerate(ks):
        if k == 0:
            continue
        for c in range(3):
            out_refs[ri][c, 0] = -_fold_rxn(rxn_rows[j][c], mc, cap)
        ri += 1
    if want_pe:
        out_refs[ri][0] = own[3]


def _call_force_group(windows, spec, rc, want_pe, interpret, zwrap, ks,
                      win_specs, grid, out_rows, rxn_out):
    """One row group's force pass as its own pallas_call (one group of a
    ``_row_groups`` plan; the merged kernel is the single group of five).
    ``grid``/``out_rows`` come from the caller ((mc, mc)/spec.rows for the
    cube; (nz, mc)/owned rows for a slab whose windows carry the ghost
    layer). ``rxn_out(k) -> (index_map, n_rows)`` gives each reaction
    array's partner-row output map — periodic for the cube, ext-rows
    (ghost layer = the seam, first layer UNWRITTEN) for the slab; blocks
    no program maps to are undefined and the caller must not read them.

    Returns ``[own, rxn_k1, ..., pe?]`` — the caller sums them (plain
    adds; the re-homing already happened at write time via the maps)."""
    mc, cap = spec.mc, spec.cap
    out_specs = [pl.BlockSpec((3, 1, mc, cap),
                              lambda z, y: (0, z * mc + y, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((3, out_rows, mc, cap), jnp.float32)]
    for k in ks:
        if k == 0:
            continue
        m, rows = rxn_out(k)
        out_specs.append(pl.BlockSpec((3, 1, mc, cap), m,
                                      memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((3, rows, mc, cap), jnp.float32))
    if want_pe:
        out_specs.append(pl.BlockSpec((1, mc, cap),
                                      lambda z, y: (z * mc + y, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((out_rows, mc, cap), jnp.float32))
    return pl.pallas_call(
        functools.partial(_force_half_kernel, spec=spec, rc=rc,
                          want_pe=want_pe, zwrap=zwrap, ks=tuple(ks)),
        grid=grid,
        in_specs=[win_specs[k] for k in ks] + [win_specs[0]],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=_window_scratch(spec),
        interpret=interpret,
    )(*([windows] * len(ks)), windows)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def dense_forces_half(pos4: jnp.ndarray, valid_f32: jnp.ndarray,
                      spec: DenseSpec, rc: float, interpret: bool = False,
                      want_pe: bool = False):
    """LJ forces via the half-sweep Newton-3 kernel — the hot force path
    (BASELINE.json:9-10 "list reuse"/half lists realized on the dense
    layout). Returns (force (3, R, mc, cap), pe (R, mc, cap) | None).

    CONTRACT: ``pos4`` must satisfy the park invariant (empty slots on
    dense_cells.park_lattice) — every rebuild-produced state does, and
    the integrator preserves it. ``valid_f32`` is unused on this path
    (validity lives in the geometry); it is kept for signature stability
    with the full-sweep diagnostics twins.

    Runs one pallas_call per ``_row_groups`` group (a single merged call
    where the live set fits — every shape up to N=1M; grouped calls at
    N=8M shapes). Reaction partials are computed by row (z, y) FOR row
    (z+dz, y+dy) and written AT the partner row by each reaction array's
    output index_map — the caller only sums the arrays (one fused
    elementwise pass; round 2's jnp.roll re-homing materialized rotated
    copies and cost 3.7 ms/step more at N=1M, tools/tpu_step_opt_probe.py).

    Unlike ``dense_forces`` (full symmetric sweep), the per-slot PE here is
    attributed ONCE per pair to the lexicographically-lower slot: total
    PE = sum(pe * valid), no halving."""
    mc, cap = spec.mc, spec.cap
    windows = pos4  # read directly under the park invariant
    specs = _state_specs_merged(spec)

    def rxn_out(k):
        dz, dy = HALF_OFFSETS5[k]
        return (lambda z, y: (0, ((z + dz) % mc) * mc + ((y + dy) % mc),
                              0, 0), spec.rows)

    force = None
    pe = None
    for ks in _row_groups(spec, want_pe):
        outs = _call_force_group(windows, spec, rc, want_pe, interpret,
                                 True, ks, specs, (mc, mc), spec.rows,
                                 rxn_out)
        f = outs[0]
        n_rxn = sum(1 for k in ks if k != 0)
        for r in outs[1:1 + n_rxn]:
            f = f + r
        force = f if force is None else force + f
        if want_pe:
            pe = outs[-1] if pe is None else pe + outs[-1]
    return force, pe


def _count_half_kernel(*refs, spec, radius: float, zwrap: bool = True,
                       ks=(0, 1, 2, 3, 4)):
    n = len(ks)
    nbr_refs = refs[:n]
    own_ref = refs[n]
    out_ref = refs[n + 1]
    scr = refs[n + 2:n + 2 + WINDOW_SCRATCH]
    mc, cap = spec.mc, spec.cap
    r2cut = jnp.float32(radius * radius)
    # accumulate in f32 (exact for counts < 2^24; i32 vector ops are slower
    # on the VPU). Reduce per row, accumulate the reduced (mc, cap): a
    # full-lane reduce is CHEAPER than one add over the raw (mc, cap, 3cap)
    # (measured 7.1 vs 8.2 ms at N=1M — reduces run in registers, an
    # accumulator add pays VMEM read+write of the wide array), the
    # opposite trade from the force kernel's three components.
    own_blk = own_ref[:, 0]
    cnt = jnp.zeros((mc, cap), jnp.float32)
    for i, k in enumerate(ks):
        dz, dy = HALF_OFFSETS5[k]
        win = _window_from_block(own_blk if k == 0 else nbr_refs[i][:, 0],
                                 spec, scr)
        r2p, _, _, _ = _pair_geom_win(win, own_blk, dz, dy, spec, zwrap)
        cnt += jnp.where(r2p < r2cut, 1.0, 0.0).sum(axis=-1)
    out_ref[0] = cnt


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def dense_counts_half(pos4: jnp.ndarray, valid_f32: jnp.ndarray,
                      spec: DenseSpec, radius: float,
                      interpret: bool = False):
    """Per-slot HALF neighbor counts (each unordered pair attributed once,
    to its lexicographically-lower cell/slot). Total pairs = sum(counts) —
    the fast counting pass (merged grid: 7.1 ms at N=1M vs 16.9 on the
    round-1 k-grid)."""
    mc, cap = spec.mc, spec.cap
    windows = pos4  # read directly under the park invariant
    specs = _state_specs_merged(spec)
    groups = ([(k,) for k in range(5)]
              if _split_rows(spec, kind="counts")
              else [(0, 1, 2, 3, 4)])
    counts = None
    for ks in groups:
        c = pl.pallas_call(
            functools.partial(_count_half_kernel, spec=spec, radius=radius,
                              ks=ks),
            grid=(mc, mc),
            in_specs=[specs[k] for k in ks] + [specs[0]],
            out_specs=pl.BlockSpec((1, mc, cap),
                                   lambda z, y: (z * mc + y, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((spec.rows, mc, cap),
                                           jnp.float32),
            scratch_shapes=_window_scratch(spec),
            interpret=interpret,
        )(*([windows] * len(ks)), windows)
        counts = c if counts is None else counts + c
    return counts.astype(jnp.int32)


def _pe_virial_half_kernel(*refs, spec, rc: float, zwrap: bool = True,
                           ks=(0, 1, 2, 3, 4)):
    """Half-sweep diagnostics pass: per-slot shifted pair potential AND
    pair virial w = dr . F = 24*(2*s6^2 - s6) (the r2 contracts one power
    of s2 exactly — ops.common.lj_pair_virial), each attributed ONCE per
    pair to the lexicographically-lower slot. A separate tiny kernel so
    the observable does not widen the hot force kernel's live set or its
    compile-cache footprint (diagnostics cadence, not step cadence)."""
    n = len(ks)
    nbr_refs = refs[:n]
    own_ref = refs[n]
    outp_ref = refs[n + 1]
    outw_ref = refs[n + 2]
    scr = refs[n + 3:n + 3 + WINDOW_SCRATCH]
    mc, cap = spec.mc, spec.cap
    r2cut = jnp.float32(rc * rc)
    s6c = jnp.float32((1.0 / (rc * rc)) ** 3)
    ushift = 4.0 * (s6c * s6c - s6c)
    own_blk = own_ref[:, 0]
    pe = jnp.zeros((mc, cap), jnp.float32)
    w = jnp.zeros((mc, cap), jnp.float32)
    for i, k in enumerate(ks):
        dz, dy = HALF_OFFSETS5[k]
        win = _window_from_block(own_blk if k == 0 else nbr_refs[i][:, 0],
                                 spec, scr)
        r2p, _, _, _ = _pair_geom_win(win, own_blk, dz, dy, spec, zwrap)
        hit = r2p < r2cut
        s2 = 1.0 / r2p  # exact divide: diagnostics are reference-exact
        s6 = s2 * s2 * s2
        pe += jnp.where(hit, 4.0 * (s6 * s6 - s6) - ushift, 0.0).sum(axis=-1)
        w += jnp.where(hit, 24.0 * s6 * (2.0 * s6 - 1.0), 0.0).sum(axis=-1)
    outp_ref[0] = pe
    outw_ref[0] = w


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def dense_pe_virial(pos4: jnp.ndarray, valid_f32: jnp.ndarray,
                    spec: DenseSpec, rc: float, interpret: bool = False):
    """Per-slot (pe, virial) within the LJ cutoff, half-attributed: total
    PE = sum(pe * valid), total virial W = sum(vir * valid), pressure
    P = (2*KE + W) / (3*V). The observable pass behind
    ``DenseSimulator.thermo`` — reuses the half-sweep geometry and the
    counts kernel's split policy."""
    mc, cap = spec.mc, spec.cap
    windows = pos4  # read directly under the park invariant
    specs = _state_specs_merged(spec)
    groups = ([(k,) for k in range(5)]
              if _split_rows(spec, kind="pe_virial")
              else [(0, 1, 2, 3, 4)])
    pe = None
    vir = None
    for ks in groups:
        p, w = pl.pallas_call(
            functools.partial(_pe_virial_half_kernel, spec=spec, rc=rc,
                              ks=ks),
            grid=(mc, mc),
            in_specs=[specs[k] for k in ks] + [specs[0]],
            out_specs=[
                pl.BlockSpec((1, mc, cap), lambda z, y: (z * mc + y, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mc, cap), lambda z, y: (z * mc + y, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((spec.rows, mc, cap), jnp.float32),
                jax.ShapeDtypeStruct((spec.rows, mc, cap), jnp.float32),
            ],
            scratch_shapes=_window_scratch(spec),
            interpret=interpret,
        )(*([windows] * len(ks)), windows)
        pe = p if pe is None else pe + p
        vir = w if vir is None else vir + w
    return pe, vir


def _list_half_kernel(*refs, spec, radius: float, zwrap: bool = True,
                      ks=(0, 1, 2, 3, 4)):
    """Half-sweep neighbor-list emission for the offset rows in ``ks``:
    packed cluster bitmasks (the consumable list artifact, cf. GROMACS
    cluster lists PAPERS.md:9) AND per-slot half counts.

    The masks are packed over the OWN-SLOT axis (bit i of word w at
    (k, row, x, lane l) says own slot i' = MASK_BITS*w + i of cell
    (row, x) has window lane l of offset row k as a half neighbor). Packing
    over slots makes the packing reduction run over SUBLANES — cheap
    vector adds — where round 2's first cut packed over window lanes and
    paid a full cross-lane reduction per word (22.7 ms vs 16.7 ms at
    N=1M, cap=32). Words are full i32 (MASK_BITS = 32, so cap=32 needs
    ONE word where 24-bit f32 packing needed two — measured 1.0 ms off
    the pass): bits within a word are distinct, so the i32 SUM carries
    nothing and equals the OR, including the sign bit (adding 1<<31 once
    is exact in two's complement). Integer shift builds the weights.
    The count channel keeps the counts kernel's single lane reduction."""
    n = len(ks)
    nbr_refs = refs[:n]
    own_ref = refs[n]
    outm_ref = refs[n + 1]
    outc_ref = refs[n + 2]
    scr = refs[n + 3:n + 3 + WINDOW_SCRATCH]
    mc, cap = spec.mc, spec.cap
    words = mask_words(cap)
    r2cut = jnp.float32(radius * radius)
    # Packing weights as ONE (1, cap, 1) f32 broadcast of 2^(slot mod 16)
    # (EXACT powers of two via integer shifts — jnp.exp2 is a polynomial
    # approximation; 2^13 came out 8192.004). Each i32 word is assembled
    # from two 16-bit halves so every weighted sublane sum stays an exact
    # f32 integer (sums of distinct 2^0..2^15 <= 65535 < 2^24), and the
    # halves recombine in i32 on the small (mc, 3cap) output rows. The
    # half-sums run over SUBLANE SLICES of the weighted hit cube
    # ([32w, 32w+16) and [32w+16, 32w+32) of the slot axis — slot % 16 is
    # the in-half bit because halves start at multiples of 16; all slice
    # bounds are multiples of 8, so they are sublane-tile aligned): each
    # slot sublane is touched by exactly one select and one reduce,
    # where the first cut summed `hitf * half_weights` over the FULL cap
    # axis once per (word, half) — 4 cube multiply+reduce passes at
    # cap=40. Measured effect is small (N=1M cap=40 list pass 19.5 ms vs
    # 20.6 before, inside the ~10% tunnel variance — the pass is NOT
    # dominated by the packing arithmetic), kept for the strictly lower
    # op count. Earlier history: packing over window lanes paid a full
    # cross-lane reduction per word (22.7 vs 16.7 ms at N=1M cap=32);
    # full (mc, cap, 3cap) i32 weight constants + i32 select/reduce
    # measured 8.9 ms of pure packing (i32 vector ops run at a fraction
    # of f32 rate).
    slot1 = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 1), 1)
    wq = (jnp.int32(1) << (slot1 % 16)).astype(jnp.float32)
    own_blk = own_ref[:, 0]
    cnt = jnp.zeros((mc, cap), jnp.float32)
    for i, k in enumerate(ks):
        dz, dy = HALF_OFFSETS5[k]
        win = _window_from_block(own_blk if k == 0 else nbr_refs[i][:, 0],
                                 spec, scr)
        r2p, _, _, _ = _pair_geom_win(win, own_blk, dz, dy, spec, zwrap)
        hit = r2p < r2cut
        cnt += jnp.where(hit, 1.0, 0.0).sum(axis=-1)  # per-row reduce
        hw = jnp.where(hit, wq, 0.0)  # (mc, cap, 3cap) weighted hits
        for w in range(words):
            lo0, lo1 = MASK_BITS * w, min(MASK_BITS * w + 16, cap)
            hi0, hi1 = MASK_BITS * w + 16, min(MASK_BITS * w + 32, cap)
            acc = jnp.sum(hw[:, lo0:lo1, :], axis=1).astype(jnp.int32)
            if hi1 > hi0:  # the word's high half exists (cap > 32w+16)
                hi_s = jnp.sum(hw[:, hi0:hi1, :], axis=1).astype(jnp.int32)
                acc = acc + (hi_s << 16)
            outm_ref[i * words + w, 0] = acc
    outc_ref[0] = cnt


def _list_half_kernel_grouped(*refs, spec, radius: float, G: int):
    """Y-grouped twin of _list_half_kernel: one program emits masks +
    counts for G consecutive y-rows at one z. Identical per-row math,
    accumulation and packing order (bitwise-equal artifact); the win is
    structural — G× fewer programs (launch fixed cost) and 2G+3 window
    builds per program instead of 5G (_GroupWindows)."""
    ins = refs[:5]
    outm_ref = refs[5]
    outc_ref = refs[6]
    scr = refs[7:7 + WINDOW_SCRATCH]
    mc, cap = spec.mc, spec.cap
    words = mask_words(cap)
    r2cut = jnp.float32(radius * radius)
    z = pl.program_id(0)
    gy = pl.program_id(1)
    slot1 = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 1), 1)
    wq = (jnp.int32(1) << (slot1 % 16)).astype(jnp.float32)
    cache = _GroupWindows(ins, spec, scr)
    own_blk = ins[GROUP_BLOCKS.index((0, 0))]
    for t in range(G):
        own = own_blk[:, t]  # (3, mc, cap)
        y = gy * G + t
        cnt = jnp.zeros((mc, cap), jnp.float32)
        for k in range(5):
            dz, dy = HALF_OFFSETS5[k]
            win = cache.get(dz, t + dy)
            r2p, _, _, _ = _pair_geom_group(win, own, dz, dy, z, y, spec)
            hit = r2p < r2cut
            cnt += jnp.where(hit, 1.0, 0.0).sum(axis=-1)
            hw = jnp.where(hit, wq, 0.0)
            for w in range(words):
                lo0, lo1 = MASK_BITS * w, min(MASK_BITS * w + 16, cap)
                hi0, hi1 = MASK_BITS * w + 16, min(MASK_BITS * w + 32, cap)
                acc = jnp.sum(hw[:, lo0:lo1, :], axis=1).astype(jnp.int32)
                if hi1 > hi0:
                    hi_s = jnp.sum(hw[:, hi0:hi1, :],
                                   axis=1).astype(jnp.int32)
                    acc = acc + (hi_s << 16)
                outm_ref[k * words + w, t] = acc
        outc_ref[t] = cnt


def _group_ceil_nby(mc: int, G: int) -> int:
    """y-block count of the grouped grid at group size G: ceil(mc/G),
    bumped by one when that leaves exactly ONE padding row — the ceil
    grid needs pad = 0 (divisor) or pad >= 2, because the +y and -y
    periodic-wrap window copies (_pad_rows_y) must occupy DISTINCT
    padded rows (padded row mc and padded row nby*G - 1)."""
    nby = -(-mc // G)
    if nby * G - mc == 1:
        nby += 1
    return nby


def _group_for_lists(spec) -> tuple[int, int]:
    """(G, nby) for the grouped list pass: largest G (2..8) whose grouped
    grid fits the scoped-VMEM budget; (1, mc) = keep the per-row merged
    grid. The model counts pipeline-buffered in/out blocks (2x), the
    window cache, and ~6 live (mc, cap, 3cap) packing temporaries.

    Round 5 (VERDICT r4 item 4): the CEIL grid (non-divisor G: nby =
    _group_ceil_nby blocks, y-padded input via _pad_rows_y, padded
    output rows sliced off) was built, bitwise-verified, and MEASURED
    DEAD at the one shape that needed it — mc=71 (N=8M), where mc is
    prime and the divisor rule excludes grouping entirely.
    tools/tpu_lists8m_probe.py on hardware: merged per-row grid
    68.30 ms/pass vs ceil G=2 75.19 / G=3 75.77 (both bitwise==True;
    G=4 — the 13 MB VMEM model's pick — fails Mosaic's scoped-vmem
    check outright, caught by the compile-variants gate). The padded
    input copy (+4–8% rows materialized per pass over a 172 MB state),
    the padded rows' window builds, and the padded-output slice cost
    more than the 5041-program launch overhead they remove. The auto
    policy therefore stays DIVISOR-ONLY (this also un-picks the
    non-compiling G=4); the ceil machinery remains for the probe and
    the parity tests as the recorded dead end."""
    mc, cap = spec.mc, spec.cap
    words = mask_words(cap)
    for G in range(8, 1, -1):
        if mc % G:
            continue
        blocks = 5 * 3 * G * mc * cap * 4 * 2
        outs = (5 * words * G * mc * 3 * cap + G * mc * cap) * 4 * 2
        wins = (2 * G + 3) * 3 * mc * 3 * cap * 4
        live = 6 * mc * cap * 3 * cap * 4
        if blocks + outs + wins + live <= (13 << 20):
            return G, mc // G
    return 1, mc


def lists_half_grouped(windows, spec, G: int, radius: float,
                       interpret: bool, nby: int | None = None):
    """Grouped-grid list emission (cube only): grid (mc, nby), G own
    y-rows per program. Same (counts, masks) artifact as lists_half_impl,
    bitwise.

    Divisor G (nby*G == mc): the round-4 grid, no padding. Ceil G
    (nby*G > mc, round 5): the y axis is padded per z to nby*G rows
    (_pad_rows_y) and the padded rows' outputs sliced off. Why only the
    two wrap-copy rows are ever read for KEPT output rows — every window
    read is cache.get(dz, t+dy), t+dy in [-1, G], for an own row with
    global y = gy*G + t < mc:
      t+dy in [0, G): own block, global y+dy — real unless y = mc-1,
        dy=+1 with t < G-1, which lands on padded row mc = the row-0
        copy (the kernel's y+1 >= mc shift makes it bitwise equal to
        the divisor grid's read of real row 0);
      t+dy == G: the db=+1 block's row 0 = global (gy+1)*G — always a
        real row when y is real (y = gy*G + G - 1 < mc implies
        (gy+1)*G <= mc - 1 + 1... and == mc only when G | mc);
      t+dy == -1: the db=-1 block's row G-1 = global gy*G - 1, real for
        gy > 0; for gy == 0 the wrap block (nby-1) row G-1 = padded row
        nby*G - 1 = the row-(mc-1) copy.
    Filler rows between the two copies feed only sliced-off outputs."""
    mc, cap = spec.mc, spec.cap
    words = mask_words(cap)
    if nby is None:
        nby = mc // G
    rows_pad = mc * nby * G
    if rows_pad != spec.rows:
        windows = _pad_rows_y(windows, spec, nby * G)
    m, c = pl.pallas_call(
        functools.partial(_list_half_kernel_grouped, spec=spec,
                          radius=radius, G=G),
        grid=(mc, nby),
        in_specs=_state_specs_grouped(spec, G, nby),
        out_specs=[
            pl.BlockSpec((5 * words, G, mc, 3 * cap),
                         lambda z, gy: (0, z * nby + gy, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, mc, cap), lambda z, gy: (z * nby + gy, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((5 * words, rows_pad, mc, 3 * cap),
                                 jnp.int32),
            jax.ShapeDtypeStruct((rows_pad, mc, cap), jnp.float32),
        ],
        scratch_shapes=_window_scratch(spec),
        interpret=interpret,
    )(*([windows] * 5))
    if rows_pad != spec.rows:  # drop the padded y rows per z
        nbyG = nby * G
        m = m.reshape(5 * words, mc, nbyG, mc, 3 * cap)[:, :, :mc]
        m = m.reshape(5 * words, spec.rows, mc, 3 * cap)
        c = c.reshape(mc, nbyG, mc, cap)[:, :mc].reshape(spec.rows, mc, cap)
    masks = m.reshape(5, words, spec.rows, mc, 3 * cap)
    return c.astype(jnp.int32), masks


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def dense_lists_half(pos4: jnp.ndarray, valid_f32: jnp.ndarray,
                     spec: DenseSpec, radius: float,
                     interpret: bool = False):
    """The neighbor-list BUILD artifact (BASELINE.json:5 "fixed-capacity
    padded half-neighbor lists", in TPU-native cluster-compressed form):

      counts (R, mc, cap) i32 — half neighbor count per slot (each
        unordered pair attributed once); total pairs = sum(counts * valid).
      masks (5, words, R, mc, 3cap) i32 — packed cluster bitmasks: for
        offset row k (HALF_OFFSETS5), cell row r, own cell x and window
        lane l, bit i of word w says own slot MASK_BITS*w + i of cell
        (r, x) has the (z+dz, y+dy) row's window lane l — partner cell
        x + l//cap - 1, slot l % cap — as a neighbor within ``radius``.
        Works at any cap (words spans the slot axis). The total popcount
        equals the total pair count (each pair sets exactly one bit).

    Takes the y-grouped grid (lists_half_grouped) when a group size fits
    the VMEM model — G× fewer programs on a launch-cost-dominated pass;
    divisor G runs pad-free, non-divisor G the ceil grid (round 5).
    Falls back to the per-row merged grid (one pass per offset row at
    _split_rows shapes); ~half the full sweep's pair evals either way."""
    G, nby = ((1, spec.mc) if _split_rows(spec, kind="lists")
              else _group_for_lists(spec))
    if G > 1:
        return lists_half_grouped(pos4, spec, G, radius, interpret, nby)
    return lists_half_impl(pos4, spec, (spec.mc, spec.mc),
                           _state_specs_merged(spec), radius, True,
                           interpret)


def lists_half_impl(windows, spec, grid, specs, radius: float, zwrap: bool,
                    interpret: bool):
    """Shared list-emission body for the cube (grid (mc, mc), zwrap) and
    slab (grid (nz, mc), ghost layer instead of z wrap) variants — ONE
    place owns the split policy, word bookkeeping, mask concat order and
    the (5, words, rows, mc, 3cap) artifact layout, so the two engines'
    artifacts cannot drift apart. ``spec.rows`` must equal
    ``grid[0] * mc`` (cube: mc^2; slab: nz * mc)."""
    mc, cap = spec.mc, spec.cap
    words = mask_words(cap)
    groups = ([(k,) for k in range(5)]
              if _split_rows(spec, kind="lists")
              else [(0, 1, 2, 3, 4)])
    mask_parts = []
    counts = None
    for ks in groups:
        nm = len(ks) * words
        m, c = pl.pallas_call(
            functools.partial(_list_half_kernel, spec=spec, radius=radius,
                              zwrap=zwrap, ks=ks),
            grid=grid,
            in_specs=[specs[k] for k in ks] + [specs[0]],
            out_specs=[
                pl.BlockSpec((nm, 1, mc, 3 * cap),
                             lambda z, y: (0, z * mc + y, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, mc, cap), lambda z, y: (z * mc + y, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nm, spec.rows, mc, 3 * cap),
                                     jnp.int32),
                jax.ShapeDtypeStruct((spec.rows, mc, cap), jnp.float32),
            ],
            scratch_shapes=_window_scratch(spec),
            interpret=interpret,
        )(*([windows] * len(ks)), windows)
        mask_parts.append(m)
        counts = c if counts is None else counts + c
    masks = (mask_parts[0] if len(mask_parts) == 1
             else jnp.concatenate(mask_parts, axis=0))
    masks = masks.reshape(5, words, spec.rows, mc, 3 * cap)
    return counts.astype(jnp.int32), masks


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


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def dense_counts(pos4: jnp.ndarray, valid_f32: jnp.ndarray, spec: DenseSpec,
                 radius: float, interpret: bool = False):
    """Per-slot FULL neighbor counts within ``radius`` (each pair counted at
    both partners) — the symmetric parity pass. Pair count = sum/2."""
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
    return counts


def mask_slot_counts(masks: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Decode per-slot half counts from the slot-packed masks
    ((5|k, words, R, mc, 3cap) i32 -> (R, mc, cap) i32): slot i' =
    MASK_BITS*w + i tallies bit i of word w over all offset rows and
    window lanes. The validation twin of the count channel — popcount
    semantics for the transposed packing."""
    words = masks.shape[1]
    cols = []
    for w in range(words):
        for b in range(min(MASK_BITS, cap - w * MASK_BITS)):
            cols.append(jnp.sum((masks[:, w] >> b) & 1, axis=(0, 3)))
    return jnp.stack(cols, axis=-1)  # (R, mc, cap)
