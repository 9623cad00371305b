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

The half-sweep list kernel (dense_lists_half) emits packed cluster
bitmasks plus half counts in one pass — a complete, consumable pair list
in cluster-compressed form (cf. GROMACS cluster lists, PAPERS.md:9); the
half-sweep force kernel (dense_forces_half) evaluates each pair once and
scatters the Newton-3 reaction via k-indexed output blocks + XLA rolls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from md_neighbor_list_tpu.ops.dense_cells import DenseSpec


MASK_BITS = 24  # bits per packed mask word (exact-in-f32 packing, see below)


def mask_words(cap: int) -> int:
    """Packed mask words per (slot, offset-row): one bit per window lane
    (3*cap lanes), MASK_BITS bits per word."""
    return (3 * cap + MASK_BITS - 1) // MASK_BITS


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
    k = pl.program_id(2)
    r2p, _, _, _ = _half_pair_geometry(nbr_ref, own_ref, spec)

    @pl.when(k == 0)
    def _():
        cnt_ref[0] = jnp.zeros_like(cnt_ref[0])

    hit = r2p < jnp.float32(radius * radius)
    cnt_ref[0] += jnp.where(hit, 1.0, 0.0).sum(axis=-1)


def _half_pair_geometry(nbr_ref, own_ref, spec, zwrap: bool = True):
    """Shared geometry for the half-sweep (z, y, k) grid over
    ``HALF_OFFSETS5``: returns (r2p, dxv, dyv, dzv) with the same-cell
    Newton-3 dedup penalty folded in at k == 0 (see _half_center_penalty).
    dz >= 0 for every half offset, so the z periodic shift is one-sided.
    zwrap=False is the slab-decomposition variant: the z axis never wraps
    locally (ghost layers pad the owned block, with the ring seam's +-L
    already baked into ghost positions by the receiver)."""
    mc, cap = spec.mc, spec.cap
    z = pl.program_id(0)
    y = pl.program_id(1)
    k = pl.program_id(2)
    dz = jnp.where(k >= 2, 1, 0)
    dy = jnp.where(k == 0, 0, jnp.where(k == 1, 1, k - 3))
    fL = jnp.float32(spec.L)
    ysh = jnp.where(y + dy >= mc, fL, jnp.where(y + dy < 0, -fL, 0.0))

    xi = own_ref[0, 0, :, cap : 2 * cap][:, :, None]
    yi = own_ref[0, 1, :, cap : 2 * cap][:, :, None]
    zi = own_ref[0, 2, :, cap : 2 * cap][:, :, None]
    xj = nbr_ref[0, 0][:, None, :]
    yj = nbr_ref[0, 1][:, None, :] + ysh
    zj = nbr_ref[0, 2][:, None, :]
    if zwrap:
        zj = zj + jnp.where(z + dz >= mc, fL, 0.0)

    dxv = xi - xj
    dyv = yi - yj
    dzv = zi - zj
    r2p = dxv * dxv + dyv * dyv + dzv * dzv
    r2p = r2p + jnp.where(k == 0, _half_center_penalty(spec), 0.0)
    return r2p, dxv, dyv, dzv


def _force_half_kernel(nbr_ref, own_ref, out_ref, *, spec,
                       rc: float, want_pe: bool, zwrap: bool = True):
    """Half-sweep Newton-3 LJ forces: each unordered pair is EVALUATED once
    (5/9 of the full sweep's work) and contributes to both partners.

    Every output block is written exactly once per program (the block index
    varies with k — mixing a k-revisited accumulator with k-varying outputs
    crashes Mosaic): channels 0-2 are the own-row partial
    force, channels 3-5 the reaction force on the (z+dz, y+dy) partner row
    (already folded from window lanes to partner-cell x slots via two static
    sublane rolls), channel 6 the once-per-pair potential. The caller sums
    partials over k and rolls each reaction block by its (dz, dy) — regular
    XLA ops, no scatter (the TPU answer to the reference's Newton-3
    scatter-add, SURVEY.md §9)."""
    mc, cap = spec.mc, spec.cap
    r2cut = jnp.float32(rc * rc)
    s6c = jnp.float32((1.0 / (rc * rc)) ** 3)
    ushift = 4.0 * (s6c * s6c - s6c)

    r2p, dxv, dyv, dzv = _half_pair_geometry(nbr_ref, own_ref, spec, zwrap)
    hit = r2p < r2cut
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
    out_ref[0, 0] = jnp.sum(px, axis=-1)
    out_ref[1, 0] = jnp.sum(py, axis=-1)
    out_ref[2, 0] = jnp.sum(pz, axis=-1)

    def fold(p):
        """Window-lane reaction -> partner-cell slots: own cell x's window
        segment seg holds partner cell x + seg - 1, so the reaction for
        partner cell xp gathers seg0[xp+1] + seg1[xp] + seg2[xp-1] —
        two static +-1 rolls along the x-cell (sublane) axis, circular
        because x is periodic (matching make_windows' circular rolls)."""
        r = jnp.sum(p, axis=1)  # (mc, 3cap)
        s0 = r[:, :cap]
        s1 = r[:, cap : 2 * cap]
        s2_ = r[:, 2 * cap :]
        # pltpu.roll requires non-negative shifts: -1 == mc - 1 (circular)
        return pltpu.roll(s0, mc - 1, axis=0) + s1 + pltpu.roll(s2_, 1, axis=0)

    out_ref[3, 0] = -fold(px)
    out_ref[4, 0] = -fold(py)
    out_ref[5, 0] = -fold(pz)
    if want_pe:
        u = jnp.where(hit, 4.0 * (s6 * s6 - s6) - ushift, 0.0)
        out_ref[6, 0] = jnp.sum(u, axis=-1)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def dense_forces_half(pos4: jnp.ndarray, valid_f32: jnp.ndarray,
                      spec: DenseSpec, rc: float, interpret: bool = False,
                      want_pe: bool = False):
    """LJ forces via the half-sweep Newton-3 kernel — the hot force path
    (BASELINE.json:9-10 "list reuse"/half lists realized on the dense
    layout). Returns (force (3, R, mc, cap), pe (R, mc, cap) | None).

    Unlike ``dense_forces`` (full symmetric sweep), the per-slot PE here is
    attributed ONCE per pair to the lexicographically-lower slot: total
    PE = sum(pe * valid), no halving."""
    mc, cap = spec.mc, spec.cap
    nch = 7 if want_pe else 6
    windows = make_windows(pos4, valid_f32, spec)
    out = pl.pallas_call(
        functools.partial(_force_half_kernel, spec=spec, rc=rc,
                          want_pe=want_pe),
        grid=(mc, mc, 5),
        in_specs=list(_win_specs_half(spec)),
        out_specs=pl.BlockSpec(
            (nch, 1, mc, cap),
            lambda z, y, k: (k, z * mc + y, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (5 * nch, spec.rows, mc, cap), jnp.float32
        ),
        interpret=interpret,
    )(windows, windows)
    out5 = out.reshape(5, nch, spec.rows, mc, cap)
    force = jnp.sum(out5[:, :3], axis=0)
    # reaction partials: block k was computed by row (z, y) FOR row
    # (z+dz, y+dy) -> a periodic (dz, dy) roll re-homes it. Regular rolls,
    # ~0.3 ms of HBM traffic at N=1M vs the ~1.8x kernel-time saving.
    rxn = out5[:, 3:6].reshape(5, 3, mc, mc, mc, cap)
    force = force + rxn[0].reshape(3, spec.rows, mc, cap)
    for kk, (dz, dy) in enumerate(HALF_OFFSETS5):
        if (dz, dy) == (0, 0):
            continue
        rolled = jnp.roll(rxn[kk], (dz, dy), axis=(1, 2))
        force = force + rolled.reshape(3, spec.rows, mc, cap)
    pe = jnp.sum(out5[:, 6], axis=0) if want_pe else None
    return force, pe


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


def _lane_weights(cap: int) -> jnp.ndarray:
    """(1, 1, 3cap) f32 packing weights: window lane l carries weight
    2^(l % MASK_BITS). Summing the weights of hit lanes within one word's
    lane group yields that packed word — every partial sum is a set of
    distinct powers of two below 2^MASK_BITS, so f32 accumulation is
    EXACT (the reason for 24-bit rather than 32-bit words: f32 has a
    24-bit significand)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 3 * cap), 2)
    # integer shift, NOT jnp.exp2: the VPU's exp2 is an approximation
    # (exp2(23.0) = 8388604.5) and would corrupt the packing
    return (jnp.int32(1) << jnp.mod(lane, MASK_BITS)).astype(jnp.float32)


def _word_lane_mask(cap: int, w: int) -> jnp.ndarray:
    """(1, 1, 3cap) f32: 1.0 on word w's lane group, 0.0 elsewhere.
    Select-masking beats lane-group slices here: slices at MASK_BITS
    offsets are not 128-lane aligned, and the relayouts they force cost
    more than the selects (measured 39.6 vs 28.5 ms at N=1M)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 3 * cap), 2)
    return (lane // MASK_BITS == w).astype(jnp.float32)


def _list_half_kernel(nbr_ref, own_ref, out_ref, *, spec,
                      radius: float, zwrap: bool = True):
    """Half-sweep neighbor-list emission: ONE pass produces the packed
    cluster bitmasks (the consumable list artifact, cf. GROMACS cluster
    lists PAPERS.md:9) AND the per-slot half counts (final channel).
    Outputs are k-indexed — written exactly once per program — which is
    what the cap<=32 single-word emitter of round 1 got wrong at
    production cap (multi-word packing into one revisited block SIGABRTed
    Mosaic). Bit l of word w for slot (x, i) at offset row k: window lane
    l' = MASK_BITS*w + l of the (dz, dy) row's x-window, i.e. partner
    cell x + l'//cap - 1, slot l' % cap."""
    words = mask_words(spec.cap)
    r2p, _, _, _ = _half_pair_geometry(nbr_ref, own_ref, spec, zwrap)
    hit = jnp.where(r2p < jnp.float32(radius * radius), 1.0, 0.0)
    bits = hit * _lane_weights(spec.cap)
    for w in range(words):
        out_ref[w, 0] = jnp.sum(bits * _word_lane_mask(spec.cap, w),
                                axis=-1)
    out_ref[words, 0] = jnp.sum(hit, axis=-1)


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


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def dense_lists_half(pos4: jnp.ndarray, valid_f32: jnp.ndarray,
                     spec: DenseSpec, radius: float,
                     interpret: bool = False):
    """The neighbor-list BUILD artifact (BASELINE.json:5 "fixed-capacity
    padded half-neighbor lists", in TPU-native cluster-compressed form):

      counts (R, mc, cap) i32 — half neighbor count per slot (each
        unordered pair attributed once); total pairs = sum(counts * valid).
      masks (5, words, R, mc, cap) i32 — packed cluster bitmasks: for
        offset row k (HALF_OFFSETS5) and slot (r, x, i), bit l of word w
        says window lane MASK_BITS*w + l of the (z+dz, y+dy) row — partner
        cell x + lane//cap - 1, slot lane % cap — is a neighbor within
        ``radius``. Works at any cap (words spans the window).

    One kernel pass emits both; ~half the full sweep's pair evals."""
    mc, cap = spec.mc, spec.cap
    words = mask_words(cap)
    windows = make_windows(pos4, valid_f32, spec)
    out = pl.pallas_call(
        functools.partial(_list_half_kernel, spec=spec, radius=radius),
        grid=(mc, mc, 5),
        in_specs=list(_win_specs_half(spec)),
        out_specs=pl.BlockSpec(
            (words + 1, 1, mc, cap),
            lambda z, y, k: (k, z * mc + y, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (5 * (words + 1), spec.rows, mc, cap), jnp.float32
        ),
        interpret=interpret,
    )(windows, windows)
    out5 = out.reshape(5, words + 1, spec.rows, mc, cap)
    counts = jnp.sum(out5[:, words], axis=0).astype(jnp.int32)
    masks = out5[:, :words].astype(jnp.int32)
    return counts, masks
