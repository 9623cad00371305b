"""Slab-decomposed variants of the dense Pallas kernels (D1/D2 fast path).

The box is split into P slabs of ``nz = mc/P`` z-layers each (SURVEY.md
§4.6, BASELINE.json:11). Per device, the dense cell-block layout is the
single-chip one restricted to the owned layers, PLUS one ghost layer of
rows appended after them:

    extended rows axis (per device): [ owned: nz*mc rows | right ghost: mc ]

Only the RIGHT ghost layer (the next device's first owned layer) is ever
read: the half sweep's offsets have dz >= 0, so pairs straddling a slab's
LOWER face are evaluated by the left neighbor, which returns their
Newton-3 reaction as one contiguous layer slice (``slab_forces_half``'s
``seam`` output) — the structural win over send-list gathers that
VERDICT.md round 1 asked for: every halo payload here is a contiguous
dense block, no compaction, no index lists.

The kernels are the pallas_force half-sweep bodies with ``zwrap=False``
(z never wraps locally; the ring seam's +-L shift is baked into ghost
positions by the receiving device), so slab arithmetic is bit-identical
to the single-chip cube's for every pair.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from md_neighbor_list_tpu.ops import pallas_force
from md_neighbor_list_tpu.ops.dense_cells import (DenseState,
                                                  park_lattice, sort_expand)
from md_neighbor_list_tpu.ops.pallas_force import HALF_OFFSETS5


@dataclasses.dataclass(frozen=True)
class SlabSpec:
    """Static geometry of one device's slab of the dense layout.

    Cells are ANISOTROPIC: x/y use the finest valid grid (mc = floor(L/rs)
    cells, cell_size = L/mc) while z uses mc_z = P*nz cells (cell_z =
    L/mc_z >= rs) — rounding the cell count down to a multiple of P (a
    shard_map uniformity requirement) then only coarsens ONE dimension,
    costing ~(cell_z/cell)x extra pair evals instead of that ratio cubed.
    The sweep stays a 27-neighborhood: each dimension's cell edge >= rs."""

    mc: int  # x/y cells per dim (full box)
    nz: int  # owned z-layers on this device
    mc_z: int  # GLOBAL z cells = P * nz
    cap: int  # slots per cell
    L: float  # box side
    cell_size: float  # L / mc  (x/y; >= search radius)
    cell_z: float  # L / mc_z (z;   >= search radius)

    @property
    def rows(self) -> int:  # owned (z, y) cell rows
        return self.nz * self.mc

    @property
    def ncells(self) -> int:
        return self.rows * self.mc

    @property
    def slots(self) -> int:
        return self.ncells * self.cap

    def ext(self) -> "SlabSpec":
        """Spec covering the extended (owned + right ghost layer) block."""
        return dataclasses.replace(self, nz=self.nz + 1)


def _slab_state_specs_merged(spec: SlabSpec):
    """One (1, 3, mc, cap) parked-state BlockSpec per half offset row
    over the EXTENDED state array (kernels build x-windows in-kernel, see
    pallas_force._window_from_block): merged grid (nz, mc); z indexes
    owned layers, never wraps (dz=1 from the last owned layer lands on
    the ghost layer); y wraps mod mc."""
    mc = spec.mc
    shape = (3, 1, mc, spec.cap)
    specs = []
    for dz, dy in HALF_OFFSETS5:
        def m(z, y, dz=dz, dy=dy):
            return (0, (z + dz) * mc + (y + dy) % mc, 0, 0)
        specs.append(pl.BlockSpec(shape, m, memory_space=pltpu.VMEM))
    return specs


def _repark_ghost(ext_pos: jnp.ndarray, ext_valid_f32: jnp.ndarray,
                  spec: SlabSpec) -> jnp.ndarray:
    """Re-park the ghost layer's EMPTY slots with ext-local row ids.

    The park invariant parks each device's empty slots with DEVICE-LOCAL
    row ids (dense_cells.park_lattice), so a received ghost layer carries
    the sender's ids — and at nz=1 the sender's first-layer park y-values
    coincide exactly with the receiver's own first layer's: two parked
    slots would meet in the (dz=1, dy=0) window at r2 = 0 and emit NaN
    forces. Re-parking the ghost rows at ext-local ids (rows nz*mc..)
    restores the collision-free lattice the round-2 per-pass park had.
    One tiny select over the ghost layer (1/(nz+1) of rows) per pass;
    real ghost positions (and their seam shift) pass through untouched."""
    rows = spec.rows
    park_g = park_lattice(spec.ext())[:, rows:]
    g = jnp.where(ext_valid_f32[rows:][None] > 0.5, ext_pos[:, rows:],
                  park_g)
    return jnp.concatenate([ext_pos[:, :rows], g], axis=1)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def slab_forces_half(ext_pos: jnp.ndarray, ext_valid_f32: jnp.ndarray,
                     spec: SlabSpec, rc: float, interpret: bool = False,
                     want_pe: bool = False):
    """Half-sweep Newton-3 LJ forces over one device's slab.

    ``ext_pos``/``ext_valid_f32``: (3, (nz+1)*mc, mc, cap) — owned rows
    followed by the right-ghost layer (positions already seam-shifted).

    Returns (force (3, nz*mc, mc, cap), seam (3, mc, mc, cap), pe | None):
    ``force`` is complete EXCEPT for reactions computed by the left
    neighbor; ``seam`` holds this device's reactions onto its right-ghost
    layer — ppermute it right and add to the receiver's first layer.
    PE is attributed once per pair to the evaluating device's own slot."""
    mc, cap, nz = spec.mc, spec.cap, spec.nz
    windows = _repark_ghost(ext_pos, ext_valid_f32, spec)
    specs = _slab_state_specs_merged(spec)

    def rxn_out(k):
        """Reaction rows computed by layer z FOR (z+dz, y+dy), written at
        the partner row by the output index_map: y wraps periodically
        (full box); dz=1 writes into an EXT-rows array whose ghost layer
        collects the seam (the share crossing the slab face) and whose
        layer 0 no program writes — the assembly below never reads it."""
        dz, dy = HALF_OFFSETS5[k]
        rows = spec.rows + (mc if dz else 0)
        return (lambda z, y: (0, (z + dz) * mc + (y + dy) % mc, 0, 0), rows)

    force = None
    seam = jnp.zeros((3, mc, mc, cap), jnp.float32)
    pe = None
    for ks in pallas_force._row_groups(spec, want_pe):
        outs = pallas_force._call_force_group(
            windows, spec, rc, want_pe, interpret, False, ks, specs,
            (nz, mc), spec.rows, rxn_out)
        # outs[0]: own force incl. the (0,0) row's reaction (in-kernel)
        f = outs[0].reshape(3, nz, mc, mc, cap)
        ri = 1
        for k in ks:
            if k == 0:
                continue
            dz, _dy = HALF_OFFSETS5[k]
            r = outs[ri]
            ri += 1
            if dz == 0:
                f = f + r.reshape(3, nz, mc, mc, cap)
            else:
                re = r.reshape(3, nz + 1, mc, mc, cap)
                f = f.at[:, 1:].add(re[:, 1:nz])
                seam = seam + re[:, nz]
        force = f if force is None else force + f
        if want_pe:
            pe = outs[-1] if pe is None else pe + outs[-1]
    return (force.reshape(3, spec.rows, mc, cap), seam,
            pe.reshape(spec.rows, mc, cap) if want_pe else None)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def slab_forces_interior(pos: jnp.ndarray, spec: SlabSpec, rc: float,
                         interpret: bool = False):
    """Half-sweep forces for the owned INTERIOR layers — everything that
    does not touch the ghost layer, so the per-step halo ppermute can fly
    while this computes (the overlap VERDICT r3 item 7 asked for; the
    no-overlap assumption this retires is priced in BASELINE.md's DD
    projection).

    ``pos``: (3, nz*mc, mc, cap) owned parked state ONLY (no ghost
    concat — the interior grid (nz-1, mc) reads blocks (z+dz)*mc with
    z <= nz-2, never past the owned rows). Requires nz >= 2.

    Returns (f_low (3, (nz-1)*mc, mc, cap), top_rxn (3, mc, mc, cap)):
    ``f_low`` is the complete force on layers 0..nz-2 from interior-
    evaluated pairs (reactions re-homed by output index_maps as in
    slab_forces_half); ``top_rxn`` is the dz=1 reaction of layer nz-2
    onto layer nz-1 — add it to the boundary pass's own-layer force.
    Layer 0 still needs the left neighbor's seam, as before."""
    mc, cap, nz = spec.mc, spec.cap, spec.nz
    assert nz >= 2, "interior split needs >= 2 owned layers"
    specs = _slab_state_specs_merged(spec)

    def rxn_out(k):
        dz, dy = HALF_OFFSETS5[k]
        return (lambda z, y: (0, (z + dz) * mc + (y + dy) % mc, 0, 0),
                spec.rows)

    own = None   # valid layers [0, nz-1): own + dz=0 reactions
    dz1 = None   # valid layers [1, nz):   dz=1 reactions
    for ks in pallas_force._row_groups(spec, False):
        outs = pallas_force._call_force_group(
            pos, spec, rc, False, interpret, False, ks, specs,
            (nz - 1, mc), spec.rows, rxn_out)
        f = outs[0]
        ri = 1
        for k in ks:
            if k == 0:
                continue
            kdz, _ = HALF_OFFSETS5[k]
            r = outs[ri]
            ri += 1
            if kdz == 0:
                f = f + r
            else:
                dz1 = r if dz1 is None else dz1 + r
        own = f if own is None else own + f
    cut = (nz - 1) * mc
    f_low = own[:, :cut]
    if nz > 2:  # dz=1 reactions land on layers 1..nz-1; layer 0 unwritten
        f_low = f_low.at[:, mc:].add(dz1[:, mc:cut])
    return f_low, dz1[:, cut:]


def _slab_state_specs_boundary(spec: SlabSpec):
    """Boundary twin of _slab_state_specs_merged over the 2-layer
    (3, 2*mc, mc, cap) window array [last owned layer | ghost layer]:
    grid (1, mc), z == 0, dz=1 reads the ghost rows."""
    mc = spec.mc
    shape = (3, 1, mc, spec.cap)
    specs = []
    for dz, dy in HALF_OFFSETS5:
        def m(z, y, dz=dz, dy=dy):
            return (0, dz * mc + (y + dy) % mc, 0, 0)
        specs.append(pl.BlockSpec(shape, m, memory_space=pltpu.VMEM))
    return specs


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def slab_forces_boundary(last_pos: jnp.ndarray, gpos: jnp.ndarray,
                         gvalid_f32: jnp.ndarray, spec: SlabSpec,
                         rc: float, interpret: bool = False):
    """Half-sweep forces for the LAST owned layer — the only part of the
    slab force pass that reads the ghost layer, sequenced after the halo
    ppermute its interior twin overlaps.

    ``last_pos``: (3, mc, mc, cap) owned last layer (park invariant
    holds — its empty slots carry device-local park ids (nz-1)*mc..);
    ``gpos``/``gvalid_f32``: the received right-ghost layer, seam-shifted;
    re-parked here at ext-local row ids nz*mc.. exactly as _repark_ghost
    does, so pair geometry is bit-identical to the combined kernel's.

    Returns (f_last (3, mc, mc, cap), seam (3, mc, mc, cap)): own-layer
    force from boundary-evaluated pairs (add slab_forces_interior's
    top_rxn and the in-flight left seam) and the Newton-3 reaction onto
    the ghost layer to ppermute right."""
    mc, cap = spec.mc, spec.cap
    park_g = park_lattice(spec.ext())[:, spec.rows:]
    g = jnp.where(gvalid_f32[None] > 0.5, gpos, park_g)
    windows = jnp.concatenate([last_pos, g], axis=1)  # (3, 2mc, mc, cap)
    specs = _slab_state_specs_boundary(spec)

    def rxn_out(k):
        dz, dy = HALF_OFFSETS5[k]
        return (lambda z, y: (0, (y + dy) % mc, 0, 0), mc)

    f_last = None
    seam = None
    for ks in pallas_force._row_groups(spec, False):
        outs = pallas_force._call_force_group(
            windows, spec, rc, False, interpret, False, ks, specs,
            (1, mc), mc, rxn_out)
        f = outs[0]
        ri = 1
        for k in ks:
            if k == 0:
                continue
            kdz, _ = HALF_OFFSETS5[k]
            r = outs[ri]
            ri += 1
            if kdz == 0:
                f = f + r
            else:
                seam = r if seam is None else seam + r
        f_last = f if f_last is None else f_last + f
    return f_last, seam


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def slab_lists_half(ext_pos: jnp.ndarray, ext_valid_f32: jnp.ndarray,
                    spec: SlabSpec, radius: float, interpret: bool = False):
    """Slab variant of dense_lists_half: (counts, masks) over the owned
    rows, pairs attributed to the evaluating device (ghost-layer pairs to
    the lower slab) — global pairs = psum of sum(counts * valid). Masks
    are slot-packed, matching dense_lists_half's format (the emission body
    is literally shared: pallas_force.lists_half_impl)."""
    return pallas_force.lists_half_impl(
        _repark_ghost(ext_pos, ext_valid_f32, spec), spec,
        (spec.nz, spec.mc), _slab_state_specs_merged(spec),
        radius, False, interpret,
    )


def slab_keys(pos: jnp.ndarray, valid: jnp.ndarray, spec: SlabSpec,
              z0_cell: jnp.ndarray, wrap: bool = True) -> jnp.ndarray:
    """Per-slot sort key for the slab rebuild, over WRAPPED positions.

    With s = (iz_global - z0 + 1) mod mc_z (z0 = this device's first
    global z-cell): s = 0 marks a LEFT emigrant, s in [1, nz] an owned
    layer, s = nz + 1 a RIGHT emigrant, s > nz + 1 a lost particle (moved
    more than one layer since the last rebuild — impossible under the skin
    protocol, dropped and caught by the global count check). The key
    x + mc*(y + mc*s) sorts emigrants below/above the owned key range
    [mc^2, mc^2*(nz+1)), which sort_expand(key_base=mc^2) then drops.
    Invalid slots get the park key mc^2*(nz+2).

    ``wrap=False`` (the P=1 self-halo mode, where nz = mc_z and z0 = 0):
    the ring mod would map the TOP owned layer (iz = mc_z - 1, s = 0) to a
    left-emigrant key and drop it; with no neighbor devices there are no
    emigrants at all, so s = iz + 1 directly — every valid slot is owned."""
    mc = spec.mc
    inv = jnp.float32(1.0 / spec.cell_size)
    inv_z = jnp.float32(1.0 / spec.cell_z)
    ix = jnp.clip(jnp.floor(pos[0] * inv).astype(jnp.int32), 0, mc - 1)
    iy = jnp.clip(jnp.floor(pos[1] * inv).astype(jnp.int32), 0, mc - 1)
    iz = jnp.clip(jnp.floor(pos[2] * inv_z).astype(jnp.int32), 0,
                  spec.mc_z - 1)
    s = iz - z0_cell + 1
    if wrap:
        s = jnp.mod(s, spec.mc_z)
    key = ix + mc * (iy + mc * s)
    return jnp.where(valid, key, jnp.int32(mc * mc * (spec.nz + 2)))


def slab_sort_expand(keys: jnp.ndarray, chans: tuple, spec: SlabSpec,
                     interpret: bool = False):
    """sort_expand with the slab key layout (owned rows start at key
    mc^2, after the left-emigrant block)."""
    return sort_expand(keys, chans, spec, interpret,
                       key_base=spec.mc * spec.mc)


__all__ = [
    "SlabSpec", "slab_forces_half", "slab_lists_half", "slab_keys",
    "slab_sort_expand", "DenseState",
]
