"""Pure-JAX reference implementation of the dense cell-pair sweep.

Mirrors the Pallas kernels' arithmetic exactly (pre-shifted neighbor images
instead of min-image rounding, identical masking) so kernel-vs-reference
differential tests are bitwise-meaningful, and serves as the CPU-runnable
semantics of the dense engine (SURVEY.md §6.2: every fast path has a slow
twin validated against the O(N^2) oracle)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from md_neighbor_list_tpu.ops.common import (lj_force_scalar,
                                             lj_pair_virial, lj_potential)
from md_neighbor_list_tpu.ops.dense_cells import (DenseSpec, DenseState,
                                                   park_positions)

OFFSETS27 = [
    (dz, dy, dx)
    for dz in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dx in (-1, 0, 1)
]


def rebuild_reference(state: DenseState, spec: DenseSpec) -> DenseState:
    """Scatter-based dense rebuild — the slow, obviously-correct twin of
    ``dense_cells.rebuild_dense``'s sort+expand kernel. Slot assignment:
    stable-sorted particles of cell c occupy slots (c, 0..len-1); cell
    overflow drops the tail (detected by the caller's count check). Wraps
    positions on entry (wrap-at-rebuild-only rule, see rebuild_dense)."""
    from md_neighbor_list_tpu.ops.common import run_first_index
    from md_neighbor_list_tpu.ops.dense_cells import cell_keys

    state = state._replace(pos=jnp.mod(state.pos, jnp.float32(spec.L)))
    s = spec.slots
    keys = cell_keys(state, spec).reshape(-1)
    order = jnp.argsort(keys, stable=True)
    k_s = keys[order]
    iota = jnp.arange(s, dtype=jnp.int32)
    rank = iota - run_first_index(k_s)
    dst = jnp.where(
        (k_s < spec.ncells) & (rank < spec.cap),
        k_s * spec.cap + rank,
        s,  # dropped by mode="drop"
    )
    shape = (spec.rows, spec.mc, spec.cap)

    def place(flat, fill, dtype):
        out = jnp.full((s,), fill, dtype)
        return out.at[dst].set(flat[order].astype(dtype), mode="drop").reshape(shape)

    pos = jnp.stack([place(state.pos[i].reshape(-1), 0.0, jnp.float32)
                     for i in range(3)])
    vel = jnp.stack([place(state.vel[i].reshape(-1), 0.0, jnp.float32)
                     for i in range(3)])
    pid = place(state.pid.reshape(-1), -1, jnp.int32)
    # park invariant (see dense_cells.park_lattice): empty slots leave
    # with park positions, matching the expand kernel's in-kernel park
    return DenseState(pos=park_positions(pos, pid >= 0, spec), vel=vel,
                      pid=pid)


def _as5d(a: jnp.ndarray, spec: DenseSpec) -> jnp.ndarray:
    """(R, mc, cap) -> (mcz, mcy, mcx, cap)."""
    return a.reshape(spec.mc, spec.mc, spec.mc, spec.cap)


def _axis_shift(spec: DenseSpec, d: int, axis: int) -> jnp.ndarray:
    """Periodic image shift for rolled neighbor data: +-L on the wrapped
    boundary layer, 0 elsewhere; broadcast over (mcz, mcy, mcx, 1)."""
    mc = spec.mc
    iota = jnp.arange(mc)
    s = jnp.float32(spec.L) * ((iota + d) // mc).astype(jnp.float32)
    shape = [1, 1, 1]
    shape[axis] = mc
    return s.reshape(shape + [1])


def sweep_reference(state: DenseState, spec: DenseSpec, radius: float,
                    want_forces: bool, want_virial: bool = False):
    """One dense 27-neighborhood sweep.

    want_forces=True: (forces (3, R, mc, cap), pe-per-slot) with the LJ rc
    cutoff — plus the per-slot pair virial when ``want_virial`` (full
    symmetric attribution like pe: total W = sum/2); else: per-slot
    neighbor counts within ``radius`` (the Verlet rs), for pair-count
    parity against the oracle."""
    mc, cap = spec.mc, spec.cap
    x = [_as5d(state.pos[i], spec) for i in range(3)]
    valid = _as5d(state.valid(), spec)
    r2cut = jnp.float32(radius * radius)

    fx = jnp.zeros_like(x[0])
    fy = jnp.zeros_like(x[0])
    fz = jnp.zeros_like(x[0])
    pe = jnp.zeros_like(x[0])
    vir = jnp.zeros_like(x[0])
    cnt = jnp.zeros(x[0].shape, jnp.int32)
    eye = jnp.eye(cap, dtype=bool)

    for (dz, dy, dx) in OFFSETS27:
        rolled = [
            jnp.roll(c, (-dz, -dy, -dx), axis=(0, 1, 2)) for c in x
        ]
        vj = jnp.roll(valid, (-dz, -dy, -dx), axis=(0, 1, 2))
        xj = rolled[0] + _axis_shift(spec, dx, 2)
        yj = rolled[1] + _axis_shift(spec, dy, 1)
        zj = rolled[2] + _axis_shift(spec, dz, 0)

        dxv = x[0][..., :, None] - xj[..., None, :]
        dyv = x[1][..., :, None] - yj[..., None, :]
        dzv = x[2][..., :, None] - zj[..., None, :]
        r2 = dxv * dxv + dyv * dyv + dzv * dzv
        mask = (r2 < r2cut) & vj[..., None, :] & valid[..., :, None]
        if (dz, dy, dx) == (0, 0, 0):
            mask &= ~eye
        if want_forces:
            f = lj_force_scalar(r2, mask)
            fx = fx + jnp.sum(f * dxv, axis=-1)
            fy = fy + jnp.sum(f * dyv, axis=-1)
            fz = fz + jnp.sum(f * dzv, axis=-1)
            pe = pe + jnp.sum(lj_potential(r2, mask, radius), axis=-1)
            if want_virial:
                vir = vir + jnp.sum(lj_pair_virial(r2, mask), axis=-1)
        else:
            cnt = cnt + jnp.sum(mask.astype(jnp.int32), axis=-1)

    shape = (spec.rows, spec.mc, spec.cap)
    if want_forces:
        force = jnp.stack(
            [fx.reshape(shape), fy.reshape(shape), fz.reshape(shape)]
        )
        if want_virial:
            return force, pe.reshape(shape), vir.reshape(shape)
        return force, pe.reshape(shape)
    return cnt.reshape(shape)


def sweep_counts_chunked(state: DenseState, spec: DenseSpec,
                         radius: float) -> jnp.ndarray:
    """Z-layer-chunked twin of ``sweep_reference(want_forces=False)``.

    ``sweep_reference`` materializes (mc^3, cap, cap) temporaries — ~2.3 GB
    each at N=8M (mc=71, cap=40), which exhausts HBM. This variant runs the
    identical arithmetic (pre-shifted periodic images, same masking, exact
    i32 accumulation) one z-layer at a time under ``lax.map``, bounding the
    live temporaries to (mc^2, cap, cap) ~ 32 MB. Counts are bitwise equal
    to the full sweep (integer sums are order-independent; the per-pair
    float geometry is computed by the same expression tree) — asserted on
    hardware by validate_tpu's "chunked reference == reference" gate and on
    CPU by tests/test_dense.py."""
    mc, cap = spec.mc, spec.cap
    x = jnp.stack([_as5d(state.pos[i], spec) for i in range(3)])
    valid = _as5d(state.valid(), spec)
    r2cut = jnp.float32(radius * radius)
    fL = jnp.float32(spec.L)
    eye = jnp.eye(cap, dtype=bool)
    iota = jnp.arange(mc)

    def inplane_shift(d: int, axis: int) -> jnp.ndarray:
        # per-index image shift for a (mc, mc, cap) layer: axis 0 = y, 1 = x
        s = fL * ((iota + d) // mc).astype(jnp.float32)
        shape = [1, 1, 1]
        shape[axis] = mc
        return s.reshape(shape)

    def layer_counts(z0):
        xi = [jax.lax.dynamic_index_in_dim(x[i], z0, 0, keepdims=False)
              for i in range(3)]
        vi = jax.lax.dynamic_index_in_dim(valid, z0, 0, keepdims=False)
        cnt = jnp.zeros((mc, mc, cap), jnp.int32)
        for dz in (-1, 0, 1):
            j = z0 + dz
            # same image arithmetic as _axis_shift: value of neighbor layer
            # j in [-1, mc] is x[j mod mc] + L * floor(j / mc)
            zoff = fL * jnp.floor_divide(j, mc).astype(jnp.float32)
            jm = jnp.mod(j, mc)
            xj0 = [jax.lax.dynamic_index_in_dim(x[i], jm, 0, keepdims=False)
                   for i in range(3)]
            vj0 = jax.lax.dynamic_index_in_dim(valid, jm, 0, keepdims=False)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    rolled = [jnp.roll(c, (-dy, -dx), axis=(0, 1))
                              for c in xj0]
                    vj = jnp.roll(vj0, (-dy, -dx), axis=(0, 1))
                    xj = rolled[0] + inplane_shift(dx, 1)
                    yj = rolled[1] + inplane_shift(dy, 0)
                    zj = rolled[2] + zoff
                    dxv = xi[0][..., :, None] - xj[..., None, :]
                    dyv = xi[1][..., :, None] - yj[..., None, :]
                    dzv = xi[2][..., :, None] - zj[..., None, :]
                    r2 = dxv * dxv + dyv * dyv + dzv * dzv
                    mask = (r2 < r2cut) & vj[..., None, :] & vi[..., :, None]
                    if (dz, dy, dx) == (0, 0, 0):
                        mask &= ~eye
                    cnt = cnt + jnp.sum(mask.astype(jnp.int32), axis=-1)
        return cnt

    cnts = jax.lax.map(layer_counts, jnp.arange(mc, dtype=jnp.int32))
    return cnts.reshape(spec.rows, spec.mc, spec.cap)
