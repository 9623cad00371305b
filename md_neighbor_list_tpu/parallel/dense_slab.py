"""DenseSlabSimulator — slab domain decomposition on the DENSE Pallas
engine (the D1-D3 fast path VERDICT.md round 1 asked for).

Same distributed protocol as ``parallel/slab.py`` (slab DD, ICI halo via
``ppermute``, migration at rebuild, global rebuild vote — SURVEY.md §4.6,
§5.4; BASELINE.json:11) but the per-device hot path is the dense
cell-block Pallas engine, not the gather-heavy XLA sweep, and every halo
payload is a CONTIGUOUS dense layer block:

  decomposition  slabs along z = nz contiguous z-layers of cell rows per
                 device (z is the leading row dimension of the dense
                 layout, so a layer is one contiguous (3, mc, mc, cap)
                 block — no send lists, no compaction, no gathers)
  per step       1 ppermute: my first owned layer -> left neighbor's
                 right-ghost block (positions only; the ghost SET stays
                 valid between rebuilds by the skin argument), plus
                 1 ppermute returning Newton-3 seam reactions
  per rebuild    wrap; exchange BOUNDARY LAYERS both ways (pos+vel+pid:
                 emigrants can only live there, having moved <= 1 cell);
                 key own + received records relative to my slab
                 (ops/slab_kernels.slab_keys: emigrants/foreigners sort
                 outside the owned key range and drop out); ONE 8-payload
                 sort + expand kernel re-bins everything; ghost layer
                 (pos+pid) refreshed from the new binning
  forces         half-sweep Newton-3 kernels with dz >= 0: pairs across
                 my LOWER face are evaluated by the left neighbor, which
                 ppermutes back one contiguous reaction layer (seam)

Collectives per step: 2 neighbor ppermutes + 1 scalar pmax vote —
O(surface), all riding ICI under shard_map. Conservation: a particle is
kept by exactly one device (the s-key ranges partition the ring); the
global psum of kept slots must equal N every rebuild, else the sticky
overflow flag triggers the host-side rollback + capacity growth + re-jit
protocol shared with the other engines (SURVEY.md §4.3).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from md_neighbor_list_tpu.core.box import Box
from md_neighbor_list_tpu.core.config import MDConfig
from md_neighbor_list_tpu.core.system import System, init_lattice
from md_neighbor_list_tpu.ops.dense_cells import grow_cap, DenseState
from md_neighbor_list_tpu.ops.slab_kernels import (SlabSpec,
                                                   slab_forces_boundary,
                                                   slab_forces_half,
                                                   slab_forces_interior,
                                                   slab_keys,
                                                   slab_lists_half,
                                                   slab_sort_expand)
from md_neighbor_list_tpu.parallel.mesh import (AXIS, make_mesh,
                                                shift_perms, slab_sharding)


def make_slab_spec(box: Box, rs: float, p: int, cap: int = 40) -> SlabSpec:
    """x/y keep the finest valid grid; the GLOBAL z cell count is rounded
    DOWN to a multiple of P (uniform slabs are a shard_map requirement),
    coarsening only the z edge — still >= rs, so the 27-sweep
    neighborhood remains sufficient (see SlabSpec)."""
    mc = max(int(box.L / rs), 1)
    mc_z = (mc // p) * p
    if mc < 3 or mc_z < p:
        raise ValueError(
            f"box too small for a {p}-slab dense grid (mc={mc}, "
            f"mc_z={mc_z} at L={box.L:.3g}, rs={rs}); fewer devices or "
            "more particles"
        )
    return SlabSpec(mc=mc, nz=mc_z // p, mc_z=mc_z, cap=cap, L=box.L,
                    cell_size=box.L / mc, cell_z=box.L / mc_z)


class SlabCarry(NamedTuple):
    """Per-device slab state (leading mesh axis P on the global view)."""

    pos: jnp.ndarray  # (3, rows, mc, cap) owned, wrapped at rebuild only
    vel: jnp.ndarray  # (3, rows, mc, cap)
    pid: jnp.ndarray  # (rows, mc, cap) i32, < 0 = empty slot
    gpos: jnp.ndarray  # (3, mc, mc, cap) right-ghost layer, seam-shifted
    gpid: jnp.ndarray  # (mc, mc, cap) i32
    force: jnp.ndarray  # (3, rows, mc, cap)
    ref_pos: jnp.ndarray  # (3, rows, mc, cap) positions at last rebuild
    n_rebuilds: jnp.ndarray  # () i32
    n_migrated: jnp.ndarray  # () i32 particles re-homed across slabs
    overflow: jnp.ndarray  # () bool (sticky)


class DenseSlabSimulator:
    """Distributed LJ/NVE over P dense slabs. API mirrors DenseSimulator.
    kernel_impl: 'pallas' (TPU) or 'interpret' (CPU tests/virtual mesh).

    P=1 is the SELF-HALO validation mode: the full distributed program —
    shard_map, halo/seam ppermutes (self-sends), rebuild vote, migration
    keying — runs unchanged on a single device, so the DD path can be
    executed and gated on real TPU hardware where only one chip exists
    (tools/validate_tpu.py --dd-p1). Two trace-time specializations: the
    boundary-layer exchange is skipped (a self-exchange would duplicate
    every boundary particle into the sort stream) and ``slab_keys`` runs
    unwrapped (the ring mod would alias the top layer to a left-emigrant
    key — see its docstring). For production single-chip runs prefer
    DenseSimulator (no ghost layer, zwrap kernels, ~12% fewer rows)."""

    def __init__(self, config: MDConfig, cap: int = 40,
                 kernel_impl: str | None = None):
        if config.mesh_devices < 1:
            raise ValueError("DenseSlabSimulator needs mesh_devices >= 1")
        self.config = config
        self.box = Box.from_density(config.n, config.rho)
        self.p = config.mesh_devices
        self.cap = cap
        if kernel_impl is None:
            kernel_impl = ("pallas" if jax.default_backend() != "cpu"
                           else "interpret")
        if kernel_impl not in ("pallas", "interpret"):
            raise ValueError(f"unknown kernel_impl {kernel_impl!r}")
        self.kernel_impl = kernel_impl
        self.mesh = make_mesh(self.p)
        self._compile()

    # ---------------------------------------------------------------- device
    def _compile(self) -> None:
        cfg = self.config
        p = self.p
        spec = make_slab_spec(self.box, cfg.rs, p, self.cap)
        self.spec = spec
        mc, nz, cap, rows = spec.mc, spec.nz, spec.cap, spec.rows
        interp = self.kernel_impl == "interpret"
        fL = jnp.float32(spec.L)
        n = cfg.n
        perm_plus, perm_minus = shift_perms(p)
        skin2 = jnp.float32(cfg.skin * cfg.skin)

        def seam_shift(layer_pos):
            """Ring-seam +L on the z channel of the received right-ghost
            layer (device P-1's right neighbor is device 0): applied by
            the RECEIVER, so kernel arithmetic matches the single-chip
            cube's pre-shifted periodic images bit-for-bit."""
            sh = jnp.where(lax.axis_index(AXIS) == p - 1, fL, 0.0)
            return layer_pos.at[2].add(sh)

        def refresh_ghosts(state: SlabCarry) -> SlabCarry:
            """Non-rebuild steps: re-send the first owned layer's fresh
            positions to the left neighbor (the ghost SET is frozen)."""
            g = lax.ppermute(state.pos[:, :mc], AXIS, perm_minus)
            return state._replace(gpos=seam_shift(g))

        def rebuild(state: SlabCarry) -> SlabCarry:
            pos = jnp.mod(state.pos, fL)
            z0 = lax.axis_index(AXIS).astype(jnp.int32) * nz
            first = slice(0, mc)
            last = slice((nz - 1) * mc, nz * mc)

            def send(sl, perm):
                return (
                    lax.ppermute(pos[:, sl], AXIS, perm),
                    lax.ppermute(state.vel[:, sl], AXIS, perm),
                    lax.ppermute(state.pid[sl], AXIS, perm),
                )

            if p == 1:
                # self-halo mode: every particle is already resident (no
                # migration transport exists to receive from), and a self-
                # exchange would enter each boundary particle twice into
                # the sort; unwrapped keys own all mc_z layers
                k_own = slab_keys(pos, state.pid >= 0, spec, z0, wrap=False)
                keys = k_own.reshape(-1)
                chans = tuple(pos[i].reshape(-1) for i in range(3)) + tuple(
                    state.vel[i].reshape(-1) for i in range(3)
                ) + (state.pid.reshape(-1).astype(jnp.float32),)
            else:
                # emigrants live only in boundary layers (they moved <= 1
                # cell since the last rebuild) -> exchanging those layers
                # IS the migration transport; non-residents key themselves
                # out. NO seam shift here: records enter the sort in the
                # wrapped global frame (slab_keys handles the ring via its
                # mod)
                recv_l = send(last, perm_plus)    # left nbr's top layer
                recv_r = send(first, perm_minus)  # right nbr's bottom

                k_own = slab_keys(pos, state.pid >= 0, spec, z0)
                k_l = slab_keys(recv_l[0], recv_l[2] >= 0, spec, z0)
                k_r = slab_keys(recv_r[0], recv_r[2] >= 0, spec, z0)

                def chan(own, rl, rr):
                    return jnp.concatenate(
                        [own.reshape(-1), rl.reshape(-1), rr.reshape(-1)]
                    )

                keys = chan(k_own, k_l, k_r)
                chans = tuple(
                    chan(pos[i], recv_l[0][i], recv_r[0][i])
                    for i in range(3)
                ) + tuple(
                    chan(state.vel[i], recv_l[1][i], recv_r[1][i])
                    for i in range(3)
                ) + (chan(state.pid, recv_l[2],
                          recv_r[2]).astype(jnp.float32),)
            new, _ = slab_sort_expand(keys, chans, spec, interp)

            # conservation: every particle kept by exactly one device
            kept = jnp.sum((new.pid >= 0).astype(jnp.int32))
            kept_global = lax.psum(kept, AXIS)
            # migration diagnostic: own records that keyed out of my slab
            own_emig = (state.pid >= 0) & (
                (k_own < mc * mc) | (k_own >= mc * mc * (nz + 1))
            )
            moved = lax.psum(jnp.sum(own_emig.astype(jnp.int32)), AXIS)

            # the ghost SET (pids) changes only here; ghost POSITIONS are
            # refreshed by the hoisted per-step ppermute in step() (which
            # overwrites gpos right after this cond — left stale here so
            # the refresh can overlap the interior force pass)
            gpid = lax.ppermute(new.pid[:mc], AXIS, perm_minus)
            return state._replace(
                pos=new.pos, vel=new.vel, pid=new.pid,
                gpid=gpid,
                ref_pos=new.pos,
                n_rebuilds=state.n_rebuilds + 1,
                n_migrated=state.n_migrated + moved,
                overflow=state.overflow | (kept_global != n),
            )

        def forces(state: SlabCarry, want_pe: bool = False):
            ext_pos = jnp.concatenate([state.pos, state.gpos], axis=1)
            ext_valid = jnp.concatenate(
                [state.pid >= 0, state.gpid >= 0], axis=0
            ).astype(jnp.float32)
            force, seam, pe = slab_forces_half(
                ext_pos, ext_valid, spec, cfg.rc, interp, want_pe
            )
            # my reactions onto the right-ghost layer belong to the right
            # neighbor's first owned layer
            recv = lax.ppermute(seam, AXIS, perm_plus)
            force = force.at[:, :mc].add(recv)
            return force, pe

        def step(state: SlabCarry, _):
            dt = jnp.float32(cfg.dt)
            vel = state.vel + 0.5 * dt * state.force
            pos = state.pos + dt * vel  # unwrapped between rebuilds
            state = state._replace(pos=pos, vel=vel)

            disp = pos - state.ref_pos  # exact: both unwrapped
            d2 = jnp.sum(disp * disp, axis=0)
            d2max = jnp.max(jnp.where(state.pid >= 0, d2, 0.0))
            d2max = lax.pmax(d2max, AXIS)
            need = 4.0 * d2max > skin2
            if cfg.rebuild_every_step:
                need = jnp.bool_(True)
            state = lax.cond(need, rebuild, lambda s: s, state)

            # ghost-position refresh hoisted OUT of the cond: both branches
            # want ppermute(state.pos[:, :mc]) of the post-cond state, and
            # outside the cond the collective can overlap the interior
            # force pass (no data dependency — XLA's latency-hiding
            # scheduler splits it into start/done around independent work).
            g = lax.ppermute(state.pos[:, :mc], AXIS, perm_minus)
            state = state._replace(gpos=seam_shift(g))

            if nz >= 2:  # overlap path: ghost-free interior, then seam
                f_low, top_rxn = slab_forces_interior(
                    state.pos, spec, cfg.rc, interp)
                f_last, seam = slab_forces_boundary(
                    state.pos[:, (nz - 1) * mc:], state.gpos,
                    (state.gpid >= 0).astype(jnp.float32), spec, cfg.rc,
                    interp)
                recv = lax.ppermute(seam, AXIS, perm_plus)
                force = jnp.concatenate([f_low, f_last + top_rxn], axis=1)
                force = force.at[:, :mc].add(recv)
            else:  # single owned layer: no interior exists
                force, _ = forces(state)
            vel = state.vel + 0.5 * dt * force
            return state._replace(vel=vel, force=force), None

        def unsqueeze(state):
            return jax.tree.map(lambda a: a[0], state)

        def squeeze(state):
            return jax.tree.map(lambda a: a[None], state)

        pspec = jax.sharding.PartitionSpec(AXIS)
        rep = jax.sharding.PartitionSpec()

        def make_run_chunk(nsteps: int):
            @jax.jit
            @functools.partial(
                jax.shard_map, mesh=self.mesh, in_specs=(pspec,),
                out_specs=pspec, check_vma=False,
            )
            def run_chunk_sm(state):
                state, _ = lax.scan(
                    step, unsqueeze(state), None, length=nsteps
                )
                return squeeze(state)

            return run_chunk_sm

        @jax.jit
        @functools.partial(
            jax.shard_map, mesh=self.mesh, in_specs=(pspec,),
            out_specs=pspec, check_vma=False,
        )
        def initial_build_sm(state):
            state = unsqueeze(state)
            state = rebuild(state)
            state = refresh_ghosts(state)  # rebuild leaves gpos stale
            force, _ = forces(state)
            return squeeze(state._replace(force=force))

        @jax.jit
        @functools.partial(
            jax.shard_map, mesh=self.mesh, in_specs=(pspec,),
            out_specs=(rep, rep), check_vma=False,
        )
        def energies_sm(state):
            state = unsqueeze(state)
            v = state.pid >= 0
            ke = 0.5 * jnp.sum(jnp.where(v[None], state.vel, 0.0) ** 2)
            _, pe = forces(state, want_pe=True)
            pe = jnp.sum(jnp.where(v, pe, 0.0))
            return lax.psum(ke, AXIS), lax.psum(pe, AXIS)

        @jax.jit
        @functools.partial(
            jax.shard_map, mesh=self.mesh, in_specs=(pspec,),
            out_specs=(pspec, rep), check_vma=False,
        )
        def lists_sm(state):
            """Distributed neighbor-list artifact + global exact pair
            count (each pair attributed to exactly one device)."""
            state = unsqueeze(state)
            ext_pos = jnp.concatenate([state.pos, state.gpos], axis=1)
            ext_valid = jnp.concatenate(
                [state.pid >= 0, state.gpid >= 0], axis=0
            ).astype(jnp.float32)
            counts, masks = slab_lists_half(
                ext_pos, ext_valid, spec, cfg.rs, interp
            )
            total = lax.psum(
                jnp.sum(jnp.where(state.pid >= 0, counts, 0)), AXIS
            )
            return squeeze(counts), total

        self._run_chunk_cache: dict[int, object] = {}
        self._make_run_chunk = make_run_chunk
        self._initial_build = initial_build_sm
        self._energies = energies_sm
        self._lists = lists_sm

    def _run_chunk(self, state: SlabCarry, nsteps: int) -> SlabCarry:
        fn = self._run_chunk_cache.get(nsteps)
        if fn is None:
            fn = self._make_run_chunk(nsteps)
            self._run_chunk_cache[nsteps] = fn
        return fn(state)

    # ------------------------------------------------------------------ host
    def _scatter(self, system: System) -> SlabCarry:
        """Host-side: distribute a global System into per-slab dense slot
        arrays (any slots — the initial rebuild sorts them into place)."""
        spec, p = self.spec, self.p
        mc, nz, cap, rows = spec.mc, spec.nz, spec.cap, spec.rows
        slots = spec.slots
        pos = np.asarray(system.pos)
        vel = np.asarray(system.vel)
        pid = np.asarray(system.pid)
        dev = np.clip(
            (pos[:, 2] / spec.cell_z).astype(np.int64), 0, spec.mc_z - 1
        ) // nz

        g_pos = np.zeros((p, 3, slots), np.float32)
        g_vel = np.zeros((p, 3, slots), np.float32)
        g_pid = np.full((p, slots), -1, np.int32)
        for d in range(p):
            sel = np.nonzero(dev == d)[0]
            if len(sel) > slots:
                raise ValueError(
                    f"slab {d} holds {len(sel)} particles > {slots} slots; "
                    "grow cap"
                )
            g_pos[d, :, : len(sel)] = pos[sel].T
            g_vel[d, :, : len(sel)] = vel[sel].T
            g_pid[d, : len(sel)] = pid[sel]

        shape4 = (p, 3, rows, mc, cap)
        z1 = np.zeros
        state = SlabCarry(
            pos=g_pos.reshape(shape4),
            vel=g_vel.reshape(shape4),
            pid=g_pid.reshape(p, rows, mc, cap),
            gpos=z1((p, 3, mc, mc, cap), np.float32),
            gpid=np.full((p, mc, mc, cap), -1, np.int32),
            force=z1(shape4, np.float32),
            ref_pos=g_pos.reshape(shape4).copy(),
            n_rebuilds=z1((p,), np.int32),
            n_migrated=z1((p,), np.int32),
            overflow=z1((p,), bool),
        )
        sh = slab_sharding(self.mesh)
        return jax.tree.map(
            lambda a: jax.device_put(jnp.asarray(a), sh), state
        )

    def gather(self, state: SlabCarry) -> System:
        """Inverse of _scatter: global System in original-pid order
        (host-side; positions wrapped into [0, L))."""
        pid = np.asarray(state.pid).reshape(-1)
        keep = pid >= 0
        n = self.config.n
        assert keep.sum() == n, f"lost particles: {keep.sum()} != {n}"
        out = {}
        for name in ("pos", "vel", "force"):
            a = np.asarray(getattr(state, name))  # (P, 3, rows, mc, cap)
            a = np.moveaxis(a, 1, -1).reshape(-1, 3)[keep]
            dst = np.empty((n, 3), np.float32)
            dst[pid[keep]] = a
            out[name] = dst
        out["pos"] = np.mod(out["pos"], np.float32(self.box.L))
        return System(
            pos=jnp.asarray(out["pos"]), vel=jnp.asarray(out["vel"]),
            force=jnp.asarray(out["force"]),
            pid=jnp.arange(n, dtype=jnp.int32),
        )

    def init(self, key=None) -> SlabCarry:
        system, _ = init_lattice(
            self.config.n, self.config.rho, key, self.config.temperature
        )
        return self.build(system)

    def build(self, system: System) -> SlabCarry:
        while True:
            try:
                scattered = self._scatter(system)
            except ValueError:  # slab slot capacity too small: grow + retry
                self.cap = grow_cap(self.cap)
                self._compile()
                continue
            state = self._initial_build(scattered)
            if not bool(np.any(np.asarray(state.overflow))):
                return state
            self.cap = grow_cap(self.cap)
            self._compile()

    def run(self, state: SlabCarry, nsteps: int, chunk: int = 100) -> SlabCarry:
        done = 0
        while done < nsteps:
            this = min(chunk, nsteps - done)
            snapshot = state
            state = self._run_chunk(state, this)
            if bool(np.any(np.asarray(state.overflow))):
                system = self.gather(snapshot)
                self.cap = grow_cap(self.cap)
                self._compile()
                state = self.build(system)
                continue
            done += this
        return state

    def energies(self, state: SlabCarry):
        return self._energies(state)

    def lists(self, state: SlabCarry):
        """(per-device counts (P, rows, mc, cap), global exact pair count)."""
        counts, total = self._lists(state)
        return counts, int(np.asarray(total))
