"""Slab domain decomposition with ICI halo exchange (D1-D3).

Driver-mandated extension beyond the single-node reference
(BASELINE.json:11; SURVEY.md §4.6, §5.4): the periodic box is split into P
slabs along x over a 1-D device mesh. Per device, all state lives in
fixed-capacity slot arrays (static shapes under ``shard_map``):

  combined index space per device, size M = cap + 2*gcap:
    [0, cap)            owned slots          (pid >= 0 marks occupancy)
    [cap, cap+gcap)     ghosts from the LEFT  neighbor (x just below my lo)
    [cap+gcap, M)       ghosts from the RIGHT neighbor (x just above my hi)

Protocol per jitted step (all collectives are neighbor ``ppermute`` shifts
over ICI plus one scalar ``pmax`` vote — O(surface), SURVEY.md §5.4):

  kick; drift; global rebuild vote = pmax(4*max_disp^2 > skin^2)
  if rebuild: migrate emigrants to +-1 neighbors -> recompact owned slots;
              select face bands (within rs of each face), record send index
              lists, exchange ghosts (pos+pid); bin+sweep the combined set
              (stable slot order, inactive slots masked)
  else:       re-gather positions at the recorded send lists, ppermute,
              overwrite ghost positions (the ghost *set* stays valid between
              rebuilds by the skin argument)
  forces over combined set with FULL lists -> owned forces complete locally
  (no reverse force exchange; 2x pair compute instead of Newton-3 scatter,
  the GPU-like trade SURVEY.md §9 anticipates); kick.

Geometric preconditions (asserted): slab width w > rs (halo only +-1 deep);
P >= 2; for P == 2, w >= 2*rs (else one particle could land twice in the
same device's ghost blocks).
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
from md_neighbor_list_tpu.core.capacity import estimate, round_up
from md_neighbor_list_tpu.core.config import MDConfig
from md_neighbor_list_tpu.core.system import System, init_lattice
from md_neighbor_list_tpu.ops import lj
from md_neighbor_list_tpu.ops.binning import make_grid
from md_neighbor_list_tpu.ops.common import compact_rows
from md_neighbor_list_tpu.ops.integrate import kinetic_energy
from md_neighbor_list_tpu.ops.pairlist import build_neighbor_lists_stable
from md_neighbor_list_tpu.parallel.mesh import AXIS, make_mesh, shift_perms


@dataclasses.dataclass(frozen=True)
class DDCapacity:
    """Static per-device capacities (SURVEY.md §9 'Static shapes under
    physics' — all sized by the Capacity policy, grown on overflow)."""

    local: int  # owned particle slots per device
    ghost: int  # ghost slots per side
    mig: int  # migration buffer slots per direction
    neighbors: int  # K, full-list padded rows
    cell: int  # dense cell-table depth
    growth: float = 1.5

    def grown(self) -> "DDCapacity":
        g = self.growth
        return dataclasses.replace(
            self,
            local=round_up(int(self.local * g) + 8, 8),
            ghost=round_up(int(self.ghost * g) + 8, 8),
            mig=round_up(int(self.mig * g) + 8, 8),
            neighbors=round_up(int(self.neighbors * g) + 8, 8),
            cell=round_up(int(self.cell * g) + 8, 8),
        )


def estimate_dd(config: MDConfig, box: Box, cell_size: float) -> DDCapacity:
    p = config.mesh_devices
    per_dev = config.n / p
    base = estimate(config.rho, config.rs, cell_size, half_list=False)
    face = config.rho * box.L * box.L  # particles per unit slab depth
    return DDCapacity(
        local=round_up(int(per_dev * 1.3) + 64, 8),
        ghost=round_up(int(face * config.rs * 1.5) + 64, 8),
        mig=round_up(int(face * max(config.skin, 0.1) * 2.0) + 64, 8),
        neighbors=base.neighbors,
        cell=base.cell,
    )


class DDState(NamedTuple):
    """Per-device slab state (leading mesh axis P on the global view)."""

    pos: jnp.ndarray  # (cap, 3)
    vel: jnp.ndarray  # (cap, 3)
    force: jnp.ndarray  # (cap, 3)
    pid: jnp.ndarray  # (cap,) i32, -1 = empty
    ghost_pos: jnp.ndarray  # (2, gcap, 3)  [0]=from-left, [1]=from-right
    ghost_pid: jnp.ndarray  # (2, gcap) i32
    send_idx: jnp.ndarray  # (2, gcap) i32  [0]=low-face sends, [1]=high-face
    idx: jnp.ndarray  # (M, K) i32 neighbor rows, sentinel M
    ref_pos: jnp.ndarray  # (cap, 3)
    n_rebuilds: jnp.ndarray  # () i32
    overflow: jnp.ndarray  # () bool (sticky)


def _gather_rows(arr: jnp.ndarray, idx: jnp.ndarray, fill_row) -> jnp.ndarray:
    """Gather rows with one sentinel row appended (idx == len(arr) -> fill)."""
    ext = jnp.concatenate([arr, jnp.asarray(fill_row, arr.dtype)[None]], axis=0)
    return ext[idx]


class SlabSimulator:
    """Distributed LJ/NVE over P slabs. API mirrors ``Simulator``."""

    def __init__(self, config: MDConfig, capacity: DDCapacity | None = None):
        if config.mesh_devices < 2:
            raise ValueError("SlabSimulator needs mesh_devices >= 2; "
                             "use Simulator for a single chip")
        self.config = config
        self.box = Box.from_density(config.n, config.rho)
        self.grid = make_grid(self.box, config.rs)
        if not self.grid.usable:
            raise ValueError("box too small for a cell grid; DD unsupported")
        self.p = config.mesh_devices
        self.w = self.box.L / self.p
        if self.w <= config.rs:
            raise ValueError(
                f"slab width {self.w:.3f} must exceed rs={config.rs} "
                "(halo exchange is only +-1 neighbor deep)"
            )
        if self.p == 2 and self.w < 2 * config.rs:
            raise ValueError("P=2 requires slab width >= 2*rs")
        self.mesh = make_mesh(self.p)
        self.capacity = capacity or estimate_dd(config, self.box, self.grid.cell_size)
        self._compile()

    # ---------------------------------------------------------------- device
    def _compile(self) -> None:
        cfg = self.config
        box, grid, cap = self.box, self.grid, self.capacity
        p, w = self.p, self.w
        cl, gcap, mig, K = cap.local, cap.ghost, cap.mig, cap.neighbors
        M = cl + 2 * gcap
        perm_plus, perm_minus = shift_perms(p)
        rs = cfg.rs
        skin2 = cfg.skin * cfg.skin

        def combined(state: DDState):
            xpos = jnp.concatenate(
                [state.pos, state.ghost_pos[0], state.ghost_pos[1]], axis=0
            )
            xpid = jnp.concatenate(
                [state.pid, state.ghost_pid[0], state.ghost_pid[1]], axis=0
            )
            return xpos, xpid >= 0

        def forces(state: DDState):
            xpos, xactive = combined(state)
            owned = jnp.concatenate(
                [state.pid >= 0, jnp.zeros((2 * gcap,), bool)], axis=0
            )
            f_all, u = lj.forces_energy(
                xpos, state.idx, box, cfg.rc, half=False, energy_rows=owned
            )
            return f_all[:cl], u

        def migrate(state: DDState):
            me = lax.axis_index(AXIS)
            valid = state.pid >= 0
            t = jnp.clip(
                jnp.floor(state.pos[:, 0] / jnp.float32(w)).astype(jnp.int32),
                0, p - 1,
            )
            delta = jnp.mod(t - me, p)
            go_r = valid & (delta == 1)
            go_l = valid & (delta == p - 1) & (p > 2)
            lost = valid & (delta != 0) & ~go_r & ~go_l  # moved >1 slab: bug
            stay = valid & ~go_r & ~go_l & ~lost

            slots = jnp.arange(cl, dtype=jnp.int32)[None, :]
            idx_r, cnt_r = compact_rows(slots, go_r[None, :], mig, fill=cl)
            idx_l, cnt_l = compact_rows(slots, go_l[None, :], mig, fill=cl)
            idx_r, idx_l = idx_r[0], idx_l[0]
            cnt_r, cnt_l = cnt_r[0], cnt_l[0]

            def pack(idx):
                return (
                    _gather_rows(state.pos, idx, [0.0, 0.0, 0.0]),
                    _gather_rows(state.vel, idx, [0.0, 0.0, 0.0]),
                    jnp.concatenate([state.pid, jnp.array([-1], jnp.int32)])[idx],
                )

            send_r = pack(idx_r)
            send_l = pack(idx_l)
            recv_from_left = jax.tree.map(
                lambda x: lax.ppermute(x, AXIS, perm_plus), send_r
            )
            recv_from_right = jax.tree.map(
                lambda x: lax.ppermute(x, AXIS, perm_minus), send_l
            )

            all_pos = jnp.concatenate(
                [state.pos, recv_from_left[0], recv_from_right[0]], axis=0
            )
            all_vel = jnp.concatenate(
                [state.vel, recv_from_left[1], recv_from_right[1]], axis=0
            )
            all_pid = jnp.concatenate(
                [jnp.where(stay, state.pid, -1),
                 recv_from_left[2], recv_from_right[2]]
            )
            valid_all = all_pid >= 0
            order = jnp.argsort(jnp.logical_not(valid_all), stable=True)[:cl]
            new_pos = all_pos[order]
            new_vel = all_vel[order]
            new_pid = all_pid[order]
            count = jnp.sum(valid_all.astype(jnp.int32))
            over = (
                (count > cl) | (cnt_r > mig) | (cnt_l > mig) | jnp.any(lost)
            )
            new_vel = jnp.where((new_pid >= 0)[:, None], new_vel, 0.0)
            return state._replace(
                pos=new_pos, vel=new_vel, pid=new_pid,
                overflow=state.overflow | over,
            )

        def halo_exchange(state: DDState):
            me = lax.axis_index(AXIS)
            lo = me.astype(jnp.float32) * jnp.float32(w)
            hi = lo + jnp.float32(w)
            valid = state.pid >= 0
            x = state.pos[:, 0]
            low = valid & (x < lo + jnp.float32(rs))
            high = valid & (x >= hi - jnp.float32(rs))

            slots = jnp.arange(cl, dtype=jnp.int32)[None, :]
            idx_low, cnt_low = compact_rows(slots, low[None, :], gcap, fill=cl)
            idx_high, cnt_high = compact_rows(slots, high[None, :], gcap, fill=cl)
            idx_low, idx_high = idx_low[0], idx_high[0]
            over = (cnt_low[0] > gcap) | (cnt_high[0] > gcap)

            pid_ext = jnp.concatenate([state.pid, jnp.array([-1], jnp.int32)])
            # low-face set -> left neighbor (perm_minus): its from-right block
            ghost_r_pos = lax.ppermute(
                _gather_rows(state.pos, idx_low, [0.0, 0.0, 0.0]),
                AXIS, perm_minus)
            ghost_r_pid = lax.ppermute(pid_ext[idx_low], AXIS, perm_minus)
            # high-face set -> right neighbor (perm_plus): its from-left block
            ghost_l_pos = lax.ppermute(
                _gather_rows(state.pos, idx_high, [0.0, 0.0, 0.0]),
                AXIS, perm_plus)
            ghost_l_pid = lax.ppermute(pid_ext[idx_high], AXIS, perm_plus)

            return state._replace(
                ghost_pos=jnp.stack([ghost_l_pos, ghost_r_pos]),
                ghost_pid=jnp.stack([ghost_l_pid, ghost_r_pid]),
                send_idx=jnp.stack([idx_low, idx_high]),
                overflow=state.overflow | over,
            )

        def refresh_ghosts(state: DDState):
            """Non-rebuild steps: same send sets, fresh positions."""
            ghost_r_pos = lax.ppermute(
                _gather_rows(state.pos, state.send_idx[0], [0.0, 0.0, 0.0]),
                AXIS, perm_minus)
            ghost_l_pos = lax.ppermute(
                _gather_rows(state.pos, state.send_idx[1], [0.0, 0.0, 0.0]),
                AXIS, perm_plus)
            return state._replace(
                ghost_pos=jnp.stack([ghost_l_pos, ghost_r_pos])
            )

        def sweep(state: DDState):
            xpos, xactive = combined(state)
            nl = build_neighbor_lists_stable(
                xpos, box, grid, rs, K, cap.cell, half=False,
                layout=cfg.layout, active=xactive,
            )
            return state._replace(
                idx=nl.idx,
                ref_pos=state.pos,
                n_rebuilds=state.n_rebuilds + 1,
                overflow=state.overflow | nl.overflow,
            )

        def rebuild(state: DDState):
            return sweep(halo_exchange(migrate(state)))

        def step(state: DDState, _):
            dt = cfg.dt
            vel = state.vel + jnp.float32(0.5 * dt) * state.force
            pos = box.wrap(state.pos + jnp.float32(dt) * vel)
            state = state._replace(pos=pos, vel=vel)

            valid = state.pid >= 0
            disp = box.min_image(pos - state.ref_pos)
            d2 = jnp.max(
                jnp.where(valid, jnp.sum(disp * disp, axis=-1), 0.0)
            )
            d2 = lax.pmax(d2, AXIS)
            need = 4.0 * d2 > jnp.float32(skin2)
            if cfg.rebuild_every_step:
                need = jnp.bool_(True)
            state = lax.cond(need, rebuild, refresh_ghosts, state)

            force, _ = forces(state)
            vel = state.vel + jnp.float32(0.5 * dt) * force
            return state._replace(vel=vel, force=force), None

        def unsqueeze(state):  # (1, ...) global shard view -> per-device
            return jax.tree.map(lambda a: a[0], state)

        def squeeze(state):
            return jax.tree.map(lambda a: a[None], state)

        spec = jax.sharding.PartitionSpec(AXIS)
        rep = jax.sharding.PartitionSpec()

        def make_run_chunk(nsteps: int):
            @jax.jit
            @functools.partial(
                jax.shard_map, mesh=self.mesh, in_specs=(spec,),
                out_specs=spec, check_vma=False,
            )
            def run_chunk_sm(state):
                state, _ = lax.scan(
                    step, unsqueeze(state), None, length=nsteps
                )
                return squeeze(state)

            return run_chunk_sm

        @jax.jit
        @functools.partial(
            jax.shard_map, mesh=self.mesh, in_specs=(spec,), out_specs=spec,
            check_vma=False,
        )
        def initial_build_sm(state):
            state = unsqueeze(state)
            state = rebuild(state)
            force, _ = forces(state)
            return squeeze(state._replace(force=force))

        @jax.jit
        @functools.partial(
            jax.shard_map, mesh=self.mesh, in_specs=(spec,),
            out_specs=(rep, rep), check_vma=False,
        )
        def energies_sm(state):
            state = unsqueeze(state)
            valid = state.pid >= 0
            ke = kinetic_energy(jnp.where(valid[:, None], state.vel, 0.0))
            _, pe = forces(state)
            return lax.psum(ke, AXIS), lax.psum(pe, AXIS)

        self._run_chunk_cache: dict[int, object] = {}
        self._make_run_chunk = make_run_chunk
        self._initial_build = initial_build_sm
        self._energies = energies_sm
        self._shapes = dict(cl=cl, gcap=gcap, M=M, K=K)

    def _run_chunk(self, state: DDState, nsteps: int) -> DDState:
        fn = self._run_chunk_cache.get(nsteps)
        if fn is None:
            fn = self._make_run_chunk(nsteps)
            self._run_chunk_cache[nsteps] = fn
        return fn(state)

    # ------------------------------------------------------------------ host
    def _scatter(self, system: System) -> DDState:
        """Host-side: distribute a global System into per-slab slot arrays."""
        cap = self.capacity
        cl, gcap, K = cap.local, cap.ghost, cap.neighbors
        M = cl + 2 * gcap
        pos = np.asarray(system.pos)
        vel = np.asarray(system.vel)
        pid = np.asarray(system.pid)
        slab = np.clip((pos[:, 0] / self.w).astype(np.int64), 0, self.p - 1)

        P = self.p
        g_pos = np.zeros((P, cl, 3), np.float32)
        g_vel = np.zeros((P, cl, 3), np.float32)
        g_pid = np.full((P, cl), -1, np.int32)
        for d in range(P):
            sel = np.nonzero(slab == d)[0]
            if len(sel) > cl:
                raise ValueError(
                    f"slab {d} holds {len(sel)} particles > capacity {cl}; "
                    "grow DDCapacity.local"
                )
            g_pos[d, : len(sel)] = pos[sel]
            g_vel[d, : len(sel)] = vel[sel]
            g_pid[d, : len(sel)] = pid[sel]

        z = np.zeros
        state = DDState(
            pos=g_pos,
            vel=g_vel,
            force=z((P, cl, 3), np.float32),
            pid=g_pid,
            ghost_pos=z((P, 2, gcap, 3), np.float32),
            ghost_pid=np.full((P, 2, gcap), -1, np.int32),
            send_idx=np.full((P, 2, gcap), cl, np.int32),
            idx=np.full((P, M, K), M, np.int32),
            ref_pos=g_pos.copy(),
            n_rebuilds=z((P,), np.int32),
            overflow=z((P,), bool),
        )
        from md_neighbor_list_tpu.parallel.mesh import slab_sharding

        sh = slab_sharding(self.mesh)
        return jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), sh), state)

    def gather(self, state: DDState) -> System:
        """Inverse of ``_scatter``: global System in original-pid order."""
        pid = np.asarray(state.pid).reshape(-1)
        keep = pid >= 0
        n = self.config.n
        assert keep.sum() == n, f"lost particles: {keep.sum()} != {n}"
        out = {}
        for name in ("pos", "vel", "force"):
            arr = np.asarray(getattr(state, name)).reshape(-1, 3)[keep]
            dst = np.empty((n, 3), np.float32)
            dst[pid[keep]] = arr
            out[name] = jnp.asarray(dst)
        return System(
            pos=out["pos"], vel=out["vel"], force=out["force"],
            pid=jnp.arange(n, dtype=jnp.int32),
        )

    def init(self, key=None) -> DDState:
        system, _ = init_lattice(
            self.config.n, self.config.rho, key, self.config.temperature
        )
        return self.build(system)

    def build(self, system: System) -> DDState:
        while True:
            state = self._initial_build(self._scatter(system))
            if not bool(np.any(np.asarray(state.overflow))):
                return state
            self.capacity = self.capacity.grown()
            self._compile()

    def run(self, state: DDState, nsteps: int, chunk: int = 100) -> DDState:
        done = 0
        while done < nsteps:
            this = min(chunk, nsteps - done)
            snapshot = state
            state = self._run_chunk(state, this)
            if bool(np.any(np.asarray(state.overflow))):
                # roll back, grow every capacity, redistribute, retry
                system = self.gather(snapshot)
                self.capacity = self.capacity.grown()
                self._compile()
                state = self.build(system)
                continue
            done += this
        return state

    def energies(self, state: DDState):
        return self._energies(state)
