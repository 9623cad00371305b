"""The LJ/NVE simulator: Verlet-list reuse + fully jitted step loop (R9, R11).

Reference capability (SURVEY.md §3 R9/R11, §4.4, §5.2; BASELINE.json:9): a
velocity-Verlet NVE loop whose neighbor list is reused across steps and
rebuilt only when ``2 * max_displacement > skin`` — the conservative
criterion under which no pair can cross into rc undetected.

TPU-native structure (SURVEY.md §5.3): the *entire* step — half-kick, drift,
wrap, rebuild predicate, ``lax.cond`` rebuild (bin + sweep), force, half-kick
— is one jitted computation; ``run()`` scans whole chunks of steps on device
and the host touches only the overflow flag between chunks. Capacity overflow
triggers the re-jit protocol: restore the pre-chunk snapshot, grow
capacities, recompile, re-run — never silently truncate (SURVEY.md §4.3).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from md_neighbor_list_tpu.core.box import Box
from md_neighbor_list_tpu.core.capacity import Capacity, estimate
from md_neighbor_list_tpu.core.config import MDConfig
from md_neighbor_list_tpu.core.system import System, init_lattice, init_random
from md_neighbor_list_tpu.ops import lj
from md_neighbor_list_tpu.ops.binning import CellGrid, make_grid
from md_neighbor_list_tpu.ops.integrate import drift, half_kick, kinetic_energy
from md_neighbor_list_tpu.ops.pairlist import build_neighbor_lists


class NeighborState(NamedTuple):
    """Verlet-list state (SURVEY.md §3 R9): padded rows + the reference
    positions they were built at, plus device-side capacity telemetry."""

    idx: jnp.ndarray  # (N, K) i32, sorted-space rows
    ref_pos: jnp.ndarray  # (N, 3) positions at build time
    max_count: jnp.ndarray  # () i32
    cell_max: jnp.ndarray  # () i32
    overflow: jnp.ndarray  # () bool — sticky across steps within a chunk
    n_rebuilds: jnp.ndarray  # () i32


class Carry(NamedTuple):
    system: System
    nbr: NeighborState


class Simulator:
    """Builds and owns the jitted step/rebuild/energy functions for one
    configuration. Hashable statics (box, grid, capacities, flags) are bound
    via closure so XLA specializes fully."""

    def __init__(self, config: MDConfig, capacity: Capacity | None = None):
        self.config = config
        self.box = Box.from_density(config.n, config.rho)
        self.grid: CellGrid = make_grid(self.box, config.rs)
        if capacity is None:
            capacity = estimate(
                rho=config.rho,
                rs=config.rs,
                cell_size=self.grid.cell_size,
                half_list=config.half_list,
            )
            if config.neighbor_capacity is not None:
                capacity = Capacity(
                    neighbors=config.neighbor_capacity,
                    cell=capacity.cell if config.cell_capacity is None
                    else config.cell_capacity,
                )
        self.capacity = capacity
        if config.backend == "pallas":
            raise ValueError(
                "backend='pallas' is the dense engine — use "
                "models.dense_lj.DenseSimulator (bench.py selects it "
                "automatically)"
            )
        self._compile()

    # ------------------------------------------------------------------ build
    def _compile(self) -> None:
        cfg = self.config
        box, grid, cap = self.box, self.grid, self.capacity

        def do_rebuild(system: System, n_rebuilds) -> Carry:
            pos_sorted, nl = build_neighbor_lists(
                system.pos, box, grid, cfg.rs, cap.neighbors, cap.cell,
                cfg.half_list, cfg.layout,
            )
            system = System(
                pos=pos_sorted,
                vel=system.vel[nl.perm],
                force=system.force[nl.perm],
                pid=system.pid[nl.perm],
            )
            nbr = NeighborState(
                idx=nl.idx,
                ref_pos=pos_sorted,
                max_count=nl.max_count,
                cell_max=nl.cell_max,
                overflow=nl.overflow,
                n_rebuilds=n_rebuilds + 1,
            )
            return Carry(system, nbr)

        def forces(system: System, nbr: NeighborState):
            return lj.forces_energy(
                system.pos, nbr.idx, box, cfg.rc, cfg.half_list
            )

        def step(carry: Carry, _):
            system, nbr = carry
            vel = half_kick(system.vel, system.force, cfg.dt)
            pos = drift(system.pos, vel, cfg.dt, box)
            system = system._replace(pos=pos, vel=vel)

            disp = box.min_image(pos - nbr.ref_pos)
            d2max = jnp.max(jnp.sum(disp * disp, axis=-1))
            need = (4.0 * d2max > jnp.float32(cfg.skin * cfg.skin))
            if cfg.rebuild_every_step:
                need = jnp.bool_(True)

            sticky = nbr.overflow
            carry = lax.cond(
                need,
                lambda s, nb: do_rebuild(s, nb.n_rebuilds),
                lambda s, nb: Carry(s, nb),
                system, nbr,
            )
            system, nbr = carry
            nbr = nbr._replace(overflow=nbr.overflow | sticky)

            force, _ = forces(system, nbr)
            vel = half_kick(system.vel, force, cfg.dt)
            return Carry(system._replace(vel=vel, force=force), nbr), None

        @functools.partial(jax.jit, static_argnums=1)
        def run_chunk(carry: Carry, nsteps: int) -> Carry:
            carry, _ = lax.scan(step, carry, None, length=nsteps)
            return carry

        @jax.jit
        def rebuild_only(system: System) -> Carry:
            """Bin + sweep only — the benchmarked list-build op
            (BASELINE.md row 1)."""
            return do_rebuild(system, jnp.zeros((), jnp.int32))

        @jax.jit
        def initial_build(system: System) -> Carry:
            carry = do_rebuild(system, jnp.zeros((), jnp.int32))
            force, _ = forces(carry.system, carry.nbr)
            return Carry(carry.system._replace(force=force), carry.nbr)

        @jax.jit
        def energies(carry: Carry):
            _, pe = forces(carry.system, carry.nbr)
            return kinetic_energy(carry.system.vel), pe

        @jax.jit
        def thermo(carry: Carry):
            """(KE, PE, W): kinetic, shifted potential, total pair virial
            W = sum over pairs of dr . F — the inputs of the instantaneous
            pressure P = (2*KE + W) / (3*V)."""
            pe, w = lj.pe_virial(
                carry.system.pos, carry.nbr.idx, box, cfg.rc, cfg.half_list
            )
            return kinetic_energy(carry.system.vel), pe, w

        self._run_chunk = run_chunk
        self._initial_build = initial_build
        self._rebuild_only = rebuild_only
        self._energies = energies
        self._thermo = thermo
        # raw (un-jitted) single step, exposed for embedding/compile checks
        self.step_fn = lambda carry: step(carry, None)[0]

    # ------------------------------------------------------------------- API
    def init(self, key=None, lattice: bool = True) -> Carry:
        """Create and neighbor-build an initial state; grows capacity until
        the initial build fits (the init-time face of the overflow
        protocol)."""
        cfg = self.config
        if lattice:
            system, _ = init_lattice(cfg.n, cfg.rho, key, cfg.temperature)
        else:
            assert key is not None
            system, _ = init_random(key, cfg.n, cfg.rho, cfg.temperature)
        return self.build(system)

    def build(self, system: System) -> Carry:
        while True:
            carry = self._initial_build(system)
            if not bool(carry.nbr.overflow):
                return carry
            self._grow()

    def _grow(self) -> None:
        self.capacity = self.capacity.grown()
        self._compile()

    def run(self, carry: Carry, nsteps: int, chunk: int = 100) -> Carry:
        """Advance ``nsteps`` steps. Device-side chunks of ``chunk`` steps;
        between chunks the host checks the sticky overflow flag and, on
        overflow, rolls back to the pre-chunk snapshot, grows capacity,
        re-jits, rebuilds, and retries (SURVEY.md §5.3 overflow policy)."""
        done = 0
        while done < nsteps:
            this = min(chunk, nsteps - done)
            snapshot = carry
            carry = self._run_chunk(carry, this)
            if bool(carry.nbr.overflow):
                self._grow()
                carry = self.build(snapshot.system)
                continue
            done += this
        return carry

    def energies(self, carry: Carry):
        """(kinetic, potential) — jitted diagnostic (SURVEY.md §6.2 NVE
        drift gate)."""
        return self._energies(carry)

    def thermo(self, carry: Carry):
        """(KE, PE, W): kinetic, shifted potential, total pair virial."""
        return self._thermo(carry)

    def pressure(self, carry: Carry) -> float:
        """Instantaneous virial pressure P = (2*KE + W) / (3*V) in reduced
        units (V = L^3)."""
        ke, _, w = self._thermo(carry)
        vol = float(self.box.L) ** 3
        return float((2.0 * ke + w) / (3.0 * vol))
