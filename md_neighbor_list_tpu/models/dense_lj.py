"""DenseSimulator — the Pallas-kernel LJ/NVE engine (configs C3/C4 fast
path; SURVEY.md §9 M3).

Same simulation contract as ``models.lj_nve.Simulator`` (velocity Verlet,
displacement-triggered rebuilds, overflow rollback + re-jit growth) but the
particle state lives in the dense cell-block layout (ops/dense_cells.py) and
the hot ops are Pallas kernels (ops/pallas_force.py):

  step:   kick -> drift/wrap -> rebuild vote -> lax.cond(sort+expand) ->
          dense cell-pair force kernel -> kick          (one jitted scan)
  Verlet reuse: between rebuilds the *binning* is reused — cell size >= rs
  guarantees every rc-pair stays inside the stale 27-neighborhood while
  2*max_disp <= skin (SURVEY.md §4.4, recast for cluster sweeps).

On non-TPU backends the Pallas calls can run in interpreter mode or be
swapped for the bit-compatible jnp reference (ops/dense_ref.py) —
``kernel_impl`` selects, tests exercise both.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from md_neighbor_list_tpu.core.box import Box
from md_neighbor_list_tpu.core.config import MDConfig
from md_neighbor_list_tpu.core.system import System, init_lattice, init_random
from md_neighbor_list_tpu.ops import dense_ref, pallas_force
from md_neighbor_list_tpu.ops.dense_cells import (DenseSpec, DenseState,
                                                  from_packed, grow_cap,
                                                  make_spec, rebuild_dense,
                                                  to_packed)
from md_neighbor_list_tpu.ops.incremental import rebuild_dense_incremental


class DenseCarry(NamedTuple):
    state: DenseState
    force: jnp.ndarray  # (3, R, mc, cap)
    ref_pos: jnp.ndarray  # (3, R, mc, cap)
    n_rebuilds: jnp.ndarray  # () i32
    overflow: jnp.ndarray  # () bool (sticky)


def _default_impl() -> str:
    return "pallas" if jax.default_backend() != "cpu" else "jnp"


class DenseSimulator:
    """LJ/NVE on the dense cell layout. kernel_impl: 'pallas' (TPU),
    'interpret' (Pallas interpreter), or 'jnp' (dense_ref, CPU tests)."""

    def __init__(self, config: MDConfig, cap: int = 40,
                 kernel_impl: str | None = None,
                 incremental: bool = False):
        self.config = config
        self.box = Box.from_density(config.n, config.rho)
        self.cap = cap
        self.kernel_impl = kernel_impl or _default_impl()
        if self.kernel_impl not in ("pallas", "interpret", "jnp"):
            raise ValueError(f"unknown kernel_impl {self.kernel_impl!r}")
        # incremental rebuild (ops/incremental.py): sort only cell-changers,
        # merge into the standing binning; falls back to the full sort in-
        # graph when the mover stream overflows its narrow window.
        # DEFAULT OFF — measured SLOWER than the full rebuild at N=1M
        # (19.6 vs 16.2 ms, tools/tpu_inc_phases.py): the full path's cost
        # is dominated by size-bound floors the incremental path also pays
        # (keys ~3, sentinel sort ~2.6, row starts ~2.4, expand's
        # window-width-INDEPENDENT ~7 ms floor) plus its own ~3 ms merge.
        # Kept as a tested, documented dead end (COMPONENTS.md round-3
        # notes); the jnp reference engine always uses the full path.
        self.incremental = incremental and self.kernel_impl != "jnp"
        self._compile()

    # ---------------------------------------------------------------- build
    def _compile(self) -> None:
        cfg = self.config
        spec = make_spec(self.box, cfg.rs, self.cap)
        self.spec = spec
        impl = self.kernel_impl
        interp = impl == "interpret"
        n = cfg.n
        fL = jnp.float32(spec.L)

        def forces(state: DenseState, want_pe: bool = False):
            """(force, pe_slots) with pe attributed ONCE per pair: total
            PE = sum(pe_slots * valid). The jnp reference sweeps the full
            symmetric neighborhood (each pair twice), so its pe is halved
            here; the Pallas path is the half-sweep Newton-3 kernel."""
            if impl == "jnp":
                f, pe = dense_ref.sweep_reference(
                    state, spec, cfg.rc, want_forces=True
                )
                return f, 0.5 * pe
            valid = state.valid().astype(jnp.float32)
            return pallas_force.dense_forces_half(
                state.pos, valid, spec, cfg.rc, interp, want_pe
            )

        def rebuild_state(state: DenseState) -> DenseState:
            if impl == "jnp":
                return dense_ref.rebuild_reference(state, spec)
            if not self.incremental:
                return rebuild_dense(state, spec, interp)[0]
            inc, inc_of = rebuild_dense_incremental(state, spec, interp)
            # mover-window overflow -> the full sort path, in-graph
            return lax.cond(
                inc_of,
                lambda s: rebuild_dense(s, spec, interp)[0],
                lambda s: inc,
                state,
            )

        def do_rebuild(carry: DenseCarry) -> DenseCarry:
            state = rebuild_state(carry.state)
            kept = jnp.sum(state.valid().astype(jnp.int32))
            return carry._replace(
                state=state,
                ref_pos=state.pos,
                n_rebuilds=carry.n_rebuilds + 1,
                overflow=carry.overflow | (kept != n),
            )

        def step(carry: DenseCarry, _):
            state = carry.state
            dt = jnp.float32(cfg.dt)
            vel = state.vel + 0.5 * dt * carry.force
            # UNWRAPPED drift: positions are wrapped only inside the rebuild
            # so the stale-bin pre-shift geometry stays exact across the
            # periodic boundary (see rebuild_dense docstring).
            pos = state.pos + dt * vel
            state = state._replace(pos=pos, vel=vel)
            carry = carry._replace(state=state)

            # unwrapped coords make the displacement an exact difference
            disp = pos - carry.ref_pos
            d2 = jnp.sum(disp * disp, axis=0)  # (R, mc, cap)
            d2max = jnp.max(jnp.where(state.valid(), d2, 0.0))
            need = 4.0 * d2max > jnp.float32(cfg.skin * cfg.skin)
            if cfg.rebuild_every_step:
                need = jnp.bool_(True)
            carry = lax.cond(need, do_rebuild, lambda c: c, carry)

            force, _ = forces(carry.state)
            vel = carry.state.vel + 0.5 * dt * force
            state = carry.state._replace(vel=vel)
            return carry._replace(state=state, force=force), None

        @functools.partial(jax.jit, static_argnums=1)
        def run_chunk(carry: DenseCarry, nsteps: int) -> DenseCarry:
            carry, _ = lax.scan(step, carry, None, length=nsteps)
            return carry

        @jax.jit
        def initial_build(state: DenseState) -> DenseCarry:
            zero = jnp.zeros_like(state.pos)
            carry = DenseCarry(
                state=state,
                force=zero,
                ref_pos=state.pos,
                n_rebuilds=jnp.zeros((), jnp.int32),
                overflow=jnp.zeros((), bool),
            )
            carry = do_rebuild(carry)
            force, _ = forces(carry.state)
            return carry._replace(force=force)

        @jax.jit
        def energies(carry: DenseCarry):
            v = carry.state.valid()
            ke = 0.5 * jnp.sum(
                jnp.where(v[None], carry.state.vel, 0.0) ** 2
            )
            _, pe_slots = forces(carry.state, want_pe=True)
            pe = jnp.sum(jnp.where(v, pe_slots, 0.0))
            return ke, pe

        @jax.jit
        def thermo(carry: DenseCarry):
            """(KE, PE, W): kinetic energy, shifted potential and total
            pair virial W = sum over pairs of dr . F_pair — the inputs of
            the instantaneous pressure P = (2*KE + W) / (3*V)."""
            v = carry.state.valid()
            ke = 0.5 * jnp.sum(
                jnp.where(v[None], carry.state.vel, 0.0) ** 2
            )
            if impl == "jnp":
                _, pe_s, w_s = dense_ref.sweep_reference(
                    carry.state, spec, cfg.rc, True, want_virial=True
                )
                half = jnp.float32(0.5)  # full sweep counts each pair twice
            else:
                valid = carry.state.valid().astype(jnp.float32)
                pe_s, w_s = pallas_force.dense_pe_virial(
                    carry.state.pos, valid, spec, cfg.rc, interp
                )
                half = jnp.float32(1.0)
            pe = half * jnp.sum(jnp.where(v, pe_s, 0.0))
            w = half * jnp.sum(jnp.where(v, w_s, 0.0))
            return ke, pe, w

        @jax.jit
        def rebuild_and_lists(state: DenseState):
            """The timed neighbor-list build (BASELINE.md row 1): bin +
            sort + expand + the one-pass half-list kernel emitting the
            complete artifact — packed cluster bitmasks AND half counts
            (total pairs = sum of counts over valid slots)."""
            if impl == "jnp":
                # jnp twin sweeps the full symmetric neighborhood: per-slot
                # counts are FULL (each pair at both partners), total pairs
                # = sum / 2; no mask artifact on this path.
                new = dense_ref.rebuild_reference(state, spec)
                counts = dense_ref.sweep_reference(
                    new, spec, cfg.rs, want_forces=False
                )
                masks = None
                total = jnp.sum(jnp.where(new.valid(), counts, 0)) // 2
            else:
                new = rebuild_state(state)
                counts, masks = pallas_force.dense_lists_half(
                    new.pos, new.valid().astype(jnp.float32), spec, cfg.rs,
                    interp,
                )
                total = jnp.sum(jnp.where(new.valid(), counts, 0))
            return new, counts, masks, total

        @jax.jit
        def init_full(key) -> DenseCarry:
            """The whole lattice cold start — lattice + Maxwell velocities
            + park + first rebuild + first forces — as ONE compiled
            program. The eager path (init_lattice -> from_packed ->
            initial_build as separate dispatches) pays one relay/compile
            round-trip per small op: ~200 s of the measured N=1M cold
            start was that chain, not the three big program compiles
            (round-5 cold-start decomposition, BASELINE.md). One program
            = one persistent-cache entry = one dispatch."""
            system, _ = init_lattice(cfg.n, cfg.rho, key, cfg.temperature)
            state = from_packed(system.pos, system.vel, system.pid, spec)
            return initial_build(state)

        self._run_chunk = run_chunk
        self._initial_build = initial_build
        self._init_full = init_full
        self._energies = energies
        self._thermo = thermo
        self._rebuild_and_lists = rebuild_and_lists
        self.step_fn = lambda carry: step(carry, None)[0]

    # ------------------------------------------------------------------ API
    def init(self, key=None, lattice: bool = True) -> DenseCarry:
        cfg = self.config
        if key is None:
            key = jax.random.PRNGKey(0)
        if not lattice:
            system, _ = init_random(key, cfg.n, cfg.rho, cfg.temperature)
            return self.build(system)
        # lattice path: one fused program (see _init_full) with the same
        # overflow-growth retry protocol as build(). The N-vs-slots check
        # is done HERE (same arithmetic from_packed would raise on) rather
        # than by catching ValueError around the jit call: the trace
        # covers the whole fused program, so a broad except would misread
        # any unrelated ValueError as "grow cap" and loop forever on a
        # cap-independent error (round-5 review finding).
        while True:
            if cfg.n > self.spec.slots:
                self.cap = grow_cap(self.cap)
                self._compile()
                continue
            carry = self._init_full(key)
            if not bool(np.asarray(carry.overflow)):
                return carry
            self.cap = grow_cap(self.cap)
            self._compile()

    def build(self, system: System) -> DenseCarry:
        while True:
            try:
                state = from_packed(system.pos, system.vel, system.pid,
                                    self.spec)
            except ValueError:  # N > total dense slots: grow cap + retry
                self.cap = grow_cap(self.cap)
                self._compile()
                continue
            carry = self._initial_build(state)
            if not bool(np.asarray(carry.overflow)):
                return carry
            self.cap = grow_cap(self.cap)
            self._compile()

    def run(self, carry: DenseCarry, nsteps: int, chunk: int = 100) -> DenseCarry:
        done = 0
        while done < nsteps:
            this = min(chunk, nsteps - done)
            snapshot = carry
            carry = self._run_chunk(carry, this)
            if bool(np.asarray(carry.overflow)):
                pos, vel = to_packed(snapshot.state, self.config.n, self.spec.L)
                system = System(
                    pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                    force=jnp.zeros_like(jnp.asarray(pos)),
                    pid=jnp.arange(self.config.n, dtype=jnp.int32),
                )
                self.cap = grow_cap(self.cap)
                self._compile()
                carry = self.build(system)
                continue
            done += this
        return carry

    def energies(self, carry: DenseCarry):
        return self._energies(carry)

    def thermo(self, carry: DenseCarry):
        """(KE, PE, W): kinetic, shifted potential, total pair virial."""
        return self._thermo(carry)

    def pressure(self, carry: DenseCarry) -> float:
        """Instantaneous virial pressure P = (2*KE + W) / (3*V) in reduced
        units (V = L^3) — the standard second MD observable next to the
        energies (SURVEY.md §4.5's LJ force contracted with dr)."""
        ke, _, w = self._thermo(carry)
        vol = float(self.spec.L) ** 3
        return float((2.0 * ke + w) / (3.0 * vol))

    def to_system(self, carry: DenseCarry):
        """(pos, vel, force) packed in pid order — host-side, tests only."""
        pos, vel = to_packed(carry.state, self.config.n, self.spec.L)
        import numpy as _np

        pid = _np.asarray(carry.state.pid).reshape(-1)
        keep = pid >= 0
        f = _np.stack(
            [_np.asarray(carry.force[i]).reshape(-1)[keep] for i in range(3)],
            -1,
        )
        force = _np.empty_like(f)
        force[pid[keep]] = f
        return pos, vel, force
