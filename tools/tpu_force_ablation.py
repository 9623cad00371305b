"""Force-pass ablation (VERDICT r2 item 1): where do the hot kernel's
milliseconds go, and what would candidate-culling actually buy?

The merged half-sweep force kernel evaluates 5 offset rows x (mc, cap,
3cap) candidate lanes to find ~46 true neighbors per particle. Before
redesigning for candidate reduction, decompose the measured cost into:

  geometry+cutoff   (the counts kernel — the irreducible sweep floor)
  + LJ pair math    (reciprocal/NR/s6/f + 3 component products)
  + N3 reaction     (per-row sublane folds + 12 extra output channels)
  + roll re-homing  (XLA rolls of the reaction channels, outside the kernel)

by timing stripped kernel variants that share the production building
blocks (_pair_geom_static etc. — timing-only physics, not a correctness
path). Also times the window build and the full-sweep (9-row, no-reaction)
alternative for the half-vs-full trade.
"""
import argparse
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.ops import pallas_force
from md_neighbor_list_tpu.ops.pallas_force import (
    HALF_OFFSETS5, _fold_rxn, _pair_geom_static, _win_specs_merged,
    make_windows)
from md_neighbor_list_tpu.ops.dense_cells import (from_packed, make_spec,
                                                  rebuild_dense)

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=1_000_000)
ap.add_argument("--reps", type=int, default=10)
ap.add_argument("--cap", type=int, default=32)
args = ap.parse_args()

print(f"device: {jax.devices()[0]}  N={args.n} cap={args.cap}", flush=True)
system, box = init_lattice(args.n, 1.0, jax.random.PRNGKey(0), 1.0)
spec = make_spec(box, 2.8, cap=args.cap)
st = from_packed(system.pos, system.vel, system.pid, spec)
st, _ = rebuild_dense(st, spec, False)
v32 = st.valid().astype(jnp.float32)
mc, cap = spec.mc, spec.cap
RC = 2.5
reps = args.reps


def timed(name, fn):
    @jax.jit
    def chained(pos4):
        def body(i, acc):
            return acc + fn(pos4 + (i % 2).astype(jnp.float32) * 1e-6)
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))
    float(np.asarray(chained(st.pos)))
    t0 = time.perf_counter()
    float(np.asarray(chained(st.pos)))
    ms = (time.perf_counter() - t0) * 1e3 / reps
    print(f"{name:44s}: {ms:8.2f} ms", flush=True)
    return ms


def variant_kernel(*refs, mode: str, nsteps_nr: int = 2):
    """nsteps_nr: -1 = exact divide, 0/1/2 = approx reciprocal + NR."""
    """Stripped merged half-sweep: mode selects what survives.
      geom      r2p + cutoff count only (== counts kernel)
      lj        + LJ magnitude, own-only sum of f (no components)
      ljcomp    + 3 component products, own sums (no reaction)
      rxn       full production shape (own + 12 reaction channels)
    """
    nbr_refs = refs[:5]
    own_ref = refs[5]
    out_ref = refs[6]
    r2cut = jnp.float32(RC * RC)
    acc = None
    rxn_rows = []
    for i, (dz, dy) in enumerate(HALF_OFFSETS5):
        r2p, dxv, dyv, dzv = _pair_geom_static(
            nbr_refs[i], own_ref, dz, dy, spec, True)
        hit = r2p < r2cut
        if mode == "geom":
            term = [jnp.where(hit, 1.0, 0.0)]
        else:
            if nsteps_nr < 0:
                s2 = 1.0 / r2p
            else:
                s2 = pl.reciprocal(r2p, approx=True)
                for _ in range(nsteps_nr):
                    s2 = s2 * (2.0 - r2p * s2)
            s6 = s2 * s2 * s2
            f = jnp.where(hit, 24.0 * s6 * (2.0 * s6 - 1.0) * s2, 0.0)
            if mode == "lj":
                term = [f]
            else:
                term = [f * dxv, f * dyv, f * dzv]
        if mode == "rxn":
            rxn_rows.append([jnp.sum(t, axis=1) for t in term])
        acc = term if acc is None else [a + t for a, t in zip(acc, term)]
    own = [jnp.sum(a, axis=-1) for a in acc]
    if mode == "rxn":
        for k in range(1, 5):
            for c in range(3):
                out_ref[3 * k + c, 0] = -_fold_rxn(rxn_rows[k][c], mc, cap)
        for c in range(3):
            out_ref[c, 0] = own[c] - _fold_rxn(rxn_rows[0][c], mc, cap)
    else:
        for c, o in enumerate(own):
            out_ref[c, 0] = o


def run_variant(mode: str, nch: int, do_rolls: bool = False,
                nsteps_nr: int = 2):
    def fn(pos4):
        windows = make_windows(pos4, v32, spec)
        specs = _win_specs_merged(spec)
        out = pl.pallas_call(
            functools.partial(variant_kernel, mode=mode,
                              nsteps_nr=nsteps_nr),
            grid=(mc, mc),
            in_specs=specs + [specs[0]],
            out_specs=pl.BlockSpec(
                (nch, 1, mc, cap), lambda z, y: (0, z * mc + y, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (nch, spec.rows, mc, cap), jnp.float32),
        )(*([windows] * 5), windows)
        force = out[:3]
        if do_rolls:
            for k, (dz, dy) in enumerate(HALF_OFFSETS5):
                if k == 0:
                    continue
                r = out[3 * k:3 * k + 3].reshape(3, mc, mc, mc, cap)
                force = force + jnp.roll(r, (dz, dy), axis=(1, 2)).reshape(
                    3, spec.rows, mc, cap)
        return jnp.sum(force[0, 0, 0])
    return fn


timed("windows build only", lambda p: jnp.sum(
    make_windows(p, v32, spec)[0, 0, 0]))


def windows_cl(pos4, parked: bool):
    """Channel-leading window build (no transpose); parked=True assumes
    positions already carry parked values for invalid slots (maintainable
    at rebuild time: invalid slots have vel=0, so parked positions persist
    through integration)."""
    mc, cap, L = spec.mc, spec.cap, spec.L
    if parked:
        w3 = pos4
    else:
        slot_id = jnp.arange(spec.slots, dtype=jnp.float32).reshape(
            spec.rows, mc, cap)
        park = 1.0e5 + slot_id * jnp.float32(2.0 * spec.cell_size)
        w3 = jnp.where(v32[None] > 0.5, pos4, park[None])
    left = jnp.roll(w3, 1, axis=2)
    right = jnp.roll(w3, -1, axis=2)
    xcell = jnp.arange(mc)
    sh_m = jnp.where(xcell == 0, -L, 0.0).astype(jnp.float32)[None, :, None]
    sh_p = jnp.where(xcell == mc - 1, L, 0.0).astype(
        jnp.float32)[None, :, None]
    left = left.at[0].add(sh_m)
    right = right.at[0].add(sh_p)
    return jnp.concatenate([left, w3, right], axis=-1)  # (3, R, mc, 3cap)


timed("windows channel-leading (no transpose)",
      lambda p: jnp.sum(windows_cl(p, False)[0, 0, 0]))
timed("windows channel-leading + pre-parked",
      lambda p: jnp.sum(windows_cl(p, True)[0, 0, 0]))
timed("geom+cutoff (sweep floor)", run_variant("geom", 1))
timed("+ LJ magnitude (own scalar sum)", run_variant("lj", 1))
timed("+ 3 components, own sums (no rxn)", run_variant("ljcomp", 3))
timed("  (same, 1 Newton step)", run_variant("ljcomp", 3, nsteps_nr=1))
timed("  (same, exact divide)", run_variant("ljcomp", 3, nsteps_nr=-1))
timed("+ N3 reaction channels (kernel only)", run_variant("rxn", 15))
timed("+ roll re-homing (== production)", run_variant("rxn", 15, True))
timed("  production shape, 1 Newton step",
      run_variant("rxn", 15, True, nsteps_nr=1))
timed("  production shape, exact divide",
      run_variant("rxn", 15, True, nsteps_nr=-1))


def f_prod(pos4):
    f, _ = pallas_force.dense_forces_half(pos4, v32, spec, RC, False, False)
    return jnp.sum(f[0, 0, 0])


def f_full(pos4):
    f, _ = pallas_force.dense_forces(pos4, v32, spec, RC, False, False)
    return jnp.sum(f[0, 0, 0])


timed("production dense_forces_half", f_prod)
timed("full-sweep dense_forces (9 rows, no N3)", f_full)
print("DONE", flush=True)
