"""Probe two untried structural savings in the per-step force pass.

The force-pass ablation (tools/tpu_force_ablation.py) decomposed the
production half-sweep into geometry / LJ / reaction-channel / roll-re-homing
legs and established a VPU-issue-bound kernel core. Two costs live OUTSIDE
the kernel core and were never isolated as removable:

1. roll re-homing (~2.8 ms/step at N=1M): the kernel returns each offset
   row's Newton-3 reaction on its OWN row's output channels, computed FOR
   row (z+dz, y+dy); the caller re-homes with jnp.roll over two axes of a
   (3, mc, mc, mc, cap) array — XLA materializes the rotated copies. The
   probe variant instead gives every offset row its own output ARRAY whose
   BlockSpec index_map writes the block directly at the partner row
   ((z+dz) % mc) * mc + (y+dy) % mc — a bijection per offset, so no program
   writes a block twice — and the caller only SUMS the five arrays.

2. the windows transpose (~2.9 ms/step): make_windows transposes the
   channel-leading state (3, R, mc, cap) into the row-major window layout
   (R, 3, mc, 3cap) every call. If the STATE were held row-major
   (R, 3, mc, cap) between rebuilds (forces can be emitted row-major for
   free by reshaping the output block), the window build is just
   park-select + two sublane rolls + a lane concat.

Timing-only variants (production building blocks, not a correctness path);
adopt into ops/pallas_force.py only what measures a real win.
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
    HALF_OFFSETS5, _fold_rxn, _force_half_kernel, _pair_geom_static,
    _win_specs_merged, make_windows)
from md_neighbor_list_tpu.ops.dense_cells import (from_packed, make_spec,
                                                  rebuild_dense)

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=1_000_000)
ap.add_argument("--cap", type=int, default=40)
ap.add_argument("--reps", type=int, default=10)
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


def timed(name, fn, arg):
    @jax.jit
    def chained(a):
        def body(i, acc):
            return acc + fn(a + (i % 2).astype(jnp.float32) * 1e-6)
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))
    float(np.asarray(chained(arg)))
    t0 = time.perf_counter()
    out = float(np.asarray(chained(arg)))
    ms = (time.perf_counter() - t0) * 1e3 / reps
    print(f"{name:46s}: {ms:8.2f} ms   (acc {out:.6e})", flush=True)
    return ms, out


# ---- 1. windows build: transpose vs row-major state ----------------------

# pre-parked row-major state: what the engine would hold between rebuilds
park3 = jnp.stack([
    jnp.broadcast_to(
        jnp.float32(1e5)
        + (jnp.arange(mc, dtype=jnp.float32)[None, :, None] * cap
           + jnp.arange(cap, dtype=jnp.float32)[None, None, :])
        * jnp.float32(2 * spec.cell_size),
        (spec.rows, mc, cap)),
    jnp.broadcast_to(
        jnp.float32(1e5)
        + jnp.arange(spec.rows, dtype=jnp.float32)[:, None, None]
        * jnp.float32(2 * spec.cell_size), (spec.rows, mc, cap)),
    jnp.broadcast_to(jnp.float32(1e5), (spec.rows, mc, cap)),
])
pos_parked = jnp.where(v32[None] > 0.5, st.pos, park3)  # (3, R, mc, cap)
pos_rm = jax.jit(lambda p: jnp.transpose(p, (1, 0, 2, 3)))(pos_parked)


def windows_rowmajor(prm):
    """(R, 3, mc, cap) pre-parked row-major state -> (R, 3, mc, 3cap)."""
    L = jnp.float32(spec.L)
    left = jnp.roll(prm, 1, axis=2)
    right = jnp.roll(prm, -1, axis=2)
    xcell = jnp.arange(mc)
    sh_m = jnp.where(xcell == 0, -L, 0.0).astype(jnp.float32)[:, None]
    sh_p = jnp.where(xcell == mc - 1, L, 0.0).astype(jnp.float32)[:, None]
    left = left.at[:, 0].add(sh_m)
    right = right.at[:, 0].add(sh_p)
    return jnp.concatenate([left, prm, right], axis=-1)


timed("windows: production (transpose+park)",
      lambda p: jnp.sum(make_windows(p, v32, spec)[0, 0, 0]), st.pos)
timed("windows: row-major pre-parked state",
      lambda p: jnp.sum(windows_rowmajor(p)[0, 0, 0]), pos_rm)

# parity of the two window builds (park fold is identical)
w_a = make_windows(st.pos, v32, spec)
w_b = windows_rowmajor(pos_rm)
assert bool(jnp.all(w_a == w_b)), "row-major windows differ"
print("windows parity: bitwise equal", flush=True)


# ---- 2. reaction re-homing: XLA rolls vs shifted output index_maps -------

def _rehome_kernel(*refs, want_pe=False):
    """Production _force_half_kernel math with per-offset output arrays:
    out[0] = own row force (incl. the (0,0) reaction), out[k] = offset k's
    reaction block, written AT THE PARTNER ROW by the BlockSpec index_map."""
    nbr_refs = refs[:5]
    own_ref = refs[5]
    out_refs = refs[6:]
    r2cut = jnp.float32(RC * RC)
    acc = None
    rxn_rows = []
    for i, (dz, dy) in enumerate(HALF_OFFSETS5):
        r2p, dxv, dyv, dzv = _pair_geom_static(
            nbr_refs[i], own_ref, dz, dy, spec, True)
        hit = r2p < r2cut
        s2 = pl.reciprocal(r2p, approx=True)
        s2 = s2 * (2.0 - r2p * s2)
        s2 = s2 * (2.0 - r2p * s2)
        s6 = s2 * s2 * s2
        f = jnp.where(hit, 24.0 * s6 * (2.0 * s6 - 1.0) * s2, 0.0)
        px, py, pz = f * dxv, f * dyv, f * dzv
        rxn_rows.append([jnp.sum(px, axis=1), jnp.sum(py, axis=1),
                         jnp.sum(pz, axis=1)])
        acc = ([px, py, pz] if acc is None
               else [a + p for a, p in zip(acc, [px, py, pz])])
    own = [jnp.sum(a, axis=-1) for a in acc]
    for c in range(3):
        out_refs[0][c, 0] = own[c] - _fold_rxn(rxn_rows[0][c], mc, cap)
    for k in range(1, 5):
        for c in range(3):
            out_refs[k][c, 0] = -_fold_rxn(rxn_rows[k][c], mc, cap)


def force_rehomed(windows):
    specs = _win_specs_merged(spec)
    out_specs, out_shapes = [], []
    for dz, dy in HALF_OFFSETS5:
        def m(z, y, dz=dz, dy=dy):
            return (0, ((z + dz) % mc) * mc + ((y + dy) % mc), 0, 0)
        out_specs.append(pl.BlockSpec((3, 1, mc, cap), m,
                                      memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((3, spec.rows, mc, cap), jnp.float32))
    outs = pl.pallas_call(
        _rehome_kernel,
        grid=(mc, mc),
        in_specs=specs + [specs[0]],
        out_specs=out_specs,
        out_shape=out_shapes,
    )(*([windows] * 5), windows)
    f = outs[0]
    for o in outs[1:]:
        f = f + o
    return f


def force_production(pos4):
    f, _ = pallas_force.dense_forces_half(pos4, v32, spec, RC, False, False)
    return jnp.sum(f[0, 0, 0])


timed("force: production (rolls re-homing)", force_production, st.pos)
timed("force: rehomed out-spec, prod windows",
      lambda p: jnp.sum(force_rehomed(make_windows(p, v32, spec))[0, 0, 0]),
      st.pos)
timed("force: rehomed + row-major windows",
      lambda p: jnp.sum(force_rehomed(windows_rowmajor(p))[0, 0, 0]),
      pos_rm)

# parity: rehomed must equal production bitwise (same adds, same order:
# f = own + k1 + k2 + k3 + k4 in HALF_OFFSETS5 order both ways)
f_prod, _ = pallas_force.dense_forces_half(st.pos, v32, spec, RC, False,
                                           False)
f_new = force_rehomed(w_a)
d = float(jnp.max(jnp.abs(f_prod - f_new)))
print(f"force parity rehomed vs production: max |d| = {d:.3e}", flush=True)
