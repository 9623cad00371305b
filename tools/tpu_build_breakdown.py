"""Per-phase cost breakdown of the neighbor-list build on the real TPU:
sort+expand (rebuild), the one-pass list kernel, counts-only, and the
half-sweep force pass — at each --n. Feeds COMPONENTS.md's cost table."""
import argparse, sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.ops import pallas_force
from md_neighbor_list_tpu.ops.dense_cells import (from_packed, make_spec,
                                                  rebuild_dense)
from md_neighbor_list_tpu.ops.incremental import rebuild_dense_incremental

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=1_000_000)
ap.add_argument("--reps", type=int, default=10)
ap.add_argument("--cap", type=int, default=40)
ap.add_argument("--phases", action="store_true",
                help="also decompose the rebuild into keys / sort / "
                "row-starts / expand sub-phases (differences of "
                "cumulative timings)")
args = ap.parse_args()

print(f"device: {jax.devices()[0]}  N={args.n} cap={args.cap}", flush=True)
system, box = init_lattice(args.n, 1.0, jax.random.PRNGKey(0), 1.0)
spec = make_spec(box, 2.8, cap=args.cap)
st = from_packed(system.pos, system.vel, system.pid, spec)
st, _ = rebuild_dense(st, spec, False)
v32 = st.valid().astype(jnp.float32)
reps = args.reps


def timed(name, fn):
    @jax.jit
    def chained(state):
        def body(i, acc):
            s = state._replace(
                pos=state.pos + (i % 2).astype(jnp.float32) * 1e-6
            )
            return acc + fn(s)
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))
    float(np.asarray(chained(st)))
    t0 = time.perf_counter()
    float(np.asarray(chained(st)))
    ms = (time.perf_counter() - t0) * 1e3 / reps
    print(f"{name:28s}: {ms:8.2f} ms", flush=True)
    return ms


def f_rebuild(s):
    new, _ = rebuild_dense(s, spec, False)
    return jnp.sum(new.pos[0, 0, 0])

# incremental rebuild is timed on a state drifted by the skin/2 ballistic
# bound — the mover load a production rebuild actually sees (the 1e-6
# perturbation used for the other rows is a zero-mover workload for it)
_v2 = jnp.sum(st.vel * st.vel, axis=0)
_tau = jnp.float32(0.15) / jnp.sqrt(jnp.max(_v2))

def f_rebuild_inc(s):
    drifted = s._replace(pos=s.pos + _tau * s.vel)
    new, inc_of = rebuild_dense_incremental(drifted, spec, False)
    kept = jnp.sum((new.pid >= 0).astype(jnp.int32))
    return (jnp.sum(new.pos[0, 0, 0]) + kept.astype(jnp.float32)
            + inc_of.astype(jnp.float32) * 1e9)

def f_lists(s):
    c, m = pallas_force.dense_lists_half(s.pos, v32, spec, 2.8, False)
    return jnp.sum(c).astype(jnp.float32) + m[0, 0, 0, 0, 0] * 0.0

def f_counts(s):
    return jnp.sum(
        pallas_force.dense_counts_half(s.pos, v32, spec, 2.8, False)
    ).astype(jnp.float32)

def f_force(s):
    f, _ = pallas_force.dense_forces_half(s.pos, v32, spec, 2.5, False,
                                          False)
    return jnp.sum(f[0, 0, 0, 0])

def f_build(s):
    new, _ = rebuild_dense(s, spec, False)
    c, m = pallas_force.dense_lists_half(
        new.pos, new.valid().astype(jnp.float32), spec, 2.8, False)
    return jnp.sum(c).astype(jnp.float32) + m[0, 0, 0, 0, 0] * 0.0

# one-off mover-load diagnostic at the drifted state
from md_neighbor_list_tpu.ops.dense_cells import cell_keys
from md_neighbor_list_tpu.ops.incremental import own_cell_keys
_drift = st._replace(pos=jnp.mod(st.pos + _tau * st.vel,
                                 jnp.float32(spec.L)))
_k = cell_keys(_drift, spec)
_movers = int(np.asarray(jnp.sum(
    (st.valid() & (_k != own_cell_keys(spec))).astype(jnp.int32))))
print(f"movers at skin/2 drift: {_movers} "
      f"({100.0 * _movers / args.n:.1f}% of N)", flush=True)

if args.phases:
    from jax import lax

    from md_neighbor_list_tpu.ops import dense_cells as dc

    def _keyed(s):
        s2 = s._replace(pos=jnp.mod(s.pos, jnp.float32(spec.L)))
        keys = dc._flat(dc.cell_keys(s2, spec))
        chans = tuple(dc._flat(s2.pos[i]) for i in range(3)) + tuple(
            dc._flat(s2.vel[i]) for i in range(3)
        ) + (dc._flat(s2.pid).astype(jnp.float32),)
        return keys, chans

    def f_keys(s):
        keys, chans = _keyed(s)
        return keys[0].astype(jnp.float32) + sum(c[0] for c in chans)

    def f_sort(s):
        keys, chans = _keyed(s)
        out = lax.sort((keys,) + chans, dimension=0, num_keys=1)
        return out[0][0].astype(jnp.float32) + sum(o[0] for o in out[1:])

    def f_rowstarts(s):
        keys, chans = _keyed(s)
        out = lax.sort((keys,) + chans, dimension=0, num_keys=1)
        rs = dc._row_starts(out[0], spec)
        return (rs[0] + rs[-1]).astype(jnp.float32) + sum(
            o[0] for o in out[1:])

    timed("rebuild phase: wrap+keys", f_keys)
    timed("rebuild phase: +8-payload sort", f_sort)
    timed("rebuild phase: +row starts", f_rowstarts)
    # full rebuild minus the +row-starts row = concat + expand kernel

timed("rebuild (sort+expand)", f_rebuild)
timed("rebuild INCREMENTAL (drifted)", f_rebuild_inc)
timed("half lists (masks+counts)", f_lists)
timed("half counts only", f_counts)
timed("half+N3 force pass", f_force)
timed("full build (rebuild+lists)", f_build)
print("DONE", flush=True)
