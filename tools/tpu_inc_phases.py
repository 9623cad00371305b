"""Phase decomposition of the incremental rebuild (why is it not ~6 ms?).

Times cumulative prefixes of the incremental pipeline on a skin/2-drifted
state: keys+stay mask | + sentinel sort | + row starts | + narrow expand |
+ merge kernel (full path for reference). Each prefix is fenced by a
scalar that depends on everything computed so far.
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.ops.dense_cells import (_flat, _row_starts,
                                                  cell_keys, from_packed,
                                                  make_spec, rebuild_dense,
                                                  sort_expand)
from md_neighbor_list_tpu.ops import incremental as inc
from md_neighbor_list_tpu.ops.incremental import (MOVER_G, MOVER_WINDOW,
                                                  own_cell_keys, _merge)
from jax import lax

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=1_000_000)
ap.add_argument("--cap", type=int, default=32)
ap.add_argument("--reps", type=int, default=10)
ap.add_argument("--uniform", action="store_true",
                help="uniform random positions (melted-liquid mover load) "
                "instead of the cold lattice")
args = ap.parse_args()

print(f"device: {jax.devices()[0]}  N={args.n} cap={args.cap}", flush=True)
system, box = init_lattice(args.n, 1.0, jax.random.PRNGKey(0), 1.0)
spec = make_spec(box, 2.8, cap=args.cap)
if args.uniform:
    pos = jax.random.uniform(jax.random.PRNGKey(7), (args.n, 3),
                             jnp.float32, 0.0, box.L)
    system = system._replace(pos=pos)
st = from_packed(system.pos, system.vel, system.pid, spec)
st, _ = rebuild_dense(st, spec, False)

_v2 = jnp.sum(st.vel * st.vel, axis=0)
_tau = jnp.float32(0.15) / jnp.sqrt(jnp.max(_v2))
drifted = st._replace(pos=jnp.mod(st.pos + _tau * st.vel,
                                  jnp.float32(spec.L)))
_k = cell_keys(drifted, spec)
movers = int(np.asarray(jnp.sum(
    (st.valid() & (_k != own_cell_keys(spec))).astype(jnp.int32))))
print(f"movers: {movers} ({100.0 * movers / args.n:.2f}% of N)", flush=True)


def timed(name, fn):
    @jax.jit
    def chained(state):
        def body(i, acc):
            s = state._replace(
                pos=state.pos + (i % 2).astype(jnp.float32) * 1e-6)
            return acc + fn(s)
        return jax.lax.fori_loop(0, args.reps, body,
                                 jnp.zeros((), jnp.float32))
    float(np.asarray(chained(drifted)))
    t0 = time.perf_counter()
    float(np.asarray(chained(drifted)))
    ms = (time.perf_counter() - t0) * 1e3 / args.reps
    print(f"{name:42s}: {ms:8.2f} ms", flush=True)
    return ms


def p_keys(s):
    s = s._replace(pos=jnp.mod(s.pos, jnp.float32(spec.L)))
    keys = cell_keys(s, spec)
    stay = s.valid() & (keys == own_cell_keys(spec))
    mk = jnp.where(s.valid() & ~stay, keys, jnp.int32(spec.ncells))
    return jnp.sum(mk.astype(jnp.float32)) * 1e-9 + jnp.sum(
        stay.astype(jnp.float32)) * 1e-9


def mover_chans(s):
    s = s._replace(pos=jnp.mod(s.pos, jnp.float32(spec.L)))
    keys = cell_keys(s, spec)
    stay = s.valid() & (keys == own_cell_keys(spec))
    mk = jnp.where(s.valid() & ~stay, keys, jnp.int32(spec.ncells))
    chans = tuple(_flat(s.pos[i]) for i in range(3)) + tuple(
        _flat(s.vel[i]) for i in range(3)
    ) + (_flat(s.pid).astype(jnp.float32),)
    return mk, chans, stay


def p_sort(s):
    mk, chans, _ = mover_chans(s)
    out = lax.sort((_flat(mk),) + chans, dimension=0, num_keys=1)
    return out[1][0] + out[0][-1].astype(jnp.float32)


def p_rowstart(s):
    mk, chans, _ = mover_chans(s)
    out = lax.sort((_flat(mk),) + chans, dimension=0, num_keys=1)
    rs_ = _row_starts(out[0], spec)
    return out[1][0] + jnp.sum(rs_.astype(jnp.float32)) * 1e-9


def p_expand(s):
    mk, chans, _ = mover_chans(s)
    mov, rs_ = sort_expand(_flat(mk), chans, spec, False,
                           group=MOVER_G, window=MOVER_WINDOW)
    return (jnp.sum(mov.pos[0, 0, 0]) +
            jnp.sum((mov.pid >= 0).astype(jnp.float32)))


def p_full_inc(s):
    new, of = inc.rebuild_dense_incremental(s, spec, False)
    return (jnp.sum(new.pos[0, 0, 0])
            + jnp.sum((new.pid >= 0).astype(jnp.float32))
            + of.astype(jnp.float32) * 1e9)


def p_full_rebuild(s):
    new, _ = rebuild_dense(s, spec, False)
    return jnp.sum(new.pos[0, 0, 0])


def p_merge_only(s):
    # merge with a PRECOMPUTED mover state: isolates the merge kernel
    mk, chans, stay = mover_chans(s)
    s2 = s._replace(pos=jnp.mod(s.pos, jnp.float32(spec.L)))
    mov, _ = sort_expand(_flat(mk), chans, spec, False,
                         group=MOVER_G, window=MOVER_WINDOW)
    # _merge takes the stayer-MASKED pid (leavers/empties -> -1), not the
    # 0/1 stay mask — passing the mask made every slot look like a stayer
    # and timed a degenerate all-stayer merge (review fix).
    merged = _merge(s2, jnp.where(stay, s2.pid, -1), mov, spec, False)
    return (jnp.sum(merged.pos[0, 0, 0])
            + jnp.sum((merged.pid >= 0).astype(jnp.float32)))


timed("keys + stay mask", p_keys)
timed("+ sentinel 8-payload sort", p_sort)
timed("+ row starts", p_rowstart)
timed("+ narrow expand", p_expand)
timed("+ merge (== full incremental)", p_merge_only)
timed("rebuild_dense_incremental (prod)", p_full_inc)
timed("full rebuild (reference)", p_full_rebuild)
print("DONE", flush=True)
