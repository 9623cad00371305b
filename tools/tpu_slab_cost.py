"""Per-device slab step cost on the real chip (VERDICT r1 item 1's done
criterion: per-device cost within ~1.3x of the single-chip dense engine at
the same per-device N).

Only one chip exists here, so this measures ONE device's slab workload
(device 0 of a P-slab decomposition of an N = P x 1M box, ghost layer
included) against the single-chip cube at N = 1M, both at the SAME cap
(default 40: the cold-lattice configuration packs 4 lattice planes into
the anisotropic slab's widest z-cells — 36 per cell — so cap=32 would
truncate; production runs at this scale use cap=40 too). The collectives this
leaves out are two (3, mc, mc, cap) layer ppermutes per step — ~4 MB over
ICI per step, negligible next to the ~25 ms of kernel work they overlap.
"""
import argparse, sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

from md_neighbor_list_tpu.core.box import Box
from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.ops import pallas_force
from md_neighbor_list_tpu.ops.dense_cells import from_packed, make_spec, rebuild_dense
from md_neighbor_list_tpu.ops.slab_kernels import (slab_forces_half,
                                                   slab_keys,
                                                   slab_lists_half,
                                                   slab_sort_expand)
from md_neighbor_list_tpu.parallel.dense_slab import make_slab_spec

ap = argparse.ArgumentParser()
ap.add_argument("--per-device-n", type=int, default=1_000_000)
ap.add_argument("--p", type=int, default=8)
ap.add_argument("--cap", type=int, default=40)
ap.add_argument("--reps", type=int, default=10)
args = ap.parse_args()
P, CAP = args.p, args.cap
N = args.per_device_n * P

print(f"device: {jax.devices()[0]}  N={N} over P={P} (per-device "
      f"{args.per_device_n}), cap={CAP}", flush=True)

# ---- single-chip cube at per-device N -----------------------------------
system1, box1 = init_lattice(args.per_device_n, 1.0, jax.random.PRNGKey(0))
spec1 = make_spec(box1, 2.8, cap=CAP)
st1 = from_packed(system1.pos, system1.vel, system1.pid, spec1)
st1, _ = rebuild_dense(st1, spec1, False)
v1 = st1.valid().astype(jnp.float32)

# ---- device 0 of the P-slab decomposition --------------------------------
box = Box.from_density(N, 1.0)
sspec = make_slab_spec(box, 2.8, P, cap=CAP)
print(f"cube: mc={spec1.mc} cell={spec1.cell_size:.3f} | slab: mc={sspec.mc}"
      f" nz={sspec.nz} cell_xy={sspec.cell_size:.3f} cell_z={sspec.cell_z:.3f}",
      flush=True)
system, _ = init_lattice(N, 1.0, jax.random.PRNGKey(0))
pos = np.asarray(system.pos)
vel = np.asarray(system.vel)
pid = np.asarray(system.pid)
zedge = sspec.nz * sspec.cell_z
sel0 = pos[:, 2] < zedge  # device 0's slab
selg = (pos[:, 2] >= zedge) & (pos[:, 2] < zedge + sspec.cell_z)  # ghost
n0, ng = int(sel0.sum()), int(selg.sum())
print(f"slab-0 owns {n0} particles, ghost layer {ng}", flush=True)

# keys + sort_expand bin the owned set into the slab's dense rows
def to_dense(sel, spec, rows):
    n = int(sel.sum())
    slots = rows * spec.mc * spec.cap
    kposT = np.zeros((3, slots), np.float32)
    kposT[:, :n] = pos[sel].T
    kvelT = np.zeros((3, slots), np.float32)
    kvelT[:, :n] = vel[sel].T
    kpid = np.full((slots,), -1, np.int32)
    kpid[:n] = pid[sel]
    return (jnp.asarray(kposT), jnp.asarray(kvelT), jnp.asarray(kpid))

posT, velT, pidv = to_dense(sel0 | selg, sspec, sspec.rows)
keys = slab_keys(posT.reshape(3, sspec.rows, sspec.mc, sspec.cap),
                 pidv.reshape(sspec.rows, sspec.mc, sspec.cap) >= 0,
                 sspec, jnp.int32(0))
# owned + the ghost layer binned in one pass: ghost-layer records key to
# s = nz + 1 and drop out of the owned expand; bin them separately below
chans = tuple(posT[i] for i in range(3)) + tuple(velT[i] for i in range(3)) \
    + (pidv.astype(jnp.float32),)
own_state, _ = slab_sort_expand(keys.reshape(-1), chans, sspec, False)
kept = int(jnp.sum(own_state.pid >= 0))
assert kept == n0, (kept, n0)

# ghost layer: bin the ghost particles alone into ONE layer of rows by
# reusing slab keys with z0 at the ghost layer
gspec = make_slab_spec(box, 2.8, P * sspec.nz, cap=CAP)  # nz=1 spec
keys_g = slab_keys(posT.reshape(3, sspec.rows, sspec.mc, sspec.cap),
                   pidv.reshape(sspec.rows, sspec.mc, sspec.cap) >= 0,
                   gspec, jnp.int32(sspec.nz))
g_state, _ = slab_sort_expand(keys_g.reshape(-1), chans, gspec, False)
assert int(jnp.sum(g_state.pid >= 0)) == ng

ext_pos = jnp.concatenate([own_state.pos, g_state.pos], axis=1)
ext_valid = jnp.concatenate(
    [own_state.pid >= 0, g_state.pid >= 0], axis=0).astype(jnp.float32)


def timed(name, fn, x0):
    @jax.jit
    def chained(x):
        def body(i, acc):
            # the loop body must depend on i, or XLA hoists the whole
            # computation out of the fori_loop and the timing is a lie
            return acc + fn(x + (i % 2).astype(jnp.float32) * 1e-6)
        return jax.lax.fori_loop(0, args.reps, body,
                                 jnp.zeros((), jnp.float32))
    float(np.asarray(chained(x0)))
    t0 = time.perf_counter()
    float(np.asarray(chained(x0)))
    ms = (time.perf_counter() - t0) * 1e3 / args.reps
    print(f"{name:32s}: {ms:8.2f} ms", flush=True)
    return ms


def cube_force(x):
    f, _pe = pallas_force.dense_forces_half(x, v1, spec1, 2.5, False, False)
    return jnp.sum(f[0, 0, 0, 0])

def slab_force(x):
    f, seam, _pe = slab_forces_half(x, ext_valid, sspec, 2.5, False, False)
    return jnp.sum(f[0, 0, 0, 0]) + jnp.sum(seam[0, 0, 0])

def cube_lists(x):
    c, m = pallas_force.dense_lists_half(x, v1, spec1, 2.8, False)
    return jnp.sum(c).astype(jnp.float32) + m[0, 0, 0, 0, 0] * 0.0

def slab_lists(x):
    c, m = slab_lists_half(x, ext_valid, sspec, 2.8, False)
    return jnp.sum(c).astype(jnp.float32) + m[0, 0, 0, 0, 0] * 0.0

c_f = timed("cube force @ per-device N", cube_force, st1.pos)
s_f = timed("slab-device force (incl ghost)", slab_force, ext_pos)
c_l = timed("cube lists @ per-device N", cube_lists, st1.pos)
s_l = timed("slab-device lists (incl ghost)", slab_lists, ext_pos)
print(f"per-device overhead: force {s_f/c_f:.3f}x, lists {s_l/c_l:.3f}x",
      flush=True)

# ---- projected v5e-8 throughput (VERDICT r2 item 10) ---------------------
# Real multi-chip cannot run here (1 chip behind the tunnel); this is a
# PROJECTION from measured per-device kernel times + counted halo bytes +
# a stated ICI assumption, published as such in BASELINE.md.
import json

ICI_GBPS = 45.0  # assumed per-link ICI bandwidth, v5e 1-D ring, one
                 # direction (public v5e spec-sheet order of magnitude);
                 # each step's two layer ppermutes ride opposite links
layer_bytes = 3 * sspec.mc * sspec.mc * sspec.cap * 4  # (3, mc, mc, cap)
halo_ms = layer_bytes / (ICI_GBPS * 1e9) * 1e3  # per ppermute, per step
# per-step cost model, all per-device:
#   force pass (measured, incl ghost rows) + 2 layer ppermutes (position
#   refresh + Newton-3 seam return; NOT overlapped in the model — an upper
#   bound) + amortized rebuild: slab lists+rebuild every R_CADENCE steps
#   plus 6 boundary-layer ppermutes (pos+vel+pid both ways) at rebuild.
R_CADENCE = 25  # measured single-chip rebuild cadence at these params
rebuild_ms = s_l  # slab lists pass; sort+expand+exchange folded into the
                  # cadence-amortized term below via the cube measurement
sort_expand_ms = 14.5  # BASELINE.md phase table (cube, full sort)
rebuild_amort = (rebuild_ms + sort_expand_ms + 6 * halo_ms) / R_CADENCE
step_ms = s_f + 2 * halo_ms + rebuild_amort
proj = {
    "projected_steps_per_s_n8m_p8": round(1000.0 / step_ms, 2),
    "model": {
        "force_ms_measured": round(s_f, 2),
        "halo_ms_per_ppermute_at_45GBps": round(halo_ms, 3),
        "layer_bytes": layer_bytes,
        "rebuild_amortized_ms": round(rebuild_amort, 2),
        "rebuild_cadence_steps": R_CADENCE,
        "ici_gbps_assumed": ICI_GBPS,
        "no_compute_comm_overlap_assumed": True,
    },
}
print(json.dumps(proj), flush=True)
print("DONE", flush=True)
