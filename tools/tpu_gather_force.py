"""Gather-force ablation (VERDICT r2 item 1, option (c)): would a
rebuild-time candidate compaction beat the zero-gather sweep?

The dense force pass evaluates 5x3cap candidate lanes per slot (~600 at
cap=40) to find ~46 true neighbors — ~8% hit rate, and the force-ablation
tool showed ~8.4 ms of that is the masked geometry sweep. The alternative
the reference family uses everywhere on CPU/GPU is candidate COMPACTION:
decode the mask artifact once per rebuild into padded (N, K) index rows
(ops.decode.masks_to_padded — one gather per rebuild), then run the
per-step force as a row gather over ~K=48 true candidates instead of the
600-lane sweep.

The per-step cost of that design is exactly ``ops.lj.forces_energy`` on
those rows (the xla engine's force path): an (N, K, 3) position gather +
masked LJ + (half lists) a segment_sum Newton-3 scatter. This tool times
it at N=1M on hardware, in the same chained-fori / single-fetch protocol
as the sweep ablation, so the two designs are directly comparable:

  half rows   gather + LJ + segment_sum scatter   (K ~ 48)
  full rows   gather + LJ, no scatter             (K ~ 64, 2x pairs)
  gather only the (N, K, 3) row gather by itself  (the HBM floor)

If these land above the sweep's ~20.6 ms, option (c) is dead on TPU for
the measured reason (sub-transaction-granularity HBM gathers + scatter),
not by assertion; if below, the engine should adopt compaction.
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

if "--cpu" in sys.argv:  # smoke mode: stay off the relay entirely
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.ops import lj, pallas_force
from md_neighbor_list_tpu.ops.decode import masks_to_padded
from md_neighbor_list_tpu.ops.dense_cells import (from_packed, make_spec,
                                                  rebuild_dense)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cap", type=int, default=40)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--chunks", type=int, nargs="+",
                    default=[8192, 32768, 131072])
    ap.add_argument("--cpu", action="store_true",
                    help="smoke mode on the CPU backend (handled at import)")
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}  N={args.n} cap={args.cap}",
          flush=True)
    system, box = init_lattice(args.n, 1.0, jax.random.PRNGKey(0), 1.0)
    spec = make_spec(box, 2.8, cap=args.cap)
    st = from_packed(system.pos, system.vel, system.pid, spec)
    st, _ = rebuild_dense(st, spec, args.cpu)
    valid = st.valid().astype(jnp.float32)
    counts, masks = pallas_force.dense_lists_half(st.pos, valid, spec, 2.8,
                                                  args.cpu)
    n = args.n
    t0 = time.time()
    idx_h, cnt_h = masks_to_padded(masks, st.pid, spec, n=n)
    print(f"decode+padded rows: {time.time() - t0:.1f}s  "
          f"K_half={idx_h.shape[1]}  pairs={int(cnt_h.sum())}", flush=True)

    # Symmetrized full rows from the same pair set (no scatter needed).
    idx_f, cnt_f = masks_to_padded(masks, st.pid, spec, n=n, full=True)
    k_full = idx_f.shape[1]
    print(f"K_full={k_full}  mean full count={cnt_f.mean():.1f}", flush=True)

    pos = jnp.asarray(np.asarray(system.pos, np.float32))
    idx_h_d = jnp.asarray(idx_h)
    idx_f_d = jnp.asarray(idx_f)
    reps = args.reps

    def timed(name, fn, *arrs):
        @jax.jit
        def chained(pos, *arrs):
            def body(i, acc):
                p = pos + (i % 2).astype(jnp.float32) * 1e-6
                return acc + fn(p, *arrs)
            return jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros((), jnp.float32))
        float(np.asarray(chained(pos, *arrs)))  # compile
        t0 = time.perf_counter()
        float(np.asarray(chained(pos, *arrs)))
        ms = (time.perf_counter() - t0) * 1e3 / reps
        print(f"{name:52s}: {ms:8.2f} ms", flush=True)
        return ms

    for chunk in args.chunks:
        def half_fn(p, idx, chunk=chunk):
            f, e = lj.forces_energy(p, idx, box, 2.5, True, chunk=chunk)
            return jnp.sum(f) + e
        timed(f"half rows K={idx_h.shape[1]} (gather+LJ+scatter) "
              f"chunk={chunk}", half_fn, idx_h_d)

    for chunk in args.chunks:
        def full_fn(p, idx, chunk=chunk):
            f, e = lj.forces_energy(p, idx, box, 2.5, False, chunk=chunk)
            return jnp.sum(f) + e
        timed(f"full rows K={k_full} (gather+LJ, no scatter) chunk={chunk}",
              full_fn, idx_f_d)

    # The HBM floor: the (N, K, 3) row gather alone, nothing else.
    chunk = args.chunks[0]
    npad = ((n + chunk - 1) // chunk) * chunk

    def gather_only(p, idx):
        pg = jnp.concatenate([p, jnp.zeros((1, 3), p.dtype)], axis=0)
        ip = jnp.pad(idx, ((0, npad - n), (0, 0)), constant_values=n)

        def body(ci, acc):
            c = jax.lax.dynamic_slice_in_dim(ip, ci * chunk, chunk)
            return acc + jnp.sum(pg[jnp.minimum(c, n)])
        return jax.lax.fori_loop(0, npad // chunk, body,
                                 jnp.zeros((), jnp.float32))

    timed(f"gather only (N,K,3) half rows chunk={chunk}", gather_only,
          idx_h_d)
    timed(f"gather only (N,K,3) full rows chunk={chunk}", gather_only,
          idx_f_d)


if __name__ == "__main__":
    main()
