"""Expand-kernel DMA/sort ablation on the real chip (VERDICT r3 item 2):
the rebuild's ~8 ms expand floor is DMA-wait bound, so try

  split   — issue the window copy as nchan CONCURRENT per-channel DMAs
            (the default single (nchan, W) copy walks nchan strided
            bursts sequentially);
  fuse    — drop the key channel from the 8-payload sort (keys are
            recomputed bitwise in-kernel from the position channels):
            -1/8 sort payload AND -1/8 window DMA traffic;
  both    — the two combined.

Each variant is timed as the FULL rebuild chain (wrap + keys + sort +
row starts + expand, reps chained in one jit) and checked bitwise equal
to the baseline rebuild before its timing is trusted.

    python tools/tpu_expand_probe.py --n 1000000 [--reps 10]
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.ops.dense_cells import (from_packed, make_spec,
                                                  rebuild_dense)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cap", type=int, default=40)
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}  N={args.n} cap={args.cap}",
          flush=True)
    system, box = init_lattice(args.n, 1.0, jax.random.PRNGKey(0), 1.0)
    spec = make_spec(box, 2.8, cap=args.cap)
    st = from_packed(system.pos, system.vel, system.pid, spec)
    st, _ = rebuild_dense(st, spec, False)
    # drift off-lattice so the sort sees a production permutation
    st = st._replace(pos=st.pos + 0.05 * st.vel)

    ref, _ = rebuild_dense(st, spec, False)
    ref_pos = np.asarray(ref.pos)
    ref_pid = np.asarray(ref.pid)

    def timed(name, fuse, split):
        new, _ = rebuild_dense(st, spec, False, fuse, split)
        eq = (np.array_equal(np.asarray(new.pos), ref_pos)
              and np.array_equal(np.asarray(new.pid), ref_pid))

        @jax.jit
        def chained(state):
            def body(i, acc):
                s = state._replace(
                    pos=state.pos + (i % 2).astype(jnp.float32) * 1e-6)
                n, _ = rebuild_dense(s, spec, False, fuse, split)
                return acc + jnp.sum(n.pos[0, 0, 0])
            return jax.lax.fori_loop(0, args.reps, body,
                                     jnp.zeros((), jnp.float32))

        float(np.asarray(chained(st)))  # compile + warm
        t0 = time.perf_counter()
        float(np.asarray(chained(st)))
        ms = (time.perf_counter() - t0) * 1e3 / args.reps
        print(f"{name:22s}: {ms:7.2f} ms/rebuild  bitwise=={eq}",
              flush=True)
        return ms, eq

    results = {}
    results["baseline"] = timed("baseline (8ch, 1 DMA)", False, False)
    results["split"] = timed("split_dma (8ch)", False, True)
    results["fuse"] = timed("fuse_keys (7ch)", True, False)
    results["both"] = timed("fuse + split (7ch)", True, True)
    bad = [k for k, (_, eq) in results.items() if not eq]
    if bad:
        print(f"PARITY FAILURES: {bad}", flush=True)
        return 1
    best = min(results, key=lambda k: results[k][0])
    print(f"best: {best} ({results[best][0]:.2f} ms vs baseline "
          f"{results['baseline'][0]:.2f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
