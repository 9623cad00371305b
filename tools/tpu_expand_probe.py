"""Expand-kernel DMA/sort ablation on the real chip (VERDICT r3 item 2,
re-designed tile-legal in round 5 after VERDICT r4 weak-1: the round-4
per-CHANNEL window split sliced 1/7 sublanes of the records matrix and
Mosaic's 8-sublane tiling rejected both variants on hardware):

  split K — issue the window copy as K CONCURRENT lane-chunk DMAs, each
            covering all 8 record rows over W/K lanes (the default
            single (8, W) copy is 8 strided HBM bursts one DMA engine
            walks sequentially; chunking puts several in flight);
  fuse    — drop the key channel read (keys are recomputed bitwise
            in-kernel from the position channels). The sort still
            carries the identical 8 operands and the window DMA still
            copies 8 rows (tile alignment), so the only saving is the
            dropped f32 key conversion + the unread sorted-key row.
  both    — fuse + split 4 combined.

Each variant is timed as the FULL rebuild chain (wrap + keys + sort +
row starts + expand, reps chained in one jit) and checked bitwise equal
(pos AND vel AND pid — ADVICE r4: vel goes through the same
redistribute path) to the baseline rebuild before its timing is trusted.

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

jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.ops.dense_cells import (from_packed, make_spec,
                                                  rebuild_dense)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cap", type=int, default=40)
    ap.add_argument("--blocked-only", action="store_true",
                    help="time only baseline vs the blocked layout")
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

    def timed(name, fuse, split, blocked=False):
        new, _ = rebuild_dense(st, spec, False, fuse, split, blocked)
        # device-side bitwise compare (pos AND vel AND pid — ADVICE r4);
        # host fetches of the 60 MB state crawl at tunnel speed
        eq = bool(np.asarray(jax.jit(
            lambda a, b: jnp.all(a.pos == b.pos) & jnp.all(a.vel == b.vel)
            & jnp.all(a.pid == b.pid))(new, ref)))

        @jax.jit
        def chained(state):
            def body(i, acc):
                s = state._replace(
                    pos=state.pos + (i % 2).astype(jnp.float32) * 1e-6)
                n, _ = rebuild_dense(s, spec, False, fuse, split, blocked)
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
    results["baseline"] = timed("baseline (1 DMA)", False, 0)
    if not args.blocked_only:
        results["split2"] = timed("split_dma K=2", False, 2)
        results["split4"] = timed("split_dma K=4", False, 4)
        results["split8"] = timed("split_dma K=8", False, 8)
        results["fuse"] = timed("fuse_keys", True, 0)
        results["both"] = timed("fuse + split4", True, 4)
    results["blocked"] = timed("blocked (tile-contig)", False, 0, True)
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
