"""Ceil-grouped list grid at the N=8M rung (VERDICT r4 item 4).

mc=71 is prime, so the round-4 G|mc gate ran the list pass on the per-row
merged grid: 71^2 = 5041 programs, ~12.6 ms of pure per-program fixed
cost at the measured ~2.5 us/program. The round-5 ceil grid (non-divisor
G, y-padded input with wrap-copy rows — ops/pallas_force._pad_rows_y)
makes grouping legal at any mc; this probe measures whether it WINS
(the ceil grid pays a padded-input copy + a padded-output slice that the
divisor grid doesn't).

Times dense list emission per variant as reps chained in one jit, after
a device-side BITWISE parity check of counts AND masks vs the merged
grid (the 1.7 GB mask artifact never crosses the tunnel). Variants that
fail to compile (the VMEM model is a heuristic; Mosaic's scoped-vmem
verdict is ground truth) are reported as COMPILE FAIL, not crashed past.

    python tools/tpu_lists8m_probe.py [--n 8000000] [--groups 2 3]
"""
from __future__ import annotations

import argparse
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.ops import pallas_force
from md_neighbor_list_tpu.ops.dense_cells import (from_packed, make_spec,
                                                  rebuild_dense)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_000_000)
    ap.add_argument("--cap", type=int, default=40)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--groups", type=int, nargs="+", default=[2, 3])
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}  N={args.n} cap={args.cap}",
          flush=True)
    system, box = init_lattice(args.n, 1.0, jax.random.PRNGKey(0), 1.0)
    spec = make_spec(box, 2.8, cap=args.cap)
    st = from_packed(system.pos, system.vel, system.pid, spec)
    st, _ = rebuild_dense(st, spec, False)
    st = st._replace(pos=st.pos + 0.05 * st.vel)
    st, _ = rebuild_dense(st, spec, False)  # production permutation
    print(f"mc={spec.mc} rows={spec.rows} "
          f"auto policy: G,nby={pallas_force._group_for_lists(spec)} "
          f"split={pallas_force._split_rows(spec, kind='lists')}",
          flush=True)

    def merged(pos4):
        return pallas_force.lists_half_impl(
            pos4, spec, (spec.mc, spec.mc),
            pallas_force._state_specs_merged(spec), 2.8, True, False)

    def parity_fn(g, nby):
        @jax.jit
        def p(pos4):
            c1, m1 = merged(pos4)
            c2, m2 = pallas_force.lists_half_grouped(pos4, spec, g, 2.8,
                                                     False, nby)
            return jnp.all(c1 == c2) & jnp.all(m1 == m2)
        return p

    def timed(name, fn):
        @jax.jit
        def chained(state):
            def body(i, acc):
                s = state._replace(
                    pos=state.pos + (i % 2).astype(jnp.float32) * 1e-6)
                c, m = fn(s.pos)
                return (acc + jnp.sum(c).astype(jnp.float32)
                        + m[0, 0, 0, 0, 0].astype(jnp.float32) * 0.0)
            return jax.lax.fori_loop(0, args.reps, body,
                                     jnp.zeros((), jnp.float32))

        float(np.asarray(chained(st)))  # compile + warm
        t0 = time.perf_counter()
        float(np.asarray(chained(st)))
        ms = (time.perf_counter() - t0) * 1e3 / args.reps
        print(f"{name:24s}: {ms:8.2f} ms/pass", flush=True)
        return ms

    results = {"merged": timed("merged (per-row grid)", merged)}
    for g in args.groups:
        nby = (spec.mc // g if spec.mc % g == 0
               else pallas_force._group_ceil_nby(spec.mc, g))
        name = f"grouped G={g} nby={nby}"
        fn = functools.partial(pallas_force.lists_half_grouped, spec=spec,
                               G=g, radius=2.8, interpret=False, nby=nby)
        wrapped = lambda pos4, fn=fn: fn(pos4)
        try:
            eq = bool(np.asarray(parity_fn(g, nby)(st.pos)))
        except Exception as e:  # noqa: BLE001 — Mosaic verdict, report
            print(f"{name:24s}: COMPILE FAIL "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
            continue
        if not eq:
            print(f"{name:24s}: PARITY FAIL — not timed as a lever",
                  flush=True)
            continue
        results[name] = timed(name + " [bitwise==True]", wrapped)
    best = min(results, key=results.get)
    print(f"best: {best} ({results[best]:.2f} ms vs merged "
          f"{results['merged']:.2f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
