"""Hardware breadth probes — reproduce the round-3 BASELINE.md rows that
go beyond the validate_tpu ladder (density sweep, minimum grids, the
production-length NVE run, and the P=1 DD program throughput).

    python tools/tpu_breadth_probe.py --densities   # rho=0.5/0.8/1.2 @16k
    python tools/tpu_breadth_probe.py --min-grid    # mc=3/4 on real Mosaic
    python tools/tpu_breadth_probe.py --long-run    # 10k NVE steps @ N=1M
    python tools/tpu_breadth_probe.py --dd-p1       # P=1 slab steps/s @ 1M
    python tools/tpu_breadth_probe.py --all

Each probe prints measured lines; density/min-grid exit nonzero on any
parity mismatch. Run one probe per process on the axon relay (SURVEY.md
§6.2 environment notes; tools/tpu_session.py isolates sessions).
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

import jax.numpy as jnp
import numpy as np


def _artifact_parity(sim, carry, cfg):
    """(pairs, oracle_pairs, popcount_ok) for the engine's list artifact on
    a fresh rebuild of ``carry``'s state."""
    from md_neighbor_list_tpu.ops import oracle, pallas_force
    from md_neighbor_list_tpu.ops.dense_cells import to_packed

    new, counts, masks, total = sim._rebuild_and_lists(carry.state)
    pop = pallas_force.mask_slot_counts(masks, sim.spec.cap)
    vm = new.valid()
    pop_ok = bool(jnp.all(jnp.where(vm, pop == counts, True)))
    pos, _ = to_packed(new, cfg.n, sim.spec.L)
    want = int(oracle.pair_count(jnp.asarray(pos), sim.box, cfg.rs))
    return int(np.asarray(total)), want, pop_ok


def densities() -> bool:
    """List-artifact parity vs oracle at rho=0.5/0.8/1.2, off-lattice
    (50 steps); rho=1.2 exercises the cap-growth path on hardware."""
    from md_neighbor_list_tpu.core.config import MDConfig
    from md_neighbor_list_tpu.models.dense_lj import DenseSimulator

    ok = True
    for rho in (0.5, 0.8, 1.2):
        cfg = MDConfig(n=16384, rho=rho, dt=0.001, temperature=1.0)
        sim = DenseSimulator(cfg, cap=56)
        c = sim.run(sim.init(jax.random.PRNGKey(0)), 50, chunk=50)
        got, want, pop_ok = _artifact_parity(sim, c, cfg)
        ok &= (got == want) and pop_ok
        print(f"rho={rho} mc={sim.spec.mc} cap={sim.cap} pairs={got} "
              f"oracle={want} exact={got == want} popcount_ok={pop_ok}",
              flush=True)
    return ok


def min_grid() -> bool:
    """mc=3/4 minimum grids through the real Mosaic kernels: every roll
    wraps and 3cap lanes cross the 128-lane tile boundary (CPU twins:
    tests/test_dense.py minimum-grid tests)."""
    from md_neighbor_list_tpu.core.config import MDConfig
    from md_neighbor_list_tpu.models.dense_lj import DenseSimulator

    ok = True
    for n, rho, cap in ((700, 1.0, 48), (1800, 1.0, 48), (400, 0.6, 40)):
        cfg = MDConfig(n=n, rho=rho, rc=2.5, skin=0.3, dt=0.001,
                       temperature=1.0)
        sim = DenseSimulator(cfg, cap=cap, kernel_impl="pallas")
        c = sim.run(sim.init(jax.random.PRNGKey(0)), 10, chunk=10)
        got, want, pop_ok = _artifact_parity(sim, c, cfg)
        ok &= (got == want) and pop_ok
        print(f"n={n} rho={rho} mc={sim.spec.mc} cap={sim.cap} pairs={got} "
              f"oracle={want} exact={got == want} popcount_ok={pop_ok}",
              flush=True)
    return ok


def long_run() -> None:
    """Production-length stability: 10k NVE steps at N=1M cap=40 with
    drift/rebuild/throughput checkpoints every few thousand steps."""
    from md_neighbor_list_tpu.core.config import MDConfig
    from md_neighbor_list_tpu.models.dense_lj import DenseSimulator

    cfg = MDConfig(n=1_000_000, dt=0.001, temperature=1.0)
    sim = DenseSimulator(cfg, cap=40)
    c = sim.init(jax.random.PRNGKey(0))
    ke0, pe0 = sim.energies(c)
    e0 = float(ke0) + float(pe0)
    done = 0
    for tgt in (1000, 2000, 5000, 10000):
        t1 = time.time()
        c = sim.run(c, tgt - done, chunk=200)
        ke, pe = sim.energies(c)
        w = time.time() - t1
        drift = abs(float(ke) + float(pe) - e0) / abs(e0)
        print(f"steps={tgt} drift={drift:.3e} "
              f"rebuilds={int(np.asarray(c.n_rebuilds))} "
              f"window_steps_per_s={(tgt - done) / w:.1f} "
              f"overflow={bool(np.asarray(c.overflow))}", flush=True)
        done = tgt


def long_run_8m(steps: int = 5000) -> bool:
    """Scale-ladder closure (VERDICT r3 item 4): a 5k-step NVE run at the
    N=8M rung, cap=40 — the 1M rung already has a 10k-step row; this gives
    the 8M rung the same long-horizon evidence (drift gate 1e-4, regrow
    count reported). Checkpoint targets derive from ``steps`` (ADVICE r4:
    the fixed ladder left ``drift`` unbound for steps < 500 and gated on
    the last LADDER value rather than the last completed window)."""
    from md_neighbor_list_tpu.core.config import MDConfig
    from md_neighbor_list_tpu.models.dense_lj import DenseSimulator

    cfg = MDConfig(n=8_000_000, dt=0.001, temperature=1.0)
    sim = DenseSimulator(cfg, cap=40)
    t0 = time.time()
    c = sim.init(jax.random.PRNGKey(0))
    ke0, pe0 = sim.energies(c)
    e0 = float(ke0) + float(pe0)
    print(f"init+first energies {time.time() - t0:.1f}s  E0={e0:.6e} "
          f"cap={sim.spec.cap} mc={sim.spec.mc}", flush=True)
    done = 0
    drift = 0.0
    cap_seen = sim.spec.cap
    targets = sorted({t for t in (500, 1000, 2500, steps)
                      if 0 < t <= steps})
    for tgt in targets:
        t1 = time.time()
        c = sim.run(c, tgt - done, chunk=100)
        ke, pe = sim.energies(c)
        w = time.time() - t1
        drift = abs(float(ke) + float(pe) - e0) / abs(e0)
        regrew = sim.spec.cap != cap_seen
        cap_seen = sim.spec.cap
        print(f"steps={tgt} drift={drift:.3e} "
              f"rebuilds={int(np.asarray(c.n_rebuilds))} "
              f"window_steps_per_s={(tgt - done) / w:.1f} cap={cap_seen} "
              f"regrew={regrew} overflow={bool(np.asarray(c.overflow))}",
              flush=True)
        done = tgt
    ok = bool(done) and drift <= 1e-4
    print(f"8M long-run gate (|dE/E| <= 1e-4 over {done} steps): "
          f"{'PASS' if ok else 'FAIL'} ({drift:.3e})", flush=True)
    return ok


def dd_p1() -> None:
    """Measured throughput of the FULL shard_map DD program (P=1 self-halo)
    at N=1M — the end-to-end cost of the distributed program structure on
    one real chip (BASELINE.md 'DD program throughput' row)."""
    from md_neighbor_list_tpu.core.config import MDConfig
    from md_neighbor_list_tpu.parallel.dense_slab import DenseSlabSimulator

    cfg = MDConfig(n=1_000_000, dt=0.001, temperature=1.0, mesh_devices=1)
    t0 = time.time()
    sim = DenseSlabSimulator(cfg, cap=40)
    state = sim.run(sim.init(jax.random.PRNGKey(0)), 200, chunk=200)  # warm
    print(f"init+warm {time.time() - t0:.1f}s spec mc={sim.spec.mc} "
          f"nz={sim.spec.nz} cap={sim.cap}", flush=True)
    ws = []
    for w in range(5):
        t1 = time.time()
        state = sim.run(state, 200, chunk=200)
        _ = int(np.asarray(state.n_rebuilds)[0])  # host fetch = the fence
        ws.append(time.time() - t1)
        print(f"window {w}: {ws[-1]:.2f}s", flush=True)
    # lower-half-median stall rejection (bench.py timed_windows, r5:
    # anchored on the fastest half so majority stalls cannot poison it)
    lo = sorted(ws)[: (len(ws) + 1) // 2]
    anchor = float(np.median(lo))
    ws_ok = sorted(t for t in ws if t <= 1.5 * anchor)
    med = ws_ok[len(ws_ok) // 2]
    print(f"P=1 dense_slab N=1M steps/s median: {200 / med:.2f} "
          f"({len(ws_ok)}/5 un-stalled; windows {[round(t, 2) for t in ws]}; "
          f"overflow={bool(np.asarray(state.overflow).any())})", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--densities", action="store_true")
    ap.add_argument("--min-grid", action="store_true")
    ap.add_argument("--long-run", action="store_true")
    ap.add_argument("--long-run-8m", action="store_true")
    ap.add_argument("--dd-p1", action="store_true")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()
    if not any((args.densities, args.min_grid, args.long_run, args.dd_p1,
                args.long_run_8m, args.all)):
        ap.error("pick at least one probe (or --all)")
    ok = True
    if args.densities or args.all:
        ok &= densities()
    if args.min_grid or args.all:
        ok &= min_grid()
    if args.long_run or args.all:
        long_run()
    if args.long_run_8m:  # deliberate ~25 min run — NOT part of --all;
        ok &= long_run_8m()  # composes with other flags (ADVICE r4)
    if args.dd_p1 or args.all:
        dd_p1()
    print("ALL OK" if ok else "GATE FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
