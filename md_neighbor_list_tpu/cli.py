"""CLI / validation driver — the L5 layer (SURVEY.md §2.2, §3 R12/D4).

The reference's main() initializes N particles, runs each variant, times it
and cross-checks pair counts (SURVEY.md §5.1). This driver does the same
over the rebuilt engines:

  python -m md_neighbor_list_tpu --preset c3_verlet --steps 500
  python -m md_neighbor_list_tpu --preset c1_brute --check-parity
  python -m md_neighbor_list_tpu --n 100000 --engine dense --save state.npz

Engines: ``xla`` (padded-list Simulator), ``dense`` (Pallas cell-block
engine), ``slab`` (multi-device domain decomposition). Emits JSON-lines
metrics (SURVEY.md §7.5) on stderr and a summary on stdout.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="md_neighbor_list_tpu")
    ap.add_argument("--preset", default="c3_verlet",
                    help="c1_brute|c2_cell|c3_verlet|c4_sorted|c5_dd")
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--dt", type=float, default=None)
    ap.add_argument("--temperature", type=float, default=None)
    ap.add_argument("--mesh-devices", type=int, default=None,
                    help="slab count for the DD engines (c5 preset: 8; "
                    "1 = self-halo mode on a single chip)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--engine", default="auto",
                    choices=["auto", "xla", "dense", "slab", "dense_slab"])
    ap.add_argument("--check-parity", action="store_true",
                    help="pair-count + force parity vs the O(N^2) oracle")
    ap.add_argument("--compare", action="store_true",
                    help="reference-driver mode (SURVEY.md §5.1): run the "
                    "xla AND dense engines on one initial state, "
                    "cross-check each engine's own pair count and forces, "
                    "time both")
    ap.add_argument("--save", default=None, help="checkpoint path (.npz)")
    ap.add_argument("--resume", default=None, help="resume from checkpoint")
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from md_neighbor_list_tpu.core.config import PRESETS
    from md_neighbor_list_tpu.utils.jsonlog import JsonLogger

    logger = JsonLogger()
    cfg = PRESETS[args.preset]
    over = {k: getattr(args, k)
            for k in ("n", "steps", "dt", "temperature", "mesh_devices")
            if getattr(args, k) is not None}
    if over:
        cfg = dataclasses.replace(cfg, **over)

    engine = args.engine
    if engine == "auto":
        engine = "dense_slab" if cfg.mesh_devices > 1 else (
            "dense" if jax.default_backend() not in ("cpu",) else "xla"
        )
    if engine == "dense_slab":
        # the dense grid needs P | mc; fall back to the XLA slab engine
        # for box/device combinations it cannot tile
        from md_neighbor_list_tpu.parallel.dense_slab import make_slab_spec
        from md_neighbor_list_tpu.core.box import Box

        try:
            make_slab_spec(Box.from_density(cfg.n, cfg.rho), cfg.rs,
                           cfg.mesh_devices)
        except ValueError as e:
            # reachable ONLY when the box has fewer >=rs z-layers than
            # devices (N < P^3 * rs^3 * rho) — a tiny-box regime where the
            # XLA twin's gather-heavy sweep costs microseconds. Loud on
            # stdout so no production run lands here silently (VERDICT r2
            # item 9).
            logger.log("engine_fallback", wanted="dense_slab",
                       reason=str(e))
            print(f"WARNING: dense_slab cannot tile this box "
                  f"({e}); falling back to the correctness-only XLA slab "
                  f"engine", flush=True)
            engine = "slab"
    logger.log("start", preset=args.preset, engine=engine, n=cfg.n,
               steps=cfg.steps, device=str(jax.devices()[0]))

    key = jax.random.PRNGKey(args.seed)
    if args.compare:
        return _compare(cfg, key, args.check_parity, logger)
    t0 = time.time()

    if engine in ("slab", "dense_slab"):
        if engine == "dense_slab":
            from md_neighbor_list_tpu.parallel.dense_slab import (
                DenseSlabSimulator)

            sim = DenseSlabSimulator(cfg)
        else:
            from md_neighbor_list_tpu.parallel.slab import SlabSimulator

            sim = SlabSimulator(cfg)
        if args.resume:
            from md_neighbor_list_tpu.utils.checkpoint import load

            system0, start_step = load(args.resume)
            state = sim.build(system0)
            logger.log("resumed", path=args.resume, step=start_step)
        else:
            state = sim.init(key)
        ke0, pe0 = sim.energies(state)
        t1 = time.time()
        state = sim.run(state, cfg.steps)
        ke1, pe1 = sim.energies(state)
        elapsed = time.time() - t1
        system = sim.gather(state)
        rebuilds = int(np.asarray(state.n_rebuilds)[0])
        pressure = None  # DD engines: energies only (observable on
        # the single-chip engines; gather + Simulator.thermo covers DD)
    else:
        if engine == "dense":
            from md_neighbor_list_tpu.models.dense_lj import DenseSimulator

            sim = DenseSimulator(cfg)
        else:
            from md_neighbor_list_tpu.models.lj_nve import Simulator

            sim = Simulator(cfg)

        if args.resume:
            from md_neighbor_list_tpu.utils.checkpoint import load

            system0, start_step = load(args.resume)
            carry = sim.build(system0)
            logger.log("resumed", path=args.resume, step=start_step)
        else:
            carry = sim.init(key)
        ke0, pe0 = sim.energies(carry)
        t1 = time.time()
        carry = sim.run(carry, cfg.steps)
        ke1, pe1 = sim.energies(carry)
        elapsed = time.time() - t1
        if engine == "dense":
            pos, vel, force = sim.to_system(carry)
            from md_neighbor_list_tpu.core.system import System

            system = System(pos=jnp.asarray(pos), vel=jnp.asarray(vel),
                            force=jnp.asarray(force),
                            pid=jnp.arange(cfg.n, dtype=jnp.int32))
            rebuilds = int(np.asarray(carry.n_rebuilds))
        else:
            system = carry.system
            rebuilds = int(np.asarray(carry.nbr.n_rebuilds))
        pressure = round(sim.pressure(carry), 6)

    e0, e1 = float(ke0) + float(pe0), float(ke1) + float(pe1)
    drift = abs(e1 - e0) / max(abs(e0), 1e-9)
    logger.log("run_done", steps=cfg.steps, seconds=round(elapsed, 3),
               steps_per_s=round(cfg.steps / max(elapsed, 1e-9), 2),
               rebuilds=rebuilds, energy_drift=drift, pressure=pressure)

    parity_ok = None
    if args.check_parity:
        parity_ok = _check_parity(cfg, system, logger)

    if args.save:
        from md_neighbor_list_tpu.utils.checkpoint import save

        save(args.save, system, step=cfg.steps)
        logger.log("saved", path=args.save)

    print(
        f"{engine}: N={cfg.n} steps={cfg.steps} "
        f"steps/s={cfg.steps / max(elapsed, 1e-9):.2f} "
        f"rebuilds={rebuilds} |dE/E|={drift:.2e}"
        + ("" if parity_ok is None else f" parity={'OK' if parity_ok else 'FAIL'}")
    )
    return 0 if (parity_ok is None or parity_ok) else 1


def _compare(cfg, key, check_oracle: bool, logger) -> int:
    """Reference-driver mode (SURVEY.md §5.1): the reference's main() runs
    EVERY list-construction variant on one initial state, times each, and
    cross-checks their pair lists against each other (and brute force).
    Here the variants are the two single-chip engines — each reports its
    OWN artifact's pair count and step-0 forces; forces are compared in
    global pid order within the fp32 gate, pair counts exactly."""
    import jax.numpy as jnp

    from md_neighbor_list_tpu.core.system import init_lattice
    from md_neighbor_list_tpu.models.dense_lj import DenseSimulator
    from md_neighbor_list_tpu.models.lj_nve import Simulator

    system0, _ = init_lattice(cfg.n, cfg.rho, key, cfg.temperature)
    rows = []

    # --- xla engine: padded-row artifact --------------------------------
    sim_x = Simulator(cfg)
    t0 = time.time()
    cx = sim_x.build(system0)
    hits = int(np.asarray(jnp.sum(cx.nbr.idx < cfg.n)))
    pairs_x = hits if cfg.half_list else hits // 2
    pid_x = np.asarray(cx.system.pid)
    f_x = np.empty((cfg.n, 3), np.float32)
    f_x[pid_x] = np.asarray(cx.system.force)
    t1 = time.time()
    cx = sim_x.run(cx, cfg.steps)
    ke, pe = sim_x.energies(cx)
    el_x = time.time() - t1
    rows.append(("xla", pairs_x, el_x,
                 int(np.asarray(cx.nbr.n_rebuilds)), time.time() - t0))

    # --- dense engine: cluster-bitmask artifact -------------------------
    sim_d = DenseSimulator(cfg)
    t0 = time.time()
    cd = sim_d.build(system0)
    _, counts, _, total = sim_d._rebuild_and_lists(cd.state)
    pairs_d = int(np.asarray(total))
    _, _, f_d = sim_d.to_system(cd)
    t1 = time.time()
    cd = sim_d.run(cd, cfg.steps)
    ke, pe = sim_d.energies(cd)
    el_d = time.time() - t1
    rows.append(("dense", pairs_d, el_d,
                 int(np.asarray(cd.n_rebuilds)), time.time() - t0))

    scale = max(float(np.abs(f_x).max()), 1.0)
    ferr = float(np.abs(f_d - f_x).max())
    pairs_ok = pairs_x == pairs_d
    force_ok = ferr <= 2e-4 * scale
    ok = pairs_ok and force_ok

    oracle_pairs = None
    if check_oracle:
        from md_neighbor_list_tpu.core.box import Box
        from md_neighbor_list_tpu.ops import oracle

        box = Box.from_density(cfg.n, cfg.rho)
        oracle_pairs = int(oracle.pair_count(system0.pos, box, cfg.rs))
        ok &= pairs_x == oracle_pairs

    logger.log("compare", pairs={r[0]: r[1] for r in rows},
               pairs_oracle=oracle_pairs, max_cross_force_err=ferr,
               force_scale=scale, ok=ok)
    print(f"{'engine':<8} {'pairs':>12} {'steps/s':>9} "
          f"{'rebuilds':>8} {'total_s':>8}")
    for name, pairs, el, reb, tot in rows:
        print(f"{name:<8} {pairs:>12} {cfg.steps / max(el, 1e-9):>9.2f} "
              f"{reb:>8} {tot:>8.1f}")
    print(f"cross-check: pairs {'==' if pairs_ok else '!='}"
          + (f" (oracle {oracle_pairs})" if oracle_pairs is not None else "")
          + f", max|dF| {ferr:.2e} vs 2e-4*scale="
          f"{2e-4 * scale:.2e} -> {'OK' if ok else 'FAIL'}")
    return 0 if ok else 1


def _check_parity(cfg, system, logger) -> bool:
    """Pair-count + force parity vs the O(N^2) oracle (SURVEY.md §5.5)."""
    import jax.numpy as jnp

    from md_neighbor_list_tpu.core.box import Box
    from md_neighbor_list_tpu.ops import oracle
    from md_neighbor_list_tpu.ops.binning import make_grid
    from md_neighbor_list_tpu.ops.pairlist import build_neighbor_lists
    from md_neighbor_list_tpu.core.capacity import estimate

    box = Box.from_density(cfg.n, cfg.rho)
    grid = make_grid(box, cfg.rs)
    cap = estimate(cfg.rho, cfg.rs, grid.cell_size, half_list=True)
    want = int(oracle.pair_count(system.pos, box, cfg.rs))
    _, nl = build_neighbor_lists(
        system.pos, box, grid, cfg.rs, cap.neighbors, cap.cell,
        half=True, layout=cfg.layout,
    )
    got = int(jnp.sum(nl.count))
    # oracle evaluated on the engine's own row order — rows compare 1:1
    f_o, _ = oracle.forces_energy(system.pos, box, cfg.rc)
    ferr = float(np.abs(np.asarray(system.force) - np.asarray(f_o)).max())
    scale = float(np.abs(np.asarray(f_o)).max())
    ok = (got == want) and ferr <= 2e-4 * max(scale, 1.0)
    logger.log("parity", pair_count_oracle=want, pair_count_engine=got,
               max_force_err=ferr, force_scale=scale, ok=ok)
    return ok


if __name__ == "__main__":
    sys.exit(main())
