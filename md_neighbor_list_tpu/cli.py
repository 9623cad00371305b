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
    t0 = time.time()

    if engine in ("slab", "dense_slab"):
        if engine == "dense_slab":
            from md_neighbor_list_tpu.parallel.dense_slab import (
                DenseSlabSimulator)

            sim = DenseSlabSimulator(cfg)
        else:
            from md_neighbor_list_tpu.parallel.slab import SlabSimulator

            sim = SlabSimulator(cfg)
        state = sim.init(key)
        ke0, pe0 = sim.energies(state)
        t1 = time.time()
        state = sim.run(state, cfg.steps)
        ke1, pe1 = sim.energies(state)
        elapsed = time.time() - t1
        system = sim.gather(state)
        rebuilds = int(np.asarray(state.n_rebuilds)[0])
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

    e0, e1 = float(ke0) + float(pe0), float(ke1) + float(pe1)
    drift = abs(e1 - e0) / max(abs(e0), 1e-9)
    logger.log("run_done", steps=cfg.steps, seconds=round(elapsed, 3),
               steps_per_s=round(cfg.steps / max(elapsed, 1e-9), 2),
               rebuilds=rebuilds, energy_drift=drift)

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
