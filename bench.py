"""Benchmark driver — the R12 equivalent (SURVEY.md §3 R12; BASELINE.md).

Measures, on the default device (the real TPU chip under the driver):
  1. neighbor-list build time: bin + 27-cell sweep -> padded half list,
     median of ``--reps`` fenced calls (BASELINE.md row 1);
  2. steady-state MD steps/s with skin-amortized rebuilds (row 2).

Prints ONE JSON line on stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...,
   "extra": {...}}
``vs_baseline`` is the speedup of the TPU list build over the in-repo
AVX-512 CPU baseline (baseline_cpp/baseline.json — the honest stand-in for
the reference's AVX-512 path, which cannot be run here; BASELINE.md note).
All diagnostics go to stderr.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import jax
import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="c4_sorted",
                    help="config preset name (see core/config.py)")
    ap.add_argument("--n", type=int, default=None, help="override N")
    ap.add_argument("--steps", type=int, default=200,
                    help="timed MD steps (after warmup)")
    ap.add_argument("--warmup-steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=10,
                    help="list-build timing repetitions")
    ap.add_argument("--backend", default=None,
                    help="override sweep backend: xla|pallas")
    args = ap.parse_args()

    import dataclasses

    from md_neighbor_list_tpu.core.config import PRESETS
    from md_neighbor_list_tpu.models.lj_nve import Simulator

    cfg = PRESETS[args.preset]
    if args.n is not None:
        cfg = dataclasses.replace(cfg, n=args.n)
    if args.backend is not None:
        cfg = dataclasses.replace(cfg, backend=args.backend)

    dev = jax.devices()[0]
    log(f"device: {dev} | config: {cfg}")

    sim = Simulator(cfg)
    log(f"grid mc={sim.grid.mc} capacity={sim.capacity} backend={sim.backend}")

    t0 = time.time()
    carry = sim.init(jax.random.PRNGKey(0))
    jax.block_until_ready(carry.system.pos)
    log(f"init + first build + compile: {time.time() - t0:.1f}s "
        f"(max_count={int(carry.nbr.max_count)}, "
        f"cell_max={int(carry.nbr.cell_max)})")

    # --- list build timing (bin + sweep, fenced) -------------------------
    system = carry.system
    build = sim._rebuild_only
    jax.block_until_ready(build(system).nbr.idx)  # warmup/compile
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = build(system)
        jax.block_until_ready(out.nbr.idx)
        times.append((time.perf_counter() - t0) * 1e3)
    build_ms = float(np.median(times))
    log(f"list build ms: median={build_ms:.2f} all={[f'{t:.1f}' for t in times]}")

    # --- MD steps/s (skin-amortized rebuilds) ----------------------------
    carry = sim.run(carry, args.warmup_steps)
    jax.block_until_ready(carry.system.pos)
    t0 = time.perf_counter()
    carry = sim.run(carry, args.steps)
    jax.block_until_ready(carry.system.pos)
    elapsed = time.perf_counter() - t0
    steps_per_s = args.steps / elapsed
    rebuilds = int(carry.nbr.n_rebuilds)
    log(f"steps/s: {steps_per_s:.2f} ({args.steps} steps in {elapsed:.2f}s, "
        f"{rebuilds} total rebuilds)")

    # --- baseline comparison --------------------------------------------
    base_path = pathlib.Path(__file__).parent / "baseline_cpp" / "baseline.json"
    vs = float("nan")
    base = None
    if base_path.exists():
        base = json.loads(base_path.read_text())
        if cfg.n == base.get("n"):
            vs = base["build_ms"] / build_ms
        else:
            # scale linearly in N for off-headline runs (diagnostic only)
            vs = base["build_ms"] * (cfg.n / base["n"]) / build_ms

    result = {
        "metric": f"neighbor_list_build_ms_n{cfg.n}",
        "value": round(build_ms, 3),
        "unit": "ms",
        "vs_baseline": None if np.isnan(vs) else round(vs, 3),
        "extra": {
            "steps_per_sec": round(steps_per_s, 3),
            "n": cfg.n,
            "backend": sim.backend,
            "device": str(dev),
            "neighbor_capacity": sim.capacity.neighbors,
            "cpu_baseline": base,
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
