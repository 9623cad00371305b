"""Benchmark driver — the R12 equivalent (SURVEY.md §3 R12; BASELINE.md).

Measures on the default device (the real TPU chip under the driver):
  1. neighbor-list build: sort + dense-expand + count/mask kernels -> the
     engine's neighbor-list artifact (BASELINE.md row 1), timed as K chained
     rebuilds inside ONE jitted loop (the remote-TPU tunnel neither honors
     block_until_ready nor transfers arrays fast, so every timing fences via
     a device-side scalar reduction fetched to host);
  2. steady-state MD steps/s with skin-amortized rebuilds (row 2).

Prints ONE JSON line on stdout; diagnostics go to stderr. ``vs_baseline`` is
the speedup of the list build over the in-repo AVX-512 CPU baseline
(baseline_cpp/baseline.json — the honest stand-in for the reference's
AVX-512 path, which cannot be run here; BASELINE.md note).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent / ".jax_cache"),
)
# cache medium-sized programs too (the default 1 s floor skips the small
# helper jits whose relay-tunnel compile round-trips add up in cold start)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def fetch_scalar(x) -> float:
    """Host fetch of a device scalar — the only reliable fence here."""
    return float(np.asarray(x))


N_WINDOWS = 5


def timed_windows(run_once, steps: int, counter0: int):
    """Run ``run_once`` (one fenced window of ``steps`` MD steps; returns
    (cumulative rebuild counter, current capacity)) N_WINDOWS times and
    summarize with stall rejection: the relay tunnel occasionally freezes
    one dispatch for ~2 minutes (measured in round 2: 3.97 / 17.84 / 4.47 s
    windows in one loop), so windows slower than 1.5x the MEDIAN window
    are classed as stalled and excluded; steps/s is the MEDIAN of the
    un-stalled windows (VERDICT r2 item 4 — min-of-N favored windows with
    fewer rebuilds; all window durations + per-window rebuild counts go in
    the JSON). The anchor (round 5, VERDICT r3 weak-6 / r4 weak-5) is the
    median of the FASTEST HALF of the non-regrow windows, robust in both
    failure directions the earlier anchors were not: the old
    fastest-window anchor let one lucky fast outlier reclassify every
    legitimate window as "stalled", and a plain median of all windows
    would itself be a stall whenever a majority of windows stall (3/5
    two-minute relay freezes would then pass the 1.5x gate and poison
    the steps/s median — round-5 review finding). The lower-half median
    keeps both cases right: a lone fast outlier is outvoted by the two
    normal windows beside it, and stalls can never reach the anchor while
    at least half the non-regrow windows are clean. On every recorded
    round's window data (r04: 3.53-3.55 s, spread <1%; r02:
    3.97/17.84/4.47) all three anchors pick the same un-stalled set and
    the same median. A capacity overflow inside a window triggers rollback
    + growth + rebuild-from-scratch, which RESETS the rebuild counter (the
    round-2 "-6 rebuilds" artifact) — such windows are excluded too and
    reported as regrow events with the capacity they grew to."""
    elapsed, counters, caps = [], [], []
    for _ in range(N_WINDOWS):
        t0 = time.perf_counter()
        nr, cap = run_once()
        elapsed.append(time.perf_counter() - t0)
        counters.append(nr)
        caps.append(cap)
    per_window = [
        b - a if b >= a else None
        for a, b in zip([counter0] + counters, counters)
    ]
    regrows = sum(d is None for d in per_window)
    nonregrow = sorted(e for e, d in zip(elapsed, per_window)
                       if d is not None) or sorted(elapsed)
    anchor = float(np.median(nonregrow[: (len(nonregrow) + 1) // 2]))
    good = [e for e, d in zip(elapsed, per_window)
            if e <= 1.5 * anchor and d is not None]
    steps_per_s = steps / float(np.median(good or elapsed))
    log(
        f"steps/s: {steps_per_s:.2f} = median of {len(good)}/"
        f"{N_WINDOWS} un-stalled windows of {steps} steps "
        f"({', '.join(f'{e:.2f}' for e in elapsed)} s; rebuilds/window "
        f"{per_window}; regrow windows {regrows}; cap/window {caps})"
    )
    return steps_per_s, {
        "windows_s": [round(e, 3) for e in elapsed],
        "windows_unstalled": len(good),
        "rebuilds_per_window": per_window,
        "rebuild_counters": counters,
        "regrow_windows": regrows,
        "cap_per_window": caps,
        "steps_per_window": steps,
    }


def bench_pallas(cfg, args):
    from md_neighbor_list_tpu.models.dense_lj import DenseSimulator
    from md_neighbor_list_tpu.ops import pallas_force

    impl = "pallas" if jax.default_backend() != "cpu" else "jnp"
    # Production cap=40 at every N: the round-2 cap=32 envelope (max
    # occupancy 31 over a 400-step melt probe) was falsified by longer
    # windows — the N=1M melt overflows cap=32 around step ~600, paying a
    # mid-measurement rollback + growth + recompile. Equilibrium max cell
    # occupancy sits in (32, 40]; tools/tpu_occupancy_probe.py tracks it.
    cap = args.cap or 40
    sim = DenseSimulator(cfg, cap=cap, kernel_impl=impl)

    # ---- AOT compile share (VERDICT r3 ask 5 / r4 weak-3) ----------------
    # Lower+compile the engine programs against abstract shapes BEFORE the
    # timed init: with the repo's committed .jax_cache this line reads in
    # seconds, and it is the PROVABLE compile share of the cold start — the
    # init line that follows then carries only first-dispatch execution and
    # whatever the relay tunnel stalls (the warm re-init line below bounds
    # the steady-state cost). AOT results land in the persistent cache, not
    # the jit dispatch cache, so the init path re-reads them from disk
    # (~0.3 s/program) rather than recompiling.
    from md_neighbor_list_tpu.ops.dense_cells import DenseState

    spec0 = sim.spec

    def _abs(*shape, dt=jnp.float32):
        return jax.ShapeDtypeStruct(shape, dt)

    astate = DenseState(
        pos=_abs(3, spec0.rows, spec0.mc, spec0.cap),
        vel=_abs(3, spec0.rows, spec0.mc, spec0.cap),
        pid=_abs(spec0.rows, spec0.mc, spec0.cap, dt=jnp.int32),
    )
    key0 = jax.random.PRNGKey(0)
    aot_s = 0.0
    if cfg.n <= spec0.slots:  # else sim.init's cap-growth retry handles it
        t0 = time.time()
        acarry = jax.eval_shape(sim._init_full, key0)
        sim._init_full.lower(key0).compile()
        sim._run_chunk.lower(acarry, args.steps).compile()
        sim._rebuild_and_lists.lower(astate).compile()
        aot_s = time.time() - t0
        log(f"AOT compile of engine programs: {aot_s:.1f}s "
            f"(persistent cache: "
            f"{pathlib.Path(__file__).resolve().parent / '.jax_cache'})")
    else:
        log(f"AOT precompile skipped: n={cfg.n} > {spec0.slots} slots at "
            f"cap={spec0.cap} — init's growth retry will compile")

    t0 = time.time()
    carry = sim.init(jax.random.PRNGKey(0))
    fetch_scalar(carry.n_rebuilds)
    init_first_s = time.time() - t0
    log(f"init + first build + compile: {init_first_s:.1f}s")
    # Re-init on the now-warm executables: the difference is the COMPILE
    # share of the cold start (plus any relay stall the first call ate) —
    # separating "XLA compile" from "tunnel stall" numerically in the
    # BENCH tail (VERDICT r3 weak-1). With a warm /root/repo/.jax_cache the
    # first call is already seconds and the share reads ~0.
    t0 = time.time()
    carry = sim.init(jax.random.PRNGKey(0))
    fetch_scalar(carry.n_rebuilds)
    init_warm_s = time.time() - t0
    log(f"init (warm executables): {init_warm_s:.1f}s -> compile+stall "
        f"share {init_first_s - init_warm_s:.1f}s")
    # read the spec AFTER init: a cold-lattice overflow (dense lattice
    # planes beating the equilibrium occupancy) grows cap + recompiles
    spec = sim.spec
    log(f"dense spec: mc={spec.mc} cap={spec.cap} slots={spec.slots} "
        f"impl={impl}")

    # ---- list build: K chained rebuild+count passes in one jit ----------
    reps = args.reps

    # Each timed build starts from a state drifted by the Verlet-reuse
    # displacement bound: ballistic drift pos += tau*vel with tau scaled so
    # max displacement == skin/2 — exactly the state a production rebuild
    # sees when the displacement criterion fires. (Round 2 perturbed by
    # 1e-6, which the full sort is oblivious to but would let the
    # incremental rebuild time a zero-mover workload.)
    half_skin = jnp.float32(cfg.skin * 0.5)

    @jax.jit
    def chained_builds(state):
        v2 = jnp.sum(state.vel * state.vel, axis=0)
        tau = half_skin / jnp.sqrt(jnp.max(v2))

        def body(i, acc_state):
            acc, st = acc_state
            st = st._replace(pos=st.pos + tau * st.vel)
            # the engine's list-build entry point: rebuild (incremental
            # with in-graph full fallback) + the one-pass half-list kernel
            # emitting the FULL artifact (packed cluster bitmasks + half
            # counts). The f32 accumulator folds in a mask word so neither
            # output can be dead-code-eliminated; the exact full-count
            # parity pass runs untimed below.
            st2, counts, masks, total = sim._rebuild_and_lists(st)
            acc = acc + total.astype(jnp.float32)
            if masks is not None:
                acc = acc + masks[0, 0, 0, 0, 0].astype(jnp.float32) * 0.0
            return acc, st2
        acc, st = jax.lax.fori_loop(
            0, reps, body, (jnp.zeros((), jnp.float32), state)
        )
        return acc

    # exact pair count from one untimed build (i32-safe for N <= ~20M)
    if impl == "jnp":
        from md_neighbor_list_tpu.ops import dense_ref

        c1 = dense_ref.sweep_reference(carry.state, spec, cfg.rs, False)
    else:
        c1 = pallas_force.dense_counts(
            carry.state.pos, carry.state.valid().astype(jnp.float32),
            spec, cfg.rs, False,
        )
    pairs = int(np.asarray(jnp.sum(
        jnp.where(carry.state.valid(), c1, 0)))) // 2

    fetch_scalar(chained_builds(carry.state))  # compile + warm
    t0 = time.perf_counter()
    fetch_scalar(chained_builds(carry.state))
    build_ms = (time.perf_counter() - t0) * 1e3 / reps
    log(f"list build: {build_ms:.2f} ms/build over {reps} chained builds "
        f"({pairs} pairs)")

    # ---- steps/s ---------------------------------------------------------
    # One 2-element fetch fences the window AND reads the rebuild counter
    # (folding both into a single host round-trip: a second fetch inside
    # the timed region would bill every window one extra tunnel trip).
    reducer = jax.jit(lambda c: jnp.stack(
        [jnp.sum(c.state.vel), c.n_rebuilds.astype(jnp.float32)]
    ))
    # One device dispatch per timed window (chunk = the whole window);
    # stall rejection + median in timed_windows.
    carry_box = [sim.run(carry, args.steps, chunk=args.steps)]  # warm
    counter0 = int(np.asarray(reducer(carry_box[0]))[1])

    def run_once():
        carry_box[0] = sim.run(carry_box[0], args.steps, chunk=args.steps)
        nr = int(np.asarray(reducer(carry_box[0]))[1])
        return nr, sim.spec.cap

    steps_per_s, windows = timed_windows(run_once, args.steps, counter0)
    rb = ("incremental rebuild, in-graph full-sort fallback"
          if sim.incremental else "full sort+expand rebuild")
    return build_ms, steps_per_s, pairs, {
        "aot_compile_s": round(aot_s, 1),
        "init_first_s": round(init_first_s, 1),
        "init_warm_s": round(init_warm_s, 1),
        "compile_or_stall_share_s": round(init_first_s - init_warm_s, 1),
        "cap": spec.cap, "mc": spec.mc, "cap_final": sim.spec.cap,
        "timed": f"skin/2 ballistic drift + {rb} + one-pass half-list "
                 "kernel (packed cluster bitmasks + half counts)",
        "incremental": sim.incremental,
        **windows,
    }


def bench_xla(cfg, args):
    from md_neighbor_list_tpu.models.lj_nve import Simulator

    sim = Simulator(cfg)
    carry = sim.init(jax.random.PRNGKey(0))
    build = sim._rebuild_only

    half_skin = jnp.float32(cfg.skin * 0.5)

    @jax.jit
    def chained(system):
        v2 = jnp.sum(system.vel * system.vel, axis=-1)
        tau = half_skin / jnp.sqrt(jnp.max(v2))

        def body(i, carry):
            acc, s = carry
            # same skin/2 ballistic drift as the dense bench; fence the
            # COMPLETE artifact — padded (N, K) idx rows AND counts — the
            # same "consumable neighbor list" contract the dense path
            # times (VERDICT r2 item 7: round 2 fenced max_count only,
            # letting XLA dead-code parts of the idx emission)
            s = s._replace(pos=s.pos + tau * s.vel)
            c = build(s)
            acc = (acc + c.nbr.max_count
                   + jnp.sum(c.nbr.idx[:, 0]) + c.nbr.idx[0, -1])
            return acc, c.system
        acc, _ = jax.lax.fori_loop(
            0, args.reps, body, (jnp.zeros((), jnp.int32), system))
        return acc

    fetch_scalar(chained(carry.system))
    t0 = time.perf_counter()
    fetch_scalar(chained(carry.system))
    build_ms = (time.perf_counter() - t0) * 1e3 / args.reps

    # single fenced fetch per window, as in bench_pallas
    reducer = jax.jit(lambda c: jnp.stack(
        [jnp.sum(c.system.vel), c.nbr.n_rebuilds.astype(jnp.float32)]
    ))
    carry_box = [sim.run(carry, args.steps, chunk=args.steps)]
    counter0 = int(np.asarray(reducer(carry_box[0]))[1])

    def run_once():
        carry_box[0] = sim.run(carry_box[0], args.steps, chunk=args.steps)
        nr = int(np.asarray(reducer(carry_box[0]))[1])
        return nr, sim.capacity.neighbors

    steps_per_s, windows = timed_windows(run_once, args.steps, counter0)
    log(f"xla: build {build_ms:.2f} ms, {steps_per_s:.2f} steps/s")
    return build_ms, steps_per_s, None, {
        "K": sim.capacity.neighbors,
        "timed": "rebuild + padded (N, K) idx rows + counts",
        **windows,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="c4_sorted")
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--warmup-steps", type=int, default=30)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cap", type=int, default=0,
                    help="dense cell capacity (grown automatically on "
                    "overflow); 0 = production default 40 at every N "
                    "(equilibrium max occupancy at rho=1 crosses 32 — "
                    "tools/tpu_occupancy_probe.py)")
    ap.add_argument("--engine", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--profile", default=None,
                    help="directory for a jax.profiler trace of the step loop")
    args = ap.parse_args()

    # The axon relay sometimes REFUSES the device grant ("Unable to
    # initialize backend ... UNAVAILABLE", surfacing after a ~20-25 min
    # blocked wait) and recovers on a ~1 h scale. jax re-attempts backend
    # init on the next jax.devices() call in-process, so a bounded retry
    # turns a certain missing-benchmark into a likely late one. This runs
    # BEFORE the engine import so no import-time constant can touch the
    # device first.
    dev = None
    t_grant = time.time()
    for attempt in range(3):
        try:
            dev = jax.devices()[0]
            break
        except RuntimeError as e:
            if ("Unable to initialize backend" not in str(e)
                    or attempt == 2):
                raise
            log(f"device grant refused (attempt {attempt + 1}/3); "
                "retrying in 300 s")
            time.sleep(300)

    grant_s = time.time() - t_grant
    log(f"device grant: {grant_s:.1f}s (relay stall, not "
        "compile — BASELINE.md 'Compile time' section)")

    from md_neighbor_list_tpu.core.config import PRESETS

    cfg = PRESETS[args.preset]
    if args.n is not None:
        cfg = dataclasses.replace(cfg, n=args.n)
    log(f"device: {dev} | engine: {args.engine} | config: {cfg}")

    if args.profile:
        import contextlib

        prof = jax.profiler.trace(args.profile)
    else:
        import contextlib

        prof = contextlib.nullcontext()

    with prof:
        if args.engine == "pallas":
            build_ms, steps_per_s, pairs, extra = bench_pallas(cfg, args)
        else:
            build_ms, steps_per_s, pairs, extra = bench_xla(cfg, args)

    # vs_baseline only against a MEASURED CPU point at the same N (no
    # linear-in-N extrapolation — VERDICT r1 "measure, don't extrapolate");
    # baseline_cpp/ holds one JSON per measured N
    vs = None
    base = None
    for f in (pathlib.Path(__file__).parent / "baseline_cpp").glob("baseline*.json"):
        b = json.loads(f.read_text())
        if b["n"] == cfg.n:
            base = b
            vs = round(b["build_ms"] / build_ms, 3)
            break

    result = {
        "metric": f"neighbor_list_build_ms_n{cfg.n}",
        "value": round(build_ms, 3),
        "unit": "ms",
        "vs_baseline": vs,
        "extra": {
            "steps_per_sec": round(steps_per_s, 3),
            "engine": args.engine,
            "n": cfg.n,
            "pairs": pairs,
            "device": str(dev),
            "device_grant_s": round(grant_s, 1),
            "cpu_baseline": base,
            **extra,
        },
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
