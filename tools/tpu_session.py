"""One-process TPU measurement session.

The axon tunnel pays a multi-minute grant stall whenever a fresh process
touches the device shortly after another exits — so chaining standalone
tools serially multiplies stalls. This driver runs the requested tools'
main() functions IN ONE PROCESS (one grant), in order:

    python tools/tpu_session.py compile_probe breakdown ablation \
        micro bench100k bench1m split8m validate8m

Each stage is isolated with try/except so one failure doesn't waste the
session; argv is patched per stage.
"""
import gc
import pathlib
import runpy
import sys
import time
import traceback

ROOT = str(pathlib.Path(__file__).resolve().parent.parent)
sys.path.insert(0, ROOT)

STAGES = {
    "compile_probe": ("tools/tpu_compile_probe.py", ["--n", "1000000"]),
    "compile_probe2": ("tools/tpu_compile_probe.py", ["--n", "1000000"]),
    "compile_probe40": ("tools/tpu_compile_probe.py",
                        ["--n", "1000000", "--cap", "40"]),
    "breakdown": ("tools/tpu_build_breakdown.py",
                  ["--n", "1000000", "--cap", "32", "--reps", "10"]),
    "ablation": ("tools/tpu_force_ablation.py",
                 ["--n", "1000000", "--reps", "10"]),
    "micro": ("tools/tpu_micro_costs.py", []),
    "inc_phases": ("tools/tpu_inc_phases.py",
                   ["--n", "1000000", "--cap", "32", "--uniform"]),
    "inc_phases_lattice": ("tools/tpu_inc_phases.py",
                           ["--n", "1000000", "--cap", "32"]),
    "bench100k": ("bench.py", ["--n", "100000", "--steps", "200"]),
    "bench1m": ("bench.py", []),
    "bench8m": ("bench.py", ["--n", "8000000", "--steps", "60"]),
    "split8m": ("tools/tpu_split_probe.py", []),
    "split8m_force": ("tools/tpu_split_probe.py", ["--mode", "force"]),
    "split1m_force": ("tools/tpu_split_probe.py",
                      ["--n", "1000000", "--mode", "force", "--pe"]),
    "breakdown8m": ("tools/tpu_build_breakdown.py",
                    ["--n", "8000000", "--cap", "40", "--reps", "5",
                     "--phases"]),
    "validate1m": ("tools/validate_tpu.py",
                   ["--n", "1000000", "--steps", "1000"]),
    "validate8m": ("tools/validate_tpu.py",
                   ["--n", "8000000", "--steps", "500"]),
    "slabcost": ("tools/tpu_slab_cost.py", []),
    "decode8m": ("tools/tpu_decode_8m.py", []),
    "gather_force": ("tools/tpu_gather_force.py", ["--n", "1000000"]),
    "occupancy": ("tools/tpu_occupancy_probe.py", []),
    # round-5 stages
    "expand_probe": ("tools/tpu_expand_probe.py", []),
    "expand_blocked": ("tools/tpu_expand_probe.py", ["--blocked-only"]),
    "compile_variants": ("tools/validate_tpu.py", ["--compile-variants"]),
    "rowstarts": ("tools/tpu_rowstarts_probe.py", []),
    "dd_p1": ("tools/tpu_breadth_probe.py", ["--dd-p1"]),
    "long8m": ("tools/tpu_breadth_probe.py", ["--long-run-8m"]),
    "api_probe": ("tools/tpu_api_probe.py", []),
    "api_probe100k": ("tools/tpu_api_probe.py", ["--n", "100000"]),
    "lists8m": ("tools/tpu_lists8m_probe.py", []),
    "blocked_bisect": ("tools/tpu_blocked_bisect.py", []),
}


def main():
    for name in sys.argv[1:]:
        script, argv = STAGES[name]
        print(f"\n===== STAGE {name} ({script} {' '.join(argv)}) "
              f"{time.strftime('%H:%M:%S')} =====", flush=True)
        sys.argv = [script] + argv
        t0 = time.time()
        try:
            runpy.run_path(f"{ROOT}/{script}", run_name="__main__")
        except SystemExit as e:
            print(f"stage {name}: exit {e.code}", flush=True)
        except Exception as e:
            traceback.print_exc()
            print(f"stage {name}: FAILED", flush=True)
            if "Unable to initialize backend" in str(e):
                # The relay refused the device grant (a ~25 min blocked
                # wait before surfacing). Every later stage AND the
                # live-array purge below would re-block on the same
                # refusal — bail out so the caller's retry loop can
                # sleep and relaunch instead.
                print("backend unavailable: skipping remaining stages",
                      flush=True)
                return
            # A stage that died on RESOURCE_EXHAUSTED leaves its arrays
            # and jit caches holding HBM, poisoning every later stage
            # (observed: one N=8M OOM cascaded into scalar-allocation
            # failures). Stages share no arrays, so hard-purge.
            try:
                import jax

                for a in jax.live_arrays():
                    a.delete()
                jax.clear_caches()
            except Exception:
                traceback.print_exc()
        gc.collect()
        print(f"===== STAGE {name} done in {time.time()-t0:.0f}s =====",
              flush=True)


if __name__ == "__main__":
    main()
