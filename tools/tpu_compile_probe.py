"""Where does the N=1M warm-up time go? (VERDICT r2 item 3: init + first
build + compile regressed 31 s -> 221 s across round 2.)

Splits, for each jitted program of the dense engine, the three phases the
"init + compile" timer lumps together:

  trace+lower   Python tracing -> StableHLO (host CPU, never cached)
  compile       XLA + Mosaic kernel compilation (persistent-cache-able)
  execute       first real dispatch (tunnel + device)

Run twice: the second run's compile column shows whether
/root/repo/.jax_cache actually hits across processes (it should — misses here
mean the cache key moved, e.g. the kernel source changed).
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cap", type=int, default=32)
    ap.add_argument("--kernels", action="store_true",
                    help="Mosaic-vs-XLA split: cold-compile single-"
                         "pallas_call programs under a throwaway cache")
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}", flush=True)

    t0 = time.time()
    from md_neighbor_list_tpu.core.config import MDConfig
    from md_neighbor_list_tpu.core.system import init_lattice
    from md_neighbor_list_tpu.models.dense_lj import DenseSimulator
    from md_neighbor_list_tpu.ops.dense_cells import from_packed
    print(f"imports: {time.time()-t0:.1f}s", flush=True)

    cfg = MDConfig(n=args.n, dt=0.001, temperature=1.0)
    t0 = time.time()
    sim = DenseSimulator(cfg, cap=args.cap,
                         kernel_impl="pallas"
                         if jax.default_backend() != "cpu" else "jnp")
    print(f"Simulator construct (closure build, no trace): "
          f"{time.time()-t0:.1f}s", flush=True)

    system, _ = init_lattice(cfg.n, cfg.rho, jax.random.PRNGKey(0),
                             cfg.temperature)
    state = from_packed(system.pos, system.vel, system.pid, sim.spec)

    def phase(name, jitted, *a, n_static: int = 0):
        t0 = time.time()
        lowered = jitted.lower(*a)
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        # AOT-compiled fns take only the non-static args (statics baked in)
        out = compiled(*a[: len(a) - n_static or None])
        leaf = jax.tree_util.tree_leaves(out)[-1]
        float(np.asarray(leaf.reshape(-1)[0]
                         if hasattr(leaf, "reshape") else leaf))
        t3 = time.time()
        print(f"{name:28s} lower {t1-t0:6.1f}s  compile {t2-t1:6.1f}s  "
              f"first-exec {t3-t2:6.1f}s", flush=True)
        return out

    if args.kernels:
        # Mosaic-vs-XLA split: single-pallas_call programs, compiled under
        # a throwaway cache dir so every row is a true cold compile. If
        # these sum to ~the engine programs' compile times, the cost is
        # Mosaic kernel compilation (per custom call, re-paid by every
        # XLA program embedding the kernel); if they are small, the cost
        # is XLA's global passes over the scan/cond graph.
        import tempfile

        from md_neighbor_list_tpu.ops import pallas_force

        jax.config.update("jax_compilation_cache_dir",
                          tempfile.mkdtemp(prefix="nocache_"))
        valid = state.valid().astype(jnp.float32)

        def k_force(pos4, v):
            return pallas_force.dense_forces_half(pos4, v, sim.spec,
                                                  cfg.rc)

        def k_counts(pos4, v):
            return pallas_force.dense_counts_half(pos4, v, sim.spec,
                                                  cfg.rs)

        def k_lists(pos4, v):
            return pallas_force.dense_lists_half(pos4, v, sim.spec,
                                                 cfg.rs)

        for name, fn in [("force kernel only", k_force),
                         ("counts kernel only", k_counts),
                         ("lists kernel only", k_lists)]:
            phase(name, jax.jit(fn), state.pos, valid)

        # the same shapes/math with zero pallas calls — XLA-only cost
        from md_neighbor_list_tpu.ops import dense_ref

        def k_jnp_force(st):
            return dense_ref.sweep_reference(st, sim.spec, cfg.rc, True)

        phase("jnp force (no pallas)", jax.jit(k_jnp_force), state)
        print("PROBE OK", flush=True)
        return

    phase("init_full (fused cold start)", sim._init_full,
          jax.random.PRNGKey(0))
    carry = phase("initial_build", sim._initial_build, state)
    phase("run_chunk(50)", sim._run_chunk, carry, 50, n_static=1)
    phase("rebuild_and_lists", sim._rebuild_and_lists, carry.state)
    phase("energies (want_pe variant)", sim._energies, carry)
    print("PROBE OK", flush=True)


if __name__ == "__main__":
    main()
