"""Probe: max cell occupancy at N=1M through the lattice melt, and the
cap=32 vs cap=40 build/force costs. Decides the production cap (pair evals
scale with cap on the i-axis; the lane axis pads to 128 either way)."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from md_neighbor_list_tpu.core.config import MDConfig
from md_neighbor_list_tpu.models.dense_lj import DenseSimulator
from md_neighbor_list_tpu.ops import pallas_force
from md_neighbor_list_tpu.ops.dense_cells import rebuild_dense

print(f"device: {jax.devices()[0]}", flush=True)
cfg = MDConfig(n=1_000_000, dt=0.001, temperature=1.0)

for cap in (40, 32):
    sim = DenseSimulator(cfg, cap=cap)
    t0 = time.time()
    carry = sim.init(jax.random.PRNGKey(0))

    @jax.jit
    def occ(state):
        return jnp.max(jnp.sum(state.valid().astype(jnp.int32), axis=-1))

    o0 = int(np.asarray(occ(carry.state)))
    carry = sim.run(carry, 400, chunk=100)  # through the melt
    o1 = int(np.asarray(occ(carry.state)))
    over = bool(np.asarray(carry.overflow))
    grown = sim.cap != cap
    print(f"cap={cap}: occ(init)={o0} occ(melted)={o1} overflow={over} "
          f"grown_to={sim.cap} rebuilds={int(np.asarray(carry.n_rebuilds))} "
          f"({time.time()-t0:.0f}s)", flush=True)
    if grown:
        continue

    spec = sim.spec
    st = carry.state
    v32 = st.valid().astype(jnp.float32)

    def timed(name, fn):
        @jax.jit
        def chained(state):
            def body(i, acc):
                s = state._replace(
                    pos=state.pos + (i % 2).astype(jnp.float32) * 1e-6)
                return acc + fn(s)
            return jax.lax.fori_loop(0, 10, body,
                                     jnp.zeros((), jnp.float32))
        float(np.asarray(chained(st)))
        t0 = time.perf_counter()
        float(np.asarray(chained(st)))
        ms = (time.perf_counter() - t0) * 1e2
        print(f"  cap={cap} {name}: {ms:.2f} ms", flush=True)

    timed("force", lambda s: jnp.sum(pallas_force.dense_forces_half(
        s.pos, v32, spec, 2.5, False, False)[0][0, 0, 0]))
    def build(s):
        new, _ = rebuild_dense(s, spec, False)
        c, m = pallas_force.dense_lists_half(
            new.pos, new.valid().astype(jnp.float32), spec, 2.8, False)
        return jnp.sum(c).astype(jnp.float32) + m[0, 0, 0, 0, 0] * 0.0
    timed("build(rebuild+lists)", build)
print("DONE", flush=True)
