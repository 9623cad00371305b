"""Probe: max cell occupancy at N=1M through the melt and beyond.

Round 2 probed 400 steps, saw max 31, and set the cap=32 headline; the
round-3 bench then hit a capacity overflow around step ~600 — the melt's
equilibrium occupancy tail crosses 32. This probe runs 2000 steps at
cap=48 (head-room so the probe itself cannot regrow) and prints the
running max-occupancy trail every 200 steps: the production cap must
clear the equilibrium plateau with margin. Also times the force + build
passes at cap=40 vs cap=32 for the cost-of-safety record.
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

from md_neighbor_list_tpu.core.config import MDConfig
from md_neighbor_list_tpu.models.dense_lj import DenseSimulator
from md_neighbor_list_tpu.ops import pallas_force
from md_neighbor_list_tpu.ops.dense_cells import rebuild_dense

print(f"device: {jax.devices()[0]}", flush=True)
cfg = MDConfig(n=1_000_000, dt=0.001, temperature=1.0)

sim = DenseSimulator(cfg, cap=48)
t0 = time.time()
carry = sim.init(jax.random.PRNGKey(0))


@jax.jit
def occ(state):
    return jnp.max(jnp.sum(state.valid().astype(jnp.int32), axis=-1))


trail = [int(np.asarray(occ(carry.state)))]
for chunk in range(10):
    carry = sim.run(carry, 200, chunk=200)
    trail.append(int(np.asarray(occ(carry.state))))
print(f"occupancy trail (init + every 200 steps to 2000): {trail}",
      flush=True)
print(f"overflow={bool(np.asarray(carry.overflow))} grown_to={sim.cap} "
      f"rebuilds={int(np.asarray(carry.n_rebuilds))} "
      f"({time.time()-t0:.0f}s)", flush=True)

# cost-of-safety: force + build on the MELTED state at cap=40
# (production) vs cap=32 (fits only if the trail stayed <= 32)
from md_neighbor_list_tpu.core.system import System
from md_neighbor_list_tpu.ops.dense_cells import to_packed

mpos, mvel = to_packed(carry.state, cfg.n, sim.spec.L)
melted = System(pos=jnp.asarray(mpos), vel=jnp.asarray(mvel),
                force=jnp.zeros_like(jnp.asarray(mpos)),
                pid=jnp.arange(cfg.n, dtype=jnp.int32))
for cap in (40, 32):
    sim2 = DenseSimulator(cfg, cap=cap)
    spec = sim2.spec
    carry2 = sim2.build(melted)
    if sim2.cap != cap:
        print(f"cap={cap}: melted state does not fit (grown to {sim2.cap})",
              flush=True)
        continue
    st = carry2.state
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
        t1 = time.perf_counter()
        float(np.asarray(chained(st)))
        ms = (time.perf_counter() - t1) * 1e2
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
