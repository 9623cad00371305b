"""TPU compiled-mode smoke for the half-sweep Newton-3 force kernel.

Validates on real Mosaic (interpret mode accepts constructs the hardware
compiler rejects — see BASELINE.md timing discipline note): parity vs the
jnp reference at N=16k, then a timed N=1M force-step comparison vs the full
symmetric kernel.
"""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.ops import dense_ref, pallas_force
from md_neighbor_list_tpu.ops.dense_cells import from_packed, make_spec, rebuild_dense

print(f"device: {jax.devices()[0]}", flush=True)

# --- parity at N=16k, cap=40 (production cap) ---------------------------
n = 16384
system, box = init_lattice(n, 1.0, jax.random.PRNGKey(3), 1.0)
spec = make_spec(box, 2.8, cap=40)
st = dense_ref.rebuild_reference(
    from_packed(system.pos, system.vel, system.pid, spec), spec)
vm = st.valid()
v32 = vm.astype(jnp.float32)
f_r, pe_r = dense_ref.sweep_reference(st, spec, 2.5, want_forces=True)
scale = float(jnp.max(jnp.abs(f_r)))

for want_pe in (True, False):
    t0 = time.time()
    f_h, pe_h = pallas_force.dense_forces_half(st.pos, v32, spec, 2.5,
                                               False, want_pe)
    df = float(jnp.max(jnp.where(vm[None], jnp.abs(f_h - f_r), 0.0)))
    leak = float(jnp.max(jnp.where(vm[None], 0.0, jnp.abs(f_h))))
    print(f"want_pe={want_pe}: max|dF|={df:.3e} rel={df/scale:.2e} "
          f"leak={leak:.1e} compile+run {time.time()-t0:.0f}s", flush=True)
    assert df <= 2e-4 * max(scale, 1.0), "force parity FAIL"
    assert leak == 0.0
    if want_pe:
        pe_full = 0.5 * float(jnp.sum(jnp.where(vm, pe_r, 0.0)))
        pe_half = float(jnp.sum(jnp.where(vm, pe_h, 0.0)))
        print(f"  PE full={pe_full:.4f} half={pe_half:.4f}", flush=True)
        assert abs(pe_full - pe_half) <= 1e-4 * abs(pe_full)

# --- timed comparison at N=1M -------------------------------------------
n = 1_000_000
system, box = init_lattice(n, 1.0, jax.random.PRNGKey(0), 1.0)
spec = make_spec(box, 2.8, cap=40)
st = from_packed(system.pos, system.vel, system.pid, spec)
st, _ = rebuild_dense(st, spec, False)
v32 = st.valid().astype(jnp.float32)

def timed(name, fn):
    @jax.jit
    def chained(pos4):
        def body(i, acc):
            f, _ = fn(pos4 + (i % 2).astype(jnp.float32) * 1e-6)
            return acc + jnp.sum(f[0, 0, 0])
        return jax.lax.fori_loop(0, 20, body, jnp.zeros((), jnp.float32))
    float(np.asarray(chained(st.pos)))  # compile+warm
    t0 = time.perf_counter()
    float(np.asarray(chained(st.pos)))
    ms = (time.perf_counter() - t0) * 1e3 / 20
    print(f"{name}: {ms:.2f} ms/force-pass @ N=1M", flush=True)
    return ms

full = timed("full sweep  ", lambda p: pallas_force.dense_forces(
    p, v32, spec, 2.5, False, False))
half = timed("half+N3     ", lambda p: pallas_force.dense_forces_half(
    p, v32, spec, 2.5, False, False))
print(f"speedup: {full/half:.2f}x", flush=True)
print("SMOKE OK", flush=True)
