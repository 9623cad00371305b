"""TPU compiled-mode smoke for the one-pass half-list (masks+counts) kernel
at production cap=40 — the round-1 Mosaic SIGABRT case. Parity at N=16k,
then timed artifact build at N=1M."""
import sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.ops import dense_ref, pallas_force
from md_neighbor_list_tpu.ops.dense_cells import from_packed, make_spec, rebuild_dense

print(f"device: {jax.devices()[0]}", flush=True)

n = 16384
system, box = init_lattice(n, 1.0, jax.random.PRNGKey(3), 1.0)
spec = make_spec(box, 2.8, cap=40)
st = dense_ref.rebuild_reference(
    from_packed(system.pos, system.vel, system.pid, spec), spec)
vm = st.valid()
v32 = vm.astype(jnp.float32)

t0 = time.time()
counts, masks = pallas_force.dense_lists_half(st.pos, v32, spec, 2.8, False)
ch = pallas_force.dense_counts_half(st.pos, v32, spec, 2.8, False)
print(f"compile+run {time.time()-t0:.0f}s; words={pallas_force.mask_words(spec.cap)}",
      flush=True)
assert bool(jnp.all(jnp.where(vm, counts == ch, True))), "counts != half counts"
pop = pallas_force.mask_slot_counts(masks, spec.cap)
assert bool(jnp.all(jnp.where(vm, pop == counts, True))), "popcount != counts"
total = int(jnp.sum(jnp.where(vm, counts, 0)))
print(f"parity OK at cap=40: {total} pairs, popcount==counts", flush=True)

# ---- timed N=1M: list kernel alone, vs the counts-only kernel -----------
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
            return acc + fn(pos4 + (i % 2).astype(jnp.float32) * 1e-6)
        return jax.lax.fori_loop(0, 20, body, jnp.zeros((), jnp.float32))
    float(np.asarray(chained(st.pos)))
    t0 = time.perf_counter()
    float(np.asarray(chained(st.pos)))
    ms = (time.perf_counter() - t0) * 1e3 / 20
    print(f"{name}: {ms:.2f} ms @ N=1M", flush=True)
    return ms

def lists_fence(pos4):
    c, m = pallas_force.dense_lists_half(pos4, v32, spec, 2.8, False)
    return jnp.sum(c).astype(jnp.float32) + m[0, 0, 0, 0, 0].astype(jnp.float32) * 0.0

def counts_fence(pos4):
    c = pallas_force.dense_counts_half(pos4, v32, spec, 2.8, False)
    return jnp.sum(c).astype(jnp.float32)

timed("half counts only     ", counts_fence)
timed("half lists (artifact)", lists_fence)
print("SMOKE OK", flush=True)
