"""Measure the realizable VPU issue ceiling at the force kernel's shapes.

The speed-of-light accounting (COMPONENTS.md "Force-pass floor") counts the
production half-sweep at ~28 VPU ops per candidate lane sustaining
~1.3e12 op/s, and brackets the v5e VPU peak at 1.0-3.9e12 op/s (8x128
lanes x 1-4 ALU ops/cycle at ~0.94 GHz). This probe pins the bracket: a
Pallas kernel on the production grid (mc, mc) and block shapes
(mc, cap, 3cap) runs nothing but f32 FMA chains, sweeping the number of
INDEPENDENT accumulator chains (instruction-level parallelism) so the
dependency-limited and issue-limited regimes are both visible. The
sustained op/s of the best variant IS the realizable ceiling for any
elementwise kernel at these shapes — if the production force kernel's
mixed stream (sub/mul/cmp/select/reciprocal) sits near it, the kernel is
issue-bound and the documented steps/s floor is proven; a large gap would
mean scheduling headroom worth chasing.

Ops accounting matches COMPONENTS.md: one FMA = one VPU op (the VPU's
multiply-add pipes retire one fused op per lane per cycle per ALU; the
force kernel's 28-op count also tallies fused ops, not flops).
"""
import argparse
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.ops.dense_cells import (from_packed, make_spec,
                                                  rebuild_dense)
from md_neighbor_list_tpu.ops.pallas_force import (_win_specs_merged,
                                                   make_windows)

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=1_000_000)
ap.add_argument("--cap", type=int, default=40)
ap.add_argument("--reps", type=int, default=10)
ap.add_argument("--depth", type=int, default=48,
                help="FMA steps per accumulator chain")
args = ap.parse_args()

print(f"device: {jax.devices()[0]}  N={args.n} cap={args.cap}", flush=True)
system, box = init_lattice(args.n, 1.0, jax.random.PRNGKey(0), 1.0)
spec = make_spec(box, 2.8, cap=args.cap)
st = from_packed(system.pos, system.vel, system.pid, spec)
st, _ = rebuild_dense(st, spec, False)
v32 = st.valid().astype(jnp.float32)
mc, cap = spec.mc, spec.cap
reps = args.reps
lanes = spec.rows * mc * cap * 3 * cap  # one (mc, cap, 3cap) cube per row


def fma_kernel(win_ref, own_ref, out_ref, *, chains: int, depth: int):
    """`chains` independent accumulators, each advanced `depth` FMAs over a
    production-shaped (mc, cap, 3cap) value. Seeds depend on the input so
    nothing folds away; the final combine is O(chains) and excluded from
    the op count (negligible at depth >= 32)."""
    xi = own_ref[0, 0, :, cap:2 * cap][:, :, None]
    xj = win_ref[0, 0][:, None, :]
    v = xi - xj  # (mc, cap, 3cap), production-shaped live value
    c = jnp.float32(0.999755859375)  # exact in f32; keeps values bounded
    accs = [v * jnp.float32(1.0 + 0.125 * k) for k in range(chains)]
    for _ in range(depth):
        accs = [a * c + v for a in accs]
    tot = accs[0]
    for a in accs[1:]:
        tot = tot + a
    out_ref[0] = jnp.sum(tot, axis=-1)


def run(chains: int, depth: int):
    specs = _win_specs_merged(spec)

    def fn(pos4):
        windows = make_windows(pos4, v32, spec)
        out = pl.pallas_call(
            functools.partial(fma_kernel, chains=chains, depth=depth),
            grid=(mc, mc),
            in_specs=[specs[1], specs[0]],
            out_specs=pl.BlockSpec((1, mc, cap),
                                   lambda z, y: (z * mc + y, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((spec.rows, mc, cap),
                                           jnp.float32),
        )(windows, windows)
        return jnp.sum(out[0, 0])

    @jax.jit
    def chained(pos4):
        def body(i, acc):
            return acc + fn(pos4 + (i % 2).astype(jnp.float32) * 1e-6)
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))

    float(np.asarray(chained(st.pos)))  # compile
    t0 = time.perf_counter()
    float(np.asarray(chained(st.pos)))
    ms = (time.perf_counter() - t0) * 1e3 / reps
    ops = lanes * chains * depth
    print(f"chains={chains:2d} depth={depth:3d}: {ms:8.2f} ms  "
          f"{ops / (ms * 1e-3):.3e} FMA/s", flush=True)
    return ms, ops


results = {}
for chains in (1, 2, 4, 8):
    results[chains] = run(chains, args.depth)

# subtract the fixed cost (windows build + DMA + the v setup) via a second
# depth so the slope gives the pure issue rate
print("--- slope (fixed-cost-free) rates, depth x2 ---", flush=True)
for chains in (1, 4):
    ms1, ops1 = results[chains]
    ms2, ops2 = run(chains, args.depth * 2)
    rate = (ops2 - ops1) / ((ms2 - ms1) * 1e-3)
    print(f"chains={chains}: marginal {rate:.3e} FMA/s", flush=True)
