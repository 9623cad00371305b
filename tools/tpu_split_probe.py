"""Measure kernel-specific _split_rows constants (ADVICE r2 low #4).

_split_rows gates the 5-row merged kernels on a live-temporary model
calibrated on the FORCE kernel (16 live (mc, cap, 3cap) f32 intermediates).
The counts/lists kernels have smaller live sets, so at N=8M shapes they may
fit merged where the conservative shared constant forces 5 split launches
(plus a mask concat). This probe compiles+times the merged counts and lists
kernels at the N=8M shape (mc=71, cap=40) directly — if Mosaic refuses
(VMEM OOM) that's the answer too.
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
from md_neighbor_list_tpu.ops import pallas_force
from md_neighbor_list_tpu.ops.pallas_force import (
    _count_half_kernel, _list_half_kernel, _win_specs_merged, make_windows,
    mask_words)
from md_neighbor_list_tpu.ops.dense_cells import (from_packed, make_spec,
                                                  rebuild_dense)

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=8_000_000)
ap.add_argument("--cap", type=int, default=40)
ap.add_argument("--reps", type=int, default=5)
ap.add_argument("--mode", default="all", choices=["all", "force", "counts"])
ap.add_argument("--pe", action="store_true",
                help="also probe the want_pe (diagnostics) force variants")
args = ap.parse_args()

print(f"device: {jax.devices()[0]}  N={args.n} cap={args.cap}", flush=True)
system, box = init_lattice(args.n, 1.0, jax.random.PRNGKey(0), 1.0)
spec = make_spec(box, 2.8, cap=args.cap)
print(f"mc={spec.mc}: _split_rows(force-model) = "
      f"{pallas_force._split_rows(spec)}", flush=True)
st = from_packed(system.pos, system.vel, system.pid, spec)
st, _ = rebuild_dense(st, spec, False)
v32 = st.valid().astype(jnp.float32)
mc, cap = spec.mc, spec.cap


def timed(name, fn):
    try:
        @jax.jit
        def chained(pos4):
            def body(i, acc):
                return acc + fn(pos4 + (i % 2).astype(jnp.float32) * 1e-6)
            return jax.lax.fori_loop(
                0, args.reps, body, jnp.zeros((), jnp.float32))
        float(np.asarray(chained(st.pos)))
        t0 = time.perf_counter()
        float(np.asarray(chained(st.pos)))
        ms = (time.perf_counter() - t0) * 1e3 / args.reps
        print(f"{name:40s}: {ms:8.2f} ms", flush=True)
        return ms
    except Exception as e:  # Mosaic VMEM OOM etc.
        print(f"{name:40s}: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
        return None


def merged_counts(pos4):
    windows = make_windows(pos4, v32, spec)
    specs = _win_specs_merged(spec)
    c = pl.pallas_call(
        functools.partial(_count_half_kernel, spec=spec, radius=2.8,
                          ks=(0, 1, 2, 3, 4)),
        grid=(mc, mc),
        in_specs=specs + [specs[0]],
        out_specs=pl.BlockSpec((1, mc, cap), lambda z, y: (z * mc + y, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((spec.rows, mc, cap), jnp.float32),
    )(*([windows] * 5), windows)
    return jnp.sum(c)


def merged_lists(pos4):
    windows = make_windows(pos4, v32, spec)
    specs = _win_specs_merged(spec)
    words = mask_words(cap)
    nm = 5 * words
    m, c = pl.pallas_call(
        functools.partial(_list_half_kernel, spec=spec, radius=2.8,
                          ks=(0, 1, 2, 3, 4)),
        grid=(mc, mc),
        in_specs=specs + [specs[0]],
        out_specs=[
            pl.BlockSpec((nm, 1, mc, 3 * cap),
                         lambda z, y: (0, z * mc + y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mc, cap), lambda z, y: (z * mc + y, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nm, spec.rows, mc, 3 * cap), jnp.int32),
            jax.ShapeDtypeStruct((spec.rows, mc, cap), jnp.float32),
        ],
    )(*([windows] * 5), windows)
    return jnp.sum(c) + m[0, 0, 0, 0].astype(jnp.float32) * 0.0


def split_counts(pos4):
    return jnp.sum(pallas_force.dense_counts_half(
        pos4, v32, spec, 2.8, False)).astype(jnp.float32)


def split_lists(pos4):
    c, m = pallas_force.dense_lists_half(pos4, v32, spec, 2.8, False)
    return jnp.sum(c).astype(jnp.float32) + m[0, 0, 0, 0, 0] * 0.0


def force_with_plan(plan, want_pe=False):
    def fn(pos4):
        orig = pallas_force._row_groups
        pallas_force._row_groups = lambda s, w=False, p=plan: p
        try:
            f, pe = pallas_force.dense_forces_half.__wrapped__(
                pos4, v32, spec, 2.5, False, want_pe)
        finally:
            pallas_force._row_groups = orig
        out = jnp.sum(f[0, 0, 0])
        return out + (jnp.sum(pe[0, 0]) if want_pe else 0.0)
    return fn


PLANS = {
    "merged(5)": [(0, 1, 2, 3, 4)],
    "groups(3,2)": [(0, 1, 2), (3, 4)],
    "groups(2,2,1)": [(0, 1), (2, 3), (4,)],
    "singletons": [(0,), (1,), (2,), (3,), (4,)],
}

if args.mode in ("force", "all"):
    print(f"force plans at mc={mc} cap={cap} "
          f"(policy: {pallas_force._row_groups(spec)})", flush=True)
    for name, plan in PLANS.items():
        timed(f"force {name}", force_with_plan(plan))
    if args.pe:
        print(f"force+pe plans (policy: "
              f"{pallas_force._row_groups(spec, True)})", flush=True)
        for name, plan in PLANS.items():
            timed(f"force+pe {name}", force_with_plan(plan, want_pe=True))

if args.mode in ("counts", "all"):
    timed("counts split (production)", split_counts)
    timed("counts MERGED at N=8M shape", merged_counts)
    timed("lists split (production)", split_lists)
    timed("lists MERGED at N=8M shape", merged_lists)
print("DONE", flush=True)
