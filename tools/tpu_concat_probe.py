"""Mosaic lowering probe: which in-kernel x-window constructions compile?

The in-kernel window build (pallas_force._window_from_block) concatenates
two pltpu.roll'ed (mc, cap) segments with the unrolled center on the lane
axis; real Mosaic rejects it ("result/input offset mismatch on non-concat
dimension" — the rolled operands carry non-zero sublane layout offsets,
and tpu.concatenate cannot relayout its inputs), while interpret mode
accepts it. This probe compiles candidate constructions standalone on the
chip and checks them against the XLA make_windows reference:

  a. scratch-store: write each segment into a (mc, 3cap) VMEM scratch at
     lane offsets 0/cap/2cap (stores normalize layout), read back whole.
  b. tripled-select: concat([b, b, b]) (identical layouts -> legal), roll
     the WHOLE (mc, 3cap) array by +1/-1 sublanes, then select per lane
     segment.
  c. store-normalized concat: round-trip each rolled segment through its
     own (mc, cap) scratch to zero the layout offset, then concat.
"""
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
from md_neighbor_list_tpu.ops.pallas_force import make_windows
from md_neighbor_list_tpu.ops.dense_cells import (from_packed, make_spec,
                                                  rebuild_dense)

N = 100_000
system, box = init_lattice(N, 1.0, jax.random.PRNGKey(0), 1.0)
spec = make_spec(box, 2.8, cap=40)
st = from_packed(system.pos, system.vel, system.pid, spec)
st, _ = rebuild_dense(st, spec, False)
v32 = st.valid().astype(jnp.float32)
mc, cap = spec.mc, spec.cap
print(f"device: {jax.devices()[0]}  mc={mc} cap={cap}", flush=True)

from md_neighbor_list_tpu.ops.pallas_force import park_state

parked = park_state(st.pos, v32, spec)
wins_ref = make_windows(st.pos, v32, spec)  # (R, 3, mc, 3cap) oracle


def seg_shifts():
    L = jnp.float32(spec.L)
    xcell = jax.lax.broadcasted_iota(jnp.int32, (mc, cap), 0)
    sh_m = jnp.where(xcell == 0, -L, 0.0)
    sh_p = jnp.where(xcell == mc - 1, L, 0.0)
    return sh_m, sh_p


def kern_a(state_ref, out_ref, scr):
    sh_m, sh_p = seg_shifts()
    for c in range(3):
        b = state_ref[0, c]
        left = pltpu.roll(b, 1, axis=0)
        right = pltpu.roll(b, mc - 1, axis=0)
        if c == 0:
            left = left + sh_m
            right = right + sh_p
        scr[:, 0:cap] = left
        scr[:, cap:2 * cap] = b
        scr[:, 2 * cap:] = right
        out_ref[0, c] = scr[:, :]


def kern_b(state_ref, out_ref):
    sh_m, sh_p = seg_shifts()
    lane = jax.lax.broadcasted_iota(jnp.int32, (mc, 3 * cap), 1)
    for c in range(3):
        b = state_ref[0, c]
        t = jnp.concatenate([b, b, b], axis=-1)
        tl = pltpu.roll(t, 1, axis=0)
        tr = pltpu.roll(t, mc - 1, axis=0)
        w = jnp.where(lane < cap, tl, jnp.where(lane < 2 * cap, t, tr))
        if c == 0:
            shm3 = jnp.concatenate([sh_m, sh_m, sh_m], axis=-1)
            shp3 = jnp.concatenate([sh_p, sh_p, sh_p], axis=-1)
            w = w + jnp.where(lane < cap, shm3,
                              jnp.where(lane < 2 * cap, 0.0, shp3))
        out_ref[0, c] = w


def kern_c(state_ref, out_ref, scr_l, scr_r):
    sh_m, sh_p = seg_shifts()
    for c in range(3):
        b = state_ref[0, c]
        scr_l[...] = pltpu.roll(b, 1, axis=0)
        scr_r[...] = pltpu.roll(b, mc - 1, axis=0)
        left = scr_l[...]
        right = scr_r[...]
        if c == 0:
            left = left + sh_m
            right = right + sh_p
        out_ref[0, c] = jnp.concatenate([left, b, right], axis=-1)


def run(name, kernel, scratches):
    try:
        fn = pl.pallas_call(
            kernel,
            grid=(spec.rows,),
            in_specs=[pl.BlockSpec((1, 3, mc, cap), lambda r: (r, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 3, mc, 3 * cap),
                                   lambda r: (r, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((spec.rows, 3, mc, 3 * cap),
                                           jnp.float32),
            scratch_shapes=scratches,
        )
        out = jax.jit(fn)(parked)
        ok = bool(jnp.all(out == wins_ref))
        print(f"{name}: compiled; bitwise=={ok}", flush=True)
        if ok:
            @jax.jit
            def chained(p):
                def body(i, acc):
                    return acc + jnp.sum(fn(p + i * 0.0)[0, 0, 0])
                return jax.lax.fori_loop(0, 10, body,
                                         jnp.zeros((), jnp.float32))
            float(np.asarray(chained(parked)))
            t0 = time.perf_counter()
            float(np.asarray(chained(parked)))
            print(f"{name}: {(time.perf_counter()-t0)*100:.2f} ms/pass",
                  flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        print(f"{name}: FAILED {msg[0][:160]}", flush=True)


run("a scratch-lane-stores", kern_a,
    [pltpu.VMEM((mc, 3 * cap), jnp.float32)])
run("b tripled-select", kern_b, [])
run("c store-normalized-concat", kern_c,
    [pltpu.VMEM((mc, cap), jnp.float32), pltpu.VMEM((mc, cap), jnp.float32)])
