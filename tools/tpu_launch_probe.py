"""Isolate the force pass's per-program fixed cost (launch + block DMA).

The post-adoption force pass (18.7 ms at N=1M cap=40) runs 1225 programs
on the merged (mc, mc) grid. The VPU-ceiling accounting (COMPONENTS.md)
attributes ~11 ms to issue-bound candidate math; this probe measures the
rest directly:

  zeros        — same grid and OUTPUT specs as the production force call,
                 kernel only writes zeros: launch + output DMA floor.
  zeros+in     — adds the production's six (1, 3, mc, cap) parked-state
                 input block fetches: + input DMA cost.
  zeros+in+win — adds the five in-kernel window builds (rolls + scratch
                 round-trips + concat) whose results feed a trivial sum,
                 bounding the window-build share of the kernel.

If (zeros+in) is small, a z-plane grid restructure (mc programs instead
of mc^2) has little to win and the kernel is genuinely issue-bound.
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
from md_neighbor_list_tpu.ops import pallas_force
from md_neighbor_list_tpu.ops.pallas_force import (
    HALF_OFFSETS5, _state_specs_merged, _window_from_block, _window_scratch,
    park_state)
from md_neighbor_list_tpu.ops.dense_cells import (from_packed, make_spec,
                                                  rebuild_dense)

N = 1_000_000
system, box = init_lattice(N, 1.0, jax.random.PRNGKey(0), 1.0)
spec = make_spec(box, 2.8, cap=40)
st = from_packed(system.pos, system.vel, system.pid, spec)
st, _ = rebuild_dense(st, spec, False)
v32 = st.valid().astype(jnp.float32)
mc, cap = spec.mc, spec.cap
print(f"device: {jax.devices()[0]}  N={N} mc={mc} cap={cap}", flush=True)


def out_specs_shapes():
    def rxn(k):
        dz, dy = HALF_OFFSETS5[k]
        return lambda z, y: (0, ((z + dz) % mc) * mc + ((y + dy) % mc),
                             0, 0)
    specs = [pl.BlockSpec((3, 1, mc, cap), lambda z, y: (0, z * mc + y,
                                                         0, 0),
                          memory_space=pltpu.VMEM)]
    shapes = [jax.ShapeDtypeStruct((3, spec.rows, mc, cap), jnp.float32)]
    for k in range(1, 5):
        specs.append(pl.BlockSpec((3, 1, mc, cap), rxn(k),
                                  memory_space=pltpu.VMEM))
        shapes.append(jax.ShapeDtypeStruct((3, spec.rows, mc, cap),
                                           jnp.float32))
    return specs, shapes


def k_zeros(*refs):
    outs = refs[-5:]
    z = jnp.zeros((mc, cap), jnp.float32)
    for o in outs:
        for c in range(3):
            o[c, 0] = z


def k_zeros_in(*refs):
    outs = refs[-5:]
    acc = refs[0][0, 0] * 0.0
    for i in range(1, 6):
        acc = acc + refs[i][0, 0] * 0.0
    for o in outs:
        for c in range(3):
            o[c, 0] = acc


# NOTE (post-adoption): _state_specs_merged now reads the CHANNEL-LEADING
# engine state directly (park invariant) — this probe passes the parked
# state.pos verbatim.


def k_zeros_in_win(*refs):
    nbr = refs[:5]
    own = refs[5][:, 0]
    outs = refs[6:11]
    scr = refs[11:]
    acc = jnp.zeros((mc, cap), jnp.float32)
    for i in range(5):
        wx, wy, wz = _window_from_block(own if i == 0 else nbr[i][:, 0],
                                        spec, scr)
        acc = acc + (wx[:, :cap] + wy[:, cap:2 * cap]
                     + wz[:, 2 * cap:]) * 0.0
    for o in outs:
        for c in range(3):
            o[c, 0] = acc


def timed(name, kernel, with_in, scratch):
    ospecs, oshapes = out_specs_shapes()
    ispecs = _state_specs_merged(spec) + [_state_specs_merged(spec)[0]]

    def fn(parked):
        outs = pl.pallas_call(
            kernel,
            grid=(mc, mc),
            in_specs=ispecs if with_in else [],
            out_specs=ospecs,
            out_shape=oshapes,
            scratch_shapes=_window_scratch(spec) if scratch else [],
        )(*([parked] * 6 if with_in else []))
        s = outs[0]
        for o in outs[1:]:
            s = s + o
        return jnp.sum(s[0, 0, 0])

    parked = st.pos  # parked by the rebuild (park invariant)

    @jax.jit
    def chained(p):
        def body(i, acc):
            return acc + fn(p + i * 0.0)
        return jax.lax.fori_loop(0, 10, body, jnp.zeros((), jnp.float32))

    float(np.asarray(chained(parked)))
    t0 = time.perf_counter()
    float(np.asarray(chained(parked)))
    ms = (time.perf_counter() - t0) * 1e2
    print(f"{name:16s}: {ms:7.2f} ms ({ms * 1e3 / (mc * mc):.2f} us/prog)",
          flush=True)


def timed_force(name):
    def fn(pos4):
        f, _ = pallas_force.dense_forces_half(pos4, v32, spec, 2.5, False,
                                              False)
        return jnp.sum(f[0, 0, 0])

    @jax.jit
    def chained(p):
        def body(i, acc):
            return acc + fn(p + (i % 2).astype(jnp.float32) * 1e-6)
        return jax.lax.fori_loop(0, 10, body, jnp.zeros((), jnp.float32))

    float(np.asarray(chained(st.pos)))
    t0 = time.perf_counter()
    float(np.asarray(chained(st.pos)))
    print(f"{name:16s}: {(time.perf_counter() - t0) * 1e2:7.2f} ms",
          flush=True)


timed("zeros", k_zeros, False, False)
timed("zeros+in", k_zeros_in, True, False)
timed("zeros+in+win", k_zeros_in_win, True, True)
timed_force("production")
