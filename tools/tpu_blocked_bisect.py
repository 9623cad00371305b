"""Bisect the blocked-expand kernel's Mosaic SIGABRT (round 5).

The blocked layout (ops/dense_cells._expand_kernel_blocked) crashes the
TPU compile helper with SIGABRT — no error text survives the remote
tunnel. This compiles a ladder of stripped-down kernels, each adding one
of the suspect ops, to pin the killer:

  k0  window DMA only: (8, nb, 128) ANY ref, 8-aligned sublane slice ->
      (2, 8, nbw, 128) scratch, double-buffered, copy out a plane
  k1  + 4-D scratch channel read win2[slot, c] -> (nbw, 128)
  k2  + the (gm+1, nbw, 128) broadcast compare + axis (1,2) reduction
  k3  + one-hot f32 dot_general (HIGHEST) gather
  k4  + conditional pltpu.roll chain + lane select
  full  the real _expand_kernel_blocked via rebuild_dense(blocked=True)

    python tools/tpu_blocked_bisect.py
"""
from __future__ import annotations

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

MC, CAP, G = 16, 40, 2
GM = G * MC
ROWS = MC * MC
NB = 512  # record blocks
W = 2048
NBW = W // 128


def kern(level, row_start_ref, recs_hbm, out_ref, win2, sems):
    r = pl.program_id(0)
    nprogs = pl.num_programs(0)
    slot = jax.lax.rem(r, 2)

    def dma(prog, buf):
        j0 = (row_start_ref[prog * G] // 1024) * 8
        return pltpu.make_async_copy(
            recs_hbm.at[:, pl.ds(j0, NBW), :], win2.at[buf], sems.at[buf])

    @pl.when(r == 0)
    def _():
        dma(0, 0).start()

    @pl.when(r + 1 < nprogs)
    def _():
        dma(r + 1, jax.lax.rem(r + 1, 2)).start()

    dma(r, slot).wait()

    if level == 0:
        out_ref[...] = jnp.broadcast_to(
            win2[slot, 0, 0, :][None, :], (GM, 128))[:, :CAP].reshape(
                G, MC, CAP)
        return
    keys = win2[slot, 7]  # (NBW, 128)
    if level == 1:
        out_ref[...] = jnp.broadcast_to(
            keys[0][None, :], (GM, 128))[:, :CAP].reshape(G, MC, CAP)
        return
    cell_ids = (r * GM + jax.lax.broadcasted_iota(
        jnp.int32, (GM + 1, 1, 1), 0)).astype(jnp.float32)
    less = (keys[None] < cell_ids).astype(jnp.int32)
    per_block = jnp.sum(less, axis=2)  # (GM+1, NBW) — never 1-D
    off_ext = jnp.sum(per_block, axis=1, keepdims=True)  # (GM+1, 1)
    off = off_ext[:GM]
    length = off_ext[1:] - off
    if level == 2:
        out_ref[...] = jnp.broadcast_to(
            off.astype(jnp.float32), (GM, CAP)).reshape(G, MC, CAP)
        return
    j = off // 128
    rr = off - j * 128
    blocks = jax.lax.broadcasted_iota(jnp.int32, (GM, NBW), 1)
    oh_a = (blocks == j).astype(jnp.float32)
    oh_b = (blocks == j + 1).astype(jnp.float32)
    plane = win2[slot, 0]
    a = jax.lax.dot_general(oh_a, plane, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    b = jax.lax.dot_general(oh_b, plane, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
    if level == 3:
        out_ref[...] = (a + b)[:, :CAP].reshape(G, MC, CAP)
        return
    s0 = jnp.mod(128 - rr, 128)  # (GM, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (GM, 128), 1)
    from_a = lane < (128 - rr)
    bit = 1
    while bit < 128:
        ra = pltpu.roll(a, bit, axis=1)
        rb = pltpu.roll(b, bit, axis=1)
        hit = (s0 & bit) != 0
        a = jnp.where(hit, ra, a)
        b = jnp.where(hit, rb, b)
        bit <<= 1
    d = jnp.where(from_a, a, b)[:, :CAP]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (GM, CAP), 1)
    d = jnp.where(slot_iota < jnp.minimum(length, CAP), d, 0.0)
    out_ref[...] = d.reshape(G, MC, CAP)


def compile_level(level):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ROWS // G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((G, MC, CAP), lambda r, *_: (r, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((2, 8, NBW, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    f = pl.pallas_call(
        functools.partial(kern, level),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ROWS, MC, CAP), jnp.float32)],
    )
    rs = jax.ShapeDtypeStruct((ROWS + 1,), jnp.int32)
    recs = jax.ShapeDtypeStruct((8, NB, 128), jnp.float32)
    jax.jit(f).lower(rs, recs).compile()


def main() -> int:
    print(f"device: {jax.devices()[0]}", flush=True)
    for level in range(5):
        t0 = time.time()
        try:
            compile_level(level)
            print(f"k{level}: compiled ({time.time() - t0:.1f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"k{level}: FAIL {str(e).splitlines()[0][:160]}",
                  flush=True)
    # the real thing at small shape
    from md_neighbor_list_tpu.core.system import init_lattice
    from md_neighbor_list_tpu.ops.dense_cells import (from_packed,
                                                      make_spec,
                                                      rebuild_dense)
    system, box = init_lattice(16384, 1.0)
    spec = make_spec(box, 2.8, cap=40)
    st = from_packed(system.pos, system.vel, system.pid, spec)
    try:
        t0 = time.time()
        new, _ = rebuild_dense(st, spec, False, False, 0, True)
        new.pid.block_until_ready()
        print(f"full blocked rebuild at n=16k: ran ({time.time()-t0:.1f}s)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"full blocked rebuild: FAIL {str(e).splitlines()[0][:160]}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
