"""End-to-end N=8M neighbor-list delivery on hardware: build the packed
cluster-bitmask artifact on the TPU, fetch it to the host, and decode ALL
320,000,000 half pairs with the native C++ walker — the full reference
deliverable (BASELINE.json:5 "fixed-capacity padded half-neighbor lists")
at the scale ladder's top rung.

Correctness is checked against the analytically-known lattice structure:
at the N=8M simple-cubic lattice (spacing 1, rs=2.8) every particle has
exactly 80 neighbors (integer offsets with 1 <= |d|^2 <= 7 < 7.84: 6 + 12
+ 8 + 6 + 24 + 24), so the half-pair total is exactly 8e6 * 40 and the
decoded degree (bincount over BOTH endpoints) must be exactly 80 for every
particle — a per-particle-exact check over all 640M endpoints, far
stronger than the count alone. A 1M-pair random subsample is additionally
re-measured geometrically (min-image distance < rs from the lattice
coordinates).
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.ops import pallas_force
from md_neighbor_list_tpu.ops.dense_cells import (from_packed, make_spec,
                                                  rebuild_dense)
from md_neighbor_list_tpu.utils import native


def main():
    n = 8_000_000
    print(f"device: {jax.devices()[0]}", flush=True)
    t0 = time.time()
    system, box = init_lattice(n, 1.0)
    spec = make_spec(box, 2.8, cap=40)
    st = from_packed(system.pos, system.vel, system.pid, spec)
    st, _ = rebuild_dense(st, spec, False)
    v32 = st.valid().astype(jnp.float32)
    counts, masks = pallas_force.dense_lists_half(st.pos, v32, spec, 2.8,
                                                  False)
    total_dev = int(np.asarray(
        jnp.sum(jnp.where(st.valid(), counts.astype(jnp.int64), 0))))
    print(f"build on device: {time.time()-t0:.1f}s, "
          f"device pair count {total_dev}", flush=True)
    assert total_dev == n * 40, total_dev

    t0 = time.time()
    m = np.asarray(masks)
    pid = np.asarray(st.pid)
    print(f"artifact fetch: {time.time()-t0:.1f}s "
          f"({m.nbytes/1e9:.2f} GB masks)", flush=True)

    t0 = time.time()
    own, partner = native.decode_half(m, pid, spec.mc, spec.cap)
    dt_native = time.time() - t0
    print(f"native decode: {dt_native:.2f}s, {own.size} pairs "
          f"({own.size/dt_native/1e6:.0f} M pairs/s)", flush=True)
    assert own.size == n * 40, own.size

    t0 = time.time()
    deg = np.bincount(own, minlength=n) + np.bincount(partner, minlength=n)
    assert deg.shape[0] == n, "decoded pid out of range"
    assert (deg == 80).all(), "lattice degree must be exactly 80 everywhere"
    print(f"degree check: {time.time()-t0:.1f}s — all {n} particles at "
          "exactly 80 neighbors", flush=True)

    rng = np.random.default_rng(0)
    sel = rng.integers(0, own.size, 1_000_000)
    p = np.asarray(system.pos)
    d = p[own[sel]].astype(np.float64) - p[partner[sel]].astype(np.float64)
    d -= box.L * np.round(d / box.L)
    r = np.sqrt((d * d).sum(-1))
    assert (r < 2.8).all() and (r > 0.99).all(), (r.min(), r.max())
    print(f"geometry subsample: 1M pairs all at 1 <= r < 2.8 "
          f"(max {r.max():.3f})", flush=True)
    print("DECODE8M: ALL PASS", flush=True)


if __name__ == "__main__":
    main()
