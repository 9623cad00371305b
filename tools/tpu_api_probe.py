"""Measured one-shot cost of the one-call API on the real chip — the
README "one-call API" note's number (VERDICT r3 ask 8 / r4 missing-5).

Times api.neighbor_list(pos, L, radius, backend=...) at N=1M the way a
user calls it: ONE call from packed (N, 3) positions to padded (N, K)
lists — cold (compile included) and warm — for BOTH backends: "dense"
(Pallas rebuild + list kernels + host-side native mask decode + device
push of the rows) and "xla" (the pure-XLA sweep, whose (N, K) rows are
born on device and never leave it). --phases decomposes the dense path
so engine cost and relay-tunnel transfer cost are attributed separately.

    python tools/tpu_api_probe.py [--n 1000000] [--phases]
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

from md_neighbor_list_tpu import api
from md_neighbor_list_tpu.core.system import init_lattice


def _timed_backend(pos, L, radius, backend):
    t0 = time.perf_counter()
    idx, cnt = api.neighbor_list(pos, L, radius, half=True, backend=backend)
    # fence on a device-side scalar (the relay neither honors
    # block_until_ready nor fetches arrays fast) — idx/cnt stay resident
    pairs = int(np.asarray(jnp.sum(cnt)))
    cold_s = time.perf_counter() - t0
    print(f"[{backend}] one-shot COLD (compile + build): {cold_s:.1f} s  "
          f"K={idx.shape[1]} pairs={pairs}", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        idx, cnt = api.neighbor_list(pos, L, radius, half=True,
                                     backend=backend)
        int(np.asarray(jnp.sum(cnt)))
        times.append(time.perf_counter() - t0)
    warm_ms = sorted(times)[1] * 1e3
    print(f"[{backend}] one-shot WARM: {warm_ms:.1f} ms (runs "
          f"{[round(t * 1e3, 1) for t in times]})", flush=True)
    return pairs


def _dense_phases(pos, box, radius):
    """Decompose the dense one-shot: device build (rebuild + list kernels,
    fenced on a device scalar) vs host decode (mask fetch + native C++
    walk) vs the device push of the (N, K) rows. On this box the relay
    tunnel makes the two transfer phases dominate; the split keeps the
    README note honest about what is engine cost vs environment cost."""
    from md_neighbor_list_tpu.ops import pallas_force
    from md_neighbor_list_tpu.ops.decode import masks_to_padded
    from md_neighbor_list_tpu.ops.dense_cells import (from_packed, make_spec,
                                                      rebuild_dense)

    n = int(pos.shape[0])
    spec = make_spec(box, radius, 40)
    pid = jnp.arange(n, dtype=jnp.int32)
    vel = jnp.zeros_like(pos)

    def build(p):
        state, _ = rebuild_dense(from_packed(p, vel, pid, spec), spec, False)
        _, masks = pallas_force.dense_lists_half(
            state.pos, state.valid().astype(jnp.float32), spec, radius,
            False)
        return state.pid, masks

    jbuild = jax.jit(build)
    spid, masks = jbuild(pos)
    int(np.asarray(jnp.sum(spid)))  # warm fence
    t0 = time.perf_counter()
    spid, masks = jbuild(pos)
    int(np.asarray(jnp.sum(spid)))
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    masks_h = np.asarray(masks)
    pid_h = np.asarray(spid)
    t_fetch = time.perf_counter() - t0
    t0 = time.perf_counter()
    idx, cnt = masks_to_padded(masks_h, pid_h, spec, n=n)
    t_decode = time.perf_counter() - t0
    t0 = time.perf_counter()
    didx = jnp.asarray(idx)
    int(np.asarray(jnp.sum(didx[0])))
    t_push = time.perf_counter() - t0
    mb_fetch = (masks_h.nbytes + pid_h.nbytes) / 1e6
    mb_push = idx.nbytes / 1e6
    print(f"[dense] phases: device build {t_build * 1e3:.1f} ms | mask "
          f"fetch {t_fetch:.1f} s ({mb_fetch:.0f} MB) | native decode "
          f"{t_decode:.1f} s | idx push {t_push:.1f} s ({mb_push:.0f} MB) "
          f"— the transfers ride the relay tunnel, not PCIe", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--radius", type=float, default=2.8)
    ap.add_argument("--backends", default="dense,xla")
    ap.add_argument("--phases", action="store_true",
                    help="decompose the dense one-shot into device build / "
                         "mask fetch / native decode / idx push")
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}  N={args.n}", flush=True)
    system, box = init_lattice(args.n, 1.0, jax.random.PRNGKey(0), 1.0)
    pos = jnp.asarray(np.asarray(system.pos))  # concrete device array

    counts = {}  # EVERY backend's count is gated (round-5 review finding:
    # keeping only the last one let a dense miscount pass behind xla's)
    for backend in args.backends.split(","):
        counts[backend] = _timed_backend(pos, box.L, args.radius, backend)
    if args.phases:
        _dense_phases(pos, box, args.radius)

    ok = len(set(counts.values())) == 1  # backends must agree everywhere
    if args.n <= 200_000:  # O(N^2) oracle affordable
        from md_neighbor_list_tpu.ops import oracle
        want = int(oracle.pair_count(pos, box, args.radius))
        ok = all(v == want for v in counts.values())
        print(f"pair parity vs oracle: {counts} vs {want} "
              f"{'PASS' if ok else 'FAIL'}", flush=True)
        return 0 if ok else 1
    print(f"cross-backend pair parity: {counts} "
          f"{'PASS' if ok else 'FAIL'} (O(N^2) oracle skipped at this N; "
          "the validate_tpu ladder covers it)", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
