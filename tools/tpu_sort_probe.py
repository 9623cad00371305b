"""Sort-lever ablation at the N=8M rebuild shape (VERDICT r3 ask 3 /
r4 item 4): the round-5 per-phase decomposition pins the 8M rung's
entire build-side per-particle overhead on the 8-payload XLA sort
(16.8 vs 8.2 ns/particle at 1M — BASELINE.md phase table), so this
probe measures the escape hatches on hardware:

  monolithic     the production sort: (slots,) 8 operands, one call;
  batched        per-z-plane batched sort (71, slots/71) — the lower
                 bound an ideal plane-local scheme could reach (NOT
                 mover-correct: particles cross plane boundaries);
  keys+iota      sort (key, iota) then gather the 7 payload channels
                 through the permutation;
  batched+iota   both.

Measured 2026-08-21 (5-rep chained, device-scalar fenced):
monolithic 131.5 ms | batched 82.9 | keys+iota 1923 | batched+iota 1926.
Verdict in COMPONENTS.md ("8M decomposition + sort floor"): gathers are
~15x off the table; the batched 37% win is unreachable once movers are
routed (any mover-correct scheme needs a second full-width batched pass
or 3x-width inputs, erasing the saving; the incremental path's merge
kernels already cost ~58 ms at this N on top of whatever sort feeds
them). The monolithic sort stands as the measured floor.

    python tools/tpu_sort_probe.py [--mc 71] [--cap 40] [--reps 5]
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
from jax import lax

jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mc", type=int, default=71)
    ap.add_argument("--cap", type=int, default=40)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    mc, cap, reps = args.mc, args.cap, args.reps
    slots = mc * mc * mc * cap
    nz = mc
    per = slots // nz

    key = jax.random.randint(jax.random.PRNGKey(0), (slots,), 0,
                             mc ** 3).astype(jnp.int32)
    chans = tuple(
        jax.random.normal(jax.random.PRNGKey(i + 1), (slots,), jnp.float32)
        for i in range(7))

    def timed(name, body):
        def run(key, *chans):
            def step(i, carry):
                k, cs = carry
                return body(k + (i % 2).astype(jnp.int32), cs)
            k, cs = lax.fori_loop(0, reps, step, (key, chans))
            return k[0].astype(jnp.float32) + sum(c[0] for c in cs)
        jfn = jax.jit(run)
        float(np.asarray(jfn(key, *chans)))  # compile + warm
        t0 = time.perf_counter()
        float(np.asarray(jfn(key, *chans)))
        ms = (time.perf_counter() - t0) * 1e3 / reps
        print(f"{name:34s}: {ms:8.2f} ms", flush=True)

    def mono(k, cs):
        out = lax.sort((k,) + cs, dimension=0, num_keys=1)
        return out[0], tuple(out[1:])

    def batched(k, cs):
        kb = k.reshape(nz, per)
        csb = tuple(c.reshape(nz, per) for c in cs)
        out = lax.sort((kb,) + csb, dimension=1, num_keys=1)
        return out[0].reshape(-1), tuple(o.reshape(-1) for o in out[1:])

    def iota_gather(k, cs):
        idx = lax.iota(jnp.int32, k.shape[0])
        ks, perm = lax.sort((k, idx), dimension=0, num_keys=1)
        return ks, tuple(jnp.take(c, perm) for c in cs)

    def batched_iota(k, cs):
        kb = k.reshape(nz, per)
        idx = jnp.broadcast_to(lax.iota(jnp.int32, per), (nz, per))
        ks, perm = lax.sort((kb, idx), dimension=1, num_keys=1)
        flat = (perm + lax.iota(jnp.int32, nz)[:, None] * per).reshape(-1)
        return ks.reshape(-1), tuple(jnp.take(c, flat) for c in cs)

    print(f"device: {jax.devices()[0]}  slots={slots} nz={nz} per={per}",
          flush=True)
    timed("monolithic 8-payload", mono)
    timed("batched per-plane 8-payload", batched)
    timed("keys+iota then 7 gathers", iota_gather)
    timed("batched keys+iota + 7 gathers", batched_iota)
    return 0


if __name__ == "__main__":
    sys.exit(main())
