"""Primitive-cost probe for the incremental-rebuild design space
(VERDICT r2 item 2). Decisions hang on measured rates for:

  - lax.sort at S=slots with 2 / 4 / 8 payload channels (is the 8-payload
    rebuild sort width-bound or size-bound?)
  - row-gather of M records x 8 channels from an (S, 8) matrix (mover
    extraction after a narrow sort)
  - element gather / scatter-add at 1M (the rates the dense design exists
    to avoid — re-measured for the record)
  - elementwise pass over the dense state (the floor)
"""
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

ap = argparse.ArgumentParser()
ap.add_argument("--s", type=int, default=1_372_000)  # N=1M dense slots
ap.add_argument("--m", type=int, default=262_144)    # mover bound
ap.add_argument("--reps", type=int, default=10)
args = ap.parse_args()
S, M, reps = args.s, args.m, args.reps

print(f"device: {jax.devices()[0]}  S={S} M={M}", flush=True)
key = jax.random.PRNGKey(0)
keys_i = jax.random.randint(key, (S,), 0, 42875, dtype=jnp.int32)
chans = [jax.random.normal(jax.random.PRNGKey(i), (S,), jnp.float32)
         for i in range(8)]
recs = jnp.stack(chans, axis=1)  # (S, 8)
idx = jax.random.randint(jax.random.PRNGKey(9), (M,), 0, S, jnp.int32)
idx1m = jax.random.randint(jax.random.PRNGKey(10), (1_000_000,), 0, S,
                           jnp.int32)


def timed(name, fn, *a):
    @jax.jit
    def chained(*a):
        def body(i, acc):
            return acc + fn(i, *a)
        return lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))
    float(np.asarray(chained(*a)))
    t0 = time.perf_counter()
    float(np.asarray(chained(*a)))
    ms = (time.perf_counter() - t0) * 1e3 / reps
    print(f"{name:46s}: {ms:8.2f} ms", flush=True)
    return ms


def sort_np(np_):
    def fn(i, keys_i, *cs):
        out = lax.sort((keys_i + i,) + cs[:np_], dimension=0, num_keys=1)
        return out[1][0] + out[0][-1].astype(jnp.float32)
    return fn


timed("sort S, 2 payload chans", sort_np(2), keys_i, *chans)
timed("sort S, 4 payload chans", sort_np(4), keys_i, *chans)
timed("sort S, 8 payload chans", sort_np(8), keys_i, *chans)

timed("row-gather (M, 8) from (S, 8)",
      lambda i, recs, idx: jnp.sum(recs[(idx + i) % S][:, 0]), recs, idx)
timed("element gather 1M",
      lambda i, c, idx1m: jnp.sum(c[(idx1m + i) % S]), chans[0], idx1m)
timed("element scatter-add 1M",
      lambda i, c, idx1m: jnp.zeros((S,), jnp.float32)
      .at[(idx1m + i) % S].add(c[:1_000_000]).sum() * 0 + c[0],
      chans[0], idx1m)
timed("elementwise pass over 8 chans",
      lambda i, recs: jnp.sum(recs * (1.0 + i)) * 1e-9, recs)
timed("argsort-free rank: searchsorted-style count_less",
      lambda i, keys_i: jnp.sum(
          jnp.searchsorted(
              jnp.sort(keys_i), jnp.arange(0, 42876, 35, dtype=jnp.int32),
              method="compare_all").astype(jnp.float32)) * 1e-9 + i * 0.0,
      keys_i)
print("DONE", flush=True)
