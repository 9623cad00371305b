"""Row-starts variants on the real chip, standalone AND inside the full
rebuild (the number that matters — sort_expand is the consumer).

Variants:
  hier     — production _count_less: recursive 128-strided subsample,
             gather window per level (2 gather rounds at S=1.7M/14.3M)
  hier_t   — _count_less with the compare_all leaf threshold raised so the
             SECOND gather round is replaced by a dense compare on the
             subsampled keys (compares are ~1.2e12/s; window gathers are
             latency-bound)
  rowg     — one-level: dense compare on the 128-strided subsample, then a
             2-ROW gather from the (S/128, 128) reshape — the window
             starts are 128-aligned by construction, so the element gather
             becomes two contiguous row fetches
  hist     — one-hot bf16 histogram MATMUL over the UNSORTED keys + cumsum

Canonical numbers (round-5 run at S=1.715M — the cite shared with
ops/dense_cells._row_starts): standalone hier 1.53 / hier_t 2.54 /
rowg 1.61 / hist 4.55 ms; INSIDE the full rebuild all four variants
measure 12.8-13.0 ms (indistinguishable — XLA overlaps the sub-2 ms
variants with neighboring ops). Standalone sub-2 ms timings vary
~±0.3 ms between tunnel sessions; earlier rounds' quotes
(1.26/3.64/4.64 and 2.72/3.62) were different sessions of this probe.

All variants are asserted EQUAL on the production key stream before
timing. Usage: python tools/tpu_rowstarts_probe.py --n 1000000 [--reps 20]
"""
import argparse, sys, pathlib, time
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))

from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.ops import dense_cells as dc
from md_neighbor_list_tpu.ops.dense_cells import (cell_keys, from_packed,
                                                  make_spec, rebuild_dense)

ap = argparse.ArgumentParser()
ap.add_argument("--n", type=int, default=1_000_000)
ap.add_argument("--cap", type=int, default=40)
ap.add_argument("--reps", type=int, default=20)
args = ap.parse_args()

print(f"device: {jax.devices()[0]}  N={args.n} cap={args.cap}", flush=True)
system, box = init_lattice(args.n, 1.0, jax.random.PRNGKey(0), 1.0)
spec = make_spec(box, 2.8, cap=args.cap)
st = from_packed(system.pos, system.vel, system.pid, spec)
st, _ = rebuild_dense(st, spec, False)

keys = dc._flat(cell_keys(st, spec))
k_s = jax.jit(lambda k: jax.lax.sort(k))(keys)
k_s.block_until_ready()
R, mc = spec.rows, spec.mc
print(f"S = {keys.shape[0]}  R+1 queries = {R + 1}", flush=True)


def hier(sorted_keys, _unsorted):
    return dc._row_starts(sorted_keys, spec)


def hier_t(sorted_keys, _unsorted):
    """Raise the compare_all leaf so only ONE gather round remains."""
    q = jnp.arange(R + 1, dtype=jnp.int32) * mc
    S = sorted_keys.shape[0]
    sub = sorted_keys[:: dc._RS_STRIDE]
    coarse = jnp.sum(
        (sub[None, :] < q[:, None]).astype(jnp.int32), axis=1)
    base = jnp.maximum(coarse - 1, 0) * dc._RS_STRIDE
    guard = jnp.full((dc._RS_STRIDE,), sorted_keys[-1], sorted_keys.dtype)
    keys_g = jnp.concatenate([sorted_keys, guard])
    win = keys_g[base[:, None]
                 + jnp.arange(dc._RS_STRIDE + 1, dtype=jnp.int32)[None, :]]
    return jnp.minimum(
        base + jnp.sum((win < q[:, None]).astype(jnp.int32), axis=1),
        jnp.int32(S)).astype(jnp.int32)


def rowg(sorted_keys, _unsorted):
    """One dense coarse compare + a 2-row gather from the (S/128, 128)
    reshape (the subsample IS column 0 of the reshape; window starts are
    128-aligned by construction)."""
    q = jnp.arange(R + 1, dtype=jnp.int32) * mc
    S = sorted_keys.shape[0]
    stride = dc._RS_STRIDE
    pad = (-S) % stride
    if pad:  # guard keys beyond every query never count
        sorted_keys = jnp.concatenate(
            [sorted_keys,
             jnp.full((pad,), jnp.iinfo(jnp.int32).max, sorted_keys.dtype)])
    k2 = sorted_keys.reshape(-1, stride)
    sub = k2[:, 0]
    coarse = jnp.sum(
        (sub[None, :] < q[:, None]).astype(jnp.int32), axis=1)
    j = jnp.maximum(coarse - 1, 0)
    guard = jnp.full((1, stride), sorted_keys[-1], sorted_keys.dtype)
    k2g = jnp.concatenate([k2, guard], axis=0)
    win = jnp.concatenate([k2g[j], k2g[j + 1]], axis=1)  # (Q, 256)
    # bracket property: keys at/after index 128*coarse are >= q, so the
    # wide window never overcounts
    return jnp.minimum(
        j * stride + jnp.sum((win < q[:, None]).astype(jnp.int32), axis=1),
        jnp.int32(S)).astype(jnp.int32)


def hist(_sorted, unsorted_keys):
    return dc._row_starts_hist(unsorted_keys, spec)[: R + 1]


VARIANTS = [("hier", hier), ("hier_t", hier_t), ("rowg", rowg),
            ("hist", hist)]

ref = np.asarray(hier(k_s, keys))
for name, fn in VARIANTS:
    got = np.asarray(jax.jit(fn)(k_s, keys))[: R + 1]
    ok = np.array_equal(ref, got[: R + 1])
    print(f"{name:8s} equal: {ok}", flush=True)
    assert ok, f"{name} disagrees with production row starts"

reps = args.reps
for name, fn in VARIANTS:
    @jax.jit
    def chained(ks, ku):
        def body(i, acc):
            r = fn(ks + (i % 2), ku + (i % 2))
            return acc + r[0] + r[-1]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.int32))
    int(chained(k_s, keys))
    t0 = time.perf_counter()
    int(chained(k_s, keys))
    ms = (time.perf_counter() - t0) * 1e3 / reps
    print(f"standalone {name:8s}: {ms:7.3f} ms", flush=True)

# ---- inside the full rebuild (the consumer) --------------------------
# sort_expand calls dc._row_starts(k_s, spec, key_base) on the SORTED
# keys — monkeypatch that symbol per variant (hist is order-independent,
# so feeding it the sorted stream is fair).
saved = dc._row_starts
for name, fn in VARIANTS:
    if name == "hist":
        dc._row_starts = lambda ks, sp, kb=0: dc._row_starts_hist(
            ks, sp, kb)
    else:
        dc._row_starts = lambda ks, sp, kb=0, fn=fn: fn(ks, None)
    try:
        @jax.jit
        def reb(state):
            def body(i, acc):
                s2 = state._replace(
                    pos=state.pos + (i % 2).astype(jnp.float32) * 1e-6)
                new, rs_out = rebuild_dense(s2, spec, False)
                return (acc + new.pos[0, 0, 0, 0]
                        + rs_out[-1].astype(jnp.float32))
            return jax.lax.fori_loop(
                0, reps, body, jnp.zeros((), jnp.float32))

        float(reb(st))
        t0 = time.perf_counter()
        float(reb(st))
        ms = (time.perf_counter() - t0) * 1e3 / reps
        print(f"full rebuild w/ {name:8s}: {ms:7.3f} ms", flush=True)
    finally:
        dc._row_starts = saved
