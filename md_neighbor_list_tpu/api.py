"""One-call neighbor-list API — the library's front door.

The reference's core contract (SURVEY.md §3 R5–R8; BASELINE.json:5) is
"given positions + box + search radius, emit a per-particle neighbor list /
pair list". Inside the engines that contract is spread across binning specs,
dense states, and capacity policies; this module collapses it back to the
one call a downstream user of a neighbor-list library expects:

    import md_neighbor_list_tpu as mdnl
    idx, cnt = mdnl.neighbor_list(pos, L, 2.8)         # (N, K) + (N,)
    i, j = mdnl.pair_list(pos, L, 2.8)                 # explicit pairs

Contract: rows and entries are in the CALLER's particle order, padded with
the sentinel ``N`` (a gather of a padded slot hits a ghost row, SURVEY.md
§4.3); capacities are estimated from density (core/capacity.py) and grown
on detected overflow — never silently truncated (SURVEY.md §6.2). The
implementation is the pure-XLA sweep (ops/pairlist.py), which runs on CPU
and TPU alike and is parity-tested against the O(N²) oracle; for maximum
single-chip throughput inside an MD loop use ``DenseSimulator`` (Pallas
kernels) instead — this entry point is for library-style one-shot builds.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from md_neighbor_list_tpu.core.box import Box
from md_neighbor_list_tpu.core.capacity import estimate
from md_neighbor_list_tpu.ops import oracle
from md_neighbor_list_tpu.ops.binning import make_grid
from md_neighbor_list_tpu.ops.pairlist import build_neighbor_lists_stable


def _as_box(box) -> Box:
    return box if isinstance(box, Box) else Box(L=float(box))


def _dense_neighbor_list(pos, box: Box, radius: float, half: bool,
                         k_cap: int | None):
    """The dense-engine fast path: Pallas rebuild + one-pass half-list
    kernel + host-side mask decode (native C++ walker). Same (idx, cnt)
    contract as the XLA path — rows in caller order, sentinel N padding —
    an order of magnitude faster at N >= ~1M on TPU where the XLA sweep's
    gather-heavy build dominates. Capacity overflows (a cell holding more
    than ``cap`` particles) are detected by slot-count conservation and
    recovered by cap growth, never truncated (SURVEY.md §4.3)."""
    from md_neighbor_list_tpu.ops import pallas_force
    from md_neighbor_list_tpu.ops.decode import masks_to_padded
    from md_neighbor_list_tpu.ops.dense_cells import (from_packed, grow_cap,
                                                      make_spec,
                                                      rebuild_dense)

    n = int(pos.shape[0])
    pid = jnp.arange(n, dtype=jnp.int32)
    vel = jnp.zeros_like(pos)
    interp = jax.default_backend() == "cpu"  # Pallas interpret mode on CPU
    cap = 40  # production default occupancy envelope; grown on overflow
    while True:
        spec = make_spec(box, radius, cap)  # raises if mc < 3 (caller gates)
        if n > spec.slots:
            cap = grow_cap(cap)
            continue
        state, _ = rebuild_dense(from_packed(pos, vel, pid, spec), spec,
                                 interp)
        if int(jnp.sum(state.valid().astype(jnp.int32))) != n:
            cap = grow_cap(cap)  # a cell run overflowed its slots
            continue
        _, masks = pallas_force.dense_lists_half(
            state.pos, state.valid().astype(jnp.float32), spec, radius,
            interp)
        idx, cnt = masks_to_padded(masks, state.pid, spec, n=n, k_cap=k_cap,
                                   full=not half)
        return jnp.asarray(idx), jnp.asarray(cnt)


# auto-crossover: below this N the XLA sweep's one-shot build is already
# milliseconds and avoids the dense path's host-side decode; above it the
# dense rebuild+list kernels win by an order of magnitude on TPU
# (measured N=1M one-shot build: see README "one-call API" note).
DENSE_API_MIN_N = 500_000


def neighbor_list(pos, box, radius: float, *, half: bool = False,
                  k_cap: int | None = None, layout: str = "rowmajor",
                  chunk: int = 2048, backend: str = "auto"):
    """Fixed-capacity padded neighbor lists for arbitrary positions.

    Args:
      pos:    (N, 3) float32 positions; wrapped into [0, L) internally
              (binning clips out-of-box coordinates into boundary cells,
              so unwrapped input MUST be wrapped before cell assignment —
              min-image distance math alone does not bin correctly).
      box:    periodic cube side length L, or a ``Box``.
      radius: search radius (e.g. rc + skin).
      half:   True → Newton-3 half lists: each unordered pair appears in
              exactly ONE row (attribution follows the engine's internal
              spatial sort order, not index order — canonicalize with
              ``pair_list`` if you need i < j). False → full symmetric
              rows.
      k_cap:  fixed row capacity K. Default: estimated from density and
              grown automatically on overflow. If given explicitly, an
              overflow raises ``ValueError`` instead (the caller asked for
              a hard shape contract).
      layout: "rowmajor" or "morton" spatial sort key (C4) — identical
              output, different internal particle ordering (XLA backend
              only; the dense backend's layout is its own cell-block
              order).
      backend: "auto" (default), "xla", or "dense". "dense" routes the
              build through the Pallas dense engine + host-side mask
              decode — the fast path at large N on TPU. "auto" picks
              dense on a non-CPU backend when N >= DENSE_API_MIN_N and
              the box supports the dense grid (mc >= 3), else xla.

    Returns (idx, cnt): ``idx`` (N, K) int32, row i = neighbor indices of
    particle i in the caller's order, padded with sentinel N; ``cnt`` (N,)
    int32 true neighbor counts.
    """
    if backend not in ("auto", "xla", "dense"):
        raise ValueError(f"backend={backend!r}")
    box = _as_box(box)
    pos = box.wrap(jnp.asarray(pos, jnp.float32))
    n = int(pos.shape[0])
    grid = make_grid(box, radius)
    if n == 0:
        k = k_cap if k_cap is not None else 8
        return jnp.zeros((0, k), jnp.int32), jnp.zeros((0,), jnp.int32)

    use_dense = backend == "dense" or (
        backend == "auto"
        and jax.default_backend() != "cpu"
        and n >= DENSE_API_MIN_N
        and int(box.L / radius) >= 3
    )
    if use_dense:
        return _dense_neighbor_list(pos, box, radius, half, k_cap)
    rho = n / box.volume()
    est = estimate(rho, radius, grid.cell_size, half_list=half)
    k = k_cap if k_cap is not None else max(est.neighbors, 8)
    cell_cap = max(est.cell, 8)

    while True:
        if not grid.usable:
            idx, cnt = oracle.neighbors(pos, box, radius, k, half)
            row_of = bool(jnp.max(cnt) > k)
            cell_of = False
        else:
            nl = build_neighbor_lists_stable(
                pos, box, grid, radius, k, cell_cap, half,
                layout=layout, chunk=chunk,
            )
            idx, cnt = nl.idx, nl.count
            cell_of = int(nl.cell_max) > cell_cap
            row_of = int(nl.max_count) > k
        if cell_of:
            # a too-small cell table DROPS candidates, so `cnt` is an
            # undercount — grow the (internal) table and re-measure before
            # judging k, even under an explicit k_cap contract
            cell_cap = int(cell_cap * 1.5) + 8
            continue
        if not row_of:
            return idx, cnt
        if k_cap is not None:
            raise ValueError(
                f"k_cap={k_cap} overflows: max neighbor count is "
                f"{int(jnp.max(cnt))}; pass a larger k_cap or let it "
                "default"
            )
        k = int(k * 1.5) + 8


def pair_list(pos, box, radius: float, **kw):
    """Explicit half pair list (i, j) with i < j, each unordered pair once.

    Host-side numpy expansion of ``neighbor_list(..., half=True)`` — pair
    extraction is the irregular decode the TPU engines avoid; its
    consumers (analysis, interop) are host-side (same stance as
    ops/decode.py). Total length == the exact pair count."""
    idx, cnt = neighbor_list(pos, box, radius, half=True, **kw)
    n = idx.shape[0]
    idx = np.asarray(idx)
    rows = np.repeat(np.arange(n, dtype=np.int64)[:, None], idx.shape[1], 1)
    keep = idx < n
    i, j = rows[keep], idx[keep].astype(np.int64)
    lo = np.minimum(i, j)
    hi = np.maximum(i, j)
    return lo.astype(np.int32), hi.astype(np.int32)


__all__ = ["neighbor_list", "pair_list"]
