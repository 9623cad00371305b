"""Consumer API for the packed neighbor-list artifact (VERDICT r2 item 6).

The dense engine's list build (``ops.pallas_force.dense_lists_half``) emits
the neighbor list in cluster-compressed form — per-offset-row cluster
bitmasks packed over the own-slot axis, plus per-slot half counts. That
shape is what the TPU kernels consume (masking over fixed lanes, zero
gathers), but a downstream user of a neighbor-list library expects the
reference's deliverable shape: explicit pairs, or fixed-capacity padded
per-particle rows (BASELINE.json:5 "fixed-capacity padded half-neighbor
lists"; SURVEY.md §3 R5/R8). This module is the documented bridge:

    counts, masks = dense_lists_half(state.pos, valid, spec, rs)
    i, j = decode_pairs(masks, state.pid, spec)          # pair list
    idx, cnt = masks_to_padded(masks, state.pid, spec)    # (N, K) rows

Both decoders are host-side: decoding is an O(pairs) irregular expansion,
exactly the access pattern the TPU engine exists to avoid, and its
consumers (I/O, analysis, interop with CPU MD tooling) are host-side
anyway. The default implementation is the native C++ streaming walker
(``native/decode.cpp`` via ctypes, built on demand — single popcount pass,
zero index intermediates; at N=8M the numpy path needs ~5 GB of nonzero
intermediates and minutes where the native walk needs none and seconds),
with the pure-numpy path as the always-available fallback and parity
reference (``impl="numpy"``). The mask format itself is documented in
``dense_lists_half``.

Bit semantics (the single source of truth, mirrored from
``pallas_force._list_half_kernel``): bit ``b`` of word ``w`` at index
``[k, w, r, x, lane]`` says own slot ``i = MASK_BITS*w + b`` of cell
``(z=r//mc, y=r%mc, x)`` has, as a half neighbor, slot ``lane % cap`` of
cell ``(z+dz) % mc, (y+dy) % mc, (x + lane//cap - 1) % mc`` where
``(dz, dy) = HALF_OFFSETS5[k]``. Each unordered pair sets exactly one bit.
"""

from __future__ import annotations

import numpy as np

from md_neighbor_list_tpu.ops.pallas_force import HALF_OFFSETS5, MASK_BITS


def _decode_slots(masks, spec):
    """Yield (own_flat, partner_flat) int64 slot-index arrays, one batch per
    (offset row, word, bit) with any set bits. Flat index = (r*mc + x)*cap
    + slot over the (R, mc, cap) dense layout.

    One full-volume ``nonzero`` pass per (offset row, word) — the per-bit
    loops then run over the compressed nonzero entries only, keeping the
    decode O(pairs) plus 5·words volume scans (not 5·cap: at production
    N=8M shapes that factor is the difference between seconds and minutes
    of host time)."""
    m = np.asarray(masks)  # (5, words, R, mc, 3cap)
    mc, cap = spec.mc, spec.cap
    for k, (dz, dy) in enumerate(HALF_OFFSETS5):
        for w in range(m.shape[1]):
            r, x, lane = np.nonzero(m[k, w])
            if r.size == 0:
                continue
            vals = m[k, w][r, x, lane]
            z, y = r // mc, r % mc
            prow = ((z + dz) % mc) * mc + (y + dy) % mc
            px = (x + lane // cap - 1) % mc
            own_base = (r.astype(np.int64) * mc + x) * cap
            partner = (prow.astype(np.int64) * mc + px) * cap + lane % cap
            for b in range(min(MASK_BITS, cap - MASK_BITS * w)):
                sel = np.nonzero((vals >> b) & 1)[0]
                if sel.size == 0:
                    continue
                yield own_base[sel] + MASK_BITS * w + b, partner[sel]


def _decode_pid_pairs(masks, pid, spec, impl: str = "auto"):
    """(own pid, partner pid) arrays for every set bit, preserving the
    kernel's Newton-3 attribution. ``impl``: "auto" (native C++ walker,
    numpy on toolchain failure), "native" (raise if unavailable), or
    "numpy" (the parity-reference path). Raises ValueError if a set bit
    points at an empty slot."""
    if impl not in ("auto", "native", "numpy"):
        raise ValueError(f"impl={impl!r}")
    if impl in ("auto", "native"):
        from md_neighbor_list_tpu.utils import native

        try:
            return native.decode_half(masks, pid, spec.mc, spec.cap)
        except native.NativeUnavailable:
            if impl == "native":
                raise
    pid = np.asarray(pid)
    flat = pid.reshape(-1)
    owns, partners = [], []
    for own, partner in _decode_slots(masks, spec):
        pi, pj = flat[own], flat[partner]
        if (pi < 0).any() or (pj < 0).any():
            raise ValueError("mask bit points at an empty slot — masks and "
                             "pid are from different states")
        owns.append(pi)
        partners.append(pj)
    if not owns:
        z = np.zeros((0,), np.int32)
        return z, z.copy()
    return np.concatenate(owns), np.concatenate(partners)


def decode_pairs(masks, pid, spec, impl: str = "auto"):
    """Decode the packed cluster bitmasks to an explicit half pair list.

    Args:
      masks: (5, words, R, mc, 3cap) i32 from ``dense_lists_half``.
      pid:   (R, mc, cap) i32 particle ids of the SAME dense state the
             masks were built from (slot -> global particle id).
      spec:  the DenseSpec of that state.
      impl:  "auto" (native C++ walker with numpy fallback), "native",
             or "numpy".

    Returns (i, j): int32 arrays of global particle ids with i < j
    elementwise, each unordered pair exactly once (Newton-3 half list —
    the total length equals the engine's pair count).
    """
    own, partner = _decode_pid_pairs(masks, pid, spec, impl)
    return (np.minimum(own, partner).astype(np.int32),
            np.maximum(own, partner).astype(np.int32))


def masks_to_padded(masks, pid, spec, n: int | None = None,
                    k_cap: int | None = None, impl: str = "auto",
                    full: bool = False):
    """Convert the packed masks to the reference's deliverable shape:
    fixed-capacity padded neighbor rows (BASELINE.json:5).

    Args:
      masks, pid, spec: as in ``decode_pairs``.
      n:     particle count / row count (default: ``max(pid) + 1`` — NOT
             the number of valid slots, which undercounts whenever the
             state's pids are not the dense range 0..n-1, e.g. a slab's
             local shard).
      k_cap: row capacity K (default: max per-particle count, rounded
             up to a multiple of 8).
      full:  False (default) — half rows: row i holds j's with (i, j)
             attributed to i by the kernel's Newton-3 dedup, each
             unordered pair stored once (sum(cnt) == pair count).
             True — the reference's FULL-list variant: every pair stored
             in both rows (row i holds its complete symmetric
             neighborhood; sum(cnt) == 2 x pair count), the shape a
             scatter-free force loop consumes.

    Returns (idx, cnt): idx (N, K) i32 rows of global neighbor ids padded
    with the sentinel N (a gather of a padded slot hits a ghost row, per
    SURVEY.md §4.3); cnt (N,) i32 neighbor counts.
    """
    if n is None:
        n = max(int(np.asarray(pid).max()) + 1, 0)
    if impl in ("auto", "native") and n > 0:
        from md_neighbor_list_tpu.utils import native

        try:
            # single-pass C++ emitter: walks the bits straight into the
            # padded rows (no pair buffer, no argsort — the numpy
            # construction below stable-sorts every pair, tens of host
            # seconds at N=1M). First pass guesses K; a too-small guess
            # reports the true max count and one re-pass finishes.
            guess = k_cap if k_cap is not None else 64
            idx, cnt, maxc = native.decode_half_padded(
                masks, pid, spec.mc, spec.cap, n, guess, full)
            if k_cap is not None:
                if maxc > k_cap:
                    raise ValueError(
                        f"k_cap={k_cap} < max half count {maxc}")
                return idx, cnt
            k = max(8, -(-maxc // 8) * 8)  # numpy-default K contract
            if k > guess:
                idx, cnt, maxc = native.decode_half_padded(
                    masks, pid, spec.mc, spec.cap, n, k, full)
            elif k < guess:
                idx = np.ascontiguousarray(idx[:, :k])
            return idx, cnt
        except native.NativeUnavailable:
            if impl == "native":
                raise
    pi, pj = _decode_pid_pairs(masks, pid, spec, impl)
    pi = pi.astype(np.int64)
    pj = pj.astype(np.int64)
    if full:
        pi, pj = np.concatenate([pi, pj]), np.concatenate([pj, pi])
    if pi.size and max(int(pi.max()), int(pj.max())) >= n:
        raise ValueError(
            f"n={n} is smaller than max decoded pid "
            f"{max(int(pi.max()), int(pj.max()))}"
        )
    cnt = np.bincount(pi, minlength=n).astype(np.int32)
    max_cnt = int(cnt.max()) if cnt.size else 0  # .max() raises on n == 0
    if k_cap is None:
        k_cap = max(8, -(-max_cnt // 8) * 8)
    elif max_cnt > k_cap:
        raise ValueError(f"k_cap={k_cap} < max half count {max_cnt}")
    idx = np.full((n, k_cap), n, np.int32)
    order = np.argsort(pi, kind="stable")
    pi, pj = pi[order], pj[order]
    slot = np.arange(pi.size) - np.concatenate(
        ([0], np.cumsum(cnt)))[pi]
    idx[pi, slot] = pj
    return idx, cnt
