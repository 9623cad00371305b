"""Host-side test helpers: canonical pair sets and numpy reference math.

Canonicalization rule (SURVEY.md §5.5): a pair list in any internal order is
reduced to a set of unordered original-id tuples ``(min(pid_i, pid_j),
max(...))`` before comparison, so engine variants with different sort orders
and list shapes (half/full) compare like-for-like.
"""

from __future__ import annotations

import numpy as np


def pairs_from_rows(idx: np.ndarray, pid: np.ndarray | None = None,
                    half: bool = True) -> set[tuple[int, int]]:
    """Padded rows (N, K) with sentinel N -> set of unordered pid pairs."""
    idx = np.asarray(idx)
    n = idx.shape[0]
    if pid is None:
        pid = np.arange(n)
    pid = np.asarray(pid)
    rows, cols = np.nonzero(idx < n)
    i = pid[rows]
    j = pid[idx[rows, cols]]
    pairs = {(int(min(a, b)), int(max(a, b))) for a, b in zip(i, j)}
    if half:
        assert len(pairs) == len(rows), "half list contains duplicate pairs"
    return pairs


def numpy_pairs(pos: np.ndarray, L: float, radius: float) -> set[tuple[int, int]]:
    """Independent numpy O(N^2) reference (distinct from the JAX oracle, so
    the oracle itself is cross-checked)."""
    pos = np.asarray(pos, dtype=np.float64)
    n = pos.shape[0]
    dr = pos[:, None, :] - pos[None, :, :]
    dr -= L * np.round(dr / L)
    r2 = np.sum(dr * dr, axis=-1)
    iu = np.triu_indices(n, k=1)
    hits = r2[iu] < radius * radius
    return {(int(a), int(b)) for a, b in zip(iu[0][hits], iu[1][hits])}


def reorder_by_pid(arr: np.ndarray, pid: np.ndarray) -> np.ndarray:
    """Return per-particle array in original-id order."""
    out = np.empty_like(arr)
    out[np.asarray(pid)] = np.asarray(arr)
    return out
