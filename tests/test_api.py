"""Top-level one-call API (api.py): the library front door must emit
oracle-exact pair sets for arbitrary positions, in the caller's particle
order, with automatic capacity growth — no engine plumbing required."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import md_neighbor_list_tpu as mdnl
from md_neighbor_list_tpu.core.box import Box
from md_neighbor_list_tpu.ops import oracle


def _random_system(n, rho, seed):
    box = Box.from_density(n, rho)
    pos = jax.random.uniform(
        jax.random.PRNGKey(seed), (n, 3), jnp.float32, 0.0, box.L
    )
    return pos, box


def _oracle_pairs(pos, box, rs, k_cap=128):
    idx, cnt = oracle.neighbors(pos, box, rs, k_cap, half=True)
    assert int(jnp.max(cnt)) <= k_cap, "oracle helper truncated"
    n = pos.shape[0]
    idx = np.asarray(idx)
    rows = np.repeat(np.arange(n)[:, None], idx.shape[1], 1)
    keep = idx < n
    i, j = rows[keep], np.asarray(idx)[keep]
    return set(zip(np.minimum(i, j).tolist(), np.maximum(i, j).tolist()))


@pytest.mark.parametrize("seed", [0, 1])
def test_pair_list_matches_oracle(seed):
    pos, box = _random_system(2000, 1.0, seed)
    rs = 2.8
    i, j = mdnl.pair_list(pos, box, rs)
    assert (i < j).all()
    got = set(zip(i.tolist(), j.tolist()))
    assert len(got) == len(i), "duplicate pairs"
    assert got == _oracle_pairs(pos, box, rs)


def test_neighbor_list_full_rows_match_oracle():
    pos, box = _random_system(1500, 0.8, 2)
    rs = 2.5
    idx, cnt = mdnl.neighbor_list(pos, box, rs, half=False)
    n = pos.shape[0]
    want_idx, want_cnt = oracle.neighbors(pos, box, rs, 128, half=False)
    assert np.array_equal(np.asarray(cnt), np.asarray(want_cnt))
    for r in range(n):  # same SET per row (slot order may differ)
        a = set(np.asarray(idx[r][idx[r] < n]).tolist())
        b = set(np.asarray(want_idx[r][want_idx[r] < n]).tolist())
        assert a == b, r


def test_scalar_box_and_tiny_system_fallback():
    """A float L works as the box; boxes with mc < 3 take the all-pairs
    fallback and still give oracle-exact pairs."""
    pos, box = _random_system(64, 1.0, 3)  # L=4 -> mc=1 at rs=2.8
    i, j = mdnl.pair_list(pos, box.L, 2.8)
    assert set(zip(i.tolist(), j.tolist())) == _oracle_pairs(pos, box, 2.8)


def test_explicit_k_cap_overflow_raises():
    pos, box = _random_system(2000, 1.0, 4)
    with pytest.raises(ValueError, match="k_cap"):
        mdnl.neighbor_list(pos, box, 2.8, k_cap=4)


def test_unwrapped_positions_bin_correctly():
    """Out-of-box coordinates must be wrapped before binning — clipping
    them into boundary cells silently drops neighbors (round-3 review):
    the same physical configuration shifted by ±L must give the same
    pair set."""
    pos, box = _random_system(400, 1.0, 7)
    rs = 2.8
    want = _oracle_pairs(pos, box, rs)
    shift = jnp.where(jnp.arange(400)[:, None] < 100, box.L, 0.0)
    i, j = mdnl.pair_list(pos + shift, box, rs)
    assert set(zip(i.tolist(), j.tolist())) == want
    i, j = mdnl.pair_list(pos - shift, box, rs)
    assert set(zip(i.tolist(), j.tolist())) == want


def test_empty_input():
    idx, cnt = mdnl.neighbor_list(jnp.zeros((0, 3)), 10.0, 2.8)
    assert idx.shape == (0, 8) and cnt.shape == (0,)
    i, j = mdnl.pair_list(jnp.zeros((0, 3)), 10.0, 2.8)
    assert i.size == 0 and j.size == 0


def test_explicit_k_cap_survives_cell_table_growth():
    """A generous explicit k_cap must not raise just because the INTERNAL
    cell-table estimate overflowed on clustered input (the table grows;
    only a true row overflow is the caller's k_cap contract violation)."""
    n = 512
    box = Box(L=20.0)
    pos = jnp.concatenate([
        10.0 + 0.8 * jax.random.uniform(jax.random.PRNGKey(5),
                                        (n // 2, 3), jnp.float32),
        jax.random.uniform(jax.random.PRNGKey(6), (n - n // 2, 3),
                           jnp.float32, 0.0, box.L),
    ])
    idx, cnt = mdnl.neighbor_list(pos, box, 2.8, half=True, k_cap=320)
    assert int(jnp.max(cnt)) <= 320
    rows = np.repeat(np.arange(n)[:, None], idx.shape[1], 1)
    keep = np.asarray(idx) < n
    i, j = rows[keep], np.asarray(idx)[keep]
    got = set(zip(np.minimum(i, j).tolist(), np.maximum(i, j).tolist()))
    assert got == _oracle_pairs(pos, box, 2.8, k_cap=320)


@pytest.mark.parametrize("half", [False, True])
def test_dense_backend_matches_xla(half):
    """backend="dense" (the TPU large-N fast path: Pallas rebuild +
    one-pass list kernel + host mask decode) must emit the same pair
    sets, row sets and counts as the XLA path and the oracle."""
    pos, box = _random_system(2000, 1.0, 8)
    rs = 2.8
    n = pos.shape[0]
    idx_d, cnt_d = mdnl.neighbor_list(pos, box, rs, half=half,
                                      backend="dense")
    idx_x, cnt_x = mdnl.neighbor_list(pos, box, rs, half=half,
                                      backend="xla")
    assert idx_d.shape[0] == n and cnt_d.shape == (n,)

    def pairset(idx):
        rows = np.repeat(np.arange(n)[:, None], idx.shape[1], 1)
        keep = np.asarray(idx) < n
        i, j = rows[keep], np.asarray(idx)[keep]
        return set(zip(np.minimum(i, j).tolist(),
                       np.maximum(i, j).tolist()))

    assert pairset(idx_d) == pairset(idx_x) == _oracle_pairs(pos, box, rs)
    if half:
        # half attribution differs between backends (cell order vs sort
        # order) but each pair appears exactly once in both
        assert int(jnp.sum(cnt_d)) == int(jnp.sum(cnt_x))
    else:
        # full rows are attribution-free: counts match per particle
        assert np.array_equal(np.asarray(cnt_d), np.asarray(cnt_x))


def test_dense_backend_explicit_k_cap_overflow_raises():
    pos, box = _random_system(2000, 1.0, 9)
    with pytest.raises(ValueError, match="k_cap"):
        mdnl.neighbor_list(pos, box, 2.8, k_cap=4, backend="dense")


def test_auto_capacity_grows_on_cluster():
    """An adversarial dense cluster overflows the density-based estimate;
    the default path must grow and return complete lists."""
    n = 512
    box = Box(L=20.0)
    key = jax.random.PRNGKey(5)
    pos = jnp.concatenate([
        10.0 + 0.8 * jax.random.uniform(key, (n // 2, 3), jnp.float32),
        jax.random.uniform(jax.random.PRNGKey(6), (n - n // 2, 3),
                           jnp.float32, 0.0, box.L),
    ])
    i, j = mdnl.pair_list(pos, box, 2.8)
    assert set(zip(i.tolist(), j.tolist())) == _oracle_pairs(
        pos, box, 2.8, k_cap=320
    )
