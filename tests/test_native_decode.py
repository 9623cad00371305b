"""Native C++ mask decoder (native/decode.cpp via utils/native.py): must be
bit-for-bit equivalent to the pure-numpy reference decoder on the same
artifact — same multiset of (own, partner) attributions, same error on a
masks/pid mismatch — across jittered states, capacity words > 1, and the
empty artifact."""

import jax.numpy as jnp
import numpy as np
import pytest

from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.ops import dense_ref, pallas_force
from md_neighbor_list_tpu.ops.dense_cells import from_packed, make_spec
from md_neighbor_list_tpu.ops.decode import (_decode_pid_pairs, decode_pairs,
                                             masks_to_padded)
from md_neighbor_list_tpu.utils import native

try:
    native.load()
    HAVE_NATIVE = True
except native.NativeUnavailable:  # pragma: no cover - g++ is baked in
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native toolchain unavailable")


def _artifact(n=8000, cap=32, jitter=0.05, seed=3):
    # n=8000 -> L=20, mc=7, cell=2.857, mean occupancy ~23 (clear of cap)
    system, box = init_lattice(n, 1.0)
    rng = np.random.default_rng(seed)
    pos = (np.asarray(system.pos)
           + rng.uniform(-jitter, jitter, (n, 3))) % box.L
    spec = make_spec(box, 2.8, cap=cap)
    state = from_packed(jnp.asarray(pos, jnp.float32), system.vel,
                        system.pid, spec)
    state = dense_ref.rebuild_reference(state, spec)
    valid = state.valid().astype(jnp.float32)
    counts, masks = pallas_force.dense_lists_half(
        state.pos, valid, spec, 2.8, True)
    total = int(np.asarray(jnp.sum(jnp.where(state.valid(), counts, 0))))
    return state, spec, masks, total


def _canon(own, partner):
    lo = np.minimum(own, partner)
    hi = np.maximum(own, partner)
    order = np.lexsort((hi, lo))
    return np.stack([lo[order], hi[order]])


@pytest.mark.parametrize("cap", [32, 40])  # one word / two words (partial)
def test_native_matches_numpy(cap):
    state, spec, masks, total = _artifact(cap=cap)
    o_n, p_n = _decode_pid_pairs(masks, state.pid, spec, impl="native")
    o_r, p_r = _decode_pid_pairs(masks, state.pid, spec, impl="numpy")
    assert o_n.size == total == o_r.size
    # identical attribution multiset AND identical unordered pair set
    np.testing.assert_array_equal(
        np.sort(o_n.astype(np.int64) * state.pid.size + p_n),
        np.sort(o_r.astype(np.int64) * state.pid.size + p_r),
    )
    np.testing.assert_array_equal(_canon(o_n, p_n), _canon(o_r, p_r))

    # the public wrappers agree between impls too
    i_n, j_n = decode_pairs(masks, state.pid, spec, impl="native")
    i_r, j_r = decode_pairs(masks, state.pid, spec, impl="numpy")
    np.testing.assert_array_equal(_canon(i_n, j_n), _canon(i_r, j_r))
    idx_n, cnt_n = masks_to_padded(masks, state.pid, spec, impl="native")
    idx_r, cnt_r = masks_to_padded(masks, state.pid, spec, impl="numpy")
    np.testing.assert_array_equal(cnt_n, cnt_r)
    np.testing.assert_array_equal(np.sort(idx_n, axis=1),
                                  np.sort(idx_r, axis=1))


def test_native_rejects_mismatched_pid():
    state, spec, masks, total = _artifact()
    assert total > 0
    bad_pid = jnp.full_like(state.pid, -1)
    with pytest.raises(ValueError, match="empty slot"):
        decode_pairs(masks, bad_pid, spec, impl="native")


def test_native_empty_artifact():
    _, spec, _, _ = _artifact()
    words = -(-spec.cap // 32)
    masks = jnp.zeros((5, words, spec.rows, spec.mc, 3 * spec.cap),
                      jnp.int32)
    pid = jnp.full((spec.rows, spec.mc, spec.cap), -1, jnp.int32)
    own, partner = _decode_pid_pairs(masks, pid, spec, impl="native")
    assert own.size == 0 and partner.size == 0


def test_native_validates_shapes():
    state, spec, masks, _ = _artifact()
    with pytest.raises(ValueError, match="layout"):
        native.decode_half(np.asarray(masks)[:, :, :-1], state.pid,
                           spec.mc, spec.cap)


def test_native_padded_emitter_contract():
    """The single-pass padded emitter (mdnl_decode_half_padded): row sets
    == the numpy construction at every K regime — truncating (guess too
    small: counts stay correct, maxc reports the true requirement),
    exact, and oversized (rows padded with sentinel n) — and the full=True
    symmetric variant."""
    state, spec, masks, total = _artifact(cap=40)
    n = int(np.asarray(state.pid).max()) + 1
    idx_r, cnt_r = masks_to_padded(masks, state.pid, spec, n=n,
                                   impl="numpy")
    true_k = int(cnt_r.max())

    # truncating pass: counts and maxc are exact even though rows clip
    idx_t, cnt_t, maxc = native.decode_half_padded(
        masks, state.pid, spec.mc, spec.cap, n, 2, False)
    assert maxc == true_k
    np.testing.assert_array_equal(cnt_t, cnt_r)
    assert idx_t.shape == (n, 2)

    # exact + oversized passes: same row SETS as numpy (walk order differs)
    for k in (true_k, true_k + 13):
        idx_k, cnt_k, maxc = native.decode_half_padded(
            masks, state.pid, spec.mc, spec.cap, n, k, False)
        assert maxc == true_k
        np.testing.assert_array_equal(cnt_k, cnt_r)
        pad = np.full((n, idx_r.shape[1] + k), n, np.int32)
        pad[:, : k] = idx_k
        np.testing.assert_array_equal(
            np.sort(pad[:, : max(k, idx_r.shape[1])], axis=1)[:, : true_k],
            np.sort(idx_r, axis=1)[:, : true_k])
        assert (np.sort(idx_k, axis=1)[:, true_k:] == n).all()

    # full=True: both wrappers agree (sorted rows; counts identical)
    idx_fn, cnt_fn = masks_to_padded(masks, state.pid, spec, n=n,
                                     impl="native", full=True)
    idx_fr, cnt_fr = masks_to_padded(masks, state.pid, spec, n=n,
                                     impl="numpy", full=True)
    np.testing.assert_array_equal(cnt_fn, cnt_fr)
    k = min(idx_fn.shape[1], idx_fr.shape[1])
    assert (np.sort(idx_fn, axis=1)[:, k:] == n).all()
    assert (np.sort(idx_fr, axis=1)[:, k:] == n).all()
    np.testing.assert_array_equal(np.sort(idx_fn, axis=1)[:, :k],
                                  np.sort(idx_fr, axis=1)[:, :k])

    # explicit-k_cap overflow surfaces as the contract ValueError
    with pytest.raises(ValueError, match="k_cap"):
        masks_to_padded(masks, state.pid, spec, n=n, impl="native",
                        k_cap=max(1, true_k - 1))
