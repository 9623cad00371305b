"""Dense cell-block engine tests (the M3 path) on CPU.

The jnp reference (dense_ref) is validated against the O(N^2) oracle; the
Pallas kernels are validated against the jnp reference in interpreter mode
(bit-compatible arithmetic), closing the chain oracle <-> reference <->
kernel (SURVEY.md §6.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from md_neighbor_list_tpu.core.box import Box
from md_neighbor_list_tpu.core.config import MDConfig
from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.models.dense_lj import DenseSimulator
from md_neighbor_list_tpu.ops import dense_ref, oracle
from md_neighbor_list_tpu.ops.dense_cells import (from_packed, make_spec,
                                                  rebuild_dense, to_packed)
from tests.util import reorder_by_pid

N = 1728  # 12^3 lattice: L = 12, mc = 4, exactly 27 particles/cell < cap 32


def _dense_state(key=None, n=N, jitter=0.05):
    system, box = init_lattice(n, 1.0)
    pos = np.asarray(system.pos)
    if key is not None:
        rng = np.random.default_rng(key)
        pos = (pos + rng.uniform(-jitter, jitter, pos.shape)) % box.L
    pos = jnp.asarray(pos, jnp.float32)
    spec = make_spec(box, 2.8, cap=32)
    state = from_packed(pos, system.vel, system.pid, spec)
    state = dense_ref.rebuild_reference(state, spec)
    return state, spec, box, pos


def test_rebuild_reference_invariants():
    state, spec, box, pos = _dense_state(key=1)
    pid = np.asarray(state.pid)
    valid = pid >= 0
    assert valid.sum() == N
    assert len(np.unique(pid[valid])) == N
    # every particle's position is preserved and sits in its keyed cell
    p, v = to_packed(state, N)
    np.testing.assert_array_equal(p, np.asarray(pos))
    R, mc, cap = pid.shape
    # cell key of each valid slot must equal its slot's cell id
    from md_neighbor_list_tpu.ops.dense_cells import cell_keys

    keys = np.asarray(cell_keys(state, spec))
    slot_cell = (
        (np.arange(R)[:, None, None] * mc)
        + np.arange(mc)[None, :, None]
        + np.zeros((1, 1, cap), int)
    )
    assert (keys[valid] == slot_cell[valid]).all()


def test_expand_variants_bitwise():
    """The fuse_keys (in-kernel key recompute) and split_dma (concurrent
    lane-chunk window copies) expand variants produce a bitwise-identical
    state to the default path — off-lattice, so the sort permutation and
    window offsets are non-trivial. Interpret mode checks the math only;
    tools/validate_tpu.py --compile-variants force-compiles every flag
    combination on real Mosaic (the round-4 variants passed here and
    crashed on the chip — VERDICT r4 weak-1)."""
    state, spec, box, pos = _dense_state(key=3)
    state, _ = rebuild_dense(state, spec, True)
    state = state._replace(pos=state.pos + 0.05 * state.vel)
    ref, _ = rebuild_dense(state, spec, True)
    variants = [(fuse, split, False) for fuse in (False, True)
                for split in (0, 2, 4)]
    variants.append((False, 0, True))  # blocked layout + MXU gather
    for fuse, split, blocked in variants:
        got, _ = rebuild_dense(state, spec, True, fuse, split, blocked)
        np.testing.assert_array_equal(np.asarray(got.pid),
                                      np.asarray(ref.pid))
        np.testing.assert_array_equal(np.asarray(got.pos),
                                      np.asarray(ref.pos))
        np.testing.assert_array_equal(np.asarray(got.vel),
                                      np.asarray(ref.vel))


def test_expand_kernel_matches_reference():
    """Pallas sort+expand (interpret mode) == scatter-based reference."""
    state, spec, box, pos = _dense_state(key=2)
    got, _ = rebuild_dense(state, spec, True)
    want = dense_ref.rebuild_reference(state, spec)
    np.testing.assert_array_equal(np.asarray(got.pid), np.asarray(want.pid))
    for i in range(3):
        vm = np.asarray(want.pid) >= 0
        np.testing.assert_array_equal(
            np.asarray(got.pos[i])[vm], np.asarray(want.pos[i])[vm]
        )
        np.testing.assert_array_equal(
            np.asarray(got.vel[i])[vm], np.asarray(want.vel[i])[vm]
        )


def test_dense_counts_match_oracle():
    """Pair count from the dense sweep == brute-force oracle, lattice
    (distances far from the rs boundary -> arithmetic-path independent)."""
    state, spec, box, pos = _dense_state()  # pure lattice
    cnt = dense_ref.sweep_reference(state, spec, 2.8, want_forces=False)
    valid = np.asarray(state.pid) >= 0
    engine_pairs = int(np.asarray(cnt)[valid].sum()) // 2
    want = int(oracle.pair_count(pos, box, 2.8))
    assert engine_pairs == want


def test_chunked_reference_counts_bitwise_equal():
    """The z-layer-chunked reference (the large-N validation twin, where
    the full sweep's temporaries exceed HBM) is bitwise-equal to the full
    sweep — identical pre-shifted-image arithmetic, integer accumulation."""
    for key in (None, 7):  # lattice and jittered (boundary-exercising)
        state, spec, _, _ = _dense_state(key=key)
        full = dense_ref.sweep_reference(state, spec, 2.8, want_forces=False)
        chunked = dense_ref.sweep_counts_chunked(state, spec, 2.8)
        assert bool(jnp.all(chunked == full))


def test_dense_forces_match_oracle():
    state, spec, box, pos = _dense_state(key=3)
    force, pe = dense_ref.sweep_reference(state, spec, 2.5, want_forces=True)
    f_oracle, u_oracle = oracle.forces_energy(pos, box, 2.5)
    # map dense slots -> pid order
    pid = np.asarray(state.pid).reshape(-1)
    keep = pid >= 0
    f = np.stack([np.asarray(force[i]).reshape(-1)[keep] for i in range(3)], -1)
    fo = np.empty_like(f)
    fo[pid[keep]] = f
    f_oracle = np.asarray(f_oracle)
    scale = max(np.abs(f_oracle).max(), 1.0)
    np.testing.assert_allclose(fo, f_oracle, atol=2e-4 * scale)
    pe_total = 0.5 * float(np.asarray(pe).reshape(-1)[keep].sum())
    np.testing.assert_allclose(pe_total, float(u_oracle), rtol=1e-4, atol=1e-2)


@pytest.mark.slow
def test_pallas_kernels_match_reference_interpret():
    """Force + count kernels (interpret mode) vs the jnp reference."""
    from md_neighbor_list_tpu.ops import pallas_force

    state, spec, box, pos = _dense_state(key=4)
    valid = state.valid().astype(jnp.float32)
    f_k, pe_k = pallas_force.dense_forces(state.pos, valid, spec, 2.5, True)
    f_r, pe_r = dense_ref.sweep_reference(state, spec, 2.5, want_forces=True)
    vm = np.asarray(state.pid) >= 0
    # want_pe variant keeps the exact divide -> reference-exact tolerances
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(f_k[i])[vm], np.asarray(f_r[i])[vm], rtol=1e-5,
            atol=1e-4,
        )
    np.testing.assert_allclose(
        np.asarray(pe_k)[vm], np.asarray(pe_r)[vm], rtol=1e-5, atol=1e-5
    )
    # hot-path variant (approx reciprocal + Newton): loose force tolerance
    f_h, _ = pallas_force.dense_forces(state.pos, valid, spec, 2.5, True,
                                       False)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(f_h[i])[vm], np.asarray(f_r[i])[vm], rtol=1e-4,
            atol=5e-3,
        )
    c_k = pallas_force.dense_counts(state.pos, valid, spec, 2.8, True)
    c_r = dense_ref.sweep_reference(state, spec, 2.8, want_forces=False)
    np.testing.assert_array_equal(np.asarray(c_k)[vm], np.asarray(c_r)[vm])


@pytest.mark.slow
def test_half_count_kernel_matches_full():
    """Half-sweep counting (each pair attributed once) must total exactly
    half the full symmetric sweep, with zero leakage onto invalid slots."""
    from md_neighbor_list_tpu.ops import pallas_force

    state, spec, box, pos = _dense_state(key=9)
    valid = state.valid().astype(jnp.float32)
    half = pallas_force.dense_counts_half(state.pos, valid, spec, 2.8, True)
    full = dense_ref.sweep_reference(state, spec, 2.8, want_forces=False)
    vm = state.valid()
    th = int(np.asarray(jnp.sum(jnp.where(vm, half, 0))))
    tf = int(np.asarray(jnp.sum(jnp.where(vm, full, 0))))
    assert th == tf // 2
    assert int(np.asarray(jnp.max(jnp.where(vm, 0, half)))) == 0


@pytest.mark.slow
def test_half_force_kernel_matches_reference_interpret():
    """Half-sweep Newton-3 force kernel (interpret mode) vs the full
    symmetric jnp reference: forces within fp32 tol, zero leakage onto
    invalid slots, once-per-pair PE totals match."""
    from md_neighbor_list_tpu.ops import pallas_force

    state, spec, box, pos = _dense_state(key=11)
    valid = state.valid().astype(jnp.float32)
    vmj = state.valid()
    vm = np.asarray(state.pid) >= 0
    f_r, pe_r = dense_ref.sweep_reference(state, spec, 2.5, want_forces=True)
    scale = max(float(jnp.max(jnp.abs(f_r))), 1.0)
    for want_pe in (True, False):
        f_h, pe_h = pallas_force.dense_forces_half(
            state.pos, valid, spec, 2.5, True, want_pe
        )
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(f_h[i])[vm], np.asarray(f_r[i])[vm],
                atol=2e-4 * scale,
            )
        assert float(jnp.max(jnp.where(vmj[None], 0.0, jnp.abs(f_h)))) == 0.0
        if want_pe:
            pe_full = 0.5 * float(jnp.sum(jnp.where(vmj, pe_r, 0.0)))
            pe_half = float(jnp.sum(jnp.where(vmj, pe_h, 0.0)))
            np.testing.assert_allclose(pe_half, pe_full, rtol=1e-5, atol=1e-2)


@pytest.mark.slow
def test_half_list_artifact_decodes_to_oracle_pairs():
    """The packed cluster bitmasks ARE the consumable neighbor list: decode
    every set bit to a (pid_i, pid_j) pair; the decoded set must equal the
    O(N^2) pair set exactly, with each pair emitted exactly once. Pure
    lattice -> distances are arithmetic-path independent."""
    from md_neighbor_list_tpu.ops import pallas_force

    state, spec, box, pos = _dense_state()  # pure lattice
    valid = state.valid().astype(jnp.float32)
    counts, masks = pallas_force.dense_lists_half(
        state.pos, valid, spec, 2.8, True
    )
    vmj = state.valid()
    total = int(np.asarray(jnp.sum(jnp.where(vmj, counts, 0))))
    # per-slot bit tally over all words/offsets/lanes == counts (the
    # popcount identity for the slot-packed format)
    pop = pallas_force.mask_slot_counts(masks, spec.cap)
    np.testing.assert_array_equal(
        np.asarray(pop)[np.asarray(vmj)], np.asarray(counts)[np.asarray(vmj)]
    )

    # the library decode API (ops.decode) is the thing under test here
    from md_neighbor_list_tpu.ops.decode import decode_pairs, masks_to_padded

    i, j = decode_pairs(masks, state.pid, spec)
    assert i.size == total
    assert (i < j).all()
    decoded = set(zip(i.tolist(), j.tolist()))
    assert len(decoded) == total, "duplicate pair emission"

    p = np.asarray(pos, np.float32)
    d = p[:, None, :] - p[None, :, :]
    d -= np.float32(box.L) * np.round(d / np.float32(box.L))
    r2 = (d * d).sum(-1)
    iu = np.triu_indices(p.shape[0], 1)
    hit = r2[iu] < np.float32(2.8) ** 2
    want = set(zip(iu[0][hit].tolist(), iu[1][hit].tolist()))
    assert decoded == want

    # padded-row converter: same pair set, reference deliverable shape
    n = p.shape[0]
    idx, cnt = masks_to_padded(masks, state.pid, spec, n=n)
    assert idx.shape[0] == n and (cnt <= idx.shape[1]).all()
    rows = set()
    for a in range(n):
        assert (idx[a, cnt[a]:] == n).all(), "padding must be sentinel N"
        for b in idx[a, : cnt[a]]:
            rows.add((min(a, int(b)), max(a, int(b))))
    assert rows == want

    # full-list variant (the reference's symmetric rows): every pair in
    # both rows, counts sum to 2x the half pair count
    idx_f, cnt_f = masks_to_padded(masks, state.pid, spec, n=n, full=True)
    assert int(cnt_f.sum()) == 2 * total
    nbrs = {a: set() for a in range(n)}
    for a, b in want:
        nbrs[a].add(b)
        nbrs[b].add(a)
    for a in range(n):
        assert (idx_f[a, cnt_f[a]:] == n).all()
        assert set(idx_f[a, : cnt_f[a]].tolist()) == nbrs[a]
        assert cnt_f[a] == len(nbrs[a])


def test_decode_empty_artifact():
    """Decoding an artifact with no set bits (e.g. a fresh/empty state)
    returns empty results instead of crashing (review fix: cnt.max() on a
    zero-size array)."""
    from md_neighbor_list_tpu.ops.decode import decode_pairs, masks_to_padded

    _, spec, _, _ = _dense_state()
    words = -(-spec.cap // 32)
    masks = jnp.zeros(
        (5, words, spec.rows, spec.mc, 3 * spec.cap), jnp.int32
    )
    pid = jnp.full((spec.rows, spec.mc, spec.cap), -1, jnp.int32)
    i, j = decode_pairs(masks, pid, spec)
    assert i.size == 0 and j.size == 0
    idx, cnt = masks_to_padded(masks, pid, spec)
    assert idx.shape == (0, 8) and cnt.size == 0


def test_dense_simulator_nve_jnp():
    """Full DenseSimulator NVE on the jnp path: energy conservation +
    rebuilds engaging + force parity with the XLA Simulator."""
    cfg = MDConfig(n=N, dt=0.001, temperature=0.7)
    sim = DenseSimulator(cfg, kernel_impl="jnp")
    carry = sim.init(jax.random.PRNGKey(5))
    ke0, pe0 = sim.energies(carry)
    e0 = float(ke0) + float(pe0)
    carry = sim.run(carry, 400)
    ke1, pe1 = sim.energies(carry)
    e1 = float(ke1) + float(pe1)
    assert abs(e1 - e0) / abs(e0) < 1e-4, (e0, e1)
    assert int(np.asarray(carry.n_rebuilds)) >= 2

    # cross-engine trajectory check vs the XLA-list Simulator
    from md_neighbor_list_tpu.models.lj_nve import Simulator

    sim2 = Simulator(cfg)
    c2 = sim2.run(sim2.init(jax.random.PRNGKey(5)), 400)
    p_dense, _ = to_packed(carry.state, N, sim.spec.L)
    p_xla = reorder_by_pid(np.asarray(c2.system.pos),
                           np.asarray(c2.system.pid))
    np.testing.assert_allclose(p_dense, p_xla, atol=5e-3)


def test_dense_overflow_detection():
    """Clustered configuration exceeding cap must flip overflow, then build
    recovers by growing cap."""
    n = 256
    cfg = MDConfig(n=n, rho=1.0, rc=1.5, skin=0.2)  # mc = 4 at rs 1.7
    sim = DenseSimulator(cfg, cap=16, kernel_impl="jnp")
    # all particles into one corner -> cell overflow at cap=8
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0, spec_cell(sim), (n, 3)), jnp.float32)
    from md_neighbor_list_tpu.core.system import System

    system = System(
        pos=pos, vel=jnp.zeros((n, 3), jnp.float32),
        force=jnp.zeros((n, 3), jnp.float32),
        pid=jnp.arange(n, dtype=jnp.int32),
    )
    carry = sim.build(system)  # must grow until everything fits
    assert sim.cap >= 256
    assert int(np.asarray(carry.state.valid().sum())) == n


def spec_cell(sim):
    return sim.spec.cell_size


def test_split_row_kernels_match_merged(monkeypatch):
    """The grouped/split paths (engaged when the _row_groups live model
    says the 5-row merged kernel would blow the 16 MB scoped-VMEM stack,
    e.g. N=8M's mc=71 cap=40) must reproduce the merged kernels: counts
    and masks bitwise, forces to summation-order noise — for EVERY group
    plan the policy can emit (5 singletons; the (3,2) and (2,2,1)
    groupings)."""
    from md_neighbor_list_tpu.ops import pallas_force

    state, spec, box, pos = _dense_state(key=13)
    v = state.valid().astype(jnp.float32)
    vm = state.valid()
    assert not pallas_force._split_rows(spec)
    assert pallas_force._row_groups(spec) == [(0, 1, 2, 3, 4)]

    c_ref = pallas_force.dense_counts_half(state.pos, v, spec, 2.8, True)
    f_ref, pe_ref = pallas_force.dense_forces_half(
        state.pos, v, spec, 2.5, True, True)
    l_ref, m_ref = pallas_force.dense_lists_half(state.pos, v, spec, 2.8,
                                                 True)

    monkeypatch.setattr(pallas_force, "_split_rows",
                        lambda s, want_pe=False, kind="force": True)
    scale = float(jnp.max(jnp.abs(f_ref)))
    for plan in ([(0,), (1,), (2,), (3,), (4,)],
                 [(0, 1, 2), (3, 4)],
                 [(0, 1), (2, 3), (4,)],
                 [(1, 0), (4, 2, 3)]):  # order inside a group is free too
        monkeypatch.setattr(pallas_force, "_row_groups",
                            lambda s, want_pe=False, plan=plan: plan)
        # fresh traces (the jit caches key on static args, not on the
        # monkeypatched policy functions)
        c2 = pallas_force.dense_counts_half.__wrapped__(
            state.pos, v, spec, 2.8, True)
        f2, pe2 = pallas_force.dense_forces_half.__wrapped__(
            state.pos, v, spec, 2.5, True, True)
        l2, m2 = pallas_force.dense_lists_half.__wrapped__(
            state.pos, v, spec, 2.8, True)

        np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c2))
        np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l2))
        np.testing.assert_array_equal(np.asarray(m_ref), np.asarray(m2))
        df = float(jnp.max(jnp.where(vm[None], jnp.abs(f_ref - f2), 0.0)))
        assert df <= 1e-4 * max(scale, 1.0), (plan, df)
        dpe = float(jnp.max(jnp.where(vm, jnp.abs(pe_ref - pe2), 0.0)))
        assert dpe <= 1e-4, (plan, dpe)


def test_lists_grouped_ceil_matches_merged():
    """The CEIL grouped list grid (non-divisor G: y-padded input with
    wrap-copy rows, padded output rows sliced — round 5, VERDICT r4
    item 4) must reproduce the merged per-row grid bitwise, for every
    non-divisor G at two grids the old G|mc rule excluded entirely
    (mc=4 covers pad=2; mc=5 covers pad=3/4 and an all-padding tail
    block, the nby-bump shapes)."""
    from md_neighbor_list_tpu.ops import pallas_force

    for n, key in ((1728, 21), (3375, 22)):
        state, spec, box, pos = _dense_state(key=key, n=n)
        l_ref, m_ref = pallas_force.lists_half_impl(
            state.pos, spec, (spec.mc, spec.mc),
            pallas_force._state_specs_merged(spec), 2.8, True, True)
        tried = 0
        for G in range(2, spec.mc):
            if spec.mc % G == 0:
                continue
            nby = pallas_force._group_ceil_nby(spec.mc, G)
            assert nby * G - spec.mc >= 2
            l2, m2 = pallas_force.lists_half_grouped(
                state.pos, spec, G, 2.8, True, nby)
            np.testing.assert_array_equal(np.asarray(l_ref),
                                          np.asarray(l2))
            np.testing.assert_array_equal(np.asarray(m_ref),
                                          np.asarray(m2))
            tried += 1
        assert tried >= 1


def test_expand_kernel_odd_rows_grouped():
    """The grouped expand kernel (2 rows per program) pads an odd row
    count with a junk tail row — bitwise parity at mc=5 (25 rows) covers
    the padded-group path."""
    from md_neighbor_list_tpu.ops.dense_cells import _expand_group

    system, box = init_lattice(3375, 1.0, jax.random.PRNGKey(0), 1.0)
    spec = make_spec(box, 2.8, cap=32)
    assert spec.rows % 2 == 1 and _expand_group(spec.mc, spec.cap) == 2
    st = from_packed(system.pos, system.vel, system.pid, spec)
    got, _ = rebuild_dense(st, spec, True)
    want = dense_ref.rebuild_reference(st, spec)
    np.testing.assert_array_equal(np.asarray(got.pid), np.asarray(want.pid))
    vm = np.asarray(want.pid) >= 0
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(got.pos[i])[vm], np.asarray(want.pos[i])[vm])
        np.testing.assert_array_equal(
            np.asarray(got.vel[i])[vm], np.asarray(want.vel[i])[vm])


def test_build_grows_when_particles_exceed_total_slots():
    """High density can make N exceed mc^3*cap before any kernel runs;
    build() must catch the from_packed slot error and take the cap-growth
    path (round-3 review) instead of crashing."""
    cfg = MDConfig(n=3000, rho=2.0, rc=2.5, skin=0.3, dt=0.001,
                   temperature=0.5)
    sim = DenseSimulator(cfg, cap=16, kernel_impl="jnp")
    assert sim.spec.slots < cfg.n  # the adversarial precondition
    c = sim.init(jax.random.PRNGKey(0))
    assert sim.spec.slots >= cfg.n and sim.cap > 16
    assert int(np.asarray(jnp.sum(c.state.valid()))) == cfg.n


@pytest.mark.parametrize("n,rho,cap", [(700, 1.0, 48), (1800, 1.0, 48),
                                       (400, 0.6, 40)])
def test_minimum_grid_geometries_oracle_exact(n, rho, cap):
    """mc=3 is the smallest valid 27-sweep grid (every ±1 neighbor cell is
    distinct only from mc>=3 up); mc=3/4 stress double-wrap adjacency —
    each cell's 27-neighborhood covers the whole box, every roll wraps.
    Off-lattice states; pair artifact must stay oracle-exact."""
    cfg = MDConfig(n=n, rho=rho, rc=2.5, skin=0.3, dt=0.001,
                   temperature=1.0)
    sim = DenseSimulator(cfg, cap=cap, kernel_impl="jnp")
    assert sim.spec.mc in (3, 4)
    c = sim.run(sim.init(jax.random.PRNGKey(0)), 10, chunk=10)
    new, counts, masks, total = sim._rebuild_and_lists(c.state)
    pos, _ = to_packed(new, cfg.n, sim.spec.L)
    want = int(oracle.pair_count(jnp.asarray(pos), sim.box, cfg.rs))
    assert int(np.asarray(total)) == want


def test_minimum_grid_interpret_kernels_oracle_exact():
    """Same mc=3 geometry through the PALLAS kernel path (interpret mode):
    counts, masks, popcount — the hardware twin of this gate runs in
    tools (mc=3 probe; round 3)."""
    from md_neighbor_list_tpu.ops import pallas_force

    cfg = MDConfig(n=700, rho=1.0, rc=2.5, skin=0.3, dt=0.001,
                   temperature=1.0)
    sim = DenseSimulator(cfg, cap=48, kernel_impl="interpret")
    assert sim.spec.mc == 3
    c = sim.init(jax.random.PRNGKey(0))
    new, counts, masks, total = sim._rebuild_and_lists(c.state)
    pop = pallas_force.mask_slot_counts(masks, sim.spec.cap)
    vm = new.valid()
    assert bool(jnp.all(jnp.where(vm, pop == counts, True)))
    pos, _ = to_packed(new, cfg.n, sim.spec.L)
    want = int(oracle.pair_count(jnp.asarray(pos), sim.box, cfg.rs))
    assert int(np.asarray(total)) == want


def test_park_lattice_f32_invariant_at_8m_shape():
    """Parked-slot geometry must keep every co-window pair > rs apart IN
    f32 at the largest supported shape (N=8M: mc=71, cap=40). The round-2
    1-D park line (1e5 + global_slot * 2*cell) violated this from slot
    ~5.9M up (f32 ulp > spacing), emitting phantom pairs between EMPTY
    slots; the 3-D park lattice keeps each axis in an ulp-safe range."""
    mc, cap = 71, 40
    rows = mc * mc
    cell = np.float32(200.0 / mc)
    step = np.float32(2.0) * cell
    base = np.float32(1.0e5)
    rs = np.float32(2.8)

    # the fixed layout: per-axis lines, each O(1e4) span
    lane = base + np.arange(mc * cap, dtype=np.float32) * step
    row = base + np.arange(rows, dtype=np.float32) * step
    assert np.diff(lane).min() > rs
    assert np.diff(row).min() > rs

    # the old 1-D line really collided at this shape (documents the bug)
    old = base + np.arange(rows * mc * cap, dtype=np.float32) * step
    assert (np.diff(old) == 0.0).sum() > 0


def test_all_invalid_slots_emit_nothing():
    """An all-empty state (every slot on the park lattice — the park
    invariant's degenerate case) must produce zero counts and zero mask
    bits: parked slots never pair with each other. Under the round-3
    contract validity lives IN the state (dense_cells.park_lattice), so
    the empty state is the lattice itself, not a mask over real
    positions."""
    from md_neighbor_list_tpu.ops import pallas_force
    from md_neighbor_list_tpu.ops.dense_cells import park_lattice

    _, spec, _, _ = _dense_state(key=2)
    zero_valid = jnp.zeros((spec.rows, spec.mc, spec.cap), jnp.float32)
    empty_pos = park_lattice(spec)
    cnt = pallas_force.dense_counts_half(empty_pos, zero_valid, spec, 2.8,
                                         True)
    assert int(jnp.sum(cnt)) == 0
    c_l, masks = pallas_force.dense_lists_half(empty_pos, zero_valid, spec,
                                               2.8, True)
    assert int(jnp.sum(c_l)) == 0
    assert int(jnp.sum(jnp.abs(masks))) == 0


def test_row_groups_policy_invariants():
    """_row_groups must always partition the five half-sweep offset rows,
    keep every non-singleton plan's modeled live set inside the scoped-VMEM
    budget, and stay merged at the shapes whose merged kernels are known to
    compile (mc=35 cap=40 force — the N=1M production shape)."""
    from md_neighbor_list_tpu.ops import pallas_force
    from md_neighbor_list_tpu.ops.dense_cells import DenseSpec

    budget = 14 << 20
    for mc in (4, 16, 35, 71, 100):
        for cap in (32, 40, 72):
            spec = DenseSpec(mc=mc, cap=cap, L=float(mc) * 2.86,
                             cell_size=2.86)
            unit = mc * cap * 3 * cap * 4
            for pe in (False, True):
                plan = pallas_force._row_groups(spec, pe)
                assert sorted(k for g in plan for k in g) == [0, 1, 2, 3, 4]
                live = (pallas_force._FORCE_LIVE_PE if pe
                        else pallas_force._FORCE_LIVE)
                if len(plan) < 5:
                    gmax = max(len(g) for g in plan)
                    assert live[gmax] * unit <= budget, (mc, cap, pe, plan)

    n1m = DenseSpec(mc=35, cap=40, L=100.0, cell_size=100.0 / 35)
    assert pallas_force._row_groups(n1m) == [(0, 1, 2, 3, 4)]
    n8m = DenseSpec(mc=71, cap=40, L=200.0, cell_size=200.0 / 71)
    assert len(pallas_force._row_groups(n8m)) > 1  # must split at N=8M


def test_pe_virial_split_policy():
    """dense_pe_virial's live-set kind must SPLIT at the N=8M shape (mc=71
    cap=40: the merged 5-row form is rejected by the chip's compiler —
    round-5 compile gate) and stay MERGED at the N=1M shape (mc=35 cap=40:
    merged compiles and runs on hardware). Regression for the latent 8M
    thermo()/pressure() compile failure the compile-variants gate caught."""
    from md_neighbor_list_tpu.ops import pallas_force
    from md_neighbor_list_tpu.ops.dense_cells import DenseSpec

    n1m = DenseSpec(mc=35, cap=40, L=100.0, cell_size=100.0 / 35)
    n8m = DenseSpec(mc=71, cap=40, L=200.0, cell_size=200.0 / 71)
    assert not pallas_force._split_rows(n1m, kind="pe_virial")
    assert pallas_force._split_rows(n8m, kind="pe_virial")
    # and it must be at least as conservative as the counts model (two
    # output accumulators cannot be cheaper than one)
    for spec in (n1m, n8m):
        if pallas_force._split_rows(spec, kind="counts"):
            assert pallas_force._split_rows(spec, kind="pe_virial")
