"""Dense-engine slab decomposition tests on 8 virtual CPU devices
(SURVEY.md §6.2 "Distributed without a real pod"): the Pallas dense engine
under shard_map must reproduce the single-chip dense run, conserve
particles under real migrations, and emit a distributed list artifact
whose global pair count is oracle-exact. Kernels run in interpret mode on
CPU (hardware compilation is gated separately by tools/validate_tpu.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from md_neighbor_list_tpu.core.config import MDConfig
from md_neighbor_list_tpu.models.dense_lj import DenseSimulator
from md_neighbor_list_tpu.ops import oracle
from md_neighbor_list_tpu.parallel.dense_slab import DenseSlabSimulator
from tests.util import reorder_by_pid

# rc=1.5 keeps the grid CPU-sized; n=4096 -> L=16, mc rounds 9->8 at P=8
CFG = dict(n=4096, rho=1.0, rc=1.5, skin=0.2, dt=0.001, temperature=0.8)


def _dd(p=8, **kw):
    base = dict(CFG, mesh_devices=p)
    base.update(kw)
    return MDConfig(**base)


def _single_positions(key, steps):
    sim = DenseSimulator(MDConfig(**CFG), cap=16, kernel_impl="jnp")
    carry = sim.run(sim.init(key), steps) if steps else sim.init(key)
    return sim.to_system(carry)


def test_slab_keys_unwrapped_owns_top_layer():
    """P=1 geometry (nz == mc_z): the ring-wrapped key maps the TOP owned
    layer to s=0 (left emigrant — it would be dropped); the unwrapped
    variant keys every layer as owned. This is the correctness pivot of
    the self-halo mode (slab_keys docstring)."""
    from md_neighbor_list_tpu.ops.slab_kernels import SlabSpec, slab_keys

    spec = SlabSpec(mc=4, nz=4, mc_z=4, cap=8, L=8.0,
                    cell_size=2.0, cell_z=2.0)
    pos = jnp.array([[0.5], [0.5], [7.5]], jnp.float32)  # top z layer
    valid = jnp.array([True])
    z0 = jnp.int32(0)
    owned_lo, owned_hi = spec.mc**2, spec.mc**2 * (spec.nz + 1)

    k_wrap = int(slab_keys(pos, valid, spec, z0)[0])
    assert k_wrap < owned_lo  # aliased to left-emigrant range: dropped

    k_flat = int(slab_keys(pos, valid, spec, z0, wrap=False)[0])
    assert owned_lo <= k_flat < owned_hi  # owned, top layer

    # every layer keys owned under wrap=False
    for iz in range(4):
        p = jnp.array([[0.5], [0.5], [2.0 * iz + 1.0]], jnp.float32)
        kf = int(slab_keys(p, valid, spec, z0, wrap=False)[0])
        assert owned_lo + iz * spec.mc**2 <= kf < owned_lo + (iz + 1) * spec.mc**2


def test_dense_dd_p1_self_halo_matches_single_chip():
    """P=1 self-halo mode: the FULL distributed program (shard_map,
    self-ppermute halos, rebuild vote, unwrapped migration keys) on one
    device must reproduce the single-chip dense engine — this is the mode
    that lets the DD path execute on the one real TPU chip."""
    steps = 20
    key = jax.random.PRNGKey(4)
    dd = DenseSlabSimulator(_dd(1), cap=16)
    sd = dd.run(dd.init(key), steps, chunk=20)
    sys_dd = dd.gather(sd)

    _, total = dd.lists(sd)
    want = int(oracle.pair_count(sys_dd.pos, dd.box, dd.config.rs))
    assert total == want

    p1, _, _ = _single_positions(key, steps)
    p_dd = reorder_by_pid(np.asarray(sys_dd.pos), np.asarray(sys_dd.pid))
    d = np.abs(p_dd - p1)
    d = np.minimum(d, dd.box.L - d)
    assert d.max() < 2e-4, d.max()
    assert int(np.asarray(sd.n_rebuilds)[0]) >= 1
    assert int(np.asarray(sd.n_migrated)[0]) == 0  # nowhere to migrate
    assert not bool(np.asarray(sd.overflow).any())


def test_dense_dd_initial_forces_and_pairs_match():
    """Initial distributed forces == single-chip dense forces; the
    distributed half-list artifact's global pair count == oracle."""
    key = jax.random.PRNGKey(0)
    dd = DenseSlabSimulator(_dd(), cap=16)
    state = dd.init(key)
    sys_dd = dd.gather(state)

    _, total = dd.lists(state)
    want = int(oracle.pair_count(sys_dd.pos, dd.box, dd.config.rs))
    assert total == want

    pos1, _, f1 = _single_positions(key, steps=0)
    f_dd = reorder_by_pid(np.asarray(sys_dd.force), np.asarray(sys_dd.pid))
    scale = max(np.abs(f1).max(), 1.0)
    np.testing.assert_allclose(f_dd, f1, atol=2e-4 * scale)


@pytest.mark.slow
def test_dense_dd_trajectory_matches_single_chip():
    """P=8 dense-slab run == P=1 dense run (the round-2 distributed
    parity gate: same engine arithmetic on both sides)."""
    steps = 40
    key = jax.random.PRNGKey(1)
    dd = DenseSlabSimulator(_dd(), cap=16)
    sd = dd.run(dd.init(key), steps, chunk=20)
    sys_dd = dd.gather(sd)

    p1, _, _ = _single_positions(key, steps)
    p_dd = reorder_by_pid(np.asarray(sys_dd.pos), np.asarray(sys_dd.pid))
    d = np.abs(p_dd - p1)
    d = np.minimum(d, dd.box.L - d)  # wrap-aware distance
    assert d.max() < 5e-4, d.max()
    assert int(np.asarray(sd.n_rebuilds)[0]) >= 1


@pytest.mark.slow
def test_dense_dd_conservation_migration_energy():
    """Hot enough and long enough that particles migrate across slabs
    (the cold lattice starts every particle 0.5 sigma from the nearest
    layer boundary, so diffusion must run ~0.5 sigma before any crossing):
    nothing lost or duplicated, energy conserved, lockstep rebuilds."""
    dd = DenseSlabSimulator(_dd(temperature=1.5, dt=0.002), cap=16)
    state = dd.init(jax.random.PRNGKey(2))
    ke0, pe0 = dd.energies(state)
    e0 = float(ke0) + float(pe0)

    state = dd.run(state, 300, chunk=20)
    dd.gather(state)  # internal assert: exactly N particles survive
    pid = np.asarray(state.pid).reshape(-1)
    pid = pid[pid >= 0]
    assert len(np.unique(pid)) == dd.config.n

    rebuilds = np.asarray(state.n_rebuilds)
    assert (rebuilds == rebuilds[0]).all() and rebuilds[0] >= 2
    assert int(np.asarray(state.n_migrated)[0]) > 0, "no migration exercised"
    assert not bool(np.asarray(state.overflow).any())

    ke1, pe1 = dd.energies(state)
    e1 = float(ke1) + float(pe1)
    assert abs(e1 - e0) / abs(e0) < 1e-3, (e0, e1)

    # pair-count parity still exact after migrations
    _, total = dd.lists(state)
    want = int(oracle.pair_count(dd.gather(state).pos, dd.box,
                                 dd.config.rs))
    assert total == want


def test_dense_dd_p2_matches_p8():
    """Device count must not change physics: P=2 and P=8 slab runs land on
    identical trajectories (same arithmetic, different decomposition)."""
    steps = 20
    key = jax.random.PRNGKey(3)
    outs = []
    for p in (2, 8):
        dd = DenseSlabSimulator(_dd(p), cap=16)
        sd = dd.run(dd.init(key), steps, chunk=20)
        sys_dd = dd.gather(sd)
        outs.append(
            reorder_by_pid(np.asarray(sys_dd.pos), np.asarray(sys_dd.pid))
        )
    d = np.abs(outs[0] - outs[1])
    L = DenseSlabSimulator(_dd(2), cap=16).box.L
    d = np.minimum(d, L - d)
    assert d.max() < 2e-4, d.max()


def test_repark_ghost_park_alias_nz1(monkeypatch):
    """Regression for the round-3 distributed NaN bug the 8-device dryrun
    caught: at nz=1 a received ghost layer's EMPTY slots carry the
    SENDER's park positions, whose device-local row ids (rows 0..mc-1)
    coincide exactly with the receiver's own first-layer park — two
    parked slots meet in the (dz=1, dy=0) window at r2 = 0 and emit NaN
    forces. ``_repark_ghost`` re-parks the ghost layer at ext-local row
    ids (rows nz*mc..) before the sweep. This test constructs the
    collision directly and asserts (a) the production path is finite,
    (b) bypassing the re-park reproduces the NaN (the test really does
    build the collision), and (c) the production path is bitwise equal
    to a pre-re-parked ghost layer fed through the raw kernel."""
    from md_neighbor_list_tpu.ops import slab_kernels
    from md_neighbor_list_tpu.ops.dense_cells import park_lattice
    from md_neighbor_list_tpu.ops.slab_kernels import (SlabSpec,
                                                       slab_forces_half)

    spec = SlabSpec(mc=4, nz=1, mc_z=4, cap=8, L=8.0,
                    cell_size=2.0, cell_z=2.0)
    mc, cap, rows = spec.mc, spec.cap, spec.rows
    park = np.asarray(park_lattice(spec))  # (3, mc, mc, cap): rows 0..mc-1

    # owned layer (z-cells [0, 2)): one particle per cell at slot 0,
    # empties on the receiver's own park (rows 0..mc-1)
    pos = park.copy()
    pid = np.full((rows, mc, cap), -1, np.int32)
    k = 0
    for y in range(mc):
        for x in range(mc):
            pos[:, y, x, 0] = (2.0 * x + 1.0, 2.0 * y + 1.0, 1.5)
            pid[y, x, 0] = k
            k += 1
    # ghost layer = the DOWNSTREAM neighbor's first owned layer: its
    # empties sit on the SENDER's park — identical row ids 0..mc-1, the
    # collision geometry
    gpos = park.copy()
    gpid = np.full((mc, mc, cap), -1, np.int32)
    for y in range(mc):
        for x in range(mc):
            gpos[:, y, x, 0] = (2.0 * x + 1.0, 2.0 * y + 1.0, 2.5)
            gpid[y, x, 0] = k
            k += 1

    ext_pos = jnp.concatenate([jnp.asarray(pos), jnp.asarray(gpos)], axis=1)
    ext_v = jnp.concatenate(
        [jnp.asarray(pid >= 0), jnp.asarray(gpid >= 0)], axis=0
    ).astype(jnp.float32)

    f_prod, seam_prod, _ = slab_forces_half(ext_pos, ext_v, spec, 2.5, True)
    assert bool(jnp.isfinite(f_prod).all()), "production path emitted NaN"
    assert bool(jnp.isfinite(seam_prod).all())
    # owned<->ghost pairs exist (z=1.5 vs 2.5), so the seam is nontrivial
    assert float(jnp.max(jnp.abs(seam_prod))) > 0.0

    # (b) bypass the re-park: the sender-park alias must reproduce the NaN
    monkeypatch.setattr(slab_kernels, "_repark_ghost",
                        lambda ext, valid, s: ext)
    f_raw, _, _ = slab_forces_half.__wrapped__(ext_pos, ext_v, spec, 2.5,
                                               True)
    assert not bool(jnp.isfinite(f_raw).all()), (
        "collision not reproduced — the regression test lost its teeth")

    # (c) a pre-re-parked ghost layer through the raw kernel is bitwise
    # identical to the production path
    park_ext = np.asarray(park_lattice(spec.ext()))[:, rows:]
    gfix = np.where((gpid >= 0)[None], gpos, park_ext)
    ext_fix = jnp.concatenate([jnp.asarray(pos), jnp.asarray(gfix)], axis=1)
    f_fix, seam_fix, _ = slab_forces_half.__wrapped__(ext_fix, ext_v, spec,
                                                      2.5, True)
    assert bool(jnp.all(f_fix == f_prod))
    assert bool(jnp.all(seam_fix == seam_prod))


def test_slab_force_row_groups_match_merged(monkeypatch):
    """The slab force kernel's grouped form (one pallas_call per
    _row_groups group at N=8M-class shapes) must reproduce the merged
    slab kernel: owned forces, seam reactions and PE to summation-order
    noise. Built as the P=1 self-halo geometry (ghost layer = the first
    owned layer shifted by +L) so the extended arrays are easy to
    synthesize from a cube state."""
    from md_neighbor_list_tpu.ops import pallas_force
    from md_neighbor_list_tpu.ops.slab_kernels import (SlabSpec,
                                                       slab_forces_half)
    from tests.test_dense import _dense_state

    state, spec, box, _ = _dense_state(key=7)
    s_spec = SlabSpec(mc=spec.mc, nz=spec.mc, mc_z=spec.mc, cap=spec.cap,
                      L=spec.L, cell_size=spec.cell_size,
                      cell_z=spec.cell_size)
    v = state.valid().astype(jnp.float32)
    ghost = state.pos[:, : spec.mc].at[2].add(jnp.float32(spec.L))
    ext_pos = jnp.concatenate([state.pos, ghost], axis=1)
    ext_v = jnp.concatenate([v, v[: spec.mc]], axis=0)

    assert pallas_force._row_groups(s_spec) == [(0, 1, 2, 3, 4)]
    f_ref, seam_ref, pe_ref = slab_forces_half(
        ext_pos, ext_v, s_spec, 2.5, True, True)

    monkeypatch.setattr(pallas_force, "_row_groups",
                        lambda s, want_pe=False: [(0, 1), (2, 3), (4,)])
    f2, seam2, pe2 = slab_forces_half.__wrapped__(
        ext_pos, ext_v, s_spec, 2.5, True, True)

    scale = max(float(jnp.max(jnp.abs(f_ref))), 1.0)
    assert float(jnp.max(jnp.abs(f_ref - f2))) <= 1e-4 * scale
    assert float(jnp.max(jnp.abs(seam_ref - seam2))) <= 1e-4 * scale
    assert float(jnp.max(jnp.abs(pe_ref - pe2))) <= 1e-4
