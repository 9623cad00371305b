"""Slab domain-decomposition tests on 8 virtual CPU devices
(SURVEY.md §6.2 "Distributed without a real pod"): P-slab run must match the
single-chip run on the same initial state; migration conserves particles;
halo refresh keeps forces exact between rebuilds."""

import jax
import numpy as np
import pytest

from md_neighbor_list_tpu.core.config import MDConfig
from md_neighbor_list_tpu.models.lj_nve import Simulator
from md_neighbor_list_tpu.parallel.slab import SlabSimulator
from tests.util import reorder_by_pid

# rc=1.5 keeps slabs wider than rs on a CPU-sized box (SURVEY.md §6.2)
CFG = dict(n=4096, rho=1.0, rc=1.5, skin=0.2, dt=0.001, temperature=0.8)


def _dd_cfg(**kw):
    base = dict(CFG, mesh_devices=8, half_list=False)
    base.update(kw)
    return MDConfig(**base)


def test_requires_wide_slabs():
    with pytest.raises(ValueError, match="slab width"):
        SlabSimulator(MDConfig(n=8192, rc=2.5, skin=0.3, mesh_devices=8))


def test_dd_initial_forces_match_single_chip():
    key = jax.random.PRNGKey(0)
    dd = SlabSimulator(_dd_cfg())
    state = dd.init(key)
    sys_dd = dd.gather(state)

    single = Simulator(MDConfig(**CFG, half_list=False))
    carry = single.init(key)
    f_single = reorder_by_pid(np.asarray(carry.system.force),
                              np.asarray(carry.system.pid))
    f_dd = reorder_by_pid(np.asarray(sys_dd.force), np.asarray(sys_dd.pid))
    scale = max(np.abs(f_single).max(), 1.0)
    np.testing.assert_allclose(f_dd, f_single, atol=1e-4 * scale)


def test_dd_trajectory_matches_single_chip():
    """P=8 slab run == P=1 run (SURVEY.md §6.2 distributed parity gate)."""
    steps = 50
    key = jax.random.PRNGKey(1)
    dd = SlabSimulator(_dd_cfg())
    sd = dd.run(dd.init(key), steps)
    sys_dd = dd.gather(sd)

    single = Simulator(MDConfig(**CFG, half_list=False))
    cs = single.run(single.init(key), steps)

    p_dd = reorder_by_pid(np.asarray(sys_dd.pos), np.asarray(sys_dd.pid))
    p_s = reorder_by_pid(np.asarray(cs.system.pos), np.asarray(cs.system.pid))
    np.testing.assert_allclose(p_dd, p_s, atol=5e-4)
    assert int(np.asarray(sd.n_rebuilds)[0]) >= 1


def test_dd_particle_conservation_and_migration():
    """Run long enough that particles cross slab boundaries; gather()
    asserts none are lost or duplicated."""
    dd = SlabSimulator(_dd_cfg(temperature=1.2))
    state = dd.init(jax.random.PRNGKey(2))
    occupancy0 = np.asarray(state.pid >= 0).sum(axis=1)
    state = dd.run(state, 150)
    sys_dd = dd.gather(state)  # internal assert: count == N
    occupancy1 = np.asarray(state.pid >= 0).sum(axis=1)
    assert occupancy1.sum() == dd.config.n
    # rebuilds happened on every device in lockstep (global vote)
    rebuilds = np.asarray(state.n_rebuilds)
    assert (rebuilds == rebuilds[0]).all() and rebuilds[0] >= 2
    # pids unique
    pid = np.asarray(state.pid).reshape(-1)
    pid = pid[pid >= 0]
    assert len(np.unique(pid)) == dd.config.n
    del occupancy0, sys_dd


def test_dd_energy_conservation():
    dd = SlabSimulator(_dd_cfg(temperature=0.7))
    state = dd.init(jax.random.PRNGKey(3))
    ke0, pe0 = dd.energies(state)
    e0 = float(ke0) + float(pe0)
    state = dd.run(state, 300)
    ke1, pe1 = dd.energies(state)
    e1 = float(ke1) + float(pe1)
    assert abs(e1 - e0) / abs(e0) < 1e-4, (e0, e1)


def test_dd_momentum_conservation():
    dd = SlabSimulator(_dd_cfg())
    state = dd.init(jax.random.PRNGKey(4))
    state = dd.run(state, 100)
    sys_dd = dd.gather(state)
    p = np.asarray(sys_dd.vel).sum(axis=0)
    assert np.abs(p).max() < 5e-2
