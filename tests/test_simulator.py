"""Simulator gates (SURVEY.md §6.2): force parity vs oracle, momentum
conservation through the Newton-3 scatter, NVE energy drift, differential
Verlet-reuse test, and overflow recovery."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from md_neighbor_list_tpu.core.config import MDConfig
from md_neighbor_list_tpu.models.lj_nve import Simulator
from md_neighbor_list_tpu.ops import oracle
from tests.util import reorder_by_pid

N_SMALL = 2048


def _cfg(**kw):
    base = dict(n=N_SMALL, rho=1.0, dt=0.001, temperature=0.8)
    base.update(kw)
    return MDConfig(**base)


@pytest.mark.parametrize("half", [True, False])
def test_forces_match_oracle(half):
    sim = Simulator(_cfg(half_list=half))
    carry = sim.init(jax.random.PRNGKey(7))
    f_engine = reorder_by_pid(np.asarray(carry.system.force),
                              np.asarray(carry.system.pid))
    pos_orig = reorder_by_pid(np.asarray(carry.system.pos),
                              np.asarray(carry.system.pid))
    f_oracle, u_oracle = oracle.forces_energy(
        jnp.asarray(pos_orig), sim.box, sim.config.rc
    )
    f_oracle = np.asarray(f_oracle)
    scale = np.abs(f_oracle).max()
    np.testing.assert_allclose(f_engine, f_oracle, atol=2e-4 * max(scale, 1.0))

    _, pe = sim.energies(carry)
    np.testing.assert_allclose(float(pe), float(u_oracle),
                               rtol=1e-4, atol=1e-2)


def test_momentum_conserved_over_steps():
    sim = Simulator(_cfg())
    carry = sim.init(jax.random.PRNGKey(3))
    p0 = np.asarray(carry.system.vel).sum(axis=0)
    carry = sim.run(carry, 200)
    p1 = np.asarray(carry.system.vel).sum(axis=0)
    # started at zero net momentum; must stay there to fp32 roundoff
    assert np.abs(p1 - p0).max() < 5e-2


def test_nve_energy_drift():
    """|dE/E| <= 1e-4 over 1k steps at dt=0.001 (BASELINE.md row 5)."""
    sim = Simulator(_cfg(temperature=0.7))
    carry = sim.init(jax.random.PRNGKey(11))
    ke0, pe0 = sim.energies(carry)
    e0 = float(ke0) + float(pe0)
    carry = sim.run(carry, 1000)
    ke1, pe1 = sim.energies(carry)
    e1 = float(ke1) + float(pe1)
    assert abs(e1 - e0) / abs(e0) < 1e-4, (e0, e1)
    assert int(carry.nbr.n_rebuilds) >= 2  # skin reuse actually engaged


def test_verlet_reuse_matches_rebuild_every_step():
    """Differential test (SURVEY.md §6.2): trajectory with skin-triggered
    reuse == trajectory with rebuild-every-step, compared by original id."""
    steps = 60
    key = jax.random.PRNGKey(5)
    sim_a = Simulator(_cfg())
    sim_b = Simulator(_cfg(rebuild_every_step=True))
    ca = sim_a.run(sim_a.init(key), steps)
    cb = sim_b.run(sim_b.init(key), steps)
    pa = reorder_by_pid(np.asarray(ca.system.pos), np.asarray(ca.system.pid))
    pb = reorder_by_pid(np.asarray(cb.system.pos), np.asarray(cb.system.pid))
    np.testing.assert_allclose(pa, pb, atol=5e-4)


def test_overflow_recovery():
    """Start with a deliberately tiny neighbor capacity: the run must detect
    overflow, grow, re-jit and produce forces matching the oracle — no
    silent truncation (SURVEY.md §6.2 overflow path)."""
    sim = Simulator(_cfg(neighbor_capacity=8))
    carry = sim.init(jax.random.PRNGKey(2))
    assert sim.capacity.neighbors > 8  # grew during init
    carry = sim.run(carry, 20)
    f_engine = reorder_by_pid(np.asarray(carry.system.force),
                              np.asarray(carry.system.pid))
    pos_orig = reorder_by_pid(np.asarray(carry.system.pos),
                              np.asarray(carry.system.pid))
    f_oracle, _ = oracle.forces_energy(jnp.asarray(pos_orig), sim.box, 2.5)
    scale = np.abs(np.asarray(f_oracle)).max()
    np.testing.assert_allclose(f_engine, np.asarray(f_oracle),
                               atol=2e-4 * max(scale, 1.0))


def test_half_and_full_lists_agree():
    key = jax.random.PRNGKey(9)
    sim_h = Simulator(_cfg(half_list=True))
    sim_f = Simulator(_cfg(half_list=False))
    ch = sim_h.run(sim_h.init(key), 30)
    cf = sim_f.run(sim_f.init(key), 30)
    ph = reorder_by_pid(np.asarray(ch.system.pos), np.asarray(ch.system.pid))
    pf = reorder_by_pid(np.asarray(cf.system.pos), np.asarray(cf.system.pid))
    np.testing.assert_allclose(ph, pf, atol=5e-4)
