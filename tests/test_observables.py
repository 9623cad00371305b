"""Virial / pressure observables (the standard second MD observable next
to the energies): engine virial vs an independent fp64 numpy pairwise sum,
thermodynamic consistency of the formula (W/(3V) == -dU/dV at T=0), and
parity across the jnp twin / interpret-mode Pallas kernel / padded-row
paths."""

import jax
import jax.numpy as jnp
import numpy as np

from md_neighbor_list_tpu.core.config import MDConfig
from md_neighbor_list_tpu.core.system import init_lattice
from md_neighbor_list_tpu.models.dense_lj import DenseSimulator
from md_neighbor_list_tpu.models.lj_nve import Simulator

N = 1728
RC = 2.5


def _np_pe_virial(pos, L, rc):
    """fp64 pairwise reference: (shifted PE, virial W) over unordered
    min-image pairs."""
    pos = np.asarray(pos, np.float64)
    d = pos[:, None, :] - pos[None, :, :]
    d -= L * np.round(d / L)
    r2 = (d * d).sum(-1)
    iu = np.triu_indices(pos.shape[0], 1)
    r2 = r2[iu]
    r2 = r2[r2 < rc * rc]
    s6 = (1.0 / r2) ** 3
    s6c = (1.0 / rc**2) ** 3
    pe = (4.0 * (s6 * s6 - s6)).sum() - r2.size * 4.0 * (s6c * s6c - s6c)
    w = (24.0 * s6 * (2.0 * s6 - 1.0)).sum()
    return pe, w


def _jittered_system(key=3, jitter=0.05):
    system, box = init_lattice(N, 1.0)
    rng = np.random.default_rng(key)
    pos = (np.asarray(system.pos)
           + rng.uniform(-jitter, jitter, (N, 3))) % box.L
    return system._replace(pos=jnp.asarray(pos, jnp.float32)), box


def test_virial_formula_is_minus_dU_dV():
    """T=0 thermodynamic identity: P_config = W/(3V) must equal -dU/dV
    (fp64 finite difference over a uniform box scaling) — validates the
    virial formula itself, independent of any engine."""
    system, box = _jittered_system()
    pos = np.asarray(system.pos, np.float64)
    L = float(box.L)
    _, w = _np_pe_virial(pos, L, RC)
    eps = 1e-6
    up, _ = _np_pe_virial(pos * (1 + eps), L * (1 + eps), RC)
    um, _ = _np_pe_virial(pos * (1 - eps), L * (1 - eps), RC)
    v = L**3
    dv = v * ((1 + eps) ** 3 - (1 - eps) ** 3)
    p_fd = -(up - um) / dv
    p_vir = w / (3.0 * v)
    assert abs(p_fd - p_vir) <= 1e-4 * max(abs(p_vir), 1.0), (p_fd, p_vir)


def test_dense_thermo_matches_numpy_reference():
    """Dense engine thermo() (jnp twin path on CPU) vs the fp64 pairwise
    reference at the engine's own positions."""
    system, box = _jittered_system()
    sim = DenseSimulator(MDConfig(n=N, rc=RC), cap=40, kernel_impl="jnp")
    carry = sim.build(system)
    pos, _ = sim.to_system(carry)[:2]
    pe_ref, w_ref = _np_pe_virial(pos, float(box.L), RC)

    ke, pe, w = (float(x) for x in sim.thermo(carry))
    assert abs(pe - pe_ref) <= 5e-5 * abs(pe_ref), (pe, pe_ref)
    assert abs(w - w_ref) <= 5e-5 * max(abs(w_ref), 1.0), (w, w_ref)

    p = sim.pressure(carry)
    vol = float(box.L) ** 3
    assert abs(p - (2.0 * ke + w) / (3.0 * vol)) <= 1e-6 * max(abs(p), 1.0)


def test_dense_pe_virial_kernel_matches_twin(monkeypatch):
    """The Pallas pe/virial kernel (interpret mode) == the jnp twin, on
    both the merged and the singleton-split group paths."""
    from md_neighbor_list_tpu.ops import dense_ref, pallas_force

    system, box = _jittered_system(key=9)
    sim = DenseSimulator(MDConfig(n=N, rc=RC), cap=40, kernel_impl="jnp")
    carry = sim.build(system)
    state, spec = carry.state, sim.spec
    vm = state.valid()
    v32 = vm.astype(jnp.float32)

    _, pe_t, w_t = dense_ref.sweep_reference(state, spec, RC, True,
                                             want_virial=True)
    pe_twin = float(jnp.sum(jnp.where(vm, pe_t, 0.0))) * 0.5
    w_twin = float(jnp.sum(jnp.where(vm, w_t, 0.0))) * 0.5

    pe_k, w_k = pallas_force.dense_pe_virial(state.pos, v32, spec, RC, True)
    pe1 = float(jnp.sum(jnp.where(vm, pe_k, 0.0)))
    w1 = float(jnp.sum(jnp.where(vm, w_k, 0.0)))
    assert abs(pe1 - pe_twin) <= 1e-4 * abs(pe_twin)
    assert abs(w1 - w_twin) <= 1e-4 * max(abs(w_twin), 1.0)

    monkeypatch.setattr(pallas_force, "_split_rows",
                        lambda s, want_pe=False, kind="force": True)
    pe_s, w_s = pallas_force.dense_pe_virial.__wrapped__(
        state.pos, v32, spec, RC, True)
    np.testing.assert_allclose(np.asarray(pe_s), np.asarray(pe_k),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_s), np.asarray(w_k), atol=1e-4)


def test_xla_thermo_matches_numpy_reference():
    """Padded-row engine thermo() vs the fp64 pairwise reference, on both
    half and full lists."""
    for half in (True, False):
        sim = Simulator(MDConfig(n=N, rc=RC, half_list=half))
        carry = sim.init(jax.random.PRNGKey(2))
        pos = np.asarray(carry.system.pos)
        pe_ref, w_ref = _np_pe_virial(pos, float(sim.box.L), RC)
        ke, pe, w = (float(x) for x in sim.thermo(carry))
        assert abs(pe - pe_ref) <= 5e-5 * abs(pe_ref), (half, pe, pe_ref)
        assert abs(w - w_ref) <= 5e-5 * max(abs(w_ref), 1.0), (half, w)
        assert np.isfinite(sim.pressure(carry))
