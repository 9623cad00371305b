"""Checkpoint exact-resume (SURVEY.md §7.4) and CLI driver smoke tests."""

import subprocess
import sys

import jax
import numpy as np
import pytest

from md_neighbor_list_tpu.core.config import MDConfig
from md_neighbor_list_tpu.models.lj_nve import Simulator
from md_neighbor_list_tpu.utils.checkpoint import load, save
from tests.util import reorder_by_pid


def test_checkpoint_exact_resume(tmp_path):
    """save -> load -> continue == uninterrupted run, bitwise positions."""
    cfg = MDConfig(n=1024, rho=1.0, rc=1.5, skin=0.2, dt=0.001,
                   temperature=0.6)
    sim = Simulator(cfg)
    key = jax.random.PRNGKey(0)

    carry = sim.init(key)
    carry = sim.run(carry, 40)
    path = tmp_path / "ckpt.npz"
    save(path, carry.system, step=40)

    # in-memory continuation from the same canonical (pid-ordered) state —
    # bitwise determinism requires identical input row order, since the
    # stable spatial sort breaks ties by input index
    import jax.numpy as jnp

    from md_neighbor_list_tpu.core.system import System

    canon = System(
        pos=jnp.asarray(reorder_by_pid(np.asarray(carry.system.pos),
                                       np.asarray(carry.system.pid))),
        vel=jnp.asarray(reorder_by_pid(np.asarray(carry.system.vel),
                                       np.asarray(carry.system.pid))),
        force=jnp.zeros((cfg.n, 3), jnp.float32),
        pid=jnp.arange(cfg.n, dtype=jnp.int32),
    )
    cont = sim.run(sim.build(canon), 40)
    p_direct = reorder_by_pid(np.asarray(cont.system.pos),
                              np.asarray(cont.system.pid))

    # resumed continuation
    system, step = load(path)
    assert step == 40
    cont2 = sim.run(sim.build(system), 40)
    p_resumed = reorder_by_pid(np.asarray(cont2.system.pos),
                               np.asarray(cont2.system.pid))
    np.testing.assert_array_equal(p_resumed, p_direct)


def test_checkpoint_roundtrip_bitwise(tmp_path):
    cfg = MDConfig(n=512, rho=1.0, rc=1.5, skin=0.2)
    sim = Simulator(cfg)
    carry = sim.init(jax.random.PRNGKey(1))
    path = tmp_path / "x.npz"
    save(path, carry.system, step=7, meta={"note": "t"})
    system, step = load(path)
    assert step == 7
    want_p = reorder_by_pid(np.asarray(carry.system.pos),
                            np.asarray(carry.system.pid))
    np.testing.assert_array_equal(np.asarray(system.pos), want_p)
    want_v = reorder_by_pid(np.asarray(carry.system.vel),
                            np.asarray(carry.system.pid))
    np.testing.assert_array_equal(np.asarray(system.vel), want_v)


@pytest.mark.slow
def test_cli_smoke(tmp_path):
    """End-to-end CLI run with parity check + checkpoint, subprocess."""
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    out = subprocess.run(
        [sys.executable, "-m", "md_neighbor_list_tpu",
         "--preset", "c1_brute", "--n", "1024", "--steps", "20",
         "--check-parity", "--save", str(tmp_path / "s.npz")],
        capture_output=True, text=True, timeout=560, env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "parity=OK" in out.stdout
    assert (tmp_path / "s.npz").exists()

    # resume path
    out2 = subprocess.run(
        [sys.executable, "-m", "md_neighbor_list_tpu",
         "--preset", "c1_brute", "--n", "1024", "--steps", "5",
         "--resume", str(tmp_path / "s.npz")],
        capture_output=True, text=True, timeout=560, env=env,
        cwd="/root/repo",
    )
    assert out2.returncode == 0, out2.stderr[-2000:]


def test_cli_compare_mode(tmp_path):
    """Reference-driver mode (SURVEY.md §5.1): both engines on one initial
    state, each engine's OWN pair artifact cross-checked (and vs oracle)."""
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    out = subprocess.run(
        [sys.executable, "-m", "md_neighbor_list_tpu",
         "--preset", "c2_cell", "--n", "4096", "--steps", "5",
         "--compare", "--check-parity"],
        capture_output=True, text=True, timeout=560, env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "-> OK" in out.stdout
    assert "xla" in out.stdout and "dense" in out.stdout


def test_cli_resume_slab_engine(tmp_path):
    """--resume must feed the checkpoint into the DD engines too (it was
    silently ignored for them before round 3): the resumed run logs a
    'resumed' event and starts from the saved system."""
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    out = subprocess.run(
        [sys.executable, "-m", "md_neighbor_list_tpu",
         "--preset", "c3_verlet", "--n", "4096", "--steps", "2",
         "--engine", "dense", "--save", str(tmp_path / "s.npz")],
        capture_output=True, text=True, timeout=560, env=env,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]

    out2 = subprocess.run(
        [sys.executable, "-m", "md_neighbor_list_tpu",
         "--preset", "c3_verlet", "--n", "4096", "--steps", "2",
         "--engine", "dense_slab", "--mesh-devices", "2",
         "--resume", str(tmp_path / "s.npz")],
        capture_output=True, text=True, timeout=560, env=env,
        cwd="/root/repo",
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    assert '"event": "resumed"' in out2.stderr + out2.stdout
