"""Checkpoint / resume (SURVEY.md §7.4).

The reference has none (benchmark runs are minutes long); this is the
trivial-but-real implementation the rebuild carries: the packed particle
state + step counter round-trips through one ``.npz`` file, and resume is
exact (bitwise position/velocity equality — tested in
tests/test_checkpoint.py) because the engines rebuild all derived state
(neighbor structure, forces) deterministically from (pos, vel).
"""

from __future__ import annotations

import pathlib

import jax.numpy as jnp
import numpy as np

from md_neighbor_list_tpu.core.system import System


def save(path: str | pathlib.Path, system: System, step: int = 0,
         meta: dict | None = None) -> None:
    """Write packed state (in pid order) + step counter to ``path``."""
    pid = np.asarray(system.pid)
    order = np.argsort(pid)
    np.savez(
        path,
        pos=np.asarray(system.pos)[order],
        vel=np.asarray(system.vel)[order],
        force=np.asarray(system.force)[order],
        step=np.int64(step),
        **({f"meta_{k}": v for k, v in (meta or {}).items()}),
    )


def load(path: str | pathlib.Path) -> tuple[System, int]:
    """Read a checkpoint back as a fresh pid-ordered System."""
    with np.load(path) as z:
        n = z["pos"].shape[0]
        system = System(
            pos=jnp.asarray(z["pos"], jnp.float32),
            vel=jnp.asarray(z["vel"], jnp.float32),
            force=jnp.asarray(z["force"], jnp.float32),
            pid=jnp.arange(n, dtype=jnp.int32),
        )
        return system, int(z["step"])
