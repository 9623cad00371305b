"""Velocity-Verlet NVE integrator pieces (R11).

Reference capability (SURVEY.md §3 R11, §4.5; BASELINE.json:9): kick-drift-
kick with PBC position wrap. Kept as tiny pure functions so the simulator's
jitted step composes them with the rebuild ``lax.cond`` in between — the
whole step is one XLA computation with zero host synchronization
(SURVEY.md §5.3).
"""

from __future__ import annotations

import jax.numpy as jnp

from md_neighbor_list_tpu.core.box import Box


def half_kick(vel: jnp.ndarray, force: jnp.ndarray, dt: float) -> jnp.ndarray:
    return vel + jnp.float32(0.5 * dt) * force


def drift(pos: jnp.ndarray, vel: jnp.ndarray, dt: float, box: Box) -> jnp.ndarray:
    return box.wrap(pos + jnp.float32(dt) * vel)


def kinetic_energy(vel: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * jnp.sum(vel * vel)
