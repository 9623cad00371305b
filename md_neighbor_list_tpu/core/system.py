"""Particle state pytree and initializers.

Reference capability: particle data arrays + initializer placing N particles
at density rho in a periodic cube with Maxwell velocities (SURVEY.md §3
R1/R2; BASELINE.json:7). The reference keeps AoS *and* SoA layouts to feed
SIMD experiments; on TPU a single ``(N, 3)`` float32 layout is canonical —
XLA lays the minor dim on lanes, and the C4 "sorted SoA" capability is
realized by *permuting rows into spatial (Morton) order* at each neighbor
rebuild rather than by a second copy of the data (SURVEY.md §4.2).

``System`` is a NamedTuple so it is a JAX pytree with zero registration
boilerplate; every field is a device array, so the whole state threads
through ``jit`` / ``lax.scan`` / ``shard_map`` unchanged.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from md_neighbor_list_tpu.core.box import Box


class System(NamedTuple):
    """MD particle state. Rows may be permuted into spatial order at each
    neighbor-list rebuild; ``pid`` tracks the original particle identity so
    trajectories / checkpoints / parity tests can canonicalize."""

    pos: jnp.ndarray  # (N, 3) f32, wrapped into [0, L)
    vel: jnp.ndarray  # (N, 3) f32
    force: jnp.ndarray  # (N, 3) f32
    pid: jnp.ndarray  # (N,)  i32 original particle id

    @property
    def n(self) -> int:
        return self.pos.shape[0]


def _fresh(pos: jnp.ndarray, vel: jnp.ndarray) -> System:
    n = pos.shape[0]
    return System(
        pos=pos.astype(jnp.float32),
        vel=vel.astype(jnp.float32),
        force=jnp.zeros((n, 3), jnp.float32),
        pid=jnp.arange(n, dtype=jnp.int32),
    )


def init_lattice(n: int, rho: float, key=None, temperature: float = 1.0) -> tuple[System, Box]:
    """Place ``n`` particles on a simple-cubic lattice inside the rho-box.

    The box side is fixed by density (L = (n/rho)^(1/3)); the lattice uses
    ``ceil(n^(1/3))`` sites per dim and keeps the first ``n`` sites, so no two
    particles overlap regardless of n. Mirrors the reference's initializer
    role (SURVEY.md §3 R2). Velocities are Maxwell at ``temperature`` with the
    center-of-mass drift removed (zero net momentum — required for the
    momentum-conservation gate, SURVEY.md §6.2).
    """
    box = Box.from_density(n, rho)
    # host math, not jnp: n is static shape logic, and keeping it off the
    # trace lets init_lattice inline into a jitted caller (DenseSimulator's
    # fused cold-start program)
    m = math.ceil(n ** (1.0 / 3.0))
    while m**3 < n:  # guard fp roundoff in ceil
        m += 1
    spacing = box.L / m
    idx = jnp.arange(m**3, dtype=jnp.int32)[:n]
    ix = idx % m
    iy = (idx // m) % m
    iz = idx // (m * m)
    pos = (jnp.stack([ix, iy, iz], axis=-1).astype(jnp.float32) + 0.5) * spacing

    if key is None:
        key = jax.random.PRNGKey(0)
    vel = _maxwell(key, n, temperature)
    return _fresh(pos, vel), box


def init_random(key, n: int, rho: float, temperature: float = 1.0) -> tuple[System, Box]:
    """Uniform-random positions in the rho-box (may overlap — used for
    neighbor-list parity tests where forces are never integrated)."""
    box = Box.from_density(n, rho)
    kp, kv = jax.random.split(key)
    pos = jax.random.uniform(kp, (n, 3), jnp.float32, 0.0, box.L)
    vel = _maxwell(kv, n, temperature)
    return _fresh(pos, vel), box


def _maxwell(key, n: int, temperature: float) -> jnp.ndarray:
    vel = jax.random.normal(key, (n, 3), jnp.float32) * jnp.sqrt(
        jnp.float32(temperature)
    )
    return vel - jnp.mean(vel, axis=0, keepdims=True)
