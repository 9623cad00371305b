"""Periodic cubic box and minimum-image convention.

Reference capability: particle data + periodic cubic box with minimum-image
distance math (SURVEY.md §3 R1; BASELINE.json:7 — "periodic cube"). The
reference stores box side as a plain scalar next to AoS/SoA arrays; here the
box is a tiny frozen dataclass whose side length is a *static* Python float so
it constant-folds under ``jax.jit`` (XLA specializes on it — no traced box).

All math is branchless (``round``/``mod``) so it vectorizes onto the TPU VPU
and never introduces data-dependent control flow inside ``jit``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Box:
    """Periodic cube of side ``L`` (reduced LJ units, sigma = 1)."""

    L: float

    @staticmethod
    def from_density(n: int, rho: float) -> "Box":
        """Box for ``n`` particles at number density ``rho``: L = (N/rho)^(1/3)."""
        return Box(L=float((n / rho) ** (1.0 / 3.0)))

    def wrap(self, pos: jnp.ndarray) -> jnp.ndarray:
        """Wrap positions into [0, L). ``mod`` handles negatives branchlessly."""
        return jnp.mod(pos, self.L)

    def min_image(self, dr: jnp.ndarray) -> jnp.ndarray:
        """Minimum-image displacement: dr - L * round(dr / L), per component.

        Valid for any dr (not just |dr| < 1.5 L); exact for wrapped inputs.
        """
        return dr - self.L * jnp.round(dr / self.L)

    def volume(self) -> float:
        return self.L**3
