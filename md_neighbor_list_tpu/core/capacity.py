"""Static-shape capacity policy.

Everything under ``jit`` on TPU must have compile-time shapes
(BASELINE.json:5 — "fixed-capacity padded half-neighbor lists ... whole step
loop jit-compiled with static shapes"). The reference, being C++, grows
std::vectors at runtime; the TPU-native contract instead is:

  estimate capacity  →  build with fixed padding  →  *detect* overflow on
  device  →  host re-jits with a larger capacity (SURVEY.md §4.3, §9
  "Static shapes under physics").

This module centralizes every such estimate (SURVEY.md §9: "Centralize in one
Capacity policy object"). Estimates are ideal-gas means inflated by a Poisson
fluctuation margin plus a multiplicative safety factor, then rounded up to a
lane-friendly multiple.
"""

from __future__ import annotations

import dataclasses
import math


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class Capacity:
    """Compile-time capacities for one (N, rho, rs) problem."""

    neighbors: int  # K: padded neighbor slots per particle
    cell: int  # max particles per cell in the dense cell table
    growth: float = 1.5  # multiplier applied on overflow re-jit

    def grown(self) -> "Capacity":
        return dataclasses.replace(
            self,
            neighbors=round_up(int(self.neighbors * self.growth) + 8, 8),
            cell=round_up(int(self.cell * self.growth) + 8, 8),
        )


def _poisson_upper(mean: float, sigmas: float) -> float:
    """Mean + ``sigmas`` standard deviations of a Poisson count."""
    return mean + sigmas * math.sqrt(max(mean, 1.0))


def estimate(
    rho: float,
    rs: float,
    cell_size: float,
    half_list: bool,
    safety: float = 1.2,
    sigmas: float = 8.0,
    align: int = 8,
) -> Capacity:
    """Capacity estimate for density ``rho``, search radius ``rs`` and cell
    edge ``cell_size``.

    ``sigmas`` is deliberately generous (max over ~1e5 cells of a Poisson
    count sits many sigmas above the mean); overflow is still *detected* and
    recovered, never assumed away (SURVEY.md §6.2 overflow tests).
    """
    mean_nbrs = rho * (4.0 / 3.0) * math.pi * rs**3
    if half_list:
        mean_nbrs *= 0.5
    k = round_up(int(_poisson_upper(mean_nbrs, sigmas) * safety) + 1, align)

    mean_cell = rho * cell_size**3
    cap = round_up(int(_poisson_upper(mean_cell, sigmas) * safety) + 1, align)
    return Capacity(neighbors=k, cell=cap)
