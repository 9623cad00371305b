"""Run configuration and the five driver presets.

The reference selects variants at compile time via Make targets / macros plus
argv N (SURVEY.md §7.6). The TPU-native equivalent is one frozen dataclass —
hashable, so it can be a static argument to ``jax.jit`` — with the driver's
five benchmark configs (BASELINE.json:7-11) as named presets.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class MDConfig:
    """Full configuration of one simulation / benchmark run."""

    n: int = 16384
    rho: float = 1.0
    rc: float = 2.5  # LJ cutoff (sigma units)
    skin: float = 0.3  # Verlet skin; search radius rs = rc + skin
    dt: float = 0.001
    steps: int = 1000
    temperature: float = 1.0

    # Neighbor-list strategy
    layout: str = "morton"  # particle sort order: "morton" | "rowmajor"
    half_list: bool = True  # Newton-3rd-law dedup (C4) vs full lists
    rebuild_every_step: bool = False  # C2 mode: no skin reuse
    backend: str = "auto"  # pair sweep impl: "auto" | "xla" | "pallas"

    # Capacity overrides (None → Capacity.estimate)
    neighbor_capacity: int | None = None
    cell_capacity: int | None = None

    # Distributed (C5): number of slab devices along x; 1 = single chip
    mesh_devices: int = 1

    def __post_init__(self):
        if self.layout not in ("morton", "rowmajor"):
            raise ValueError(f"layout must be 'morton' or 'rowmajor', got {self.layout!r}")
        if self.backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"backend must be auto|xla|pallas, got {self.backend!r}")
        if self.n <= 0 or self.rho <= 0 or self.rc <= 0 or self.skin < 0:
            raise ValueError("n, rho, rc must be positive and skin non-negative")

    @property
    def rs(self) -> float:
        return self.rc + self.skin


PRESETS: dict[str, MDConfig] = {
    # C1 — brute-force O(N^2) oracle config (BASELINE.json:7)
    "c1_brute": MDConfig(n=16384, steps=100, rebuild_every_step=True),
    # C2 — cell list, full rebuild every step, pair-count parity (BASELINE.json:8)
    "c2_cell": MDConfig(n=100_000, steps=100, rebuild_every_step=True,
                        layout="rowmajor"),
    # C3 — Verlet skin + displacement-triggered rebuild in NVE (BASELINE.json:9)
    "c3_verlet": MDConfig(n=100_000, steps=1000),
    # C4 — Morton-sorted SoA, half lists, N=1M single chip (BASELINE.json:10)
    "c4_sorted": MDConfig(n=1_000_000, steps=1000, layout="morton",
                          half_list=True),
    # C5 — slab DD + ICI halo, N=8M over 8 devices (BASELINE.json:11)
    "c5_dd": MDConfig(n=8_000_000, steps=1000, mesh_devices=8),
}
