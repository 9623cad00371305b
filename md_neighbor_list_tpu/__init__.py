"""md_neighbor_list_tpu — a TPU-native MD neighbor-search and short-range
force engine, built from scratch in JAX/Pallas.

Capabilities mirror ``kohnakagawa/md_neighbor_list`` (capability spec:
BASELINE.json:5-11; blueprint: SURVEY.md §2-§4 — the reference mount is empty,
see SURVEY.md §0, so parity claims cite the driver spec, never reference
file:line):

- brute-force O(N^2) pair search (the correctness oracle)        [C1, R3]
- sort-based cell binning: spatial keys + per-cell segment offsets [C2, R4]
- 27-cell pair sweep emitting fixed-capacity padded neighbor lists [R5-R8]
- skin-based Verlet-list reuse with displacement-triggered rebuild [C3, R9]
- Lennard-Jones forces + velocity-Verlet NVE, fully jit-compiled   [R10-R11]
- Morton-sorted SoA layout, half lists with Newton-3 dedup         [C4]
- slab domain decomposition with halo exchange over ICI            [C5, D1-D3]
"""

from md_neighbor_list_tpu.api import neighbor_list, pair_list
from md_neighbor_list_tpu.core.box import Box
from md_neighbor_list_tpu.core.config import MDConfig, PRESETS
from md_neighbor_list_tpu.core.system import System, init_lattice, init_random

__version__ = "0.1.0"

__all__ = [
    "Box",
    "MDConfig",
    "PRESETS",
    "System",
    "init_lattice",
    "init_random",
    "neighbor_list",
    "pair_list",
]
