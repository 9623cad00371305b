"""Device-mesh helpers for the 1-D slab decomposition (D1).

The TPU-native "communication backend" (SURVEY.md §7.8): a 1-D
``jax.sharding.Mesh`` whose collectives (``ppermute`` halo shifts, ``pmax``
rebuild votes, ``psum`` diagnostics) ride ICI under ``shard_map`` — the
reference has no distributed backend at all (single node, SURVEY.md §3), so
this layer is a driver-mandated extension (BASELINE.json:11)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


AXIS = "x"


def make_mesh(n_devices: int) -> Mesh:
    devs = jax.devices()
    if len(devs) < n_devices:
        raise ValueError(
            f"need {n_devices} devices, have {len(devs)} "
            "(tests use XLA_FLAGS=--xla_force_host_platform_device_count=8)"
        )
    return Mesh(np.array(devs[:n_devices]), (AXIS,))


def slab_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded across slabs, everything else replicated."""
    return NamedSharding(mesh, PartitionSpec(AXIS))


def shift_perms(p: int):
    """(perm_plus, perm_minus): perm_plus sends i -> i+1 (receive from the
    LEFT neighbor); perm_minus sends i -> i-1 (receive from the RIGHT).
    Periodic wraparound matches the periodic box."""
    perm_plus = [(i, (i + 1) % p) for i in range(p)]
    perm_minus = [(i, (i - 1) % p) for i in range(p)]
    return perm_plus, perm_minus
