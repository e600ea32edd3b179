"""Mesh bootstrap and sharding helpers.

The reference has no distributed backend (SURVEY.md §2.4); here the unit of
scale-out is a 1-D ``jax.sharding.Mesh`` over the serving slice. Vector-store
rows shard over the ``data`` axis (each chip holds a contiguous row range of
the database in its HBM); queries are replicated; the top-k merge rides ICI
collectives (see ``parallel.distributed_search``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` (default: all) devices.

    With neither argument given, the ``MESH_SHAPE`` env knob (e.g.
    ``"data:4"``) bounds the device count — useful to pin a serving slice
    to a subset of a shared host's chips."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        from multimodal_rag_tpu.config import settings

        if settings.MESH_SHAPE:
            try:
                n_devices = 1
                for part in settings.MESH_SHAPE.split(","):
                    n_devices *= int(part.split(":")[-1])
            except ValueError:
                n_devices = None
    if n_devices is not None:
        devices = devices[: max(1, min(n_devices, len(devices)))]
    import numpy as np

    return Mesh(np.asarray(devices), (DATA_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (N, D) array's rows over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, None))


def col_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a (1, N) mask's columns over the data axis."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
