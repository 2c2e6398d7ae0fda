"""Device mesh helpers.

The reference is single-threaded (SURVEY.md §2: no parallel components — the
serial bitstream dependence is exactly what this build breaks).  Here the unit
of data parallelism is the independent 64 KiB chunk: chunks shard over the
``data`` mesh axis, ride ICI for the size all-gather and the assembly
reduction, and concatenate in stream order.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))
