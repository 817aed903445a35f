"""Device mesh construction.

The reference's thread-group/affinity model (C/Threads.h:138-157) maps to
mesh axes: "data" shards independent blocks/frames (MtCoder-style), and a
second "lane" axis is reserved for intra-codec parallelism (multi-lane
entropy streams) on larger slices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
LANE_AXIS = "lane"


def data_axis() -> str:
    return DATA_AXIS


def make_mesh(n_devices: int | None = None, lanes: int = 1) -> Mesh:
    """Build a (data, lane) mesh over the first n devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    if n_devices % lanes:
        raise ValueError("n_devices must be divisible by lanes")
    arr = np.array(devs[:n_devices]).reshape(n_devices // lanes, lanes)
    return Mesh(arr, (DATA_AXIS, LANE_AXIS))
