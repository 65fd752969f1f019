"""Device mesh construction helpers.

The reference has no distribution at all (SURVEY.md §2.3: one process,
std::thread + a mutex). Scaling axes here, per the build contract:
  * ``point`` — map-point/observation blocks sharded for distributed
    Schur-complement BA (psum on the reduced camera system over ICI),
  * ``stream`` — data parallelism over independent camera streams for
    throughput serving.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "point") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(n_point: int, n_stream: int) -> Mesh:
    devs = np.asarray(jax.devices()[: n_point * n_stream])
    return Mesh(devs.reshape(n_stream, n_point), ("stream", "point"))


def shard_points(mesh: Mesh, axis: str = "point") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
