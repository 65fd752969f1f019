"""Multi-host (multi-process) execution: jax.distributed bring-up + meshes.

The reference is a single process with two std::threads (SURVEY.md §2.3);
scaling past one host is a build-contract axis with no reference analogue
(BASELINE.md: >=70% frames/s efficiency at 2 hosts). The recipe:

  * every process calls :func:`initialize` first (before any jax backend
    touch) — on TPU pods this wires DCN; in CI it runs N processes on one
    machine with ``local_device_count`` virtual CPU devices each and gloo
    cross-process collectives (SURVEY.md §4's multi-host-on-CPU recipe),
  * meshes are then built over the GLOBAL device list (:func:`global_mesh`),
    so `dist.ba_sharded.solve_sharded` and `dist.multi_stream` run unchanged
    — shard_map collectives ride ICI within a process and DCN across,
  * inputs materialize as global arrays via :func:`put_sharded` /
    :func:`put_replicated` (every host holds the full host-side value; each
    process uploads only its addressable shards).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize(coordinator_address: str, num_processes: int, process_id: int,
               local_device_count: Optional[int] = None,
               platform: str = "cpu") -> None:
    """Bring up jax.distributed for this process.

    Must run before JAX initializes its backends. With ``platform='cpu'``
    (CI / tests) forces the host platform with ``local_device_count``
    virtual devices and gloo collectives; with ``platform=None``/'tpu' the
    real backend is kept (TPU pods discover topology themselves).
    """
    if local_device_count is not None:
        flags = [
            f for f in os.environ.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        ]
        flags.append(
            f"--xla_force_host_platform_device_count={local_device_count}"
        )
        os.environ["XLA_FLAGS"] = " ".join(flags)

    import jax

    if platform == "cpu":
        # the container's site config pins jax_platforms to the TPU tunnel;
        # env vars are shadowed, only the in-process config wins
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "point"):
    """1-D mesh over every device of every process."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def global_mesh_2d(n_stream: int, axis_stream: str = "stream",
                   axis_point: str = "point"):
    """(stream, point) mesh over all global devices; ``n_stream`` must
    divide the device count. Lay STREAMS across processes (outer axis) so
    per-stream tracking never crosses a host, and point-sharded BA psums
    within a host first."""
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())
    return Mesh(devs.reshape(n_stream, -1), (axis_stream, axis_point))


def put_replicated(x, mesh):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(x, NamedSharding(mesh, P()))


def put_sharded(x, mesh, axis: str):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(x, NamedSharding(mesh, P(axis)))


def process_count() -> int:
    import jax

    return jax.process_count()


def demo_ba_problem(seed: int = 11, K: int = 4, P: int = 256,
                    noise: float = 0.05 / 420.0, perturb: float = 0.05):
    """Deterministic synthetic BA problem — every process builds the SAME
    problem from the seed (no cross-host broadcast needed), used by the
    2-process CI test and bench_scaling --multihost."""
    import jax.numpy as jnp

    from ..core import se3
    from ..solvers import ba

    rs = np.random.default_rng(seed)
    pts = rs.uniform([-3, -3, 4], [3, 3, 12], size=(P, 3)).astype(np.float32)
    poses = np.stack([
        np.asarray(se3.exp(jnp.asarray(
            [0.4 * k / K, 0, 0, 0, 0.01 * k, 0], jnp.float32)))
        for k in range(K)
    ])
    p_cam = np.asarray(
        se3.transform(jnp.asarray(poses)[None], jnp.asarray(pts)[:, None])
    )
    uv = (p_cam[..., :2] / p_cam[..., 2:3]).astype(np.float32)
    uv = uv + rs.normal(0, noise, uv.shape).astype(np.float32)
    mask = rs.random((P, K)) > 0.15
    return ba.BAProblem(
        poses=jnp.asarray(poses),
        fixed=jnp.asarray([True, True] + [False] * (K - 2)),
        points=jnp.asarray(
            pts + rs.normal(0, perturb, pts.shape).astype(np.float32)),
        obs_uv=jnp.asarray(uv),
        obs_mask=jnp.asarray(mask),
    )
