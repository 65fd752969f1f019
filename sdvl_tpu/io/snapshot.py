"""Map/session checkpointing: save and resume a full SLAM session.

The reference has NO persistence at all (SURVEY.md §5: a vestigial
``map_saved_`` field at reference point.h:131 is never used; there is no map
serialization or resume path). Here it is first-class: because the whole
world model is one fixed-shape pytree (:class:`~sdvl_tpu.state.map_state
.MapState`) plus a dozen host scalars, a checkpoint is a single ``.npz``
written atomically — no pointer graphs to walk, no partial-write hazards.

Use cases: suspend/resume long mapping runs, post-hoc BA/evaluation on a
saved map, seeding relocalization-only ("localization mode") sessions, and
crash recovery for production deployments.
"""

from __future__ import annotations

import json
import os
import tempfile

import jax.numpy as jnp
import numpy as np

from ..state.map_state import MapState

FORMAT_VERSION = 1

# MapState leaves are handled generically; kf_pyr (a tuple of per-level
# arrays) is splatted into indexed keys.
_PYR_KEY = "map.kf_pyr.{i}"


def _map_to_arrays(m: MapState) -> dict:
    out = {}
    for name, val in m._asdict().items():
        if name == "kf_pyr":
            for i, lvl in enumerate(val):
                out[_PYR_KEY.format(i=i)] = np.asarray(lvl)
        else:
            out[f"map.{name}"] = np.asarray(val)
    return out


# scalar counters added after snapshots already existed in the wild: a
# missing key loads as 0 instead of failing the whole restore
_COUNTER_DEFAULTS = ("n_evicted", "n_pruned")


def _map_from_arrays(z) -> MapState:
    levels = sum(1 for k in z.files if k.startswith("map.kf_pyr."))
    kw = {}
    for name in MapState._fields:
        if name == "kf_pyr":
            kw[name] = tuple(
                jnp.asarray(z[_PYR_KEY.format(i=i)]) for i in range(levels)
            )
        elif f"map.{name}" not in z.files and name in _COUNTER_DEFAULTS:
            kw[name] = jnp.asarray(0, jnp.int32)
        else:
            kw[name] = jnp.asarray(z[f"map.{name}"])
    return MapState(**kw)


def save_snapshot(slam, path: str) -> None:
    """Write the complete session state of an ``SDVL`` instance to ``path``.

    Atomic: writes to a temp file in the same directory then renames, so a
    crash mid-save never corrupts an existing checkpoint.
    """
    arrays = _map_to_arrays(slam.m)
    host = {
        "state": slam.state.name,
        "quality": slam.quality.name,
        "frame_id": slam.frame_id,
        "frames_since_kf": slam.frames_since_kf,
        "kf_matches": slam.kf_matches,
        "lost_frames": slam.lost_frames,
        "format_version": FORMAT_VERSION,
    }
    arrays["host_json"] = np.frombuffer(
        json.dumps(host).encode(), dtype=np.uint8
    )
    arrays["key"] = np.asarray(slam.key)
    arrays["last_pose"] = np.asarray(slam.last_pose)
    arrays["xi_model"] = np.asarray(slam.xi_model)
    if slam.last_match_idx is not None:
        arrays["last_match_idx"] = np.asarray(slam.last_match_idx)
        arrays["last_match_ok"] = np.asarray(slam.last_match_ok)
    if slam.last_pyr is not None:
        for i, lvl in enumerate(slam.last_pyr):
            arrays[f"last_pyr.{i}"] = np.asarray(lvl)
    if slam.trajectory:
        arrays["traj_ids"] = np.asarray([t[0] for t in slam.trajectory])
        arrays["traj_poses"] = np.stack([t[1] for t in slam.trajectory])
    if slam._first_fs is not None:
        pyr1, corners1 = slam._first_fs
        for i, lvl in enumerate(pyr1):
            arrays[f"first_pyr.{i}"] = np.asarray(lvl)
        for field, val in corners1._asdict().items():
            arrays[f"first_corners.{field}"] = np.asarray(val)

    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_snapshot(slam, path: str):
    """Restore session state saved by :func:`save_snapshot` into ``slam``.

    ``slam`` must be constructed with the same Config capacities (they define
    the tensor shapes). Returns ``slam`` for chaining.
    """
    from ..pipeline.sdvl import TrackingQuality, TrackingState

    with np.load(path) as z:
        host = json.loads(bytes(z["host_json"]).decode())
        if host.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"snapshot format {host.get('format_version')} != "
                f"{FORMAT_VERSION}"
            )
        m = _map_from_arrays(z)
        K, P, C = m.capacities
        K0, P0, C0 = slam.m.capacities
        if (K, P, C) != (K0, P0, C0):
            raise ValueError(
                f"snapshot capacities {(K, P, C)} != config {(K0, P0, C0)}"
            )
        slam.m = m
        slam.state = TrackingState[host["state"]]
        slam.quality = TrackingQuality[host["quality"]]
        slam.frame_id = host["frame_id"]
        slam.frames_since_kf = host["frames_since_kf"]
        slam.kf_matches = host["kf_matches"]
        slam.lost_frames = host["lost_frames"]
        slam.key = jnp.asarray(z["key"])
        slam.last_pose = jnp.asarray(z["last_pose"])
        slam.xi_model = jnp.asarray(z["xi_model"])
        if "last_match_idx" in z.files:
            slam.last_match_idx = jnp.asarray(z["last_match_idx"])
            slam.last_match_ok = jnp.asarray(z["last_match_ok"])
        levels = sum(1 for k in z.files if k.startswith("last_pyr."))
        if levels:
            slam.last_pyr = tuple(
                jnp.asarray(z[f"last_pyr.{i}"]) for i in range(levels)
            )
        if "traj_ids" in z.files:
            slam.trajectory = [
                (int(i), p) for i, p in zip(z["traj_ids"], z["traj_poses"])
            ]
        n_first = sum(1 for k in z.files if k.startswith("first_pyr."))
        if n_first:
            from ..ops.fast import Corners

            pyr1 = tuple(
                jnp.asarray(z[f"first_pyr.{i}"]) for i in range(n_first)
            )
            corners1 = Corners(**{
                f: jnp.asarray(z[f"first_corners.{f}"])
                for f in Corners._fields
            })
            slam._first_fs = (pyr1, corners1)
        elif slam.state == TrackingState.SECOND_FRAME:
            # saved mid-bootstrap without the first frame: restart cleanly
            slam.state = TrackingState.FIRST_FRAME
    return slam


def save_trajectory_tum(slam, path: str, timestamps=None) -> None:
    """Write the session trajectory in TUM format via
    :func:`~sdvl_tpu.io.dataset.save_tum_trajectory`."""
    from .dataset import save_tum_trajectory

    ids = [i for i, _ in slam.trajectory]
    poses = np.stack([p for _, p in slam.trajectory])
    stamps = [timestamps[i] if timestamps is not None else float(i)
              for i in ids]
    save_tum_trajectory(path, stamps, poses)


# ------------------------------------------------------------------ stream
def _tree_to_arrays(prefix: str, tree) -> dict:
    """Flatten a NamedTuple-of-(arrays|tuples) into npz-safe keyed arrays."""
    out = {}
    for name, val in tree._asdict().items():
        if isinstance(val, tuple):
            for i, leaf in enumerate(val):
                out[f"{prefix}.{name}.{i}"] = np.asarray(leaf)
        else:
            out[f"{prefix}.{name}"] = np.asarray(val)
    return out


def _tree_from_arrays(prefix: str, cls, z):
    kw = {}
    for name in cls._fields:
        flat_key = f"{prefix}.{name}"
        if flat_key in z.files:
            kw[name] = jnp.asarray(z[flat_key])
        elif name in _COUNTER_DEFAULTS:
            kw[name] = jnp.asarray(0, jnp.int32)
        else:
            n = sum(1 for k in z.files if k.startswith(flat_key + "."))
            kw[name] = tuple(
                jnp.asarray(z[f"{flat_key}.{i}"]) for i in range(n)
            )
    return cls(**kw)


def save_stream_snapshot(stream, path: str) -> None:
    """Checkpoint an :class:`~sdvl_tpu.pipeline.stream.SdvlStream` session.

    The stream's entire state is two pytrees (MapState + SlamCarry), so the
    checkpoint is exact and complete. NOTE: this transfers device->host,
    which on the tunnel runtime permanently degrades subsequent launch
    latency (pipeline/device_fsm.py docstring) — checkpoint at sequence
    boundaries / process handoff, not inside the hot loop.
    """
    arrays = _tree_to_arrays("map", stream.m)
    arrays.update(_tree_to_arrays("carry", stream.carry))
    arrays["host_json"] = np.frombuffer(
        json.dumps({"format_version": FORMAT_VERSION,
                    "kind": "stream"}).encode(), dtype=np.uint8
    )
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez_compressed(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_stream_arrays(path: str):
    """Load a stream snapshot's (MapState, SlamCarry) as host trees.

    Session-independent form of :func:`load_stream_snapshot` — used by the
    shared-map multi-stream localizer, which replicates ONE MapState per
    device instead of binding it to a session object.
    """
    from ..pipeline.device_fsm import SlamCarry

    with np.load(path) as z:
        host = json.loads(bytes(z["host_json"]).decode())
        if host.get("format_version") != FORMAT_VERSION:
            raise ValueError(f"snapshot format {host.get('format_version')}")
        return (_tree_from_arrays("map", MapState, z),
                _tree_from_arrays("carry", SlamCarry, z))


def load_stream_snapshot(stream, path: str):
    """Restore a stream session; capacities must match the config."""
    m, carry = load_stream_arrays(path)
    if m.capacities != stream.m.capacities:
        raise ValueError(
            f"snapshot capacities {m.capacities} != config "
            f"{stream.m.capacities}"
        )
    stream.m = m
    stream.carry = carry
    return stream
