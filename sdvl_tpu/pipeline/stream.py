"""Host driver for the device-resident FSM: feed frames, read results once.

This is the TPU-facing replacement for the per-frame host loop in
pipeline.sdvl.SDVL (which mirrors reference main.cc:126-159 and pulls
tracking scalars every frame). On this runtime the first device->host pull
permanently switches launches to ~25 ms synchronous mode (see
pipeline.device_fsm docstring), so the stream driver:

  * uploads each frame (uint8 — ~0.2 ms on the tunnel),
  * dispatches ONE fused launch per frame (or one per chunk via lax.scan),
  * accumulates per-frame ``FrameInfo`` as *device references*,
  * transfers everything device->host exactly once, in :meth:`result`.

``block=True`` in :meth:`feed` synchronizes (``block_until_ready`` does not
poison the runtime — only value transfers do) for real-time pacing/latency
measurement; the default is pure async dispatch for maximum throughput.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import camera as cam
from ..core import se3
from .config import Config, intrinsics
from .device_fsm import (FrameInfo, STATE_FIRST, STATE_LOST, STATE_RUNNING,
                         STATE_SECOND, init_state, make_chunk_step, make_step)

STATE_NAMES = {0: "FIRST_FRAME", 1: "SECOND_FRAME", 2: "RUNNING", 3: "LOST"}


class SlamResult:
    """Finalized (host-side) outputs of a streamed sequence."""

    def __init__(self, infos: FrameInfo):
        # infos: stacked FrameInfo with leading dim N (numpy)
        self.poses_raw = infos.pose              # (N, 7) as recorded
        self.states = infos.state                # (N,)
        self.quality = infos.quality
        self.n_matches = infos.n_matches
        self.n_attempts = infos.n_attempts
        self.is_keyframe = infos.is_keyframe
        self.n_corners = infos.n_corners
        self.median_shift = infos.median_shift
        self.trajectory = _rebase_trajectory(infos.pose, infos.world_tf)

    @property
    def n_frames(self) -> int:
        return int(self.poses_raw.shape[0])

    def state_name(self, i: int = -1) -> str:
        return STATE_NAMES[int(self.states[i])]


def _rebase_trajectory(poses: np.ndarray, world_tfs: np.ndarray) -> np.ndarray:
    """Express every recorded pose in the FINAL world frame.

    A frame whose ``world_tf`` is not identity re-based the world (ground
    plane alignment at bootstrap, reference map.cc:704-837); poses recorded
    *before* it must be composed with the inverse, mirroring what
    pipeline.sdvl does to its trajectory list at bootstrap time. Walked
    backwards with a cumulative correction.
    """
    n = poses.shape[0]
    out = np.array(poses, copy=True)
    ident = np.asarray(se3.identity())
    C = ident.copy()
    have_c = False
    for i in range(n - 1, -1, -1):
        if have_c:
            out[i] = np.asarray(se3.compose(jnp.asarray(poses[i]),
                                            jnp.asarray(C)))
        tf = world_tfs[i]
        if not np.allclose(tf, ident, atol=1e-12):
            inv = np.asarray(se3.inverse(jnp.asarray(tf)))
            C = np.asarray(se3.compose(jnp.asarray(inv), jnp.asarray(C)))
            have_c = True
    return out


class SdvlStream:
    """Streaming SLAM session over the single-program device FSM."""

    def __init__(self, config: Config, seed: int = 0, donate: bool = True):
        self.cfg = config
        s = config.sdvl
        H, W = config.camera.height, config.camera.width
        div = 1 << (s.pyramid_levels - 1)
        self.crop_h, self.crop_w = (H // div) * div, (W // div) * div

        self.m, self.carry = init_state(config, seed)
        self._undistort = any(abs(d) > 1e-12 for d in config.camera.dist)
        if self._undistort:
            grid = cam.undistort_map(intrinsics(config))
            self._grid = jax.device_put(
                np.asarray(grid)[: self.crop_h, : self.crop_w]
            )
        else:
            self._grid = jax.device_put(np.zeros((1, 1, 2), np.float32))

        donate_args = (0, 1) if donate else ()
        self._step = jax.jit(make_step(config, self._undistort),
                             donate_argnums=donate_args)
        self._chunk_fn = None
        self._donate = donate_args
        self._infos: List[FrameInfo] = []

    # --------------------------------------------------------- serving
    @classmethod
    def localizer(cls, config: Config, snapshot_path: str,
                  seed: int = 0, donate: bool = True) -> "SdvlStream":
        """Localization-only serving session against a frozen, prebuilt map.

        Loads a stream snapshot (io.snapshot.save_stream_snapshot) produced
        by a SLAM session with the same capacities, freezes its map
        (``localize_only`` compiles the mapping stage out of the step
        entirely), and starts in LOST so the first frame relocalizes
        against the loaded keyframes. Capability the reference lacks: it
        has no map persistence, so every run must re-map (SURVEY.md §5
        "Checkpoint / resume: none").
        """
        import dataclasses

        from ..io.snapshot import load_stream_snapshot

        if not config.sdvl.localize_only:
            config = dataclasses.replace(
                config,
                sdvl=dataclasses.replace(config.sdvl, localize_only=True),
            )
        stream = cls(config, seed=seed, donate=donate)
        load_stream_snapshot(stream, snapshot_path)
        stream.carry = stream.carry._replace(
            state=jnp.asarray(STATE_LOST, jnp.int32),
            lost_frames=jnp.asarray(3, jnp.int32),
            xi_model=jnp.zeros(6, jnp.float32),
        )
        stream._infos = []
        return stream

    # ------------------------------------------------------------- feeding
    def _prep(self, img: np.ndarray) -> np.ndarray:
        img = np.asarray(img)[: self.crop_h, : self.crop_w]
        return img

    def feed(self, img: np.ndarray, block: bool = False) -> FrameInfo:
        """Process one frame. Returns device-ref FrameInfo (do NOT convert
        to host values mid-run on TPU — that is the poison this class
        exists to avoid)."""
        self.m, self.carry, info = self._step(
            self.m, self.carry, self._prep(img), self._grid
        )
        self._infos.append((False, info))
        if block:
            jax.block_until_ready(info.pose)
        return info

    def feed_chunk(self, imgs: np.ndarray, block: bool = False) -> FrameInfo:
        """Process a (T, H, W) stack of frames in ONE launch (lax.scan)."""
        if self._chunk_fn is None:
            self._chunk_fn = jax.jit(
                make_chunk_step(self.cfg, self._undistort),
                donate_argnums=self._donate,
            )
        imgs = np.asarray(imgs)[:, : self.crop_h, : self.crop_w]
        self.m, self.carry, infos = self._chunk_fn(
            self.m, self.carry, imgs, self._grid
        )
        self._infos.append((True, infos))
        if block:
            jax.block_until_ready(infos.pose)
        return infos

    def block(self):
        """Wait for all dispatched work (no host transfer — safe)."""
        jax.block_until_ready(self.carry.pose)

    # ------------------------------------------------------------- results
    def result(self) -> SlamResult:
        """ONE device->host transfer of every recorded frame's info.

        On this runtime the first value transfer degrades later launch
        latency AND each individual transfer costs ~1 s of synchronous
        tunnel round trip — pulling the raw per-chunk FrameInfo pytrees
        (frames x 9 fields) measured ~190 s for a 256-frame run. So the
        fields are first packed ON DEVICE into a single (N, 21) f32 matrix
        (pose 7 + world_tf 7 + 7 scalar columns; every int fits f32
        exactly) and exactly one buffer crosses the tunnel.
        """
        if not self._infos:
            raise ValueError("no frames fed")

        chunked_flags = [c for c, _ in self._infos]

        def pack(info_list):
            rows = []
            for chunked, info in zip(chunked_flags, info_list):
                if not chunked:
                    info = jax.tree_util.tree_map(
                        lambda x: jnp.asarray(x)[None], info
                    )
                scal = jnp.stack([
                    info.state.astype(jnp.float32),
                    info.quality.astype(jnp.float32),
                    info.n_matches.astype(jnp.float32),
                    info.n_attempts.astype(jnp.float32),
                    info.is_keyframe.astype(jnp.float32),
                    info.n_corners.astype(jnp.float32),
                    info.median_shift.astype(jnp.float32),
                ], axis=-1)
                rows.append(jnp.concatenate(
                    [info.pose, info.world_tf, scal], axis=-1
                ))
            return jnp.concatenate(rows, axis=0)

        packed = np.asarray(jax.jit(pack)([i for _, i in self._infos]))
        stacked = FrameInfo(
            pose=packed[:, 0:7],
            world_tf=packed[:, 7:14],
            state=packed[:, 14].astype(np.int32),
            quality=packed[:, 15].astype(np.int32),
            n_matches=packed[:, 16].astype(np.int32),
            n_attempts=packed[:, 17].astype(np.int32),
            is_keyframe=packed[:, 18] > 0.5,
            n_corners=packed[:, 19].astype(np.int32),
            median_shift=packed[:, 20],
        )
        return SlamResult(stacked)
