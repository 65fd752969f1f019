"""Multi-stream SPMD serving: N camera streams, one SLAM session each,
data-parallel over the device mesh.

The reference is strictly one camera / one process (SURVEY.md §2.3); the
TPU-native scaling story for *serving* is running many independent tracking
sessions at once — fleet localization, multi-robot, or batch dataset
evaluation. Each stream's whole state (MapState + SlamCarry) lives sharded
on its own device along the mesh's ``stream`` axis and every frame batch is
ONE ``shard_map``-ped launch.

Why ``shard_map`` and not ``vmap``: the per-stream FSM is a ``lax.switch``
on a per-stream state integer. Under ``vmap`` a batched predicate makes XLA
execute EVERY branch for every stream each frame (select semantics);
under ``shard_map`` each device holds exactly its own streams' states, the
switch index stays scalar within the shard, and only the taken branch runs —
bootstrap costs nothing once a stream is RUNNING. Streams never communicate:
no collectives on this axis, scaling is embarrassingly linear over ICI-
connected chips (the distributed-BA ``point`` axis composes orthogonally,
dist/ba_sharded.py).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline.config import Config
from ..pipeline.device_fsm import (FrameInfo, STATE_LOST, SlamCarry,
                                   init_carry, init_state, make_step)
from ..pipeline.stream import SlamResult, _rebase_trajectory


def _stack_states(states):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


class MultiStream:
    """N independent SLAM sessions, one fused launch per frame batch.

    ``n_streams`` must be a multiple of the mesh's ``stream``-axis size;
    each device processes ``n_streams / mesh_size`` sessions sequentially
    inside the shard (a host-unrolled loop over the local batch dim).
    """

    def __init__(self, config: Config, mesh: Mesh, n_streams: int,
                 seed: int = 0, axis: str = "stream",
                 frozen_map: str | tuple | None = None):
        """``frozen_map`` switches to shared-map localization serving: a
        stream snapshot path (or a preloaded ``(MapState, SlamCarry)``
        tuple) whose map is replicated ONCE per device and shared
        read-only by every local stream — per-stream state shrinks to the
        SlamCarry. At Zurich capacity the map is ~0.46 GB, so 4 query
        streams/chip cost 0.46 GB instead of 1.85 GB of replicas. Implies
        ``localize_only`` (the step never writes the map; sessions start
        LOST and relocalize)."""
        if n_streams % mesh.shape[axis] != 0:
            raise ValueError(
                f"n_streams={n_streams} not divisible by mesh axis "
                f"{axis}={mesh.shape[axis]}"
            )
        self.frozen = frozen_map is not None
        if self.frozen and not config.sdvl.localize_only:
            import dataclasses

            config = dataclasses.replace(
                config,
                sdvl=dataclasses.replace(config.sdvl, localize_only=True),
            )
        self.cfg = config
        self.mesh = mesh
        self.axis = axis
        self.n = n_streams
        s = config.sdvl
        H, W = config.camera.height, config.camera.width
        div = 1 << (s.pyramid_levels - 1)
        self.crop_h, self.crop_w = (H // div) * div, (W // div) * div

        shard = NamedSharding(mesh, P(axis))
        if self.frozen:
            from ..io.snapshot import load_stream_arrays

            # ALIASING CONTRACT (round-4 advisor): a live (MapState,
            # SlamCarry) tuple is adopted BY REFERENCE — no copy, no host
            # round trip. The source session must be quiescent (or have
            # fed its last chunk with donation disabled): if it keeps
            # stepping with donated buffers, XLA may invalidate the very
            # buffers this server is reading. Pass a snapshot PATH for a
            # fully decoupled (freshly loaded) map instead.
            m0, c_snap = (frozen_map if isinstance(frozen_map, tuple)
                          else load_stream_arrays(frozen_map))
            # carry-only init: N carries + ONE map; going through
            # init_state here would transiently allocate a full keyframe
            # store per stream (round-3 advisor: ~7.4 GB at 16 streams of
            # Zurich capacity) just to extract the carries
            cfg_caps = (s.max_keyframes, s.max_points, s.max_candidates)
            if m0.capacities != cfg_caps:
                raise ValueError(
                    f"snapshot capacities {m0.capacities} != config "
                    f"{cfg_caps}"
                )
            # NB: jnp.asarray, never np.asarray — when the snapshot is a
            # live device tuple, a host round trip here would poison the
            # whole process into ~25 ms/launch sync mode before serving
            # even starts (observed as a 70-fps density report)
            snap_pose = jnp.asarray(c_snap.pose)
            carries = [
                init_carry(config, seed=seed + i)._replace(
                    state=jnp.asarray(STATE_LOST, jnp.int32),
                    lost_frames=jnp.asarray(3, jnp.int32),
                    pose=snap_pose,
                )
                for i in range(n_streams)
            ]
            stacked_c = _stack_states(carries)
            replicated = NamedSharding(mesh, P())
            self.m = jax.device_put(
                m0, jax.tree_util.tree_map(lambda _: replicated, m0)
            )
        else:
            states = [init_state(config, seed=seed + i)
                      for i in range(n_streams)]
            stacked_m = _stack_states([m for m, _ in states])
            stacked_c = _stack_states([c for _, c in states])
            self.m = jax.device_put(
                stacked_m,
                jax.tree_util.tree_map(lambda _: shard, stacked_m),
            )
        self.carry = jax.device_put(
            stacked_c, jax.tree_util.tree_map(lambda _: shard, stacked_c)
        )

        step = make_step(config, undistort=False)

        def frozen_step(m, carry, imgs):
            # m is the SHARED read-only map (no stream dim); localize_only
            # steps never write it, so the returned m is dropped and XLA
            # DCEs any map-output plumbing
            def one(c1, img1):
                _, c1, info = step(m, c1, img1,
                                   jnp.zeros((1, 1, 2), jnp.float32))
                return c1, info

            local = carry.frame_id.shape[0]
            outs = [
                one(jax.tree_util.tree_map(lambda x: x[i], carry), imgs[i])
                for i in range(local)
            ]
            cs, infos = zip(*outs)
            return _stack_states(cs), _stack_states(infos)

        def frozen_chunk(m, carry, imgs):
            def body(c, imgs_t):
                return frozen_step(m, c, imgs_t)

            carry, infos = jax.lax.scan(body, carry, imgs)
            return carry, infos

        def sharded_step(m, carry, imgs):
            # local shapes: leading dim = n_streams / mesh_size
            def one(m1, c1, img1):
                return step(m1, c1, img1, jnp.zeros((1, 1, 2), jnp.float32))

            local = m.kf_valid.shape[0]
            outs = [
                one(
                    jax.tree_util.tree_map(lambda x: x[i], m),
                    jax.tree_util.tree_map(lambda x: x[i], carry),
                    imgs[i],
                )
                for i in range(local)
            ]
            ms, cs, infos = zip(*outs)
            return (_stack_states(ms), _stack_states(cs),
                    _stack_states(infos))

        def sharded_chunk(m, carry, imgs):
            # imgs local (T, local, H, W): lax.scan over time inside the
            # shard — one launch per T-frame batch across all local streams
            def body(mc, imgs_t):
                m, c = mc
                m, c, info = sharded_step(m, c, imgs_t)
                return (m, c), info

            (m, carry), infos = jax.lax.scan(body, (m, carry), imgs)
            return m, carry, infos

        specs_m = jax.tree_util.tree_map(
            lambda _: P() if self.frozen else P(axis), self.m
        )
        specs_c = jax.tree_util.tree_map(lambda _: P(axis), self.carry)
        out_info_spec = jax.tree_util.tree_map(
            lambda _: P(axis),
            FrameInfo(*([0] * len(FrameInfo._fields))),
        )
        out_chunk_spec = jax.tree_util.tree_map(
            lambda _: P(None, axis),
            FrameInfo(*([0] * len(FrameInfo._fields))),
        )
        if self.frozen:
            # map replicated (P()), never donated, never returned
            self._step = jax.jit(
                jax.shard_map(
                    frozen_step, mesh=mesh,
                    in_specs=(specs_m, specs_c, P(axis)),
                    out_specs=(specs_c, out_info_spec),
                    check_vma=False,
                ),
                donate_argnums=(1,),
            )
            self._chunk_step = jax.jit(
                jax.shard_map(
                    frozen_chunk, mesh=mesh,
                    in_specs=(specs_m, specs_c, P(None, axis)),
                    out_specs=(specs_c, out_chunk_spec),
                    check_vma=False,
                ),
                donate_argnums=(1,),
            )
        else:
            self._step = jax.jit(
                jax.shard_map(
                    sharded_step, mesh=mesh,
                    in_specs=(specs_m, specs_c, P(axis)),
                    out_specs=(specs_m, specs_c, out_info_spec),
                    check_vma=False,
                ),
                donate_argnums=(0, 1),
            )
            self._chunk_step = jax.jit(
                jax.shard_map(
                    sharded_chunk, mesh=mesh,
                    in_specs=(specs_m, specs_c, P(None, axis)),
                    out_specs=(specs_m, specs_c, out_chunk_spec),
                    check_vma=False,
                ),
                donate_argnums=(0, 1),
            )
        # entries: (is_chunk, FrameInfo with leaves (N, ...) or (T, N, ...))
        self._infos: List[tuple] = []

    def feed(self, imgs: np.ndarray, block: bool = False) -> FrameInfo:
        """Process one frame per stream: ``imgs`` is (N, H, W)."""
        imgs = np.asarray(imgs)[:, : self.crop_h, : self.crop_w]
        if self.frozen:
            self.carry, info = self._step(self.m, self.carry, imgs)
        else:
            self.m, self.carry, info = self._step(self.m, self.carry, imgs)
        self._infos.append((False, info))
        if block:
            jax.block_until_ready(info.pose)
        return info

    def feed_chunk(self, imgs: np.ndarray, block: bool = False) -> FrameInfo:
        """Process T frames per stream in ONE launch: ``imgs`` is
        (T, N, H, W). The scan runs inside the shard, so dispatch cost
        amortizes over T like SdvlStream.feed_chunk does for one stream."""
        imgs = np.asarray(imgs)[:, :, : self.crop_h, : self.crop_w]
        if self.frozen:
            self.carry, infos = self._chunk_step(self.m, self.carry, imgs)
        else:
            self.m, self.carry, infos = self._chunk_step(
                self.m, self.carry, imgs
            )
        self._infos.append((True, infos))
        if block:
            jax.block_until_ready(infos.pose)
        return infos

    def block(self):
        jax.block_until_ready(self.carry.pose)

    def result(self, stream: int | None = None):
        """Pull all frames' infos (ONE transfer). Returns a list of
        per-stream SlamResult, or a single one if ``stream`` given."""
        host = jax.device_get([info for _, info in self._infos])
        parts = [
            info if is_chunk else jax.tree_util.tree_map(
                lambda x: np.asarray(x)[None], info
            )
            for (is_chunk, _), info in zip(self._infos, host)
        ]  # every part (t, N, ...)
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs], axis=0),
            *parts,
        )  # (T, N, ...)
        results = []
        for i in range(self.n):
            fi = jax.tree_util.tree_map(lambda x: x[:, i], stacked)
            results.append(SlamResult(fi))
        if stream is not None:
            return results[stream]
        return results
