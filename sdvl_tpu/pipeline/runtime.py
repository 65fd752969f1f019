"""Async tracker/mapper runtime — the reference's thread split, functional.

The reference runs mapping on its own thread polling work queues every 2 ms
(reference Map::Run map.cc:65-71), with the tracker enqueueing frames and
keyframes (map.cc:145-163), a backlog-discard policy that always prefers
keyframes (map.cc:89-111), and one big mutex around the shared pointer-graph
map (map.h:134).

Here the world model is an immutable pytree (MapState), which makes the
concurrency trivial and race-free by construction:

  * ALL map writes happen on the mapper thread, which folds enqueued work
    into its authoritative state and *publishes* each new MapState by a
    single (GIL-atomic) attribute store — no mutex, no trash-vector
    deferred deletion (map.cc:207-254), no torn reads: the tracker always
    sees some complete, internally consistent MapState, at most a frame or
    two stale (exactly the reference's semantics, where the mapper lags the
    tracker by its queue depth).
  * The tracker thread only reads the latest published map and enqueues
    (track-result, pyramid, pose) work items.
  * Device-side, tracker and mapper programs interleave on the same chip
    stream; the host threads overlap Python/dispatch overhead, and JAX's
    async dispatch overlaps mapper compute with the tracker's host work —
    the single-chip analog of the reference's core-level parallelism.

Keyframe work (covisibility, seeding, local BA, pruning) and depth-filter
updates run on the mapper thread; bootstrap and relocalization stay on the
tracker (as in the reference, sdvl.cc:61-89).
"""

from __future__ import annotations

import queue
import threading
from typing import Optional


class _Work:
    __slots__ = ("kind", "payload")

    def __init__(self, kind: str, payload: tuple):
        self.kind = kind
        self.payload = payload


class AsyncMapper:
    """Background mapper for an :class:`~sdvl_tpu.pipeline.sdvl.SDVL`.

    Usage::

        slam = SDVL(cfg)
        mapper = AsyncMapper(slam)      # takes ownership of map updates
        ...
        info = slam.handle_frame(img)   # tracker side, returns immediately
        ...
        mapper.stop()                   # drain + join

    While attached, ``slam.handle_frame`` routes mapping work here instead
    of running it inline (sequential mode, reference main.cc:97,148-149).
    """

    def __init__(self, slam, max_queue: int = 2):
        self.slam = slam
        self.q: "queue.Queue[_Work]" = queue.Queue(maxsize=max_queue)
        self._stop = threading.Event()
        self.dropped_frames = 0
        self.processed = 0
        self._exc: Optional[BaseException] = None
        slam._async_mapper = self
        self.thread = threading.Thread(target=self._run, daemon=True,
                                       name="sdvl-mapper")
        self.thread.start()

    # ------------------------------------------------------------- tracker side
    def submit_frame(self, tr, pyr, pose, stats_enabled=True) -> None:
        """Enqueue a tracked frame for depth-filter updates. If the mapper
        is behind, the frame is dropped (reference map.cc:99-106 discards
        frame backlog — depth filters just get fewer measurements).
        ``stats_enabled`` False = the frame was a relocalization recovery;
        its match failures must not decay point stats
        (feature_align.cc:128,141)."""
        self._check()
        try:
            self.q.put_nowait(_Work("frame", (tr, pyr, pose, stats_enabled)))
        except queue.Full:
            self.dropped_frames += 1

    def submit_keyframe(self, tr, pyr, pose, frame_id, corners,
                        stats_enabled=True) -> None:
        """Enqueue keyframe insertion (+BA +prune). Blocks if full —
        keyframes are never dropped (reference map.cc:92-97 prefers
        keyframes over any frame backlog)."""
        self._check()
        self.q.put(_Work("keyframe",
                         (tr, pyr, pose, frame_id, corners, stats_enabled)))

    def barrier(self, timeout: float = 60.0) -> None:
        """Wait until all enqueued work is folded in (for eval/shutdown)."""
        ev = threading.Event()
        self.q.put(_Work("barrier", (ev,)))
        ev.wait(timeout)
        self._check()

    def stop(self) -> None:
        self.barrier()
        self._stop.set()
        self.q.put(_Work("stop", ()))
        self.thread.join(timeout=60.0)
        self.slam._async_mapper = None
        self._check()

    def _check(self):
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc

    # -------------------------------------------------------------- mapper side
    def _run(self):
        import jax

        slam = self.slam
        while not self._stop.is_set():
            work = self.q.get()
            try:
                if work.kind == "stop":
                    return
                if work.kind == "barrier":
                    work.payload[0].set()
                    continue
                if work.kind == "frame":
                    tr, pyr, pose, stats_on = work.payload
                    m = slam._update_stats(slam.m, tr, stats_on)
                    m = slam._update_map(m, pyr, pose)
                elif work.kind == "keyframe":
                    tr, pyr, pose, frame_id, corners, stats_on = work.payload
                    m = slam._update_stats(slam.m, tr, stats_on)
                    m, slot = slam._add_keyframe(
                        m, pyr, pose, frame_id,
                        tr.match_pt_idx, tr.match_px, tr.match_ok,
                        tr.match_level,
                        corners.xy, corners.level, corners.valid,
                    )
                    m = slam._local_ba(m, slot)
                    m = slam._prune(m)
                    m = slam._update_map(m, pyr, pose)
                else:  # pragma: no cover
                    continue
                # publish: single attribute store of an immutable pytree
                slam.m = m
                self.processed += 1
            except BaseException as e:  # surface on the tracker thread
                self._exc = e
            finally:
                self.q.task_done()
