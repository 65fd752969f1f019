"""Multi-stream SPMD serving (dist.multi_stream) on the CPU test mesh."""

import numpy as np
import pytest

from sdvl_tpu.dist.mesh import make_mesh
from sdvl_tpu.dist.multi_stream import MultiStream
from sdvl_tpu.io.synthetic import PlaneScene
from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig
from sdvl_tpu.pipeline.stream import SdvlStream


def _cfg_scene():
    scene = PlaneScene(fx=120.0, fy=120.0, cx=79.5, cy=63.5,
                       width=160, height=128, plane_z=4.0)
    cfg = Config(
        camera=CameraConfig(width=160, height=128, fx=120.0, fy=120.0,
                            u0=79.5, v0=63.5, dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(cell_size=16, min_avg_shift=3.0, max_keyframes=6,
                        min_keyframe_its=5, min_init_corners=15,
                        min_matches=8, max_points=256, max_candidates=64,
                        map_scale=4.0),
    )
    return cfg, scene


@pytest.fixture(scope="module")
def multi_run():
    cfg, scene = _cfg_scene()
    mesh = make_mesh(2, axis="stream")
    ms = MultiStream(cfg, mesh, n_streams=2, seed=0)
    n = 18
    seqs = [
        [scene.render(p)
         for p in scene.trajectory(n, translation_amp=1.0 + 0.3 * i)]
        for i in range(2)
    ]
    for t in range(n):
        ms.feed(np.stack([seqs[0][t], seqs[1][t]]))
    return cfg, seqs, ms.result()


def test_streams_progress_independently(multi_run):
    _, _, results = multi_run
    # both must bootstrap on this scene; their tracks differ
    for r in results:
        assert r.state_name() == "RUNNING", r.states
    assert not np.allclose(results[0].trajectory, results[1].trajectory)


def test_stream_zero_matches_single_session(multi_run):
    """Sharded lane 0 == a standalone SdvlStream run of the same frames."""
    cfg, seqs, results = multi_run
    st = SdvlStream(cfg, seed=0)
    for f in seqs[0]:
        st.feed(f)
    solo = st.result()
    np.testing.assert_array_equal(results[0].states, solo.states)
    np.testing.assert_allclose(results[0].trajectory, solo.trajectory,
                               atol=1e-4)


def test_feed_chunk_matches_per_frame(multi_run):
    """feed_chunk (lax.scan inside the shard) == per-frame feeds: same
    states and trajectories, mixed per-frame and chunked feeding allowed."""
    cfg, seqs, results = multi_run
    mesh = make_mesh(2, axis="stream")
    ms = MultiStream(cfg, mesh, n_streams=2, seed=0)
    n = len(seqs[0])
    batches = [np.stack([seqs[0][t], seqs[1][t]]) for t in range(n)]
    # 6 per-frame feeds, then two 6-frame chunks
    for t in range(6):
        ms.feed(batches[t])
    ms.feed_chunk(np.stack(batches[6:12]))
    ms.feed_chunk(np.stack(batches[12:18]))
    chunked = ms.result()
    for rc, rf in zip(chunked, results):
        np.testing.assert_array_equal(rc.states, rf.states)
        np.testing.assert_allclose(rc.trajectory, rf.trajectory, atol=1e-4)
