"""Kidnapped-robot relocalization: teleport to mapped-but-DISTANT territory.

The bounded relocalizer (pipeline/relocalize.py) selects its vmap lanes by
proximity to the pose guess — exactly right when lost mid-track, exactly
wrong after a teleport, where the guess is garbage and the correct keyframe
sits outside the fan-out. Both drivers escalate to an all-keyframe sweep
after ``Config.reloc_escalate_after`` consecutive failed LOST frames,
mirroring the reference's always-global newest-first walk (reference
sdvl.cc:205-238). These tests teleport the camera mid-sequence back to the
start of a long straight run and assert recovery through the escalation
path — and that the bounded pass alone does NOT recover, so the escalation
is load-bearing, not decorative.
"""

import numpy as np
import pytest

from sdvl_tpu.io.synthetic import PlaneScene
from sdvl_tpu.pipeline.config import CameraConfig, Config, SdvlConfig
from sdvl_tpu.pipeline.sdvl import SDVL
from sdvl_tpu.pipeline.stream import SdvlStream

W, H = 160, 120
FX = 120.0


def _cfg(escalate_after: int) -> Config:
    return Config(
        camera=CameraConfig(width=W, height=H, fx=FX, fy=FX,
                            u0=W / 2 - 0.5, v0=H / 2 - 0.5,
                            dist=(0, 0, 0, 0, 0)),
        sdvl=SdvlConfig(cell_size=16, min_avg_shift=3.0, max_keyframes=24,
                        min_keyframe_its=3, min_init_corners=15,
                        # 12: above the spurious-match floor of this random
                        # texture (~9-17 ZMSSD/LK false positives survive a
                        # wrong-by-miles pose), below healthy tracking (30+)
                        min_matches=12, max_points=512, max_candidates=256,
                        map_scale=4.0,
                        # tiny fan-out so the spatial prior CAN miss: the
                        # two lanes nearest a post-teleport guess are both
                        # end-of-run keyframes with zero view overlap
                        reloc_max_keyframes=2,
                        reloc_escalate_after=escalate_after),
    )


def _kidnap_frames():
    """A straight x-travel well past one FOV width, then a teleport home.

    FOV width at z=4 is 2*4*(W/2)/FX = 5.3 world units; the run travels
    7 units, so the final view shares nothing with the first. The teleport
    returns to the frame-4 pose (mapped at bootstrap time) and dwells.
    """
    from sdvl_tpu.io.synthetic import _np_se3_exp, _np_se3_inverse

    scene = PlaneScene(fx=FX, fy=FX, cx=W / 2 - 0.5, cy=H / 2 - 0.5,
                       width=W, height=H, plane_z=4.0, extent=12.0,
                       texture=None)

    def pose_at(x, y=0.0):
        xi = np.array([x, y, 0.0, 0.0, 0.0, 0.0], np.float32)
        return _np_se3_inverse(_np_se3_exp(xi))

    poses = []
    n_out = 72
    for i in range(n_out):
        # 0.1 u/frame = 3 px/frame; slight y wobble for bootstrap parallax
        poses.append(pose_at(0.097 * i, 0.05 * np.sin(i / 5.0)))
    teleport_at = len(poses)
    for i in range(24):
        poses.append(pose_at(0.097 * 4 + 0.03 * np.sin(i / 4.0),
                             0.04 * np.cos(i / 3.0)))
    frames = [np.round(np.clip(scene.render(p), 0, 255)).astype(np.uint8)
              for p in poses]
    return frames, teleport_at


@pytest.fixture(scope="module")
def kidnap_frames():
    return _kidnap_frames()


def test_stream_driver_recovers_via_escalation(kidnap_frames):
    frames, teleport_at = kidnap_frames
    st = SdvlStream(_cfg(escalate_after=2), seed=0)
    for f in frames:
        st.feed(f)
    r = st.result()
    states = np.asarray(r.states)
    assert (states[teleport_at:] == 3).any(), "teleport never tripped LOST"
    assert r.state_name() == "RUNNING", states[teleport_at:]
    # recovery sticks: solid matches at the end
    assert (r.n_matches[-4:] >= 12).all(), r.n_matches[-8:]


def test_stream_driver_stuck_without_escalation(kidnap_frames):
    """Same sequence, escalation disabled: the 2-lane spatial prior keeps
    selecting zero-overlap keyframes and the session must NOT recover —
    proving the passing test above goes through the escalation path."""
    frames, teleport_at = kidnap_frames
    st = SdvlStream(_cfg(escalate_after=-1), seed=0)
    for f in frames:
        st.feed(f)
    r = st.result()
    states = np.asarray(r.states)
    assert (states[teleport_at:] == 3).any(), "teleport never tripped LOST"
    assert r.state_name() == "LOST", states[teleport_at:]


def test_host_driver_recovers_via_escalation(kidnap_frames):
    frames, teleport_at = kidnap_frames
    slam = SDVL(_cfg(escalate_after=2), seed=0)
    infos = [slam.handle_frame(f) for f in frames]
    states = [i["state"] for i in infos]
    assert "LOST" in states[teleport_at:], "teleport never tripped LOST"
    assert slam.state.name == "RUNNING", states[teleport_at:]
