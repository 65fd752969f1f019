"""Dataset-preset parity: our configs/*.cfg mirror the reference presets.

The reference validates itself by running against public datasets through
its 7 preset files (reference config/config_*.cfg; SURVEY.md §4). We ship
the same presets under `configs/`; this test proves (a) `load_cfg` reads
the reference's own OpenCV-YAML format directly, and (b) every shipped
preset resolves to the *identical* Config value as the reference file of
the same name — camera intrinsics, distortion, and every SDVL.* knob —
so accuracy comparisons between the two systems run the same tuning.

Skips the byte-parity half when /root/reference is not present (the
presets still must load standalone).
"""

import dataclasses
import os

import pytest

from sdvl_tpu.pipeline.config import load_cfg

HERE = os.path.dirname(os.path.abspath(__file__))
CONFIGS = os.path.join(HERE, os.pardir, "configs")
REF = "/root/reference/config"

PRESETS = ["euroc", "iclnuim", "tum_f1", "tum_f2", "tum_f3", "tum_mono",
           "zurich"]


@pytest.mark.parametrize("name", PRESETS)
def test_preset_loads_and_is_sane(name):
    cfg = load_cfg(os.path.join(CONFIGS, name + ".cfg"))
    assert cfg.camera.width > 0 and cfg.camera.height > 0
    assert cfg.camera.fx > 100 and cfg.camera.fy > 100
    assert len(cfg.camera.dist) == 5
    # capacities double as static tensor shapes — must be positive ints
    assert cfg.sdvl.max_keyframes >= 100
    assert cfg.sdvl.max_matches >= 150
    assert cfg.sdvl.pyramid_levels == 5
    # every dataset preset enables the ORB gate (reference config/*.cfg)
    assert cfg.sdvl.use_orb is True


# Deliberate preset divergences: TPU-native extension knobs with no
# reference analogue, shipped ON where a measurement justifies them (the
# justification lives as a comment in the preset file + PARITY.md). Every
# knob the reference DOES have must still match exactly.
ALLOWED_DIVERGENCES = {"zurich": {"epipolar_corner_gate"}}


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference checkout not available")
@pytest.mark.parametrize("name", PRESETS)
def test_preset_matches_reference_exactly(name):
    ours = load_cfg(os.path.join(CONFIGS, name + ".cfg"))
    ref = load_cfg(os.path.join(REF, f"config_{name}.cfg"))
    assert ours.camera == ref.camera
    allowed = ALLOWED_DIVERGENCES.get(name, set())
    for f in dataclasses.fields(ours.sdvl):
        if f.name in allowed:
            continue
        assert getattr(ours.sdvl, f.name) == getattr(ref.sdvl, f.name), \
            f"knob {f.name} diverges from the reference preset"
    # the divergence list stays honest: each listed knob really diverges
    for name_ in allowed:
        assert getattr(ours.sdvl, name_) != getattr(ref.sdvl, name_), \
            f"{name_} listed as divergent but matches"


def test_first_token_numeric_repair(tmp_path):
    """Space-separated numeric tokens parse to the FIRST token (mirroring
    the effective cv::FileStorage behavior of keeping a parseable value,
    never digit concatenation: "3 5" must not become 35)."""
    p = tmp_path / "c.cfg"
    p.write_text("SDVL.max_keyframes: 100 0\nSDVL.max_matches: 3 5\n"
                 "Camera.fx: 517.3\n")
    from sdvl_tpu.pipeline.config import _parse_opencv_yaml

    kv = _parse_opencv_yaml(str(p))
    assert kv["SDVL.max_keyframes"] == 100
    assert kv["SDVL.max_matches"] == 3
    assert kv["Camera.fx"] == 517.3


def test_iclnuim_typo_matches_reference_binary_default():
    """config_iclnuim.cfg's "max_keyframes: 100 0" typo: the reference
    binary falls back to its compiled-in default 100 (config.cc:60,134);
    our parser's first-token repair and the shipped preset both land on
    that same effective value."""
    ours = load_cfg(os.path.join(CONFIGS, "iclnuim.cfg"))
    assert ours.sdvl.max_keyframes == 100
    if os.path.isdir(REF):
        ref = load_cfg(os.path.join(REF, "config_iclnuim.cfg"))
        assert ref.sdvl.max_keyframes == 100
