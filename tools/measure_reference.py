"""Measure the reference SDVL's tracking throughput on this host.

Renders the SAME synthetic sequence bench.py times the TPU pipeline on,
writes it in the reference's image-list format (video_source.cc:46-79, one
filename per line, path-prefixed), runs the binary built by
tools/build_reference.sh, and parses its per-frame "[INFO] Tracking time is
X ms" prints (main.cc:146). The mean feeds bench.py's vs_baseline
denominator (BASELINE.md "Measured baseline").

Usage:  python tools/measure_reference.py [--orb] [/tmp/sdvlref/SDVL]

``--orb`` switches to the PRESET shape every dataset config ships
(use_orb: 1, num_features: 1000, max_matches: 200 — config/config_*.cfg):
per-match ORB descriptor + Hamming gating is real per-frame cost the
default-shape number excludes. This feeds bench.py's preset-mode
vs_baseline denominator.
"""

import argparse
import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CFG = """%YAML:1.0
Camera.width: 640
Camera.height: 480
Camera.fx: 517.3
Camera.fy: 516.5
Camera.u0: 318.6
Camera.v0: 255.3
Camera.d1: 0.0
Camera.d2: 0.0
Camera.d3: 0.0
Camera.d4: 0.0
Camera.d5: 0.0
Video.type: 1
Video.path: "{path}/"
Video.filename: "files.txt"
SDVL.min_avg_shift: 10
SDVL.min_init_corners: 40
SDVL.map_scale: 4.0
{extra}"""

PRESET_EXTRA = """SDVL.use_orb: 1
SDVL.num_features: 1000
SDVL.max_matches: 200
SDVL.max_keyframes: 100
"""


def main():
    import cv2

    from sdvl_tpu.io.synthetic import PlaneScene

    ap = argparse.ArgumentParser()
    ap.add_argument("binary", nargs="?", default="/tmp/sdvlref/SDVL")
    ap.add_argument("--orb", action="store_true",
                    help="preset shape: use_orb=1, num_features=1000, "
                         "max_matches=200, max_keyframes=100")
    args = ap.parse_args()
    binary = args.binary
    if not os.path.exists(binary):
        sys.exit(f"reference binary not found: {binary} "
                 "(run tools/build_reference.sh first)")

    root = "/tmp/refrun"
    images = os.path.join(root, "images")
    os.makedirs(os.path.join(root, "bin"), exist_ok=True)
    os.makedirs(images, exist_ok=True)

    scene = PlaneScene(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                       width=640, height=480, plane_z=4.0)
    n = 150
    names = []
    for i, p in enumerate(scene.trajectory(n, translation_amp=1.0)):
        name = f"f{i:04d}.png"
        img = np.round(np.clip(scene.render(p), 0, 255)).astype(np.uint8)
        cv2.imwrite(os.path.join(images, name), img)
        names.append(name)
    with open(os.path.join(images, "files.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    with open(os.path.join(root, "config.cfg"), "w") as f:
        f.write(CFG.format(path=images,
                           extra=PRESET_EXTRA if args.orb else ""))

    # main.cc:104 reads ../config.cfg relative to the cwd
    out = subprocess.run(
        [binary], cwd=os.path.join(root, "bin"),
        capture_output=True, text=True, timeout=600,
    ).stdout

    t = np.asarray([
        float(m.group(1))
        for m in re.finditer(r"Tracking time is ([\d.]+)ms", out)
    ])
    mt = [float(m.group(1))
          for m in re.finditer(r"Map time is ([\d.]+)ms", out)]
    ba = [float(m.group(1))
          for m in re.finditer(r"Bundle Adjustment time is ([\d.]+)ms", out)]
    assert len(t) >= n - 5, f"reference only timed {len(t)} frames"
    steady = t[10:]
    print(f"frames: {len(t)}")
    print(f"tracking ms/frame: mean {steady.mean():.3f} "
          f"median {np.median(steady):.3f} p95 {np.percentile(steady, 95):.3f}")
    print(f"tracking-only fps: {1000.0 / steady.mean():.1f}")
    if mt:
        print(f"map update ms: mean {np.mean(mt):.2f} (n={len(mt)})")
    if ba:
        print(f"local BA ms: mean {np.mean(ba):.2f} (n={len(ba)})")


if __name__ == "__main__":
    main()
