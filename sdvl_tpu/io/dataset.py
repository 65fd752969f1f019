"""Dataset readers: image-list sequences (reference-compatible), TUM RGB-D,
live camera.

TPU-native replacement for the reference's VideoSource (reference
video_source.{h,cc}): its image-sequence mode reads filenames line-by-line
from ``<path>/<filename>`` and loads grayscale frames (video_source.cc:46-79);
its live-V4L mode opens ``cv::VideoCapture`` and converts to grayscale
(video_source.cc:31-45) — :func:`camera_source` here. The reader interface
is a plain iterator either way.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import numpy as np


def _imread_gray(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img


def image_list_source(path: str, filename: str = "files.txt"
                      ) -> Iterator[np.ndarray]:
    """Reference-format source: one image filename per line
    (video_source.cc:46-56,64-79). EOF simply ends the iterator (the
    reference signals it with an empty Mat, main.cc:129-132)."""
    listfile = os.path.join(path, filename)
    with open(listfile) as f:
        for line in f:
            name = line.strip()
            if not name:
                continue
            yield _imread_gray(os.path.join(path, name))


def camera_source(device: int = 0, width: Optional[int] = None,
                  height: Optional[int] = None) -> Iterator[np.ndarray]:
    """Live camera source (reference Video.type=0, video_source.cc:31-45):
    grabs BGR frames from ``cv::VideoCapture`` and yields grayscale. Ends
    when the device stops delivering frames."""
    import cv2

    cap = cv2.VideoCapture(device)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open camera device {device}")
    if width:
        cap.set(cv2.CAP_PROP_FRAME_WIDTH, width)
    if height:
        cap.set(cv2.CAP_PROP_FRAME_HEIGHT, height)
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                return
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    finally:
        cap.release()


def tum_rgb_index(seq_dir: str):
    """(stamps, absolute image paths) from a TUM ``rgb.txt`` — the path
    list feeds the native prefetching loader (io.native_loader)."""
    stamps, paths = [], []
    with open(os.path.join(seq_dir, "rgb.txt")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) < 2:
                continue
            stamps.append(float(parts[0]))
            paths.append(os.path.join(seq_dir, parts[1]))
    return stamps, paths


def tum_rgb_source(seq_dir: str) -> Iterator[Tuple[float, np.ndarray]]:
    """TUM RGB-D format: ``rgb.txt`` with `timestamp filename` rows."""
    stamps, paths = tum_rgb_index(seq_dir)
    for ts, p in zip(stamps, paths):
        yield ts, _imread_gray(p)


def load_tum_groundtruth(seq_dir: str) -> np.ndarray:
    """(N, 8) rows of [t, tx, ty, tz, qx, qy, qz, qw] from groundtruth.txt."""
    rows = []
    with open(os.path.join(seq_dir, "groundtruth.txt")) as f:
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.split()
            if len(parts) >= 8:
                rows.append([float(x) for x in parts[:8]])
    return np.asarray(rows)


def euroc_index(seq_dir: str, cam: str = "cam0"):
    """(stamps_sec, absolute image paths) from an EuRoC ``data.csv``.
    ``seq_dir`` may point at the sequence root or directly at ``mav0``."""
    root = seq_dir
    if os.path.isdir(os.path.join(seq_dir, "mav0")):
        root = os.path.join(seq_dir, "mav0")
    camdir = os.path.join(root, cam)
    stamps, paths = [], []
    with open(os.path.join(camdir, "data.csv")) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            ts_ns, name = line.strip().split(",")[:2]
            stamps.append(float(ts_ns) * 1e-9)
            paths.append(os.path.join(camdir, "data", name))
    return stamps, paths


def euroc_source(seq_dir: str, cam: str = "cam0"
                 ) -> Iterator[Tuple[float, np.ndarray]]:
    """EuRoC MAV format: ``mav0/<cam>/data.csv`` rows of
    `timestamp_ns,filename` with images under ``mav0/<cam>/data/``.
    Yields (seconds, grayscale image)."""
    stamps, paths = euroc_index(seq_dir, cam)
    for ts, p in zip(stamps, paths):
        yield ts, _imread_gray(p)


def load_euroc_groundtruth(seq_dir: str) -> np.ndarray:
    """(N, 8) rows of [t_sec, tx, ty, tz, qx, qy, qz, qw] from the EuRoC
    ``state_groundtruth_estimate0/data.csv`` (stored there as
    t_ns, p_xyz, q_wxyz — reordered here to the TUM layout so one ATE path
    serves both formats)."""
    root = seq_dir
    if os.path.isdir(os.path.join(seq_dir, "mav0")):
        root = os.path.join(seq_dir, "mav0")
    path = os.path.join(root, "state_groundtruth_estimate0", "data.csv")
    rows = []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            v = [float(x) for x in line.strip().split(",")[:8]]
            t, px, py, pz, qw, qx, qy, qz = v
            rows.append([t * 1e-9, px, py, pz, qx, qy, qz, qw])
    return np.asarray(rows)


def save_tum_trajectory(path: str, stamps, poses_wc) -> None:
    """Write a TUM-format trajectory (cam->world, x y z qx qy qz qw) —
    the format every external ATE tool expects. The reference has no
    save path at all (SURVEY.md §5 checkpoint/resume: none)."""
    import jax.numpy as jnp

    from ..core import se3

    poses = np.asarray(poses_wc, np.float32)
    inv = np.asarray(se3.inverse(jnp.asarray(poses)))
    with open(path, "w") as f:
        for ts, p in zip(stamps, inv):
            qw, qx, qy, qz, tx, ty, tz = p
            f.write(f"{ts} {tx} {ty} {tz} {qx} {qy} {qz} {qw}\n")
