"""I/O: dataset readers (reference L1 VideoSource), synthetic fixtures,
trajectory save/load, ATE/RPE evaluation."""

from . import dataset, evaluate, synthetic  # noqa: F401
