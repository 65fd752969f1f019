"""Pallas TPU kernels for the hot dense ops.

Kernels are drop-in replacements for the XLA implementations in
``sdvl_tpu.ops`` and are validated against them in tests (interpret mode on
CPU, compiled on TPU). Enable via the ``use_pallas`` switches.
"""

from .detect import fast_shi_tomasi_map  # noqa: F401
