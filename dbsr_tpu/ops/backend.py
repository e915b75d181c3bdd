"""Kernel dispatch policy shared by the Pallas op families.

Every custom-kernel entry point (``cost_volume``, ``warp_auto``,
``merge_auto``, ``conv3x3_s2d_auto``) asks :func:`pallas_enabled` before
taking its Pallas path. Setting ``DBSR_DISABLE_PALLAS=1`` forces the XLA
oracle formulations everywhere — used for (a) A/B measurement of kernel
gains, and (b) analytic FLOP counting via CPU-backend HLO cost analysis
(TPU ``pallas_call``s refuse to lower for CPU, and the axon AOT backend
returns no cost analysis at all — see ``bench.py:_analytic_flops``).
"""

import os

import jax


def pallas_enabled() -> bool:
    """True when custom Pallas kernels should be dispatched: running on a
    TPU backend and not overridden by ``DBSR_DISABLE_PALLAS=1``."""
    return (jax.default_backend() == "tpu"
            and os.environ.get("DBSR_DISABLE_PALLAS") != "1")
