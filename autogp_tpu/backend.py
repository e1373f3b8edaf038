"""Backend selection for the hot covariance/linalg paths.

The Pallas kernels (tape-driven assembly fwd/bwd, batched blocked
Cholesky) are used automatically on TPU float32 — both forward and
gradient paths, via custom-VJP boundaries. The XLA stack-machine
evaluator + plain autodiff is used on CPU and under float64.
Set AUTOGP_NO_PALLAS=1 to force the XLA path everywhere.
"""

from __future__ import annotations

import os

import jax

_FORCED = None


def set_use_pallas(value):
    """Force (True/False) or restore auto-detection (None)."""
    global _FORCED
    _FORCED = value


def use_pallas() -> bool:
    if _FORCED is not None:
        return _FORCED
    if os.environ.get("AUTOGP_NO_PALLAS") == "1":
        return False
    if jax.config.jax_enable_x64:
        return False
    return jax.default_backend() == "tpu"
