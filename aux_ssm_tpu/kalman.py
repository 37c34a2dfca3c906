"""Reference-compatible namespace: `from aux_ssm_tpu.kalman import get_kernel`
mirrors `from aux_samplers.kalman import get_kernel` (reference
`kalman/__init__.py:1`)."""

from .kernels.kalman import get_kernel, KalmanSampler
from .ops.lgssm import LGSSM

__all__ = ["get_kernel", "KalmanSampler", "LGSSM"]
