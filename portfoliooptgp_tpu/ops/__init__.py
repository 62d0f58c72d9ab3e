"""Numerical ops: dense linalg, Pallas kernels, entropy diagnostics."""

from portfoliooptgp_tpu.ops import linalg as linalg
