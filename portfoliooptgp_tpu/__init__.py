"""portfoliooptgp_tpu — TPU-native Gaussian-process inference for portfolio optimization.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the GPflow/
TensorFlow reference (LUOJIUzxy/PortfolioOptGP): exact GP regression with
composable kernels, multi-restart marginal-likelihood training, multi-timescale
posterior blending, multi-input GPR with covariates, sparse/variational GPs
(SGPR/SVGP/VGP), NUTS over hyperparameters, and a mean-variance portfolio layer
with five allocation strategies and backtesting.

Everything is functional-first: models are pytrees, losses are pure functions,
restarts/kernel menus are vmapped batch axes, and multi-chip scale-out uses
`jax.sharding.Mesh` + collectives rather than process-level loops.
"""

import jax as _jax

# Parity-first precision stance: on TPU the default f32 matmul path feeds the
# MXU bf16 inputs (one pass), which is ~1e-2 relative error — enough to break
# PSD-ness in iterated Cholesky updates (observed: blocked_cholesky NaNs on a
# real v5e at N>=512 while bit-fine on CPU). GP solves and their VJPs need
# full f32 contractions, so the framework defaults every matmul to "highest"
# (6-pass bf16 ~= true f32). Hot kernels that are provably tolerant may
# override locally with an explicit precision= argument.
_jax.config.update("jax_default_matmul_precision", "highest")

from portfoliooptgp_tpu import config as config
from portfoliooptgp_tpu import kernels as kernels
from portfoliooptgp_tpu import models as models
from portfoliooptgp_tpu import ops as ops

__version__ = "0.1.0"


def enable_x64() -> None:
    """Enable float64 (the reference is float64 end-to-end, e.g.
    GPR/data_handler.py:63-64). Call before any JAX computation. On TPU,
    float64 is emulated; prefer the float32 fast path for throughput."""
    import jax

    jax.config.update("jax_enable_x64", True)
