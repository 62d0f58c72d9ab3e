"""Periodic kernel wrapper (gpflow.kernels.Periodic semantics).

k(x,x') = base.K_r(Σ_d |sin(π(x_d-x'_d)/p)| / ℓ_d)        for K_r bases
k(x,x') = base.K_r2(Σ_d sin²(π(x_d-x'_d)/p) / ℓ_d²)       for K_r2 bases

so Periodic(SquaredExponential) = σ² exp(-0.5 Σ sin²(π d/p)/ℓ²), matching the
reference's `Periodic(SquaredExponential())` menu entries (GPR/main.py:110-111).
The base kernel's variance and lengthscales remain the trainable amplitude and
smoothness; the wrapper adds the period parameter.
"""

from __future__ import annotations

import jax.numpy as jnp

from portfoliooptgp_tpu.kernels.base import ActiveDims, Kernel, normalize_active_dims, pytree_dataclass
from portfoliooptgp_tpu.kernels.stationary import Stationary
from portfoliooptgp_tpu.params import as_param, positive, positive_inv


@pytree_dataclass(meta=("active_dims",))
class Periodic(Kernel):
    base: Stationary
    raw_period: jnp.ndarray
    active_dims: ActiveDims = None

    @classmethod
    def create(cls, base: Stationary, period=1.0, active_dims=None):
        return cls(
            base=base,
            raw_period=positive_inv(as_param(period)),
            active_dims=normalize_active_dims(active_dims),
        )

    @property
    def period(self):
        return positive(self.raw_period)

    def _K(self, X, X2):
        diff = X[:, None, :] - X2[None, :, :]
        sine = jnp.sin(jnp.pi * diff / self.period) / self.base.lengthscales
        if hasattr(self.base, "K_r2"):
            return self.base.K_r2(jnp.sum(sine * sine, axis=-1))
        return self.base.K_r(jnp.sum(jnp.abs(sine), axis=-1))

    def _Kdiag(self, X):
        return jnp.full((X.shape[0],), 1.0, dtype=X.dtype) * self.base.variance
