"""Dot-product kernels (gpflow.kernels.Linear / Polynomial semantics).

Linear:     k(x,x') = σ² ⟨x, x'⟩          (menu item GPR/main.py:110)
Polynomial: k(x,x') = (σ² ⟨x, x'⟩ + γ)^d  (used via gpflow Polynomial elsewhere)
"""

from __future__ import annotations

import jax.numpy as jnp

from portfoliooptgp_tpu.kernels.base import ActiveDims, Kernel, normalize_active_dims, pytree_dataclass
from portfoliooptgp_tpu.params import as_param, positive, positive_inv


@pytree_dataclass(meta=("active_dims",))
class Linear(Kernel):
    raw_variance: jnp.ndarray
    active_dims: ActiveDims = None

    @classmethod
    def create(cls, variance=1.0, active_dims=None):
        return cls(
            raw_variance=positive_inv(as_param(variance)),
            active_dims=normalize_active_dims(active_dims),
        )

    @property
    def variance(self):
        return positive(self.raw_variance)

    def _K(self, X, X2):
        return self.variance * (X @ X2.T)

    def _Kdiag(self, X):
        return self.variance * jnp.sum(X * X, axis=-1)


@pytree_dataclass(meta=("active_dims", "degree"))
class Polynomial(Kernel):
    raw_variance: jnp.ndarray
    raw_offset: jnp.ndarray
    degree: float = 3.0
    active_dims: ActiveDims = None

    @classmethod
    def create(cls, degree=3.0, variance=1.0, offset=1.0, active_dims=None):
        return cls(
            raw_variance=positive_inv(as_param(variance)),
            raw_offset=positive_inv(as_param(offset)),
            degree=float(degree),
            active_dims=normalize_active_dims(active_dims),
        )

    @property
    def variance(self):
        return positive(self.raw_variance)

    @property
    def offset(self):
        return positive(self.raw_offset)

    def _K(self, X, X2):
        return (self.variance * (X @ X2.T) + self.offset) ** self.degree

    def _Kdiag(self, X):
        return (self.variance * jnp.sum(X * X, axis=-1) + self.offset) ** self.degree
