"""Isotropic stationary kernels (GPflow-convention formulas).

Scaled distances: r² = Σ_d (x_d - x'_d)² / ℓ_d². Each kernel implements
`K_r2` (if naturally a function of r²) or `K_r`. The Periodic wrapper
dispatches on which one exists, matching gpflow.kernels.periodic semantics
(reference usage: GPR/main.py:110-111).

Distance construction uses the ‖x‖² + ‖x'‖² − 2⟨x,x'⟩ expansion so the inner
product rides the MXU; the tiny negative values that expansion can produce are
clamped at zero before any sqrt.
"""

from __future__ import annotations

import jax.numpy as jnp

from portfoliooptgp_tpu.kernels.base import (
    ActiveDims,
    Kernel,
    normalize_active_dims,
    pytree_dataclass,
)
from portfoliooptgp_tpu.params import as_param, positive, positive_inv


def scaled_squared_distance(X, X2, lengthscales):
    """r²[i,j] = Σ_d (X[i,d]-X2[j,d])²/ℓ_d², MXU-friendly form."""
    Xs = X / lengthscales
    X2s = X2 / lengthscales
    xx = jnp.sum(Xs * Xs, axis=-1)
    yy = jnp.sum(X2s * X2s, axis=-1)
    xy = Xs @ X2s.T
    r2 = xx[:, None] + yy[None, :] - 2.0 * xy
    return jnp.maximum(r2, 0.0)


class Stationary(Kernel):
    """Base for isotropic stationary kernels with σ² and (ARD) ℓ."""

    @property
    def variance(self):
        return positive(self.raw_variance)

    @property
    def lengthscales(self):
        return positive(self.raw_lengthscales)

    @classmethod
    def create(cls, variance=1.0, lengthscales=1.0, active_dims=None):
        return cls(
            raw_variance=positive_inv(as_param(variance)),
            raw_lengthscales=positive_inv(as_param(lengthscales)),
            active_dims=normalize_active_dims(active_dims),
        )

    def _r2(self, X, X2):
        return scaled_squared_distance(X, X2, self.lengthscales)

    def _r(self, X, X2):
        # sqrt with a zero-safe gradient (d/dx sqrt(x) → inf at 0)
        r2 = self._r2(X, X2)
        return jnp.sqrt(jnp.maximum(r2, 1e-36))

    def _K(self, X, X2):
        if hasattr(self, "K_r2"):
            return self.K_r2(self._r2(X, X2))
        return self.K_r(self._r(X, X2))

    def _Kdiag(self, X):
        return jnp.full((X.shape[0],), 1.0, dtype=X.dtype) * self.variance


@pytree_dataclass(meta=("active_dims",))
class SquaredExponential(Stationary):
    """k(r) = σ² exp(-r²/2) (gpflow.kernels.SquaredExponential; menu item
    GPR/main.py:106)."""

    raw_variance: jnp.ndarray
    raw_lengthscales: jnp.ndarray
    active_dims: ActiveDims = None

    def K_r2(self, r2):
        return self.variance * jnp.exp(-0.5 * r2)


@pytree_dataclass(meta=("active_dims",))
class Matern12(Stationary):
    """k(r) = σ² exp(-r) (gpflow.kernels.Matern12; `Exponential` in GPflow is
    the same function — menu items GPR/main.py:107,109)."""

    raw_variance: jnp.ndarray
    raw_lengthscales: jnp.ndarray
    active_dims: ActiveDims = None

    def K_r(self, r):
        return self.variance * jnp.exp(-r)


# GPflow defines Exponential ≡ Matern12 (identical covariance function).
Exponential = Matern12


@pytree_dataclass(meta=("active_dims",))
class Matern32(Stationary):
    """k(r) = σ² (1 + √3 r) exp(-√3 r)."""

    raw_variance: jnp.ndarray
    raw_lengthscales: jnp.ndarray
    active_dims: ActiveDims = None

    def K_r(self, r):
        s3r = jnp.sqrt(3.0) * r
        return self.variance * (1.0 + s3r) * jnp.exp(-s3r)


@pytree_dataclass(meta=("active_dims",))
class Matern52(Stationary):
    """k(r) = σ² (1 + √5 r + 5r²/3) exp(-√5 r)."""

    raw_variance: jnp.ndarray
    raw_lengthscales: jnp.ndarray
    active_dims: ActiveDims = None

    def K_r(self, r):
        s5r = jnp.sqrt(5.0) * r
        return self.variance * (1.0 + s5r + (5.0 / 3.0) * r * r) * jnp.exp(-s5r)


@pytree_dataclass(meta=("active_dims",))
class RationalQuadratic(Stationary):
    """k(r) = σ² (1 + r²/(2α))^{-α} (gpflow.kernels.RationalQuadratic; menu
    item GPR/main.py:108)."""

    raw_variance: jnp.ndarray
    raw_lengthscales: jnp.ndarray
    raw_alpha: jnp.ndarray
    active_dims: ActiveDims = None

    @classmethod
    def create(cls, variance=1.0, lengthscales=1.0, alpha=1.0, active_dims=None):
        return cls(
            raw_variance=positive_inv(as_param(variance)),
            raw_lengthscales=positive_inv(as_param(lengthscales)),
            raw_alpha=positive_inv(as_param(alpha)),
            active_dims=normalize_active_dims(active_dims),
        )

    @property
    def alpha(self):
        return positive(self.raw_alpha)

    def K_r2(self, r2):
        a = self.alpha
        return self.variance * jnp.exp(-a * jnp.log1p(r2 / (2.0 * a)))


#: Canonical kernel-class → fused-Pallas-family mapping (the `family`
#: argument of ops/pallas/stationary_nll). Single source of truth for the
#: GPR dispatch (models/gpr.fused_stationary_spec) and the ICM chol-NLL
#: fast path (models/icm.neg_log_marginal_likelihood_chol). "rq" carries
#: its alpha through the per-atom scalar slot and is only usable by
#: callers that thread it (the GPR spec does; simple per-family callers
#: should filter it out).
FUSED_FAMILY_OF = {
    SquaredExponential: "se",
    Matern12: "matern12",
    Matern32: "matern32",
    Matern52: "matern52",
    RationalQuadratic: "rq",
}
