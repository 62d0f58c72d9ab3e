"""Likelihoods (gpflow.likelihoods parity surface).

Gaussian is the workhorse (frozen at 1e-5 in GPR/model_trainer.py:16-17,
trainable in Multi-Input_GPR/models/model_trainer.py:26-54). StudentT appears
with VGP (test_scripts/SVGP.py:432-437). Variational expectations for
non-conjugate likelihoods use Gauss–Hermite quadrature (GPflow's default
scheme, 20 points).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from portfoliooptgp_tpu.kernels.base import pytree_dataclass
from portfoliooptgp_tpu.params import as_param, positive, positive_inv

GH_POINTS = 20


class Likelihood:
    pass


@pytree_dataclass
class Gaussian(Likelihood):
    raw_variance: jnp.ndarray

    @classmethod
    def create(cls, variance=1.0):
        return cls(raw_variance=positive_inv(as_param(variance)))

    @property
    def variance(self):
        return positive(self.raw_variance)

    def log_prob(self, f, y):
        v = self.variance
        return -0.5 * (jnp.log(2.0 * jnp.pi) + jnp.log(v) + (y - f) ** 2 / v)

    def variational_expectations(self, f_mean, f_var, y):
        """E_{q(f)=N(μ,s)}[log N(y|f,σ²)] — closed form for Gaussian."""
        v = self.variance
        return -0.5 * (
            jnp.log(2.0 * jnp.pi) + jnp.log(v) + ((y - f_mean) ** 2 + f_var) / v
        )

    def predict_mean_and_var(self, f_mean, f_var):
        return f_mean, f_var + self.variance


@pytree_dataclass(meta=("df",))
class StudentT(Likelihood):
    """Student-t with fixed degrees of freedom (GPflow default df=3) and
    trainable scale."""

    raw_scale: jnp.ndarray
    df: float = 3.0

    @classmethod
    def create(cls, scale=1.0, df=3.0):
        return cls(raw_scale=positive_inv(as_param(scale)), df=float(df))

    @property
    def scale(self):
        return positive(self.raw_scale)

    def log_prob(self, f, y):
        import jax.scipy.stats as jstats

        return jstats.t.logpdf(y, self.df, loc=f, scale=self.scale)

    def variational_expectations(self, f_mean, f_var, y):
        return gauss_hermite_expectation(self.log_prob, f_mean, f_var, y)

    def predict_mean_and_var(self, f_mean, f_var):
        # Var[y] = Var[f] + scale² df/(df-2) for df > 2
        lik_var = self.scale**2 * self.df / (self.df - 2.0)
        return f_mean, f_var + lik_var


def gauss_hermite_expectation(log_prob, f_mean, f_var, y, n_points=GH_POINTS):
    """∫ N(f|μ,s) log p(y|f) df via Gauss–Hermite quadrature."""
    nodes, weights = np.polynomial.hermite_e.hermegauss(n_points)  # probabilists'
    nodes = jnp.asarray(nodes, dtype=f_mean.dtype)
    weights = jnp.asarray(weights / np.sqrt(2.0 * np.pi), dtype=f_mean.dtype)
    f = f_mean[..., None] + jnp.sqrt(jnp.maximum(f_var, 0.0))[..., None] * nodes
    return jnp.sum(log_prob(f, y[..., None]) * weights, axis=-1)
