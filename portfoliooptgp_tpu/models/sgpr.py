"""SGPR — Titsias's collapsed sparse bound (gpflow.models.SGPR parity).

Used by the reference at test_scripts/SVGP.py:393-400 (10 linspace inducing
points on the combined AAPL series). The variational distribution over u is
optimal in closed form, so the model pytree holds only kernel + likelihood +
inducing inputs.

Collapsed bound (Gaussian likelihood, σ² noise, M inducing, N data):
    A  = Luu⁻¹ Kuf / σ          (M, N)
    B  = I + A Aᵀ,  LB = chol(B)
    c  = LB⁻¹ A (Y−μ) / σ
    ELBO = −NP/2 log 2πσ² − P Σlog diag(LB) − ‖Y−μ‖²/(2σ²) + ‖c‖²/2
           − P/(2σ²) (Σ Kdiag(X) − tr(AAᵀ)σ²... )
(the trace term is (Σ_n k(x_n,x_n) − Σ tr(Luu⁻¹KufKfuLuu⁻ᵀ)) / (2σ²) · P.)
"""

from __future__ import annotations

import jax.numpy as jnp

from portfoliooptgp_tpu.kernels.base import Kernel, pytree_dataclass
from portfoliooptgp_tpu.kernels.means import MeanFunction, Zero
from portfoliooptgp_tpu.models.likelihoods import Gaussian
from portfoliooptgp_tpu.models.svgp import INDUCING_JITTER
from portfoliooptgp_tpu.ops import linalg


@pytree_dataclass
class SGPR:
    kernel: Kernel
    likelihood: Gaussian
    mean_function: MeanFunction
    Z: jnp.ndarray  # (M, D)

    @classmethod
    def create(cls, kernel, inducing_points, noise_variance=1.0, mean_function=None):
        return cls(
            kernel=kernel,
            likelihood=Gaussian.create(noise_variance),
            mean_function=mean_function if mean_function is not None else Zero(),
            Z=jnp.asarray(inducing_points, dtype=jnp.result_type(float)),
        )


def _common(model: SGPR, X, Y, chol_fn=linalg.cholesky_guarded):
    sigma2 = model.likelihood.variance
    sigma = jnp.sqrt(sigma2)
    err = Y - model.mean_function(X)
    from portfoliooptgp_tpu.models.svgp import jittered_kuu

    Kuu = jittered_kuu(model.kernel, model.Z)
    Luu, _ = chol_fn(Kuu)
    Kuf = model.kernel.K(model.Z, X)
    A = linalg.solve_lower(Luu, Kuf) / sigma  # (M, N)
    B = linalg.add_diag(A @ A.T, 1.0)
    LB = linalg.cholesky(B)
    c = linalg.solve_lower(LB, A @ err) / sigma  # (M, P)
    return sigma2, err, Luu, A, LB, c


def elbo(model: SGPR, X, Y):
    sigma2, err, Luu, A, LB, c = _common(model, X, Y)
    n, p = err.shape
    bound = -0.5 * n * p * jnp.log(2.0 * jnp.pi)
    bound -= p * jnp.sum(jnp.log(jnp.diagonal(LB)))
    bound -= 0.5 * n * p * jnp.log(sigma2)
    bound -= 0.5 * jnp.sum(err * err) / sigma2
    bound += 0.5 * jnp.sum(c * c)
    trace = jnp.sum(model.kernel.Kdiag(X)) / sigma2 - jnp.sum(A * A)
    bound -= 0.5 * p * trace
    return bound


def neg_elbo(model: SGPR, X, Y):
    return -elbo(model, X, Y)


def predict_f(model: SGPR, X, Y, Xnew, full_cov: bool = False):
    """Posterior q(f(Xnew)) under the optimal collapsed q(u).

    Prediction is not per-step hot, so Kuu goes through the safe_cholesky
    jitter-escalation ladder (an ill-conditioned Kuu recovers at a larger
    jitter instead of returning NaN to pipeline callers); the ELBO keeps the
    single guarded factorization whose NaN loss the trainers mask."""
    sigma2, err, Luu, A, LB, c = _common(model, X, Y, chol_fn=linalg.safe_cholesky)
    Kus = model.kernel.K(model.Z, Xnew)  # (M, S)
    tmp1 = linalg.solve_lower(Luu, Kus)  # Luu⁻¹ Kus
    tmp2 = linalg.solve_lower(LB, tmp1)  # LB⁻¹ Luu⁻¹ Kus
    mean = tmp2.T @ c + model.mean_function(Xnew)
    if full_cov:
        cov = model.kernel.K(Xnew) + tmp2.T @ tmp2 - tmp1.T @ tmp1
        return mean, cov
    var = (
        model.kernel.Kdiag(Xnew)
        + jnp.sum(tmp2 * tmp2, axis=0)
        - jnp.sum(tmp1 * tmp1, axis=0)
    )
    var = jnp.maximum(var, 0.0)
    return mean, jnp.broadcast_to(var[:, None], mean.shape)


def predict_y(model: SGPR, X, Y, Xnew):
    mean, var = predict_f(model, X, Y, Xnew)
    return model.likelihood.predict_mean_and_var(mean, var)
