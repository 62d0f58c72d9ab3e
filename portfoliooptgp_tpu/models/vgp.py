"""VGP — whitened variational GP over the training inputs, for non-conjugate
likelihoods (gpflow.models.VGP parity; used with StudentT at
test_scripts/SVGP.py:432-437).

Equivalent to an SVGP whose inducing inputs are the training inputs X
(M = N), so we reuse the SVGP math with Z ≡ X held fixed:

    f = μ(X) + L v,  L = chol(K(X,X)+jitter),  q(v) = N(q_mu, q_sqrt q_sqrtᵀ)
    ELBO = Σ_n E_q[log p(y_n|f_n)] − KL(q(v) ‖ N(0,I))
"""

from __future__ import annotations

import jax.numpy as jnp

from portfoliooptgp_tpu.kernels.base import Kernel, pytree_dataclass
from portfoliooptgp_tpu.kernels.means import MeanFunction, Zero
from portfoliooptgp_tpu.models.likelihoods import Likelihood, StudentT
from portfoliooptgp_tpu.models.svgp import INDUCING_JITTER
from portfoliooptgp_tpu.ops import linalg


@pytree_dataclass(meta=("num_latent",))
class VGP:
    kernel: Kernel
    likelihood: Likelihood
    mean_function: MeanFunction
    q_mu: jnp.ndarray  # (N, P)
    q_sqrt: jnp.ndarray  # (P, N, N) lower-triangular

    num_latent: int = 1

    @classmethod
    def create(cls, num_data, kernel, likelihood=None, mean_function=None, num_latent=1):
        n = int(num_data)
        return cls(
            kernel=kernel,
            likelihood=likelihood if likelihood is not None else StudentT.create(),
            mean_function=mean_function if mean_function is not None else Zero(),
            q_mu=jnp.zeros((n, num_latent)),
            q_sqrt=jnp.broadcast_to(jnp.eye(n), (num_latent, n, n)).copy(),
            num_latent=num_latent,
        )


def _whitened_marginals(model: VGP, X):
    """Mean/var of q(f(X)) at the training inputs: f = μ + L v."""
    K = linalg.add_diag(model.kernel.K(X), INDUCING_JITTER)
    L = linalg.cholesky(K)
    LS = jnp.tril(model.q_sqrt)  # (P, N, N)
    mean = L @ model.q_mu + model.mean_function(X)
    # cov = L S Lᵀ; diag = row-sums of (L LS_p)²
    LLs = jnp.einsum("nk,pkm->pnm", L, LS)
    var = jnp.sum(LLs * LLs, axis=-1)  # (P, N)
    return L, mean, var.T  # var (N, P)


def prior_kl(model: VGP):
    LS = jnp.tril(model.q_sqrt)
    m = model.q_mu
    n = m.shape[0]
    p = model.q_sqrt.shape[0]
    trace = jnp.sum(LS * LS)
    quad = jnp.sum(m * m)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(LS, axis1=-2, axis2=-1))))
    return 0.5 * (trace + quad - n * p - logdet)


def elbo(model: VGP, X, Y):
    _, mean, var = _whitened_marginals(model, X)
    ve = model.likelihood.variational_expectations(mean, var, Y)
    return jnp.sum(ve) - prior_kl(model)


def neg_elbo(model: VGP, X, Y):
    return -elbo(model, X, Y)


def predict_f(model: VGP, X, Xnew, full_cov: bool = False):
    """q(f(Xnew)) via the whitened conditional: with A = L⁻¹ K(X, Xnew),
    mean = Aᵀ q_mu + μ, var = K(Xnew) − AᵀA + Aᵀ S A (same structure as SVGP
    predict with Z = X)."""
    K = linalg.add_diag(model.kernel.K(X), INDUCING_JITTER)
    L = linalg.cholesky(K)
    Kxs = model.kernel.K(X, Xnew)
    A = linalg.solve_lower(L, Kxs)  # (N, S)
    mean = A.T @ model.q_mu + model.mean_function(Xnew)
    LS = jnp.tril(model.q_sqrt)
    SA = jnp.einsum("pnk,ns->pks", LS, A)  # LSᵀ A per latent
    if full_cov:
        cov = model.kernel.K(Xnew)[None] - (A.T @ A)[None] + jnp.einsum(
            "pks,pkt->pst", SA, SA
        )
        return mean, cov
    var = (
        model.kernel.Kdiag(Xnew)[None, :]
        - jnp.sum(A * A, axis=0)[None, :]
        + jnp.sum(SA * SA, axis=1)
    )
    return mean, jnp.maximum(var, 0.0).T


def predict_y(model: VGP, X, Xnew):
    mean, var = predict_f(model, X, Xnew)
    return model.likelihood.predict_mean_and_var(mean, var)
