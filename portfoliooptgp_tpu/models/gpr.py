"""Exact Gaussian-process regression.

Pure-functional replacement for gpflow.models.GPR as used throughout the
reference (constructed at GPR/model_trainer.py:15, Multi-Input_GPR/
models/model_trainer.py:31; predictions at GPR/predictor.py:5-8). The model is
a pytree (kernel + mean function + Gaussian likelihood), the loss is
`neg_log_marginal_likelihood(model, X, Y)`, and gradients come from
`jax.grad` — no TF variables, no object state.

Math (GPflow-parity):
    L = chol(K(X,X) + σ² I)
    log p(Y|X,θ) = -½ Σ_p ‖L⁻¹(Y_p-μ)‖² - P Σ log diag(L) - NP/2 log 2π
    predict_f: mean = K*ₓᵀ (K+σ²I)⁻¹ (Y-μ(X)) + μ(X*)
               var  = K** - K*ₓᵀ (K+σ²I)⁻¹ K*ₓ  (diag or full)
    predict_y = predict_f + likelihood variance (GPR/predictor.py:6-7)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from portfoliooptgp_tpu.kernels.base import Kernel, pytree_dataclass
from portfoliooptgp_tpu.kernels.means import MeanFunction, Zero
from portfoliooptgp_tpu.models.likelihoods import Gaussian
from portfoliooptgp_tpu.ops import linalg


@pytree_dataclass
class GPR:
    """Exact GPR model pytree: hyperparameters only — data is passed to the
    pure functions below, so one model structure can be vmapped over stacked
    restarts (SURVEY.md §2.3 restart/kernel batch parallelism)."""

    kernel: Kernel
    likelihood: Gaussian
    mean_function: MeanFunction

    @classmethod
    def create(cls, kernel, noise_variance=1.0, mean_function=None):
        return cls(
            kernel=kernel,
            likelihood=Gaussian.create(noise_variance),
            mean_function=mean_function if mean_function is not None else Zero(),
        )


class GPRPosterior(NamedTuple):
    """Cached posterior: reused across repeated predict calls, mirroring how
    the reference calls predict_f/predict_y many times per trained model
    (GPR/main.py:47-49, Multi-Input_GPR/main.py:434)."""

    L: jnp.ndarray  # chol(K + σ²I), (N, N)
    alpha: jnp.ndarray  # (K+σ²I)⁻¹ (Y - μ(X)), (N, P)
    X: jnp.ndarray
    err: jnp.ndarray


def _noisy_kernel(model: GPR, X):
    K = model.kernel.K(X)
    return linalg.add_diag(K, model.likelihood.variance)


def log_marginal_likelihood(model: GPR, X, Y):
    Ks = _noisy_kernel(model, X)
    L = linalg.cholesky(Ks)
    err = Y - model.mean_function(X)
    n, p = err.shape
    quad = linalg.mahalanobis_from_chol(L, err)
    logdet = linalg.logdet_from_chol(L)
    return -0.5 * quad - 0.5 * p * logdet - 0.5 * n * p * jnp.log(2.0 * jnp.pi)


def neg_log_marginal_likelihood(model: GPR, X, Y):
    """`model.training_loss` parity (minimized at GPR/model_trainer.py:18-19)."""
    return -log_marginal_likelihood(model, X, Y)


def posterior(model: GPR, X, Y) -> GPRPosterior:
    Ks = _noisy_kernel(model, X)
    L = linalg.cholesky(Ks)
    err = Y - model.mean_function(X)
    alpha = linalg.chol_solve(L, err)
    return GPRPosterior(L=L, alpha=alpha, X=X, err=err)


def predict_f(model: GPR, X, Y, Xnew, full_cov: bool = False, cache: Optional[GPRPosterior] = None):
    """Posterior mean/variance of the latent f at Xnew.

    Returns (mean (M,P), var (M,P)) for full_cov=False or (mean, cov (M,M))
    for full_cov=True — matching gpflow predict_f's shapes as consumed at
    GPR/predictor.py:6 and Multi-Input_GPR/main.py:434.
    """
    post = cache if cache is not None else posterior(model, X, Y)
    Kmn = model.kernel.K(post.X, Xnew)  # (N, M)
    mean = Kmn.T @ post.alpha + model.mean_function(Xnew)
    A = linalg.solve_lower(post.L, Kmn)  # (N, M)
    if full_cov:
        cov = model.kernel.K(Xnew) - A.T @ A
        return mean, cov
    var = model.kernel.Kdiag(Xnew) - jnp.sum(A * A, axis=0)
    var = jnp.maximum(var, 0.0)
    return mean, jnp.broadcast_to(var[:, None], mean.shape)


def predict_y(model: GPR, X, Y, Xnew, cache: Optional[GPRPosterior] = None):
    """predict_f + likelihood variance (GPR/predictor.py:7)."""
    mean, var = predict_f(model, X, Y, Xnew, full_cov=False, cache=cache)
    return model.likelihood.predict_mean_and_var(mean, var)


def neg_log_marginal_likelihood_cg(model: GPR, X, Y, key, num_probes: int = 16,
                                   num_lanczos: int = 32, cg_tol: float = 1e-6):
    """Matrix-free NLL for large N (CG quad + SLQ log-det, ops/iterative.py).
    Stochastic in the log-det; use for N beyond direct-factorization budgets
    with Adam-style optimizers that average gradient noise."""
    from portfoliooptgp_tpu.ops import iterative

    K = model.kernel.K(X)
    err = Y - model.mean_function(X)
    return iterative.nll_cg(
        K, err, model.likelihood.variance, key, num_probes, num_lanczos, cg_tol
    )


def fused_stationary_spec(stacked_model, X):
    """Eligibility + operands for the fused stationary Pallas NLL paths.

    Returns (families, d2s, variances, lengthscales, alphas) — tuples over
    the 1 or 2 stationary factors — or None if the model's kernel is not a
    single isotropic stationary kernel (scalar ℓ) or a 2-factor product of
    them on column slices (the multi-input composite, Multi-Input_GPR/main.py:
    118-135). d2 matrices are unit-lengthscale squared distances on each
    factor's active dims, shared across the whole batch. alphas carries the
    RationalQuadratic exponent per 'rq' factor (ones elsewhere).
    """
    import jax

    from portfoliooptgp_tpu.kernels import stationary as st_kernels
    from portfoliooptgp_tpu.kernels.base import Product

    FAMILY_OF = {
        st_kernels.SquaredExponential: "se",
        st_kernels.Matern12: "matern12",
        st_kernels.Matern32: "matern32",
        st_kernels.Matern52: "matern52",
        st_kernels.RationalQuadratic: "rq",
    }

    def factor_alpha(get_term):
        def f(m):
            t = get_term(m)
            if isinstance(t, st_kernels.RationalQuadratic):
                return t.alpha
            return jnp.ones((), X.dtype)
        return jax.vmap(f)(stacked_model)

    kern = stacked_model.kernel
    one = jnp.ones((), X.dtype)

    fam = FAMILY_OF.get(type(kern))
    if (fam is not None and getattr(kern, "active_dims", None) is None
            and jnp.ndim(kern.raw_lengthscales) == 1):
        d2 = st_kernels.scaled_squared_distance(X, X, one)
        v = jax.vmap(lambda m: m.kernel.variance)(stacked_model)
        ell = jax.vmap(lambda m: m.kernel.lengthscales)(stacked_model)
        al = factor_alpha(lambda m: m.kernel)
        return (fam,), (d2,), (v,), (ell,), (al,)

    if (isinstance(kern, Product) and len(kern.terms) == 2
            and all(type(t) in FAMILY_OF for t in kern.terms)
            and all(jnp.ndim(t.raw_lengthscales) == 1 for t in kern.terms)):
        fams = tuple(FAMILY_OF[type(t)] for t in kern.terms)
        d2s = tuple(
            st_kernels.scaled_squared_distance(t.slice_x(X), t.slice_x(X), one)
            for t in kern.terms
        )
        vs = tuple(
            jax.vmap(lambda m, j=j: m.kernel.terms[j].variance)(stacked_model)
            for j in range(2)
        )
        ells = tuple(
            jax.vmap(lambda m, j=j: m.kernel.terms[j].lengthscales)(stacked_model)
            for j in range(2)
        )
        als = tuple(
            factor_alpha(lambda m, j=j: m.kernel.terms[j]) for j in range(2)
        )
        return fams, d2s, vs, ells, als
    return None


def batched_neg_log_marginal_likelihood(stacked_model, X, Y, fast: bool = True):
    """NLL for a stacked batch of models sharing (X, Y) — the vmapped-restart
    primitive. With `fast=True` and float32 inputs the batch is routed by N:
    N ≤ 256 → fused in-VMEM Pallas factor+solve+logdet kernel
    (ops/pallas/nll.py); 256 < N ≤ 4096 → blocked Pallas-panel + MXU-syrk
    Cholesky (ops/pallas/blocked_nll.py); otherwise the vmapped XLA path.
    All three share the same custom-VJP contract. Returns (B,) losses."""
    import jax

    from portfoliooptgp_tpu.ops.pallas import blocked_nll as blocked_mod
    from portfoliooptgp_tpu.ops.pallas import nll as nll_mod

    n = X.shape[0]
    leaves = jax.tree.leaves(stacked_model)
    params_f32 = all(jnp.asarray(l).dtype == jnp.float32 for l in leaves)
    use_fast = (
        fast
        and X.dtype == jnp.float32
        and params_f32  # f64 params (parity mode) take the XLA path
        and Y.shape[1] == 1
        and (nll_mod.pallas_nll_supported(n) or blocked_mod.blocked_nll_supported(n))
    )
    if not use_fast:
        return jax.vmap(lambda m: neg_log_marginal_likelihood(m, X, Y))(stacked_model)

    noise = jax.vmap(lambda m: m.likelihood.variance)(stacked_model)
    err = Y[None, :, 0] - jax.vmap(lambda m: m.mean_function(X))(stacked_model)[:, :, 0]

    # fully-fused path: isotropic stationary kernel over all input dims with
    # a scalar lengthscale — K is built inside the Pallas kernel from one
    # shared (N, N) distance matrix and never materialized in HBM
    from portfoliooptgp_tpu.kernels import stationary as st_kernels
    from portfoliooptgp_tpu.ops.pallas import stationary_nll as st_mod

    spec = fused_stationary_spec(stacked_model, X)
    if spec is not None and nll_mod.pallas_nll_supported(n):
        fams, d2s, vs, ells, als = spec
        if len(fams) == 1 and fams[0] != "rq":
            return st_mod.batched_nll_stationary(
                d2s[0], err, vs[0], ells[0], noise, fams[0]
            )
        mask = jnp.ones((err.shape[0], n), X.dtype)
        return st_mod.batched_nll_stationary_general(
            fams, d2s, err, vs, ells, als, noise, mask
        )

    Kb = jax.vmap(lambda m: m.kernel.K(X))(stacked_model)  # (B, N, N)
    if nll_mod.pallas_nll_supported(n):
        return nll_mod.batched_nll(Kb, err, noise)
    return blocked_mod.batched_nll_blocked(Kb, err, noise)
