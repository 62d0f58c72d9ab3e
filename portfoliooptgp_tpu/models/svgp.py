"""Sparse variational GP (SVGP) with whitened inducing variables.

Replaces gpflow.models.SVGP as used by the reference's sparse experiments
(test_scripts/SVGP.py:459-533: M ∈ {20, 120} linspace inducing points,
Gaussian likelihood frozen at 1e-4, `training_loss_closure` ELBO minimized
with L-BFGS maxiter=100). Whitened parameterization:

    u = Luu v,  q(v) = N(q_mu, q_sqrt q_sqrtᵀ),  Kuu = k(Z,Z) + jitter·I
    f(x) | v  has mean A(x)ᵀ q_mu, cov K(x,x) − AᵀA + Aᵀ S A,  A = Luu⁻¹ K(Z,x)
    ELBO = (N/B) Σ_batch E_q[log p(y|f)] − KL(q(v) ‖ N(0, I))

The minibatch scale factor (num_data / batch) makes the ELBO an unbiased
full-dataset estimate — this is the quantity sharded across the mesh `data`
axis with psum reduction (BASELINE.json north star; parallel/elbo_sharded.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from portfoliooptgp_tpu.kernels.base import Kernel, pytree_dataclass
from portfoliooptgp_tpu.kernels.means import MeanFunction, Zero
from portfoliooptgp_tpu.models.likelihoods import Gaussian, Likelihood
from portfoliooptgp_tpu.ops import linalg

INDUCING_JITTER = 1e-6  # GPflow default_jitter applied to Kuu (float64)


def inducing_jitter(dtype):
    """float32 needs a larger jitter for Kuu factorization stability at
    GPflow-like inducing-point densities."""
    return 1e-4 if dtype == jnp.float32 else INDUCING_JITTER


def jittered_kuu(kernel, Z):
    """Kuu = k(Z, Z) + jitter·I with a dtype- and scale-aware jitter.

    float64 keeps GPflow's absolute default_jitter (1e-6) for parity. float32
    uses 1e-3 *relative to the mean prior amplitude*: at reference-scale
    inducing densities (M=128 on a 44-year daily grid, ℓ ≫ spacing,
    cond(Kuu) ≳ 1e7) a single f32 factorization at 1e-4 fails outright,
    while 1e-3·tr(Kuu)/M is stable through full Adam trajectories and costs
    ~1e-3 relative ELBO slack (measured: trains to a better bound than the
    jitter-ladder path it replaces)."""
    Kuu = kernel.K(Z)
    if Z.dtype == jnp.float32:
        scale = jnp.mean(jnp.diagonal(Kuu))
        return linalg.add_diag(Kuu, 1e-3 * scale + 1e-12)
    return linalg.add_diag(Kuu, INDUCING_JITTER)


@pytree_dataclass(meta=("num_latent",))
class SVGP:
    kernel: Kernel
    likelihood: Likelihood
    mean_function: MeanFunction
    Z: jnp.ndarray  # (M, D) inducing inputs
    q_mu: jnp.ndarray  # (M, P)
    q_sqrt: jnp.ndarray  # (P, M, M), lower-triangular factor of q(v) cov
    num_latent: int = 1

    @classmethod
    def create(cls, kernel, inducing_points, likelihood=None, mean_function=None, num_latent=1):
        Z = jnp.asarray(inducing_points, dtype=jnp.result_type(float))
        m = Z.shape[0]
        return cls(
            kernel=kernel,
            likelihood=likelihood if likelihood is not None else Gaussian.create(1.0),
            mean_function=mean_function if mean_function is not None else Zero(),
            Z=Z,
            q_mu=jnp.zeros((m, num_latent)),
            q_sqrt=jnp.broadcast_to(jnp.eye(m), (num_latent, m, m)).copy(),
            num_latent=num_latent,
        )

    @property
    def num_inducing(self):
        return self.Z.shape[0]


def _tril(q_sqrt):
    return jnp.tril(q_sqrt)


def prior_kl(model: SVGP):
    """KL(q(v) ‖ N(0,I)) for whitened v, summed over latent dims:
    ½ Σ_p [ tr(S_p) + ‖m_p‖² − M − log|S_p| ]."""
    L = _tril(model.q_sqrt)  # (P, M, M)
    m = model.q_mu  # (M, P)
    M = model.num_inducing
    trace = jnp.sum(L * L)
    quad = jnp.sum(m * m)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(L, axis1=-2, axis2=-1))))
    P = model.q_sqrt.shape[0]
    return 0.5 * (trace + quad - M * P - logdet)


def _predict_f(model: SVGP, Xnew, full_cov, chol_fn):
    Kuu = jittered_kuu(model.kernel, model.Z)
    Luu, _ = chol_fn(Kuu)
    Kuf = model.kernel.K(model.Z, Xnew)  # (M, N)
    A = linalg.solve_lower(Luu, Kuf)  # (M, N)
    mean = A.T @ model.q_mu + model.mean_function(Xnew)
    LS = _tril(model.q_sqrt)  # (P, M, M)
    SA = jnp.einsum("pmk,kn->pmn", jnp.swapaxes(LS, -1, -2), A)  # Lᵀ A per latent
    if full_cov:
        Kff = model.kernel.K(Xnew)
        cov = Kff[None] - (A.T @ A)[None] + jnp.einsum("pmn,pmo->pno", SA, SA)
        return mean, cov
    Kdiag = model.kernel.Kdiag(Xnew)
    var = Kdiag[None, :] - jnp.sum(A * A, axis=0)[None, :] + jnp.sum(SA * SA, axis=1)
    var = jnp.maximum(var, 0.0)  # (P, N)
    return mean, var.T  # (N, P)


def predict_f(model: SVGP, Xnew, full_cov: bool = False):
    """q(f(Xnew)) marginal mean/var under the whitened posterior.

    Public prediction surface: Kuu is factored through the `safe_cholesky`
    jitter-escalation ladder, so an ill-conditioned Kuu at prediction time
    recovers with a larger jitter instead of surfacing NaN mean/variance to
    the pipelines/portfolio callers. The per-step training path uses
    `predict_f_guarded` instead (one factorization; a failure becomes a NaN
    loss masked by the trainers), because the ladder was >50% of the SVGP
    ELBO step time on v5e while prediction runs once per horizon."""
    return _predict_f(model, Xnew, full_cov, linalg.safe_cholesky)


def predict_f_guarded(model: SVGP, Xnew, full_cov: bool = False):
    """Hot-path posterior used inside the ELBO: ONE Kuu factorization at the
    dtype-scaled jitter with a NaN-guarded VJP — a failed factorization makes
    the ELBO NaN (masked by the trainers) with zero gradients, instead of
    paying the 6-factorization jitter ladder on every training step."""
    return _predict_f(model, Xnew, full_cov, linalg.cholesky_guarded)


def predict_y(model: SVGP, Xnew):
    mean, var = predict_f(model, Xnew)
    return model.likelihood.predict_mean_and_var(mean, var)


def elbo(model: SVGP, X, Y, num_data: Optional[int] = None):
    """Minibatch evidence lower bound (training_loss_closure parity,
    test_scripts/SVGP.py:530). `num_data` rescales the likelihood term when
    (X, Y) is a minibatch."""
    mean, var = predict_f_guarded(model, X)
    ve = model.likelihood.variational_expectations(mean, var, Y)
    scale = 1.0 if num_data is None else num_data / X.shape[0]
    return jnp.sum(ve) * scale - prior_kl(model)


def neg_elbo(model: SVGP, X, Y, num_data: Optional[int] = None):
    return -elbo(model, X, Y, num_data)


def gaussian_elbo_gram(model: SVGP, X, Y, weights=None,
                       num_data: Optional[int] = None):
    """Gaussian-likelihood ELBO in Gram-accumulation form — the TPU-native
    restatement of the per-point whitened posterior (VERDICT r3 item 2).

    The textbook path (predict_f → variational_expectations) solves the
    M×B triangular system A = Luu⁻¹ Kuf and reads off per-point means and
    variances — on TPU that trisolve is a latency-bound blocked loop and the
    per-point var/ve chain is a string of small VPU ops. For a GAUSSIAN
    likelihood the batch only enters the ELBO through three reductions:

        Σ_b w (y−mean)²,   Σ_b w Kdiag,   and the weighted Gram
        G = Kuf diag(w) Kufᵀ  (M×M),

    because  Σ_b w‖A_b‖² = tr(Kuu⁻¹ G) = tr(C)  and
             Σ_b w‖SA_b‖² = Σ_p ⟨C, L_p L_pᵀ⟩  with  C = Luu⁻¹ G Luu⁻ᵀ.

    So the whole batch collapses into ONE MXU matmul (the G syrk), one
    matvec for the means, and M×M ops — no M×B solve in the forward OR the
    VJP (autodiff of G = Kw Kufᵀ is another matmul). Exactly equal to
    `elbo` (same whitening convention) up to float reduction order; parity
    is tested in tests/test_sparse.py. Replaces the per-step cost model of
    gpflow's SVGP.training_loss at test_scripts/SVGP.py:515-533.

    weights: optional (B,) row weights (0 = padding row, as in the sharded
    path). num_data rescales the likelihood term for minibatches.
    """
    Luu = gram_chol(model)
    partials = gram_partials(model, Luu, X, Y, weights)
    return gram_finish(model, Luu, partials, num_data)


def _gram_family(kernel) -> Optional[str]:
    """Pallas φ family of a bare stationary kernel, or None if the fused
    gram path cannot handle it (composites, active_dims, RQ/periodic)."""
    from portfoliooptgp_tpu.kernels import stationary as st

    if getattr(kernel, "active_dims", None) is not None:
        return None
    for cls, fam in ((st.SquaredExponential, "se"), (st.Matern12, "matern12"),
                     (st.Matern32, "matern32"), (st.Matern52, "matern52")):
        if type(kernel) is cls:
            return fam
    return None


def svgp_gram_fused_supported(model: SVGP, X) -> bool:
    """True when the single-program Pallas gram kernels can run this model:
    bare stationary kernel, Gaussian likelihood, Zero/Constant mean, P=1,
    float32, M % 8 == 0, B within the VMEM budget."""
    from portfoliooptgp_tpu.kernels.means import ConstantMean, Zero
    from portfoliooptgp_tpu.models.likelihoods import Gaussian
    from portfoliooptgp_tpu.ops.pallas import svgp_gram

    return (
        _gram_family(model.kernel) is not None
        and isinstance(model.likelihood, Gaussian)
        and isinstance(model.mean_function, (Zero, ConstantMean))
        and model.q_sqrt.shape[0] == 1
        and model.Z.shape[0] % 8 == 0
        and model.Z.shape[1] <= svgp_gram.LANES
        and X.shape[0] <= svgp_gram.MAX_FUSED_B
        and X.dtype == jnp.float32
        and model.Z.dtype == jnp.float32
    )


def gram_partials_fused(model: SVGP, Luu, X, Y, weights=None, t=None):
    """Fused-kernel version of `gram_partials` (same additive tuple), for
    eligible models on TPU — one Pallas program for the whole batch phase.
    `t` (= Luu⁻ᵀ q_mu) may be precomputed by the caller (the fast finish
    derives it from the explicit inverse instead of a trisolve)."""
    from portfoliooptgp_tpu.ops.pallas import svgp_gram

    family = _gram_family(model.kernel)
    if t is None:
        t = linalg.solve_upper_t(Luu, model.q_mu)[:, 0]
    y_eff = (Y - model.mean_function(X))[:, 0]
    B = X.shape[0]
    w = jnp.ones((B,), X.dtype) if weights is None else weights
    v = model.kernel.variance
    ell = model.kernel.lengthscales
    s = 1.0 / (ell * ell)
    G, sq_err = svgp_gram.gram_reduce(model.Z, X, y_eff, w, t, v, s, family)
    W = jnp.sum(w)
    kdiag_w = v * W  # stationary families: Kdiag ≡ variance
    return G, sq_err, kdiag_w, W


def gaussian_elbo_gram_fused(model: SVGP, X, Y, weights=None,
                             num_data: Optional[int] = None,
                             use_pallas: bool = False):
    """The fast-path Gaussian ELBO: Gram accumulation with the M-phase on
    `linalg.cholesky_inverse_pair` — ONE factorization whose explicit
    inverse makes the whitened terms AND every backward term matmuls (no
    serial trisolve anywhere in the VJP).

    The batch phase defaults to the XLA formulation: interleaved v5e
    measurements (benchmarks/prof_svgp_fused_parts.py, M=128 B=2048) put
    XLA's fused build+syrk+reduce at 36.7 µs value+grad vs 46.3 µs for the
    single-program Pallas kernel pair (ops/pallas/svgp_gram.py), D=1 and
    D=4 alike — XLA's residual reuse (Kuf stored once, backward dots at
    native precision) beats the kernel's recompute. `use_pallas=True`
    selects the kernel pair (same values/gradients, parity-tested) for
    shapes where recompute wins (B beyond the XLA fusion budget).

    Same value/gradients as `gaussian_elbo_gram` in every configuration."""
    if use_pallas and svgp_gram_fused_supported(model, X):
        with jax.named_scope("svgp/gram_fused"):
            Kuu = jittered_kuu(model.kernel, model.Z)
            Luu, Winv = linalg.cholesky_inverse_pair(Kuu)
            t = (Winv.T @ model.q_mu)[:, 0]
            G, sq_err, kdiag_w, Wsum = gram_partials_fused(
                model, Luu, X, Y, weights, t=t)
            C = (Winv @ G) @ Winv.T
            return _gram_tail(model, C, sq_err, kdiag_w, Wsum, num_data)
    with jax.named_scope("svgp/gram_fast"):
        Kuu = jittered_kuu(model.kernel, model.Z)
        Luu, Winv = linalg.cholesky_inverse_pair(Kuu)
        t = Winv.T @ model.q_mu  # (M, P)
        G, sq_err, kdiag_w, Wsum = gram_partials(
            model, Luu, X, Y, weights, t=t)
        C = (Winv @ G) @ Winv.T
        return _gram_tail(model, C, sq_err, kdiag_w, Wsum, num_data)


def gram_chol(model: SVGP):
    """Luu for the Gram-accumulation path (one guarded factorization)."""
    Kuu = jittered_kuu(model.kernel, model.Z)
    Luu, _ = linalg.cholesky_guarded(Kuu)
    return Luu


def gram_partials(model: SVGP, Luu, X, Y, weights=None, t=None):
    """Per-shard reductions of the Gaussian ELBO: (G, sq_err, kdiag_w, W).
    Every element is ADDITIVE across row shards, so the sharded path psums
    this tuple and finishes replicated (parallel/elbo_sharded.py). `t`
    (= Luu⁻ᵀ q_mu, (M, P)) may be precomputed by the caller — the fast path
    derives it from the explicit inverse instead of a trisolve."""
    Kuf = model.kernel.K(model.Z, X)  # (M, B)
    B = X.shape[0]
    w = jnp.ones((B,), Kuf.dtype) if weights is None else weights
    Kw = Kuf * w[None, :]
    G = Kw @ Kuf.T  # (M, M) weighted Gram
    if t is None:
        t = linalg.solve_upper_t(Luu, model.q_mu)  # (M, P) = Luu⁻ᵀ q_mu
    mean = Kuf.T @ t + model.mean_function(X)  # (B, P)
    err = Y - mean
    sq_err = jnp.sum(err * err * w[:, None])
    kdiag_w = jnp.sum(model.kernel.Kdiag(X) * w)
    return G, sq_err, kdiag_w, jnp.sum(w)


def _gram_tail(model: SVGP, C, sq_err, kdiag_w, W, num_data):
    """Shared ELBO tail given C = Luu⁻¹ G Luu⁻ᵀ and the scalar partials."""
    sigma2 = model.likelihood.variance
    LS = _tril(model.q_sqrt)  # (P, M, M)
    CL = jnp.einsum("mn,pnk->pmk", C, LS)
    P = model.q_sqrt.shape[0]
    sum_var = P * (kdiag_w - jnp.trace(C)) + jnp.sum(CL * LS)
    ve_sum = (
        -0.5 * W * P * jnp.log(2.0 * jnp.pi * sigma2)
        - 0.5 * (sq_err + sum_var) / sigma2
    )
    scale = 1.0 if num_data is None else num_data / jnp.maximum(W, 1.0)
    return ve_sum * scale - prior_kl(model)


def gram_finish(model: SVGP, Luu, partials, num_data: Optional[int] = None):
    """Finish the Gaussian ELBO from (psum'd) Gram partials: M×M ops only."""
    G, sq_err, kdiag_w, W = partials
    HG = linalg.solve_lower(Luu, G)  # Luu⁻¹ G
    C = linalg.solve_lower(Luu, HG.T)  # Luu⁻¹ G Luu⁻ᵀ (symmetric)
    return _gram_tail(model, C, sq_err, kdiag_w, W, num_data)
