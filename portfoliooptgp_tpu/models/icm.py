"""Multi-output GP regression — intrinsic coregionalization model (ICM) with
Kronecker-structured exact inference.

BASELINE.json config 5 asks for a "20-asset multi-output GP posterior →
efficient-frontier weight optimization"; the reference approximates this with
five *independent* per-asset GPRs glued together by an empirical correlation
matrix (Multi-Input_GPR/main.py:535-565, Portfolio/portfolio.py:137). Here
the cross-asset structure is part of the model:

    cov(Y[n, i], Y[m, j]) = B[i, j] · k(x_n, x_m),   B = W Wᵀ + diag(κ)

With all assets observed on the same grid, the Gram matrix is the Kronecker
product B ⊗ Kx, and the NLL/posterior collapse to two small symmetric
eigendecompositions — O(N³ + P³) instead of O((NP)³):

    Kx = Qx Λx Qxᵀ,  B = Qb Λb Qbᵀ,  W = Λb ⊗ Λx + σ²
    Ỹ = Qxᵀ Y Qb
    NLL = ½ Σ Ỹ²/W + ½ Σ log W + NP/2 log 2π

Eigendecompositions are batched-friendly on TPU and everything is
differentiable, so hyperparameters (kernel + B + σ²) train by L-BFGS and can
be sampled with NUTS like any other model pytree.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from portfoliooptgp_tpu.kernels.base import Kernel, pytree_dataclass
from portfoliooptgp_tpu.models.likelihoods import Gaussian
from portfoliooptgp_tpu.ops.linalg import safe_eigh
from portfoliooptgp_tpu.params import as_param, positive, positive_inv

EIG_JITTER = 1e-10


@pytree_dataclass(meta=("num_outputs", "rank"))
class ICMGPR:
    kernel: Kernel
    likelihood: Gaussian
    W: jnp.ndarray  # (P, rank) coregionalization factors
    raw_kappa: jnp.ndarray  # (P,) per-output diagonal of B

    num_outputs: int = 2
    rank: int = 1

    @classmethod
    def create(cls, kernel, num_outputs, rank=1, noise_variance=1.0, w_scale=0.1, seed=0):
        key = jax.random.PRNGKey(seed)
        W = w_scale * jax.random.normal(
            key, (num_outputs, rank), dtype=jnp.result_type(float)
        )
        return cls(
            kernel=kernel,
            likelihood=Gaussian.create(noise_variance),
            W=W,
            raw_kappa=positive_inv(jnp.ones((num_outputs,)) * as_param(1.0)),
            num_outputs=int(num_outputs),
            rank=int(rank),
        )

    @property
    def B(self):
        return self.W @ self.W.T + jnp.diag(positive(self.raw_kappa))


class ICMDecomposition(NamedTuple):
    Qx: jnp.ndarray
    lam_x: jnp.ndarray
    Qb: jnp.ndarray
    lam_b: jnp.ndarray
    Ytil: jnp.ndarray  # Qxᵀ Y Qb
    weights: jnp.ndarray  # (N, P): λx λb + σ²


def decompose(model: ICMGPR, X, Y) -> ICMDecomposition:
    Kx = model.kernel.K(X)
    # safe_eigh: B has p − rank exactly-tied eigenvalues at the uniform-κ
    # init and Kx is near-rank-deficient for long lengthscales; the plain
    # eigh VJP is NaN at such (near-)degeneracies (ops/linalg.safe_eigh).
    lam_x, Qx = safe_eigh(Kx + EIG_JITTER * jnp.eye(Kx.shape[0], dtype=Kx.dtype))
    lam_b, Qb = safe_eigh(model.B)
    Ytil = Qx.T @ Y @ Qb
    weights = lam_x[:, None] * lam_b[None, :] + model.likelihood.variance
    return ICMDecomposition(Qx, lam_x, Qb, lam_b, Ytil, weights)


def neg_log_marginal_likelihood(model: ICMGPR, X, Y):
    dec = decompose(model, X, Y)
    n, p = Y.shape
    quad = jnp.sum(dec.Ytil**2 / dec.weights)
    logdet = jnp.sum(jnp.log(dec.weights))
    return 0.5 * quad + 0.5 * logdet + 0.5 * n * p * jnp.log(2.0 * jnp.pi)


def neg_log_marginal_likelihood_chol(model: ICMGPR, X, Y):
    """Same NLL without eigh(Kx): with B = E Λb Eᵀ (p×p, cheap) the ICM Gram
    block-diagonalizes over B's eigenbasis,

        NLL = Σ_i [ ½ ỹ_iᵀ (λb_i Kx + σ²I)⁻¹ ỹ_i
                    + ½ log|λb_i Kx + σ²I| ] + NP/2 log 2π,   Ỹ = Y E,

    i.e. P independent shifted-GPR NLLs sharing one kernel build — a (P, N,
    N) batched Cholesky routed through the same Pallas dispatch tiers as GPR
    restart training. This is the NUTS log-density path: TPU's eigh is an
    iterative serial factorization whose cost (and vjp) dominated every
    leapfrog at the 20-asset shape (the `eigh(Kx)` variant crashed the
    remote worker outright at N=261, P=20, 300 NUTS iterations), while the
    batched-Cholesky form is the fused/blocked tier's home shape.
    Differentiates through eigh(B) exactly like `decompose` does."""
    from portfoliooptgp_tpu.kernels import stationary as st_kernels
    from portfoliooptgp_tpu.ops.pallas import blocked_nll as blocked_mod
    from portfoliooptgp_tpu.ops.pallas import nll as nll_mod
    from portfoliooptgp_tpu.ops.pallas import stationary_nll as st_mod

    n, p = Y.shape
    lam_b, E = safe_eigh(model.B)
    err = (Y @ E).T  # (P, N): per-output residuals in B's eigenbasis
    noise = jnp.broadcast_to(model.likelihood.variance, (p,))

    # Pallas tiers require float32 end to end, like gpr.nll_tier: with
    # jax_enable_x64 (the CPU parity mode) or f64-promoted params, fall
    # through to the vmapped XLA path at the bottom instead of handing
    # Mosaic an f64 kernel.
    f32 = (X.dtype == jnp.float32
           and all(jnp.asarray(l).dtype == jnp.float32
                   for l in jax.tree.leaves(model)))

    # fused fast path: for a bare isotropic stationary base kernel the P
    # shifted problems ARE a fused-tier batch — shared d2 matrix, per-model
    # variance λb_i·v (λ scaling is a variance tweak), shared lengthscale.
    # K never hits HBM; this is the same kernel the GPR restart batch uses.
    # rq excluded: batched_nll_stationary has no alpha slot (the GPR spec
    # path threads it; here the dense tiers below handle rq correctly)
    fam = st_kernels.FUSED_FAMILY_OF.get(type(model.kernel))
    fam = None if fam == "rq" else fam
    if (f32 and fam is not None
            and jnp.ndim(model.kernel.raw_lengthscales) == 0
            and n + ((-n) % 128) <= st_mod.MAX_FUSED_N):
        Xs = model.kernel.slice_x(X)
        d2 = st_kernels.scaled_squared_distance(
            Xs, Xs, jnp.ones((), Xs.dtype))
        v = lam_b * model.kernel.variance
        ell = jnp.broadcast_to(model.kernel.lengthscales, (p,))
        losses = st_mod.batched_nll_stationary(d2, err, v, ell, noise, fam)
        return jnp.sum(losses)

    Kx = model.kernel.K(X)  # built ONCE, shared by all P outputs
    Kb = lam_b[:, None, None] * Kx[None]
    if f32 and nll_mod.pallas_nll_supported(n):
        losses = nll_mod.batched_nll(Kb, err, noise)
    elif f32 and blocked_mod.blocked_nll_preferred(n):
        losses = blocked_mod.batched_nll_blocked(Kb, err, noise)
    elif f32 and blocked_mod.hinv_nll_preferred(n, p):
        losses = blocked_mod.batched_nll_hinv(Kb, err, noise)
    else:
        eye = jnp.eye(n, dtype=Kx.dtype)

        def one(K_i, e_i):
            L = jnp.linalg.cholesky(K_i + noise[0] * eye)
            a = jax.scipy.linalg.solve_triangular(L, e_i[:, None], lower=True)
            return (0.5 * jnp.sum(a * a)
                    + jnp.sum(jnp.log(jnp.diagonal(L)))
                    + 0.5 * n * jnp.log(2.0 * jnp.pi))

        losses = jax.vmap(one)(Kb, err)
    return jnp.sum(losses)


def predict_f(model: ICMGPR, X, Y, Xnew):
    """Posterior mean (M, P) and per-output marginal variance (M, P) of the
    latent multi-output process at Xnew."""
    dec = decompose(model, X, Y)
    B = model.B
    Ks = model.kernel.K(X, Xnew)  # (N, M)
    # mean: K*ₓ Ā B with vec-solve Ā = Qx (Ỹ/W) Qbᵀ
    Abar = dec.Qx @ (dec.Ytil / dec.weights) @ dec.Qb.T  # (N, P)
    mean = Ks.T @ Abar @ B

    # marginal variance of output j at x*:
    #   B_jj k(x*,x*) − Σ_{n,i} (u_{ij} v_{n*})² / W_{n,i}
    # with u = Qbᵀ B[:, j], v = Qxᵀ k*
    V = dec.Qx.T @ Ks  # (N, M)
    U = dec.Qb.T @ B  # (P_eig, P_out)
    quad = jnp.einsum("nm,ni,ij->mj", V**2, 1.0 / dec.weights, U**2)
    kdiag = model.kernel.Kdiag(Xnew)  # (M,)
    var = jnp.diag(B)[None, :] * kdiag[:, None] - quad
    return mean, jnp.maximum(var, 0.0)


def predict_y(model: ICMGPR, X, Y, Xnew):
    mean, var = predict_f(model, X, Y, Xnew)
    return model.likelihood.predict_mean_and_var(mean, var)


def posterior_asset_moments(model: ICMGPR, X, Y, Xnew):
    """(mu, Sigma) of the posterior predictive across outputs at the LAST row
    of Xnew — the inputs to mean-variance optimization (mu (P,), Sigma (P,P)
    including cross-asset covariance, which the reference approximates with
    outer(σ,σ)·corr at Portfolio/portfolio.py:137)."""
    dec = decompose(model, X, Y)
    B = model.B
    kstar = model.kernel.K(X, Xnew[-1:])  # (N, 1)
    Abar = dec.Qx @ (dec.Ytil / dec.weights) @ dec.Qb.T
    mu = (kstar.T @ Abar @ B)[0]  # (P,)
    v = dec.Qx.T @ kstar  # (N, 1)
    U = dec.Qb.T @ B  # (P, P)
    # cov[j, k] = B_jk k** − Σ_{n,i} v_n² u_{ij} u_{ik} / W_{n,i}
    s = jnp.einsum("ni,ij,ik->jk", (v**2) / dec.weights, U, U)
    kss = model.kernel.Kdiag(Xnew[-1:])[0]
    Sigma = B * kss - s + model.likelihood.variance * jnp.eye(B.shape[0], dtype=B.dtype)
    return mu, Sigma


def posterior_asset_moments_chol(model: ICMGPR, X, Y, Xnew):
    """`posterior_asset_moments` without eigh(Kx) (see
    `neg_log_marginal_likelihood_chol` for why): in B's eigenbasis each
    eigenpair i needs (λb_i Kx + σ²I)⁻¹ applied to [ỹ_i | k*] — one batched
    (P, N, N) Cholesky with two right-hand sides. Used by the frontier
    pipeline's Bayesian averaging, where this runs vmapped over dozens of
    NUTS draws in a single device execution."""
    n, p = Y.shape
    lam_b, E = safe_eigh(model.B)
    B = model.B
    Kx = model.kernel.K(X)
    kstar = model.kernel.K(X, Xnew[-1:])  # (N, 1)
    Kb = lam_b[:, None, None] * Kx[None] + (
        model.likelihood.variance * jnp.eye(n, dtype=Kx.dtype)[None]
    )
    L = jnp.linalg.cholesky(Kb)  # (P, N, N)
    rhs = jnp.concatenate(
        [(Y @ E).T[:, :, None], jnp.broadcast_to(kstar, (p, n, 1))], axis=2
    )  # (P, N, 2): [ỹ_i | k*]
    sol = jax.scipy.linalg.cho_solve((L, True), rhs)
    a = sol[:, :, 0]  # a_i = (λb_i Kx + σ²I)⁻¹ ỹ_i
    c = jnp.einsum("pn,pn->p", jnp.broadcast_to(kstar[:, 0], (p, n)), sol[:, :, 1])
    # Abar = [a_1 … a_P] Eᵀ  (== Qx (Ỹ/W) Qbᵀ);  mean = k*ᵀ Abar B
    mu = (kstar[:, 0] @ (a.T @ E.T)) @ B
    # s_jk = Σ_i c_i U_ij U_ik with U = Eᵀ B
    U = E.T @ B
    s = jnp.einsum("i,ij,ik->jk", c, U, U)
    kss = model.kernel.Kdiag(Xnew[-1:])[0]
    Sigma = B * kss - s + model.likelihood.variance * jnp.eye(p, dtype=B.dtype)
    return mu, Sigma
