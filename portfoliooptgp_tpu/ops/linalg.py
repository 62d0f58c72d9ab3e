"""Jitter-stabilized dense linear algebra for GP inference.

The reference delegates `cholesky(K + σ²I)`, triangular solves and log-dets to
TF/Eigen inside GPflow (invoked from GPR/model_trainer.py:18-19). Here they are
first-class, with a deterministic jitter-escalation policy: GPflow's failure
mode for ill-conditioned K is an unhandled InvalidArgumentError; ours is a
masked retry ladder so a bad restart in a vmapped batch yields +inf loss
instead of poisoning the batch (SURVEY.md §5 race/failure policy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_JITTER = 1e-6
JITTER_LADDER = (0.0, 1e-8, 1e-6, 1e-4, 1e-2)


def add_diag(K, value):
    n = K.shape[-1]
    return K + value * jnp.eye(n, dtype=K.dtype)


def cholesky(K, jitter=0.0):
    if isinstance(jitter, (int, float)) and jitter == 0.0:
        return jnp.linalg.cholesky(K)
    return jnp.linalg.cholesky(add_diag(K, jitter))


@jax.custom_vjp
def _cholesky_nan_guarded(K):
    """cholesky(K) whose VJP returns zeros (instead of NaN) when the
    factorization failed. A plain cholesky VJP at a NaN primal produces NaN
    even against a zero cotangent, which poisons `lax.cond` graphs where the
    failed factor sits on the untaken branch."""
    return jnp.linalg.cholesky(K)


def _cng_fwd(K):
    L = jnp.linalg.cholesky(K)
    return L, L


def _cng_bwd(L, Lbar):
    # reverse-mode cholesky (Murray 2016): Kbar = L⁻ᵀ Φ(Lᵀ L̄) L⁻¹ with
    # Φ = tril, diagonal halved; parity with jax.grad(cholesky) is tested
    # in tests/test_gpr.py::test_guarded_cholesky_vjp_matches_autodiff
    ok = jnp.all(jnp.isfinite(L))
    Ls = jnp.where(ok, L, jnp.eye(L.shape[-1], dtype=L.dtype))
    P = jnp.tril(Ls.T @ Lbar)
    P = P - 0.5 * jnp.diag(jnp.diagonal(P))
    Kbar = jax.scipy.linalg.solve_triangular(
        Ls, jax.scipy.linalg.solve_triangular(Ls, P.T, lower=True, trans=1).T,
        lower=True, trans=1,
    )
    Kbar = 0.5 * (Kbar + Kbar.T)  # jax's cholesky VJP symmetrizes; match it
    return (jnp.where(ok, Kbar, 0.0),)


_cholesky_nan_guarded.defvjp(_cng_fwd, _cng_bwd)


def cholesky_guarded(K):
    """One cholesky(K) factorization with the NaN-guarded VJP and a finiteness
    flag. The hot-path alternative to `safe_cholesky`: no jitter escalation,
    no `lax.cond` (a TPU conditional costs ~85µs — 5× the 128×128
    factorization it would guard, measured on v5e). A failed factorization
    yields (NaN L, ok=False) with ZERO gradients instead of NaN gradients, so
    vmapped restart batches mask the loss rather than poisoning the batch.
    Callers (SVGP/SGPR ELBO, batched trainers) already treat non-finite
    losses as masked-out restarts."""
    L = _cholesky_nan_guarded(K)
    return L, jnp.all(jnp.isfinite(jnp.diagonal(L, axis1=-2, axis2=-1)))


def safe_cholesky(K, ladder=JITTER_LADDER):
    """Cholesky with deterministic jitter escalation.

    The needed jitter level is *probed* on a stop-gradient copy of K (failed
    probe factorizations never enter the autodiff graph — a cholesky VJP at a
    NaN primal yields NaN even against a zero cotangent), then ONE
    differentiable factorization runs at the chosen level. Returns (L, ok);
    `ok` is False if even the largest jitter fails, and callers turn that
    into an +inf loss / masked restart instead of a crash (the reference
    dies with an unhandled InvalidArgumentError here).

    Cost: len(ladder)+1 factorizations. For per-step hot paths where the
    base jitter is already adequate, use `cholesky_guarded` (one
    factorization, failure → NaN loss masked upstream)."""
    Kp = jax.lax.stop_gradient(K)
    oks = jnp.stack(
        [jnp.all(jnp.isfinite(cholesky(Kp, j))) for j in ladder]
    )
    # first succeeding level (argmax of ok); if none succeed use the last
    idx = jnp.argmax(oks)
    chosen = jnp.asarray(list(ladder), dtype=K.dtype)[idx]
    L = _cholesky_nan_guarded(add_diag(K, chosen))
    return L, jnp.any(oks)


@jax.custom_vjp
def cholesky_inverse_pair(K):
    """(L, W) = (chol(K), L⁻¹) with an ALL-MATMUL backward.

    On TPU both the Cholesky VJP and the triangular-solve VJP lower to
    serial blocked substitution loops; with W in hand every backward term is
    a dense 128³-class matmul instead:

        from W = L⁻¹:   L̄ += tril(−Wᵀ W̄ Wᵀ)
        chol VJP:       P = Φ(Lᵀ L̄)  (tril, diag halved)
                        K̄ = ½ (Wᵀ P W + (Wᵀ P W)ᵀ)

    Forward failure behaves like `cholesky_guarded`: NaN outputs, zero
    gradients. This is the M-phase primitive of the fused SVGP step
    (models/svgp.gaussian_elbo_gram_fused)."""
    L = jnp.linalg.cholesky(K)
    W = jax.scipy.linalg.solve_triangular(
        L, jnp.eye(L.shape[-1], dtype=L.dtype), lower=True)
    return L, W


def _cip_fwd(K):
    L, W = cholesky_inverse_pair(K)
    return (L, W), (L, W)


def _cip_bwd(res, cots):
    L, W = res
    Lbar, Wbar = cots
    ok = jnp.all(jnp.isfinite(L))
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    Ws = jnp.where(ok, W, eye)
    Ls = jnp.where(ok, L, eye)
    Lbar_tot = Lbar + jnp.tril(-(Ws.T @ Wbar) @ Ws.T)
    P = jnp.tril(Ls.T @ Lbar_tot)
    P = P - 0.5 * jnp.diag(jnp.diagonal(P))
    Kbar = Ws.T @ (P @ Ws)
    Kbar = 0.5 * (Kbar + Kbar.T)
    return (jnp.where(ok, Kbar, 0.0),)


cholesky_inverse_pair.defvjp(_cip_fwd, _cip_bwd)


def solve_lower(L, B):
    """Solve L X = B with L lower-triangular."""
    return jax.scipy.linalg.solve_triangular(L, B, lower=True)


def solve_upper_t(L, B):
    """Solve Lᵀ X = B with L lower-triangular."""
    return jax.scipy.linalg.solve_triangular(L.T, B, lower=False)


def chol_solve(L, B):
    """Solve (L Lᵀ) X = B."""
    return solve_upper_t(L, solve_lower(L, B))


def logdet_from_chol(L):
    """log|K| = 2 Σ log diag(L)."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))


def mahalanobis_from_chol(L, y):
    """yᵀ K⁻¹ y via one triangular solve: ‖L⁻¹y‖²."""
    a = solve_lower(L, y)
    return jnp.sum(a * a)


@jax.custom_vjp
def safe_eigh(A):
    """eigh with a degeneracy-safe VJP.

    The standard eigh pullback contains F_ij = 1/(λ_j − λ_i), which is NaN
    for repeated eigenvalues. For any downstream function that depends on A
    only as a matrix (invariant to basis rotations inside a degenerate
    eigenspace — true of every spectral function: NLLs, log-dets, solves),
    the degenerate contributions cancel analytically; this VJP implements
    that cancellation by zeroing F where |λ_j − λ_i| is below a relative
    threshold. Needed by the ICM model, whose coregionalization matrix
    B = WWᵀ + diag(κ) has p − rank exactly-tied eigenvalues at the uniform-κ
    init (models/icm.py) — plain `jnp.linalg.eigh` gradients are NaN there.
    """
    return jnp.linalg.eigh(A)


def _safe_eigh_fwd(A):
    lam, E = jnp.linalg.eigh(A)
    return (lam, E), (lam, E)


def _safe_eigh_bwd(res, ct):
    lam, E = res
    lam_bar, E_bar = ct
    d = lam[None, :] - lam[:, None]  # d_ij = λ_j − λ_i
    scale = jnp.maximum(jnp.max(jnp.abs(lam)), 1.0)
    eps = 64.0 * jnp.finfo(lam.dtype).eps * scale
    F = jnp.where(jnp.abs(d) > eps, 1.0 / jnp.where(jnp.abs(d) > eps, d, 1.0), 0.0)
    M = F * (E.T @ E_bar)
    Abar = E @ (jnp.diag(lam_bar) + 0.5 * (M + M.T)) @ E.T
    # input is constrained symmetric: symmetrize the cotangent
    return (0.5 * (Abar + Abar.T),)


safe_eigh.defvjp(_safe_eigh_fwd, _safe_eigh_bwd)
