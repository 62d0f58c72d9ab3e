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


def safe_cholesky(K, ladder=JITTER_LADDER):
    """Cholesky with deterministic jitter escalation.

    The needed jitter level is *probed* on a stop-gradient copy of K (failed
    probe factorizations never enter the autodiff graph — a cholesky VJP at a
    NaN primal yields NaN even against a zero cotangent), then ONE
    differentiable factorization runs at the chosen level. Returns (L, ok);
    `ok` is False if even the largest jitter fails, and callers turn that
    into an +inf loss / masked restart instead of a crash (the reference
    dies with an unhandled InvalidArgumentError here)."""
    Kp = jax.lax.stop_gradient(K)
    oks = jnp.stack(
        [jnp.all(jnp.isfinite(cholesky(Kp, j))) for j in ladder]
    )
    # first succeeding level (argmax of ok); if none succeed use the last
    idx = jnp.argmax(oks)
    chosen = jnp.asarray(list(ladder), dtype=K.dtype)[idx]
    L = cholesky(K, chosen)
    return L, jnp.any(oks)


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
