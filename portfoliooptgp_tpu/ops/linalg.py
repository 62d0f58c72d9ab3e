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
    return jnp.linalg.cholesky(add_diag(K, jitter) if jitter else K)


def safe_cholesky(K, ladder=JITTER_LADDER):
    """Cholesky with deterministic jitter escalation.

    Tries each jitter in `ladder` (branchless — all factorizations are computed
    lazily via lax.cond chain) and returns (L, ok). `ok` is False if even the
    largest jitter fails; callers turn that into an +inf loss / masked restart.
    """

    def attempt(jit_val):
        L = cholesky(K, jit_val)
        ok = jnp.all(jnp.isfinite(L))
        return L, ok

    L, ok = attempt(ladder[0])
    for j in ladder[1:]:
        # lax.cond avoids factorizing again once a level succeeded
        L, ok = jax.lax.cond(ok, lambda: (L, ok), lambda jv=j: attempt(jv))
    return L, ok


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
