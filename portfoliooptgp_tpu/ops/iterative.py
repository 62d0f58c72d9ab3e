"""Matrix-free GPR inference: conjugate gradients + stochastic Lanczos
quadrature (the BBMM recipe — PAPERS.md: Gardner et al. 2018, "GPyTorch:
Blackbox Matrix-Matrix Gaussian Process Inference").

For N beyond direct-factorization budgets, the NLL's two expensive pieces
become iterative and matmul-dominated (MXU-friendly):

    quad   = yᵀ Ks⁻¹ y            via batched CG solves
    logdet ≈ (N/P) Σ_p ‖z_p‖ e₁ᵀ log(T_p) e₁   via m-step Lanczos on
             Rademacher probes z_p (SLQ)

Gradients use the standard stochastic trace identity
    d logdet/dθ = tr(Ks⁻¹ dKs/dθ) ≈ mean_p (Ks⁻¹ z_p)ᵀ (dKs/dθ) z_p
wired through a custom VJP whose solves are CG again — no O(N³) anywhere,
no N×N factor stored. Estimates are stochastic: accuracy is controlled by
(num_probes, num_lanczos, cg_tol) and documented in the tests. This is an
opt-in large-N path; the exact paths (dense / Pallas / distributed
Cholesky) remain the defaults.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

LOG2PI = 1.8378770664093453


def batched_cg(matvec: Callable, B_rhs, *, tol: float = 1e-8, maxiter: int = 256):
    """Solve A X = B for SPD A with multiple right-hand sides.

    matvec: (N, R) -> (N, R) applying A column-wise; B_rhs: (N, R).
    Per-column scalars, one fused while_loop; columns that converge stop
    contributing updates (their alpha is zeroed). Plain CG is exactly
    `batched_pcg` with the identity preconditioner (z = r, ⟨r, z⟩ = ‖r‖²) —
    one loop, one convergence/guard policy for both paths.
    """
    return batched_pcg(matvec, lambda V: V, B_rhs, tol=tol, maxiter=maxiter)


def pivoted_cholesky(K, rank: int, jitter: float = 1e-30):
    """Partial pivoted Cholesky K ≈ L Lᵀ with L (N, rank) — the GPyTorch
    preconditioner recipe (PAPERS.md: Gardner et al. 2018, §3.2). Greedy:
    each step pivots on the largest remaining diagonal and eliminates one
    column; O(N·rank) per step, O(N·rank²) total. Runs inside the nll_cg
    custom-VJP forward, so it is never differentiated."""
    n = K.shape[0]

    def step(carry, i):
        L, d = carry
        piv = jnp.argmax(d)
        val = jnp.sqrt(jnp.maximum(d[piv], jitter))
        # precision pinned: a single-bf16-pass projection degrades the
        # factor enough that the whitened spectrum stops clustering and the
        # split-SLQ logdet loses its accuracy (same class of failure as the
        # CG/Lanczos and natgrad fixes)
        proj = jnp.matmul(L, L[piv], precision=jax.lax.Precision.HIGHEST)
        col = (jnp.take(K, piv, axis=1) - proj) / val
        L = L.at[:, i].set(col)
        d = jnp.maximum(d - col * col, 0.0)
        return (L, d), None

    L0 = jnp.zeros((n, rank), K.dtype)
    (L, _), _ = jax.lax.scan(step, (L0, jnp.diagonal(K)), jnp.arange(rank))
    return L


def woodbury_preconditioner(L, noise):
    """apply(V) ≈ (L Lᵀ + σ²I)⁻¹ V via Woodbury: one k×k Cholesky up front,
    then two skinny matmuls per application. L: (N, k), noise: scalar σ²."""
    k = L.shape[1]
    M = noise * jnp.eye(k, dtype=L.dtype) + jnp.matmul(
        L.T, L, precision=jax.lax.Precision.HIGHEST
    )
    Mc = jnp.linalg.cholesky(M)

    def apply(V):
        t = jnp.matmul(L.T, V, precision=jax.lax.Precision.HIGHEST)
        t = jax.scipy.linalg.cho_solve((Mc, True), t)
        return (V - jnp.matmul(L, t, precision=jax.lax.Precision.HIGHEST)) / noise

    return apply


def split_preconditioner(L, noise):
    """For P = L Lᵀ + σ²I, return (apply_P_inv_half, logdet_P) where
    apply_P_inv_half(V) = P^(-1/2) V and logdet_P is EXACT.

    Basis: W = L U diag(d^(-1/2)) with (d, U) = eigh(LᵀL) has orthonormal
    columns spanning range(L), so P = W diag(σ²+d) Wᵀ + σ²(I − W Wᵀ) and

        P^(-1/2) v = v/σ + W (diag((σ²+d)^(-1/2)) − I/σ) Wᵀ v
        log|P|     = Σ_active log(σ²+d_i) + (N − k_active) log σ²

    Numerically-dependent pivoted-Cholesky columns (d_i below a relative
    floor) are dropped from both the basis and the logdet sum — they fold
    into the σ² subspace, keeping the split exact. Enables the split-SLQ
    logdet: log|Ks| = log|P| + log|P^(-1/2) Ks P^(-1/2)|, where the
    whitened operator's clustered spectrum needs far fewer Lanczos steps."""
    n, k = L.shape
    hi = jax.lax.Precision.HIGHEST
    G = jnp.matmul(L.T, L, precision=hi)
    d, U = jnp.linalg.eigh(G)
    active = d > jnp.maximum(jnp.max(d), 1e-30) * 1e-6
    d_safe = jnp.where(active, d, 1.0)
    W = jnp.matmul(L, (U / jnp.sqrt(d_safe)[None, :]) * active[None, :],
                   precision=hi)
    inv_sigma = 1.0 / jnp.sqrt(noise)
    scale = jnp.where(active, 1.0 / jnp.sqrt(noise + d_safe) - inv_sigma, 0.0)

    def apply(V):
        t = jnp.matmul(W.T, V, precision=hi)
        return inv_sigma * V + jnp.matmul(W, scale[:, None] * t, precision=hi)

    k_active = jnp.sum(active)
    logdet_P = (jnp.sum(jnp.where(active, jnp.log(noise + d_safe), 0.0))
                + (n - k_active) * jnp.log(noise))
    return apply, logdet_P


def batched_pcg(matvec: Callable, prec: Callable, B_rhs, *, tol: float = 1e-8,
                maxiter: int = 256):
    """Preconditioned CG, same contract as `batched_cg` (per-column
    convergence on the UNpreconditioned residual, so tol means the same
    thing with and without preconditioning)."""
    b_norm2 = jnp.sum(B_rhs * B_rhs, axis=0)  # (R,)
    stop2 = (tol * tol) * jnp.maximum(b_norm2, 1e-30)

    def cond(state):
        x, r, z, p, rz, it = state
        rs = jnp.sum(r * r, axis=0)
        return (it < maxiter) & jnp.any(rs > stop2)

    def body(state):
        x, r, z, p, rz, it = state
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap, axis=0)
        active = jnp.sum(r * r, axis=0) > stop2
        alpha = jnp.where(active, rz / jnp.where(pAp > 0, pAp, 1.0), 0.0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * Ap
        z = prec(r)
        rz_new = jnp.sum(r * z, axis=0)
        beta = jnp.where(active, rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        p = z + beta[None, :] * p
        return x, r, z, p, rz_new, it + 1

    x0 = jnp.zeros_like(B_rhs)
    z0 = prec(B_rhs)
    state = (x0, B_rhs, z0, z0, jnp.sum(B_rhs * z0, axis=0), jnp.asarray(0))
    x, r, z, p, rz, it = jax.lax.while_loop(cond, body, state)
    return x, it


def lanczos_logdet(matvec: Callable, n: int, key, *, num_probes: int = 16,
                   num_lanczos: int = 32, dtype=jnp.float32):
    """SLQ estimate of log|A| for SPD A (size n) via `matvec` on (n, P)."""
    Z = jnp.where(
        jax.random.bernoulli(key, 0.5, (n, num_probes)), 1.0, -1.0
    ).astype(dtype)

    m = num_lanczos

    def lanczos(z):
        q0 = z / jnp.linalg.norm(z)

        def step(carry, _):
            q_prev, q, beta_prev = carry
            Aq = matvec(q[:, None])[:, 0]
            alpha = q @ Aq
            w = Aq - alpha * q - beta_prev * q_prev
            # one re-orthogonalization pass against the two stored vectors
            w = w - (w @ q) * q - (w @ q_prev) * q_prev
            beta = jnp.linalg.norm(w)
            q_next = w / jnp.where(beta > 1e-12, beta, 1.0)
            return (q, q_next, beta), (alpha, beta)

        (_, _, _), (alphas, betas) = jax.lax.scan(
            step, (jnp.zeros_like(q0), q0, jnp.asarray(0.0, dtype)), None, length=m
        )
        T = (
            jnp.diag(alphas)
            + jnp.diag(betas[:-1], 1)
            + jnp.diag(betas[:-1], -1)
        )
        evals, evecs = jnp.linalg.eigh(T)
        evals = jnp.maximum(evals, 1e-12)
        weights = evecs[0, :] ** 2
        return jnp.sum(weights * jnp.log(evals)) * (z @ z)

    estimates = jax.vmap(lanczos, in_axes=1)(Z)
    return jnp.mean(estimates)


class CGNLLAux(NamedTuple):
    alpha: jnp.ndarray
    probes: jnp.ndarray
    probe_solves: jnp.ndarray
    cg_iters: jnp.ndarray


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def nll_cg(K, y, noise, key, num_probes=16, num_lanczos=32, cg_tol=1e-6,
           precond_rank=0):
    """Matrix-free GPR NLL. K: (N, N); y: (N, 1); noise: scalar σ².
    Stochastic in logdet (SLQ); quad term is CG-exact to cg_tol.
    precond_rank > 0 enables the rank-k pivoted-Cholesky Woodbury
    preconditioner on the CG solves (identical solution, fewer K streams —
    the preconditioner does not change what the iteration converges to)."""
    nll, _ = _nll_cg_fwd_impl(K, y, noise, key, num_probes, num_lanczos,
                              cg_tol, precond_rank)
    return nll


def _nll_cg_fwd_impl(K, y, noise, key, num_probes, num_lanczos, cg_tol,
                     precond_rank=0):
    n = K.shape[0]
    dtype = K.dtype

    def matvec(V):
        # precision pinned: the TPU-default single-bf16-pass matmul injects
        # ~1e-2 relative noise into the CG/Lanczos recurrences (measured: 7%
        # error on hyperparameter gradients vs <2% at full f32); the matvec
        # is HBM-bound at large N, so the extra MXU passes are free
        return jnp.matmul(K, V, precision=jax.lax.Precision.HIGHEST) + noise * V

    # ONE batched solve for [y | probes]: every CG iteration streams the
    # (N, N) operand from HBM exactly once regardless of the number of
    # right-hand sides, so folding the backward's trace probes into the
    # target solve halves the bandwidth cost of the whole forward (the
    # matvec is HBM-bound at large N — K is ~480 MB at the full-AAPL scale)
    probes = jnp.where(
        jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5, (n, num_probes)),
        1.0, -1.0,
    ).astype(dtype)
    rhs = jnp.concatenate([y, probes], axis=1)  # (N, 1 + P)
    if precond_rank and precond_rank > 0:
        Lpc = pivoted_cholesky(K, precond_rank)
        prec = woodbury_preconditioner(Lpc, noise)
        sol, iters = batched_pcg(matvec, prec, rhs, tol=cg_tol, maxiter=4 * n)
    else:
        sol, iters = batched_cg(matvec, rhs, tol=cg_tol, maxiter=4 * n)
    alpha, solves = sol[:, :1], sol[:, 1:]
    quad = jnp.sum(y * alpha)
    if precond_rank and precond_rank > 0:
        # split-SLQ: log|Ks| = log|P| (exact) + log|P^-1/2 Ks P^-1/2| (SLQ
        # on the whitened operator, whose spectrum clusters at 1 — both the
        # Lanczos convergence and the probe variance improve by the same
        # mechanism that cut the CG iterations)
        phalf_inv, logdet_P = split_preconditioner(Lpc, noise)

        def matvec_white(V):
            return phalf_inv(matvec(phalf_inv(V)))

        logdet = logdet_P + lanczos_logdet(
            matvec_white, n, key, num_probes=num_probes,
            num_lanczos=num_lanczos, dtype=dtype
        )
    else:
        logdet = lanczos_logdet(
            matvec, n, key, num_probes=num_probes, num_lanczos=num_lanczos,
            dtype=dtype
        )
    nll = 0.5 * quad + 0.5 * logdet + 0.5 * n * LOG2PI
    aux = CGNLLAux(alpha=alpha, probes=probes, probe_solves=solves, cg_iters=iters)
    return nll, aux


def _nll_cg_fwd(K, y, noise, key, num_probes, num_lanczos, cg_tol,
                precond_rank):
    nll, aux = _nll_cg_fwd_impl(K, y, noise, key, num_probes, num_lanczos,
                                cg_tol, precond_rank)
    return nll, aux


def _nll_cg_bwd(num_probes, num_lanczos, cg_tol, precond_rank, aux, g):
    alpha, Z, S = aux.alpha, aux.probes, aux.probe_solves
    P = Z.shape[1]
    # d logdet/dK ≈ mean_p s_p z_pᵀ (symmetrized); d quad/dK = −α αᵀ
    trace_est = 0.5 * (S @ Z.T + Z @ S.T) / P
    dK = g * 0.5 * (trace_est - alpha @ alpha.T)
    dy = g * alpha
    dnoise = g * 0.5 * (jnp.trace(trace_est) - jnp.sum(alpha * alpha))
    return dK, dy, dnoise, None  # no cotangent for the PRNG key


nll_cg.defvjp(_nll_cg_fwd, _nll_cg_bwd)
