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

import logging
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
                                   num_lanczos: int = 32, cg_tol: float = 1e-4,
                                   precond_rank: int = 0):
    """Matrix-free NLL for large N (CG quad + SLQ log-det, ops/iterative.py).

    Stochastic in the log-det; use for N beyond direct-factorization budgets
    with Adam-style optimizers that average gradient noise. This is the
    RECOMMENDED path past the hinv window (padded N > 4096, where the exact
    dispatch in `batched_neg_log_marginal_likelihood` hands off to XLA).
    Measured round 5 at the reference's full-AAPL N=10,963 (B=1, f32,
    cg_tol=1e-4, benchmarks/bench_cg_large.py) vs 350.7 ms/iter for the
    dense XLA value+grad:

    - unpreconditioned (124 CG iters, 32 Lanczos): 116.1 ms/iter (3.0×),
      |ΔNLL|/NLL = 2.7e-5;
    - `precond_rank=512`, `num_lanczos=8` (RECOMMENDED at this scale):
      3 PCG iters, **38.0 ms/iter (9.2×)**, |ΔNLL|/NLL = 2.4e-6 — the
      rank-k pivoted-Cholesky preconditioner both collapses the CG
      iteration count and, via the exact split log-det
      (ops/iterative.split_preconditioner), shrinks the SLQ estimator's
      error an order of magnitude at a quarter of the Lanczos steps.

    Gradient noise is unchanged by preconditioning (same probe-trace
    estimator): 7e-6 on the noise gradient, 0.7–3.8% stochastic error on
    kernel hyperparameter gradients at the default 16 probes. It stays OUT
    of the exact dispatch because its log-det and gradients are estimators,
    not values — callers opt in explicitly."""
    from portfoliooptgp_tpu.ops import iterative

    K = model.kernel.K(X)
    err = Y - model.mean_function(X)
    return iterative.nll_cg(
        K, err, model.likelihood.variance, key, num_probes, num_lanczos,
        cg_tol, precond_rank
    )


class FusedSpec(NamedTuple):
    """Operands of the fused build-in-VMEM Pallas NLL paths: J factor
    'atoms' combined by `combine` ('prod'|'sum'). `dims[j]` is atom j's
    count of shared (N, N) matrices — 1 for isotropic atoms, D for ARD
    atoms with per-dim lengthscales (the φ argument is Σ_d d2_d/ℓ_d²).
    d2s/ls are atom-major flat (Σ dims entries); vs/als are per-atom (see
    ops/pallas/stationary_nll.batched_nll_stationary_general)."""

    combine: str
    families: tuple
    dims: tuple
    d2s: tuple
    vs: tuple
    ls: tuple
    als: tuple


def fused_stationary_spec(stacked_model, X):
    """Eligibility + operands for the fused stationary Pallas NLL paths.

    Returns a FusedSpec, or None if the kernel is not built from supported
    atoms. Supported atoms (each a pointwise function of one batch-shared
    matrix plus per-model scalars):
    - isotropic stationary kernels with scalar lengthscale (SE, Matern12/32/
      52, RationalQuadratic), on any active_dims slice;
    - Periodic(SquaredExponential) on a 1-d slice (menu entries 6-7,
      GPR/main.py:110-111): shared matrix is the squared distance, the ls
      slot carries the period, the als slot the base lengthscale;
    - Linear (menu entry 6, GPR/main.py:110): shared matrix is the raw Gram
      ⟨x, x'⟩.
    Combinations: a single atom, a full-dim Sum of atoms (menu entries 5-7,
    GPR/main.py:109-112), or a full-dim Product of atoms (the multi-input
    composite, Multi-Input_GPR/main.py:118-135).
    """
    import jax

    from portfoliooptgp_tpu.kernels import stationary as st_kernels
    from portfoliooptgp_tpu.kernels.base import Product, Sum
    from portfoliooptgp_tpu.kernels.linear import Linear
    from portfoliooptgp_tpu.kernels.periodic import Periodic

    FAMILY_OF = st_kernels.FUSED_FAMILY_OF

    one = jnp.ones((), X.dtype)

    def atom(t, get):
        """Spec of one atom `t` (stacked pytree) with accessor `get`, or
        None if unsupported. Returns (family, [matrices], v, [ls], al) —
        one matrix/ls pair for isotropic atoms, one per feature dim for
        ARD atoms (stacked raw_lengthscales of ndim 2, i.e. (B, D))."""
        fam = FAMILY_OF.get(type(t))
        Xs = t.slice_x(X)
        if fam is not None and jnp.ndim(t.raw_lengthscales) == 1:
            d2 = st_kernels.scaled_squared_distance(Xs, Xs, one)
            v = jax.vmap(lambda m: get(m).variance)(stacked_model)
            ell = jax.vmap(lambda m: get(m).lengthscales)(stacked_model)
            if fam == "rq":
                al = jax.vmap(lambda m: get(m).alpha)(stacked_model)
            else:
                al = jnp.ones_like(v)
            return fam, [d2], v, [ell], al
        if (fam is not None
                and jnp.ndim(t.raw_lengthscales) == 2
                and t.raw_lengthscales.shape[1] == Xs.shape[1]
                and Xs.shape[1] <= 8):
            # ARD: per-dim lengthscales (B, D); the fused kernel builds
            # u = Σ_d d2_d/ℓ_d² from D shared per-dim distance matrices
            # (D ≤ 8 keeps them within the VMEM budget). Restores the
            # fused tier for the multi-input composite with ARD enabled
            # (Multi-Input_GPR/main.py:118-135).
            D = Xs.shape[1]
            v = jax.vmap(lambda m: get(m).variance)(stacked_model)
            ells = jax.vmap(lambda m: get(m).lengthscales)(stacked_model)
            d2s = [
                st_kernels.scaled_squared_distance(Xs[:, d:d + 1],
                                                   Xs[:, d:d + 1], one)
                for d in range(D)
            ]
            if fam == "rq":
                al = jax.vmap(lambda m: get(m).alpha)(stacked_model)
            else:
                al = jnp.ones_like(v)
            return fam, d2s, v, [ells[:, d] for d in range(D)], al
        if (isinstance(t, Periodic)
                and isinstance(t.base, st_kernels.SquaredExponential)
                and Xs.shape[1] == 1
                and jnp.ndim(t.base.raw_lengthscales) == 1
                and jnp.ndim(t.raw_period) == 1):
            # exact pairwise form, NOT the expanded xx+yy-2xy: the kernel
            # recovers |x-x'| as √d2 inside sin(π√u), and the expanded
            # form's f32 cancellation (~|x|²ε absolute) is amplified by the
            # oscillatory φ' into O(1) gradient error at menu-scale inputs
            diff = Xs[:, 0][:, None] - Xs[:, 0][None, :]
            d2 = diff * diff
            v = jax.vmap(lambda m: get(m).base.variance)(stacked_model)
            per = jax.vmap(lambda m: get(m).period)(stacked_model)
            bl = jax.vmap(lambda m: get(m).base.lengthscales)(stacked_model)
            return "periodic_se", [d2], v, [per], bl
        if isinstance(t, Linear):
            P = Xs @ Xs.T
            v = jax.vmap(lambda m: get(m).variance)(stacked_model)
            on = jnp.ones_like(v)
            return "linear", [P], v, [on], on
        return None

    kern = stacked_model.kernel
    a0 = atom(kern, lambda m: m.kernel)
    if a0 is not None:
        atoms, combine = [a0], "prod"
    elif (isinstance(kern, (Sum, Product))
          and getattr(kern, "active_dims", None) is None):
        combine = "sum" if isinstance(kern, Sum) else "prod"
        atoms = []
        for j in range(len(kern.terms)):
            aj = atom(kern.terms[j], lambda m, j=j: m.kernel.terms[j])
            if aj is None:
                return None
            atoms.append(aj)
    else:
        return None
    fams, d2_lists, vs, ell_lists, als = zip(*atoms)
    dims = tuple(len(ds) for ds in d2_lists)
    d2s_flat = tuple(d for ds in d2_lists for d in ds)
    ells_flat = tuple(l for ls in ell_lists for l in ls)
    return FusedSpec(combine, tuple(fams), dims, d2s_flat, tuple(vs),
                     ells_flat, tuple(als))


_dispatch_logger = logging.getLogger("portfoliooptgp_tpu.dispatch")

#: Trace-time record of NLL dispatch decisions: dicts with tier/N/B. Each
#: jit-compiled shape appends once (at trace time), so this reports which
#: tier every distinct training configuration actually used — the
#: observability VERDICT r1 asked for on the fused-path eligibility cliffs.
DISPATCH_EVENTS: list = []


def _record_tier(tier: str, n: int, b: int) -> None:
    DISPATCH_EVENTS.append({"tier": tier, "n": int(n), "batch": int(b)})
    if len(DISPATCH_EVENTS) > 512:
        del DISPATCH_EVENTS[:256]
    _dispatch_logger.info("batched NLL dispatch: tier=%s N=%d B=%d", tier, n, b)


def nll_tier(stacked_model, X, Y, fast: bool = True) -> str:
    """The dispatch tier `batched_neg_log_marginal_likelihood` would take:
    'fused_stationary' | 'fused_general_prod' | 'fused_general_sum' |
    'pallas_dense' | 'blocked' | 'blocked_hinv' | 'xla'. Pure metadata —
    nothing is computed."""
    import jax

    from portfoliooptgp_tpu.ops.pallas import blocked_nll as blocked_mod
    from portfoliooptgp_tpu.ops.pallas import nll as nll_mod
    from portfoliooptgp_tpu.ops.pallas import stationary_nll as st_mod

    n = X.shape[0]
    leaves = jax.tree.leaves(stacked_model)
    b = int(jnp.shape(leaves[0])[0])
    params_f32 = all(jnp.asarray(l).dtype == jnp.float32 for l in leaves)
    if not (
        fast
        and X.dtype == jnp.float32
        and params_f32
        and Y.shape[1] == 1
        and (st_mod.fused_nll_supported(n)
             or blocked_mod.blocked_nll_preferred(n)
             or blocked_mod.hinv_nll_preferred(n, b))
    ):
        return "xla"
    spec = fused_stationary_spec(stacked_model, X)
    if spec is not None and st_mod.fused_nll_supported(n):
        if (len(spec.families) == 1 and spec.families[0] in st_mod.FAMILIES
                and spec.dims == (1,)):
            return "fused_stationary"
        return f"fused_general_{spec.combine}"
    if nll_mod.pallas_nll_supported(n):
        return "pallas_dense"
    if blocked_mod.blocked_nll_preferred(n):
        return "blocked"
    return "blocked_hinv"


def batched_neg_log_marginal_likelihood(stacked_model, X, Y, fast: bool = True):
    """NLL for a stacked batch of models sharing (X, Y) — the vmapped-restart
    primitive. With `fast=True` and float32 inputs the batch is routed by
    kernel structure and N:
    - supported kernel atoms (see `fused_stationary_spec`) and N ≤ 512 →
      fully-fused build-in-VMEM Pallas kernel (K never materialized in HBM;
      N > 256 lowers with batch tile ≤ 16, stationary_nll.MAX_FUSED_N);
    - other kernels, N ≤ 256 → dense (B,N,N) K + in-VMEM Pallas factor
      (ops/pallas/nll.py);
    - 256 < N ≤ 1024 (fused-ineligible kernels) → blocked Pallas-panel +
      MXU-syrk Cholesky
      (ops/pallas/blocked_nll.py; wins vs XLA only up to this N — see
      blocked_nll.BLOCKED_PREFERRED_N);
    - 1024 < N ≤ 4096 → XLA Cholesky + hierarchical MXU triangular inverse
      with an all-matmul backward (blocked_nll.batched_nll_hinv);
    - otherwise the vmapped XLA path. Past this window the matrix-free
      CG+SLQ tier (`neg_log_marginal_likelihood_cg`) measures 3.0× faster
      than XLA at N=10,963 but is stochastic in the log-det, so it is
      opt-in rather than dispatched (see its docstring for the measured
      accuracy budget).
    All tiers share the same custom-VJP contract, return (B,) losses, and
    record their dispatch decision in `DISPATCH_EVENTS` at trace time."""
    import jax

    from portfoliooptgp_tpu.ops.pallas import blocked_nll as blocked_mod
    from portfoliooptgp_tpu.ops.pallas import nll as nll_mod
    from portfoliooptgp_tpu.ops.pallas import stationary_nll as st_mod

    n = X.shape[0]
    # dispatch and telemetry share one predicate: nll_tier() IS the router;
    # each tier runs under a jax.named_scope so XPlane traces identify it
    tier = nll_tier(stacked_model, X, Y, fast=fast)
    if tier == "xla":
        _record_tier("xla", n, jnp.shape(jax.tree.leaves(stacked_model)[0])[0])
        with jax.named_scope("nll/xla"):
            return jax.vmap(lambda m: neg_log_marginal_likelihood(m, X, Y))(stacked_model)

    noise = jax.vmap(lambda m: m.likelihood.variance)(stacked_model)
    err = Y[None, :, 0] - jax.vmap(lambda m: m.mean_function(X))(stacked_model)[:, :, 0]
    b = err.shape[0]

    # fully-fused path: the kernel is built from supported atoms — K is
    # constructed inside the Pallas kernel from batch-shared (N, N) matrices
    # and per-model scalars, and never materialized in HBM
    if tier in ("fused_stationary", "fused_general_sum", "fused_general_prod"):
        spec = fused_stationary_spec(stacked_model, X)
        if tier == "fused_stationary":
            _record_tier("fused_stationary", n, b)
            with jax.named_scope("nll/fused_stationary"):
                return st_mod.batched_nll_stationary(
                    spec.d2s[0], err, spec.vs[0], spec.ls[0], noise, spec.families[0]
                )
        mask = jnp.ones((b, n), X.dtype)
        if tier == "fused_general_sum":
            _record_tier("fused_general_sum", n, b)
            with jax.named_scope("nll/fused_general_sum"):
                return st_mod.batched_nll_stationary_sum(
                    spec.families, spec.d2s, err, spec.vs, spec.ls, spec.als,
                    noise, mask, dims=spec.dims
                )
        _record_tier("fused_general_prod", n, b)
        with jax.named_scope("nll/fused_general_prod"):
            return st_mod.batched_nll_stationary_general(
                spec.families, spec.d2s, err, spec.vs, spec.ls, spec.als, noise,
                mask, dims=spec.dims
            )

    Kb = jax.vmap(lambda m: m.kernel.K(X))(stacked_model)  # (B, N, N)
    if tier == "pallas_dense":
        _record_tier("pallas_dense", n, b)
        with jax.named_scope("nll/pallas_dense"):
            return nll_mod.batched_nll(Kb, err, noise)
    if tier == "blocked":
        _record_tier("blocked", n, b)
        with jax.named_scope("nll/blocked"):
            return blocked_mod.batched_nll_blocked(Kb, err, noise)
    _record_tier("blocked_hinv", n, b)
    with jax.named_scope("nll/blocked_hinv"):
        return blocked_mod.batched_nll_hinv(Kb, err, noise)
