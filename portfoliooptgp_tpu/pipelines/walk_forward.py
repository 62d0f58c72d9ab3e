"""Batched walk-forward retraining — pad-and-mask over growing prefixes.

The reference's flagship loop retrains a fresh GPR per test day on the data
prefix [:i] (Multi-Input_GPR/main.py:414-456): days × restarts × L-BFGS ×
O(N³), all sequential. Growing-N refits are causally independent given the
prefix (SURVEY.md §2.3 walk-forward parallelism), so here every day becomes a
row of one batched training problem over the FULL padded design matrix:

    K_day = M K Mᵀ + (I − M)        (M = diag of the day's prefix mask)
    y_day = M y

Rows outside the prefix contribute exactly nothing to the NLL: their K rows/
columns are identity and their targets zero, so quad and logdet pick up only
known constants (zero). The whole walk-forward then trains as ONE fused
batched L-BFGS (train/batched_lbfgs.py) and predicts all next-day targets in
one batched solve. Results match the sequential loop exactly up to optimizer
tolerance (tested).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from portfoliooptgp_tpu.models import gpr as gpr_mod
from portfoliooptgp_tpu.models.gpr import GPR
from portfoliooptgp_tpu.ops import linalg
from portfoliooptgp_tpu.train import batched_lbfgs, lbfgs


def masked_system(model: GPR, X, Y, mask):
    """(Ks, err) for the masked prefix at full static shape: rows/cols
    outside the prefix become identity with zero targets."""
    K = model.kernel.K(X)
    m = mask[:, None]
    Km = K * (m * m.T)
    Ks = Km + jnp.diag(mask * model.likelihood.variance + (1.0 - mask))
    err = (Y - model.mean_function(X)) * m
    return Ks, err


def masked_nll(model: GPR, X, Y, mask):
    """NLL over the rows where mask==1, computed at full static shape."""
    Ks, err = masked_system(model, X, Y, mask)
    L = linalg.cholesky(Ks)
    quad = linalg.mahalanobis_from_chol(L, err)
    logdet = linalg.logdet_from_chol(L)
    n_eff = jnp.sum(mask)
    return 0.5 * quad + 0.5 * logdet + 0.5 * n_eff * jnp.log(2.0 * jnp.pi)


def masked_predict_next(model: GPR, X, Y, mask, next_index):
    """Posterior mean/var at row `next_index` given the masked prefix."""
    K = model.kernel.K(X)
    m = mask[:, None]
    Ks = K * (m * m.T) + jnp.diag(mask * model.likelihood.variance + (1.0 - mask))
    err = (Y - model.mean_function(X)) * m
    L = linalg.cholesky(Ks)
    kstar = (K[:, next_index] * mask)[:, None]
    A = linalg.solve_lower(L, kstar)
    alpha = linalg.chol_solve(L, err)
    x_next = jax.lax.dynamic_slice_in_dim(X, next_index, 1, axis=0)
    mean = (kstar[:, 0] @ alpha[:, 0]) + model.mean_function(x_next)[0, 0]
    var = K[next_index, next_index] - jnp.sum(A * A)
    return mean, jnp.maximum(var, 0.0)


class WalkForwardResult(NamedTuple):
    models: GPR  # stacked, one per day
    losses: jnp.ndarray  # (D,)
    f_mean: jnp.ndarray  # (D,) next-day posterior means
    f_var: jnp.ndarray  # (D,) next-day posterior variances


def batched_walk_forward(
    X_full,
    Y_full,
    n_train: int,
    make_model,
    *,
    n_days: Optional[int] = None,
    restart_noise_inits: Sequence[float] = (1e-3,),
    maxiter: int = 200,
    train_likelihood_variance: bool = True,
    warm_start: bool = False,
    warm_maxiter: Optional[int] = None,
    mesh=None,
    mesh_axis: str = "restart",
    **fit_kw,
) -> WalkForwardResult:
    """Train all walk-forward days at once.

    make_model(noise_variance) -> fresh GPR pytree (hyperparameter init).
    Day d (0-based) trains on rows [: n_train + d] and predicts row
    n_train + d. With R restart noise inits the batch is D×R rows and the
    best restart per day is selected by final loss
    (models/model_trainer.py:40-48 semantics).

    warm_start=True (off by default for reference parity) first trains only
    day 0's R restart rows to convergence, then initializes every day's row
    from the matching day-0 optimum and polishes the full D×R batch for
    `warm_maxiter` iterations (default maxiter//4). Growing-prefix refits
    move hyperparameters very little day-to-day, so the polish phase
    typically converges in a handful of iterations — the intentional perf
    improvement flagged in SURVEY.md §5 (checkpoint/resume).
    """
    n_full = X_full.shape[0]
    if n_days is None:
        n_days = n_full - n_train
    D = n_days
    R = len(restart_noise_inits)
    dtype = X_full.dtype

    row = jnp.arange(n_full)
    masks = (row[None, :] < (n_train + jnp.arange(D))[:, None]).astype(dtype)  # (D, n)

    models = [make_model(v) for v in restart_noise_inits]
    stacked_r = lbfgs.stack_pytrees(models)  # leading axis R
    masks_dr = jnp.repeat(masks, R, axis=0)  # (D*R, n)

    frozen = (
        None
        if train_likelihood_variance
        else lbfgs.freeze_leaves(models[0], likelihood=True)
    )

    if warm_start:
        # phase 1: day 0 only (R rows) to convergence on its prefix mask
        masks_r0 = jnp.tile(masks[:1], (R, 1))

        def day0_loss(ms):
            return jax.vmap(lambda m, msk: masked_nll(m, X_full, Y_full, msk))(
                ms, masks_r0
            )

        stacked_r, _ = batched_lbfgs.fit_batched_fused(
            day0_loss, stacked_r, frozen=frozen, maxiter=maxiter, **fit_kw
        )
        maxiter = warm_maxiter if warm_maxiter is not None else max(maxiter // 4, 10)

    # tile to (D*R, ...): day-major so reshape recovers (D, R)
    stacked = jax.tree.map(
        lambda x: jnp.tile(x, (D,) + (1,) * (x.ndim - 1)), stacked_r
    )

    if mesh is not None:
        # shard the D·R row batch over the mesh axis (day×restart rows are
        # independent training problems); jit's sharding propagation carries
        # the placement through the fused L-BFGS steps
        n_shards = mesh.shape[mesh_axis]
        if (D * R) % n_shards:
            raise ValueError(
                f"the '{mesh_axis}' axis size {n_shards} must divide the "
                f"walk-forward batch D*R={D*R}")
        row_sharding = jax.NamedSharding(
            mesh, jax.sharding.PartitionSpec(mesh_axis))
        stacked = jax.tree.map(
            lambda x: jax.device_put(x, row_sharding), stacked)
        masks_dr = jax.device_put(masks_dr, row_sharding)

    from portfoliooptgp_tpu.ops.pallas import blocked_nll as blocked_mod
    from portfoliooptgp_tpu.ops.pallas import nll as nll_mod
    from portfoliooptgp_tpu.ops.pallas import stationary_nll as st_mod

    # the build-in-VMEM fused masked kernel reaches N ≤ MAX_FUSED_N (512);
    # the dense masked Pallas factor only N ≤ 256 (it materializes (B,N,N))
    use_fused = dtype == jnp.float32 and st_mod.fused_nll_supported(n_full)
    use_dense = dtype == jnp.float32 and nll_mod.pallas_nll_supported(n_full)
    n_eff_dr = jnp.sum(masks_dr, axis=1)
    spec_probe = (
        gpr_mod.fused_stationary_spec(stacked, X_full) if use_fused else None
    )

    if spec_probe is not None:
        # fully-fused masked path: the kernel matrix is built in VMEM from
        # the shared per-factor distance blocks and the day's prefix mask —
        # no (B, N, N) masked K is ever materialized in HBM
        def batched_loss(ms):
            spec = gpr_mod.fused_stationary_spec(ms, X_full)
            noise = jax.vmap(lambda m: m.likelihood.variance)(ms)
            err = (
                Y_full[None, :, 0]
                - jax.vmap(lambda m: m.mean_function(X_full))(ms)[:, :, 0]
            ) * masks_dr
            fused = (
                st_mod.batched_nll_stationary_sum
                if spec.combine == "sum"
                else st_mod.batched_nll_stationary_general
            )
            nll = fused(
                spec.families, spec.d2s, err, spec.vs, spec.ls, spec.als,
                noise, masks_dr, dims=spec.dims
            )
            # the kernel's 2π constant uses the full N; restate it for n_eff
            return nll - 0.5 * (n_full - n_eff_dr) * jnp.log(2.0 * jnp.pi)

    elif use_dense:

        def batched_loss(ms):
            Kb, errb = jax.vmap(
                lambda m, msk: masked_system(m, X_full, Y_full, msk)
            )(ms, masks_dr)
            nll = nll_mod.batched_nll(
                Kb, errb[:, :, 0], jnp.zeros((Kb.shape[0],), dtype)
            )
            # the kernel's 2π constant uses the full N; restate it for n_eff
            return nll - 0.5 * (n_full - n_eff_dr) * jnp.log(2.0 * jnp.pi)

    elif dtype == jnp.float32 and (
        blocked_mod.blocked_nll_preferred(n_full)
        or blocked_mod.hinv_nll_preferred(n_full, D * R)
    ):
        # large-N masked rows: the masked system already carries its own
        # diagonal (mask·σ² + (1−mask)), so the blocked tiers run at zero
        # added noise; same tier windows as the gpr dispatch
        tier_fn = (blocked_mod.batched_nll_blocked
                   if blocked_mod.blocked_nll_preferred(n_full)
                   else blocked_mod.batched_nll_hinv)  # gated on D·R above

        def batched_loss(ms):
            Kb, errb = jax.vmap(
                lambda m, msk: masked_system(m, X_full, Y_full, msk)
            )(ms, masks_dr)
            nll = tier_fn(Kb, errb[:, :, 0], jnp.zeros((Kb.shape[0],), dtype))
            return nll - 0.5 * (n_full - n_eff_dr) * jnp.log(2.0 * jnp.pi)

    else:

        def batched_loss(ms):
            return jax.vmap(lambda m, msk: masked_nll(m, X_full, Y_full, msk))(
                ms, masks_dr
            )

    trained, res = batched_lbfgs.fit_batched_fused(
        batched_loss, stacked, frozen=frozen, maxiter=maxiter, **fit_kw
    )

    losses = jnp.where(jnp.isfinite(res.loss), res.loss, jnp.inf).reshape(D, R)
    best_r = jnp.argmin(losses, axis=1)  # (D,)
    flat_idx = jnp.arange(D) * R + best_r
    best_models = jax.tree.map(lambda x: x[flat_idx], trained)

    next_idx = n_train + jnp.arange(D)
    f_mean, f_var = jax.vmap(
        lambda m, msk, ni: masked_predict_next(m, X_full, Y_full, msk, ni)
    )(best_models, masks, next_idx)

    return WalkForwardResult(
        models=best_models,
        losses=jnp.min(losses, axis=1),
        f_mean=f_mean,
        f_var=f_var,
    )
