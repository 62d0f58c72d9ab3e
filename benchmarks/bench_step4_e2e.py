"""End-to-end walk-forward (step 4) wall time: batched engine vs the
sequential retrain-per-day loop, on the real TPU chip.

This is the flagship workflow of the reference (Multi-Input_GPR/main.py:
414-456): for each test day i, retrain on rows [:i] and predict row i.
`MultiInputGPR.run_step_4` now routes through
`pipelines.walk_forward.batched_walk_forward` by default; this bench measures
what that buys end-to-end, *including* compilation: the sequential loop
retraces every day (each prefix [:i] is a new shape), the batched engine
compiles one fused batched L-BFGS.

Workload: synthetic daily-return series, N_train=192 history rows, D test
days, composite 2-factor kernel (feature x time, the step-4 shape), single
pinned-noise restart (isFixedLikelihood=True path).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TRAIN = 192
DAYS = 16
MAXITER = 200


def main():
    import jax
    import jax.numpy as jnp

    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr
    from portfoliooptgp_tpu.pipelines.walk_forward import batched_walk_forward
    from portfoliooptgp_tpu.train import trainer

    rng = np.random.default_rng(0)
    n_full = N_TRAIN + DAYS
    dtype = jnp.float32

    # feature column + time column, like _build_inputs' [covariates..., time]
    t = np.arange(n_full, dtype=np.float64)
    feat = np.sin(t / 17.0) + 0.2 * rng.normal(size=n_full)
    X = jnp.asarray(np.column_stack([feat, t]), dtype)
    Y = jnp.asarray(
        (0.6 * np.sin(t / 9.0) + 0.1 * rng.normal(size=n_full))[:, None], dtype
    )

    def make_model(noise_variance):
        kern = km.composite_kernel(2, km.Exponential, km.Exponential)
        return gpr.GPR.create(kern, noise_variance=noise_variance)

    # ---- batched engine (the run_step_4 default) ----
    t0 = time.perf_counter()
    res = batched_walk_forward(
        X, Y, N_TRAIN, make_model,
        restart_noise_inits=(1e-3,), maxiter=MAXITER,
        train_likelihood_variance=False,
    )
    f_mean_b = np.asarray(res.f_mean)
    t_batched = time.perf_counter() - t0

    # ---- sequential reference loop (run_step_4(batched=False) inner) ----
    t0 = time.perf_counter()
    f_mean_s = []
    for i in range(N_TRAIN, n_full):
        m0 = make_model(1e-3)
        tr = trainer.train_model(m0, X[:i], Y[:i], maxiter=MAXITER)
        fm, _ = gpr.predict_f(tr.model, X[:i], Y[:i], X[i : i + 1])
        f_mean_s.append(float(fm[0, 0]))
    t_seq = time.perf_counter() - t0

    err = float(np.max(np.abs(f_mean_b - np.asarray(f_mean_s))))
    print(f"batched walk-forward  D={DAYS}: {t_batched:8.2f} s  ({t_batched/DAYS*1e3:7.1f} ms/day)")
    print(f"sequential loop       D={DAYS}: {t_seq:8.2f} s  ({t_seq/DAYS*1e3:7.1f} ms/day)")
    print(f"speedup: {t_seq / t_batched:.2f}x   max |mean diff| = {err:.2e}")


if __name__ == "__main__":
    main()
