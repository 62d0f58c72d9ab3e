"""On-TPU smoke tier: exercise every NLL dispatch tier + the blocked
N=4096 path + a short SVGP train ON THE REAL CHIP and assert finiteness and
parity vs the XLA fallback (VERDICT r2 item 7).

CI runs the Pallas kernels in CPU interpret mode (tests/conftest.py), so
Mosaic lowering and VMEM-budget regressions are invisible to pytest; this
script is the mechanical on-chip gate. One command, exit-code gated:

    timeout 1800 python tools/smoke_tpu.py        # on the axon/TPU host

Prints one PASS/FAIL line per check and exits non-zero on any failure.
Kept small (B=16, one jit per tier) so it completes in a few minutes
including compiles.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr
    from portfoliooptgp_tpu.train import lbfgs

    if jax.default_backend() == "cpu":
        print("WARNING: no TPU backend — smoke will run interpret-mode "
              "kernels and prove nothing about Mosaic lowering")

    failures = []

    def check(name, fn):
        try:
            fn()
            print(f"PASS {name}")
        except Exception as e:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {e}")

    rng = np.random.default_rng(0)

    def data(n, d=1):
        X = jnp.asarray(np.sort(rng.uniform(0, 30, (n, d)), axis=0)
                        .astype(np.float32))
        Y = jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32))
        return X, Y

    def stack(models):
        return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                            lbfgs.stack_pytrees(models))

    def tier_check(name, models, n, d=1, expect=None, gtol=2e-2):
        def run():
            X, Y = data(n, d)
            s = stack(models)
            tier = gpr.nll_tier(s, X, Y)
            if expect is not None:
                assert tier == expect, f"tier {tier} != {expect}"
            f = jax.jit(lambda m: gpr.batched_neg_log_marginal_likelihood(
                m, X, Y, fast=True))
            r = jax.jit(lambda m: gpr.batched_neg_log_marginal_likelihood(
                m, X, Y, fast=False))
            fast, ref = np.asarray(f(s)), np.asarray(r(s))
            assert np.all(np.isfinite(fast)), "non-finite fast NLL"
            np.testing.assert_allclose(fast, ref, rtol=3e-3)
            gf = jax.jit(jax.grad(lambda m: jnp.sum(
                gpr.batched_neg_log_marginal_likelihood(m, X, Y))))(s)
            gr = jax.jit(jax.grad(lambda m: jnp.sum(
                gpr.batched_neg_log_marginal_likelihood(m, X, Y,
                                                        fast=False))))(s)
            for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
                a, b = np.asarray(a), np.asarray(b)
                assert np.all(np.isfinite(a)), "non-finite fast grad"
                scale = max(np.abs(b).max(), 1.0)
                np.testing.assert_allclose(a / scale, b / scale, atol=gtol)
        check(name, run)

    B = 16
    vs = np.geomspace(0.5, 2.0, B)

    # tier 1: fused_stationary (single isotropic atom, N<=256)
    tier_check(
        "fused_stationary N=256",
        [gpr.GPR.create(km.SquaredExponential.create(float(v), 3.0),
                        noise_variance=0.1) for v in vs],
        256, expect="fused_stationary")

    # tier 2: fused_general_sum (menu entry 5-7 shape)
    tier_check(
        "fused_general_sum N=200",
        [gpr.GPR.create(km.Exponential.create(float(v), 4.0)
                        + km.Linear.create(variance=0.05),
                        noise_variance=0.2) for v in vs],
        200, expect="fused_general_sum", gtol=2e-2)

    # tier 3: fused_general_prod with an ARD atom (dims=(4,))
    tier_check(
        "fused_general_prod ARD D=4 N=192",
        [gpr.GPR.create(
            km.SquaredExponential.create(
                float(v), np.linspace(0.5, 2.0, 4) * float(v)),
            noise_variance=0.1) for v in vs],
        192, d=4, expect="fused_general_prod")

    # tier 4: pallas_dense (unsupported kernel structure, N<=256)
    tier_check(
        "pallas_dense N=224",
        [gpr.GPR.create(
            km.SquaredExponential.create(float(v), 3.0, active_dims=[0])
            * km.Matern32.create(1.0, 5.0, active_dims=[0]),
            noise_variance=0.1) for v in vs],
        224)

    # tier 5: blocked (256 < N <= 1024)
    tier_check(
        "blocked N=512",
        [gpr.GPR.create(km.SquaredExponential.create(float(v), 5.0),
                        noise_variance=0.1) for v in vs[:8]],
        512, expect="blocked", gtol=3e-2)

    # direct blocked path at its N=4096 ceiling (VMEM/Mosaic stress):
    # forward finiteness + logdet parity vs XLA cholesky
    def blocked_4096():
        from portfoliooptgp_tpu.ops.pallas import blocked_nll as bn

        n = 4096
        X, Y = data(n)
        d2 = (X[:, 0][:, None] - X[:, 0][None, :]) ** 2
        K = jnp.exp(-0.5 * d2 / 25.0)[None].repeat(8, 0)
        y = Y[:, 0][None].repeat(8, 0)
        noise = jnp.full((8,), 1e-2, jnp.float32)
        nll = np.asarray(jax.jit(bn.batched_nll_blocked)(K, y, noise))
        assert np.all(np.isfinite(nll)), "non-finite blocked NLL at N=4096"

        def xla(K, y, noise):
            Ks = K + noise[:, None, None] * jnp.eye(n, dtype=K.dtype)
            L = jnp.linalg.cholesky(Ks)
            a = jax.lax.linalg.triangular_solve(
                L, y[:, :, None], left_side=True, lower=True)[:, :, 0]
            return (0.5 * jnp.sum(a * a, -1)
                    + jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
                    + 0.5 * n * jnp.log(2 * jnp.pi))
        ref = np.asarray(jax.jit(xla)(K, y, noise))
        np.testing.assert_allclose(nll, ref, rtol=3e-4)
    check("blocked direct N=4096", blocked_4096)

    # 2-step SVGP train on-chip (guarded-cholesky path + Adam)
    def svgp_train():
        import optax

        from portfoliooptgp_tpu.models import svgp as svgp_mod
        from portfoliooptgp_tpu.parallel import elbo_sharded

        n, m, b = 4096, 64, 512
        X, Y = data(n)
        Z = np.linspace(0, 30, m)[:, None].astype(np.float32)
        model = svgp_mod.SVGP.create(
            km.SquaredExponential.create(1.0, 3.0),
            inducing_points=jnp.asarray(Z))
        model = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), model)
        init_fn, step_fn = elbo_sharded.make_elbo_train_step(
            num_data=n, optimizer=optax.adam(1e-2))
        state = init_fn(model)
        wb = jnp.ones((b,), jnp.float32)

        @jax.jit
        def two_steps(state):
            state, l1 = step_fn(state, X[:b], Y[:b], wb)
            state, l2 = step_fn(state, X[b:2 * b], Y[b:2 * b], wb)
            return l1, l2
        l1, l2 = map(float, two_steps(state))
        assert np.isfinite(l1) and np.isfinite(l2), (l1, l2)
    check("svgp 2-step train", svgp_train)

    print(f"\n{'OK' if not failures else 'FAILED'}: "
          f"{7 - len(failures)}/7 checks passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
