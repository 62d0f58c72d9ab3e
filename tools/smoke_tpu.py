"""On-TPU smoke tier: exercise every NLL dispatch tier + the blocked
N=4096 path + the masked walk-forward fused path + the fused NUTS
log-density pair + a short SVGP train ON THE REAL CHIP and assert
finiteness and parity vs the XLA fallback (VERDICT r2 item 7, r3 item 1).

CI runs the Pallas kernels in CPU interpret mode (tests/conftest.py), so
Mosaic lowering and VMEM-budget regressions are invisible to pytest; this
script is the mechanical on-chip gate. It is ALSO run by bench.py at the
start of every driver round (SMOKE.json artifact at the repo root with
per-check max-abs-err), so a lowering regression in any tier cannot ship
silently behind a still-green headline bench. Standalone:

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


def run_smoke():
    """Run every check; returns (results, backend) where results is a list of
    {"name", "ok", "max_abs_err" | "error"} dicts. max_abs_err is the worst
    normalized |fast − reference| across the check's value AND gradient
    comparisons (already divided by the per-leaf scale the assertion uses)."""
    import jax
    import jax.numpy as jnp

    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr
    from portfoliooptgp_tpu.train import lbfgs

    backend = jax.default_backend()
    if backend == "cpu":
        print("WARNING: no TPU backend — smoke will run interpret-mode "
              "kernels and prove nothing about Mosaic lowering")

    results = []

    def check(name, fn):
        try:
            err = fn()
            results.append({"name": name, "ok": True,
                            "max_abs_err": None if err is None else float(err)})
            print(f"PASS {name}" + ("" if err is None else f" (err {err:.2e})"))
        except Exception as e:  # noqa: BLE001 — report and continue
            results.append({"name": name, "ok": False,
                            "error": f"{type(e).__name__}: {e}"})
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

    def grad_err(gf, gr, gtol):
        """max over leaves of normalized |fast − ref|; asserts within gtol."""
        worst = 0.0
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
            a, b = np.asarray(a), np.asarray(b)
            assert np.all(np.isfinite(a)), "non-finite fast grad"
            scale = max(np.abs(b).max(), 1.0)
            e = np.abs(a - b).max() / scale
            worst = max(worst, float(e))
            np.testing.assert_allclose(a / scale, b / scale, atol=gtol)
        return worst

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
            verr = float(np.abs((fast - ref) / ref).max())
            gf = jax.jit(jax.grad(lambda m: jnp.sum(
                gpr.batched_neg_log_marginal_likelihood(m, X, Y))))(s)
            gr = jax.jit(jax.grad(lambda m: jnp.sum(
                gpr.batched_neg_log_marginal_likelihood(m, X, Y,
                                                        fast=False))))(s)
            return max(verr, grad_err(gf, gr, gtol))
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

    # tier 6: blocked_hinv (1024 < N <= 4096): XLA chol + hierarchical
    # MXU triangular inverse, all-matmul backward
    tier_check(
        "blocked_hinv N=1536",
        [gpr.GPR.create(km.SquaredExponential.create(float(v), 6.0),
                        noise_variance=0.1) for v in vs[:4]],
        1536, expect="blocked_hinv", gtol=3e-2)

    # direct blocked path at its N=4096 ceiling (VMEM/Mosaic stress):
    # forward finiteness + logdet parity vs XLA cholesky
    def blocked_4096():
        import jax.numpy as jnp

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
        return float(np.abs((nll - ref) / ref).max())
    check("blocked direct N=4096", blocked_4096)

    # masked walk-forward fused path: mask-aware fused general NLL equals
    # the dense pad-and-mask system (pipelines/walk_forward.py masked_nll),
    # values AND grads — the primitive behind batched_walk_forward
    def masked_walk_forward():
        import jax.numpy as jnp

        from portfoliooptgp_tpu.ops.pallas import stationary_nll as st
        from portfoliooptgp_tpu.pipelines.walk_forward import masked_nll

        n = 128
        X, Y = data(n)
        s = stack([gpr.GPR.create(km.SquaredExponential.create(float(v), 2.0),
                                  noise_variance=0.1) for v in vs[:8]])
        cuts = np.linspace(64, n, 8).astype(np.int64)
        masks = jnp.asarray(np.arange(n)[None, :] < cuts[:, None], jnp.float32)

        def fused(s):
            sp = gpr.fused_stationary_spec(s, X)
            nz = jax.vmap(lambda m: m.likelihood.variance)(s)
            e = Y[None, :, 0] * masks
            out = st.batched_nll_stationary_general(
                sp.families, sp.d2s, e, sp.vs, sp.ls, sp.als, nz, masks)
            n_eff = jnp.sum(masks, axis=1)
            return out - 0.5 * (n - n_eff) * jnp.log(2.0 * jnp.pi)

        def dense(s):
            return jax.vmap(lambda m, msk: masked_nll(m, X, Y, msk))(s, masks)

        got = np.asarray(jax.jit(fused)(s))
        want = np.asarray(jax.jit(dense)(s))
        assert np.all(np.isfinite(got)), "non-finite masked fused NLL"
        np.testing.assert_allclose(got, want, rtol=2e-3)
        verr = float(np.abs((got - want) / want).max())
        gf = jax.jit(jax.grad(lambda s: jnp.sum(fused(s))))(s)
        gr = jax.jit(jax.grad(lambda s: jnp.sum(dense(s))))(s)
        return max(verr, grad_err(gf, gr, 2e-2))
    check("masked walk-forward fused", masked_walk_forward)

    # fused NUTS log-density: the joint value+grad custom_vmap surface used
    # per leapfrog (inference/fused_logdensity.py) vs dense value_and_grad
    def fused_nuts_logdensity():
        import jax.numpy as jnp

        from portfoliooptgp_tpu.inference.fused_logdensity import (
            gpr_logdensity_vg)

        n, C = 128, 8
        X, Y = data(n)
        m0 = gpr.GPR.create(km.SquaredExponential.create(1.0, 5.0),
                            noise_variance=0.1)
        m0 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), m0)
        ms = jax.tree.map(
            lambda x: jnp.stack([x] * C)
            * jnp.linspace(0.9, 1.1, C).reshape((C,) + (1,) * jnp.ndim(x)),
            m0)
        vg = gpr_logdensity_vg(X, Y)
        dense = jax.value_and_grad(
            lambda m: gpr.log_marginal_likelihood(m, X, Y))
        vv, gv = jax.jit(jax.vmap(vg))(ms)
        vr, gr = jax.jit(jax.vmap(dense))(ms)
        vv, vr = np.asarray(vv), np.asarray(vr)
        assert np.all(np.isfinite(vv)), "non-finite fused logp"
        np.testing.assert_allclose(vv, vr, rtol=3e-3)
        verr = float(np.abs((vv - vr) / vr).max())
        return max(verr, grad_err(gv, gr, 2e-2))
    check("fused NUTS logdensity vg", fused_nuts_logdensity)

    # 2-step SVGP train on-chip (guarded-cholesky path + Adam)
    def svgp_train():
        import jax.numpy as jnp
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

    return results, backend


def main() -> int:
    results, _ = run_smoke()
    failures = [r["name"] for r in results if not r["ok"]]
    total = len(results)
    print(f"\n{'OK' if not failures else 'FAILED'}: "
          f"{total - len(failures)}/{total} checks passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
