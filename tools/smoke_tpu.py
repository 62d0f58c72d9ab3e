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


def run_smoke(only: str | None = None):
    """Run every check; returns (results, backend) where results is a list of
    {"name", "ok", "max_abs_err" | "error"} dicts. max_abs_err is the worst
    normalized |fast − reference| across the check's value AND gradient
    comparisons (already divided by the per-leaf scale the assertion uses).
    `only`: substring filter for iterating on a single check."""
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
        if only is not None and only not in name:
            return
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

    # tier 1b: fused_stationary in the EXTENDED window (256 < N <= 512,
    # b_tile <= 16 — VERDICT r4 item 3); B=8 is the NUTS chain shape
    tier_check(
        "fused_stationary N=512",
        [gpr.GPR.create(km.SquaredExponential.create(float(v), 5.0),
                        noise_variance=0.1) for v in vs[:8]],
        512, expect="fused_stationary", gtol=3e-2)

    # tier 5: blocked (fused-ineligible sizes, 512 < N <= 1024)
    tier_check(
        "blocked N=768",
        [gpr.GPR.create(km.SquaredExponential.create(float(v), 5.0),
                        noise_variance=0.1) for v in vs[:8]],
        768, expect="blocked", gtol=3e-2)

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

    # CG + SLQ matrix-free NLL (ops/iterative.py): value AND hyperparameter
    # gradient vs the dense factorization at N=2048 on a full-AAPL-like
    # posterior (day-index inputs, daily lengthscale). The logdet and its
    # gradients are stochastic (Rademacher trace probes); at P=128 the
    # measured worst-seed error on THIS conditioning is ~5% of the kernel
    # hyperparameter gradients (CPU probe-sweep, round 5: P=64 seeds span
    # ±8%, halved at P=128). Caveat documented here: near-rank-deficient
    # posteriors whose hyperparameter gradients are near zero see large
    # RELATIVE error (the absolute probe noise is what is bounded) — the
    # CG tier is an opt-in large-N path, not a parity path.
    def cg_slq_nll():
        import jax.numpy as jnp

        from portfoliooptgp_tpu.ops import iterative

        n = 2048
        x = jnp.asarray(np.arange(n), jnp.float32)
        d2 = (x[:, None] - x[None, :]) ** 2
        Y = jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32))
        key = jax.random.PRNGKey(7)

        def loss_cg(p):
            v, l, nz = p
            K = v * jnp.exp(-0.5 * d2 / (l * l))
            return iterative.nll_cg(K, Y, nz, key, 128, 48, 1e-6)

        def loss_dense(p):
            v, l, nz = p
            K = v * jnp.exp(-0.5 * d2 / (l * l))
            Ks = K + nz * jnp.eye(n, dtype=K.dtype)
            L = jnp.linalg.cholesky(Ks)
            a = jax.scipy.linalg.solve_triangular(L, Y, lower=True)
            return (0.5 * jnp.sum(a * a) + jnp.sum(jnp.log(jnp.diagonal(L)))
                    + 0.5 * n * jnp.log(2 * jnp.pi))

        p0 = tuple(jnp.asarray(t, jnp.float32) for t in (1.3, 30.0, 0.1))
        (vc, gc) = jax.jit(jax.value_and_grad(loss_cg))(p0)
        (vd, gd) = jax.jit(jax.value_and_grad(loss_dense))(p0)
        vc, vd = float(vc), float(vd)
        assert np.isfinite(vc), "non-finite CG NLL"
        np.testing.assert_allclose(vc, vd, rtol=2e-3)
        gerr = grad_err(gc, gd, 1e-1)
        return max(abs(vc - vd) / abs(vd), gerr)
    check("cg_slq NLL N=2048", cg_slq_nll)

    # preconditioned variant: rank-k pivoted Cholesky + split-SLQ logdet
    # (the recommended large-N call) — guards the pivoted-chol scan,
    # Woodbury PCG, and split_preconditioner lowering on chip
    def pcg_split_slq_nll():
        import jax.numpy as jnp

        from portfoliooptgp_tpu.ops import iterative

        n = 2048
        x = jnp.asarray(np.arange(n), jnp.float32)
        d2 = (x[:, None] - x[None, :]) ** 2
        Y = jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32))
        key = jax.random.PRNGKey(7)

        def loss_pcg(p):
            v, l, nz = p
            K = v * jnp.exp(-0.5 * d2 / (l * l))
            return iterative.nll_cg(K, Y, nz, key, 64, 8, 1e-6, 256)

        def loss_dense(p):
            v, l, nz = p
            K = v * jnp.exp(-0.5 * d2 / (l * l))
            Ks = K + nz * jnp.eye(n, dtype=K.dtype)
            L = jnp.linalg.cholesky(Ks)
            a = jax.scipy.linalg.solve_triangular(L, Y, lower=True)
            return (0.5 * jnp.sum(a * a) + jnp.sum(jnp.log(jnp.diagonal(L)))
                    + 0.5 * n * jnp.log(2 * jnp.pi))

        p0 = tuple(jnp.asarray(t, jnp.float32) for t in (1.3, 30.0, 0.1))
        (vc, gc) = jax.jit(jax.value_and_grad(loss_pcg))(p0)
        (vd, gd) = jax.jit(jax.value_and_grad(loss_dense))(p0)
        vc, vd = float(vc), float(vd)
        assert np.isfinite(vc), "non-finite PCG NLL"
        # split-SLQ is tighter than plain SLQ even at 8 Lanczos steps
        np.testing.assert_allclose(vc, vd, rtol=2e-3)
        gerr = grad_err(gc, gd, 2e-1)  # 64 probes (vs 128 above)
        return max(abs(vc - vd) / abs(vd), gerr)
    check("pcg split-slq NLL N=2048 rank=256", pcg_split_slq_nll)

    # ragged hinv window: the uneven-split hierarchical inverse at N=2560
    # (20 panels -> 16+4, no power-of-two padding) — W L = I on chip
    def uneven_inverse():
        import jax.numpy as jnp

        from portfoliooptgp_tpu.ops.pallas import blocked_nll as bn

        n, b = 2560, 4
        X, _ = data(n)
        x = X[:, 0]
        d2 = (x[:, None] - x[None, :]) ** 2
        ls = jnp.asarray(np.geomspace(3, 10, b), jnp.float32)
        K = jnp.exp(-0.5 * d2[None] / (ls[:, None, None] ** 2))
        Ks = K + 1e-2 * jnp.eye(n, dtype=K.dtype)[None]

        @jax.jit
        def resid(Ks):
            L = jnp.linalg.cholesky(Ks)
            W = bn.triangular_inverse_uneven(L)
            I = jnp.einsum("brk,bkq->brq", W, L,
                           preferred_element_type=W.dtype,
                           precision=jax.lax.Precision.HIGHEST)
            return jnp.max(jnp.abs(I - jnp.eye(n, dtype=W.dtype)[None]))
        err = float(np.asarray(resid(Ks)))
        assert err < 5e-3, f"uneven inverse residual {err}"
        return err
    check("triangular_inverse_uneven N=2560", uneven_inverse)

    # fused Pallas SVGP gram kernels (the use_pallas=True opt-in): value +
    # grads vs the XLA gram formulation, on chip
    def svgp_gram_pallas():
        import dataclasses

        import jax.numpy as jnp

        from portfoliooptgp_tpu.models import svgp as svgp_mod
        from portfoliooptgp_tpu.models.likelihoods import Gaussian

        n, m = 512, 64
        X, Y = data(n)
        Z = jnp.asarray(np.linspace(0, 30, m)[:, None].astype(np.float32))
        model = svgp_mod.SVGP.create(
            km.SquaredExponential.create(1.3, 4.0), inducing_points=Z,
            likelihood=Gaussian.create(0.05))
        model = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), model)
        model = dataclasses.replace(
            model,
            q_mu=jnp.asarray(rng.normal(size=(m, 1)).astype(np.float32)),
            q_sqrt=jnp.asarray(
                (np.tril(rng.normal(size=(1, m, m)) * 0.2) + np.eye(m))
                .astype(np.float32)))
        assert svgp_mod.svgp_gram_fused_supported(model, X)
        f = jax.jit(jax.value_and_grad(lambda mm: svgp_mod.gaussian_elbo_gram_fused(
            mm, X, Y, num_data=n, use_pallas=True)))
        r = jax.jit(jax.value_and_grad(lambda mm: svgp_mod.gaussian_elbo_gram(
            mm, X, Y, num_data=n)))
        vf, gf = f(model)
        vr, gr = r(model)
        vf, vr = float(vf), float(vr)
        assert np.isfinite(vf), "non-finite fused-pallas ELBO"
        np.testing.assert_allclose(vf, vr, rtol=3e-3)
        return max(abs(vf - vr) / abs(vr), grad_err(gf, gr, 2e-2))
    check("svgp gram fused (use_pallas)", svgp_gram_pallas)

    # natural-gradient step: gamma=1 with Gaussian likelihood must land on
    # the SGPR collapsed bound (the defining exactness property), on chip
    def natgrad_exact():
        import jax.numpy as jnp

        from portfoliooptgp_tpu.models import sgpr as sgpr_mod
        from portfoliooptgp_tpu.models import svgp as svgp_mod
        from portfoliooptgp_tpu.models.likelihoods import Gaussian
        from portfoliooptgp_tpu.train import natgrad

        n, m = 256, 32
        X, Y = data(n)
        Z = jnp.asarray(np.linspace(0, 30, m)[:, None].astype(np.float32))
        kern = km.SquaredExponential.create(1.2, 4.0)
        model = svgp_mod.SVGP.create(kern, inducing_points=Z,
                                     likelihood=Gaussian.create(0.05))
        model = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), model)

        @jax.jit
        def stepped_elbo(model):
            s = natgrad.natgrad_step(model, X, Y, num_data=n, gamma=1.0)
            return svgp_mod.elbo(s, X, Y, num_data=n)
        got = float(stepped_elbo(model))
        collapsed = sgpr_mod.SGPR.create(kern, inducing_points=model.Z,
                                         noise_variance=0.05)
        collapsed = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                                 collapsed)
        want = float(jax.jit(sgpr_mod.elbo)(collapsed, X, Y))
        assert np.isfinite(got), "non-finite natgrad ELBO"
        np.testing.assert_allclose(got, want, rtol=2e-3)
        return abs(got - want) / abs(want)
    check("natgrad_step gamma=1 exactness", natgrad_exact)

    # ICM multi-output decompose + predict_f vs the dense Kronecker
    # reference (host float64) — config-5's model family, on chip
    def icm_predict():
        import jax.numpy as jnp

        from portfoliooptgp_tpu.models import icm

        n, p = 64, 3
        X, _ = data(n)
        base = np.sin(np.asarray(X, dtype=np.float64))
        loadings = rng.normal(size=(1, p)) * 0.8 + 1.0
        Yp = jnp.asarray((base @ loadings
                          + 0.1 * rng.normal(size=(n, p))).astype(np.float32))
        model = icm.ICMGPR.create(
            km.SquaredExponential.create(1.0, 5.0), num_outputs=p, rank=2,
            noise_variance=0.05, w_scale=0.5)
        model = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), model)
        Xnew = jnp.asarray(np.linspace(0, 30, 8)[:, None].astype(np.float32))
        nll = float(jax.jit(icm.neg_log_marginal_likelihood)(model, X, Yp))
        mean, var = jax.jit(icm.predict_f)(model, X, Yp, Xnew)
        mean, var = np.asarray(mean), np.asarray(var)
        assert np.isfinite(nll) and np.all(np.isfinite(mean)), "non-finite ICM"

        # dense Kronecker reference in float64 on host
        Kx = np.asarray(model.kernel.K(X), dtype=np.float64)
        B = np.asarray(model.B, dtype=np.float64)
        Kfull = np.kron(B, Kx) + float(model.likelihood.variance) * np.eye(n * p)
        yv = np.asarray(Yp, dtype=np.float64).reshape(-1, order="F")
        a = np.linalg.solve(Kfull, yv)
        Ksn = np.asarray(model.kernel.K(X, Xnew), dtype=np.float64)
        mean_ref = (np.kron(B, Ksn.T) @ a).reshape(-1, p, order="F")
        scale = max(np.abs(mean_ref).max(), 1.0)
        np.testing.assert_allclose(mean / scale, mean_ref / scale, atol=2e-3)
        assert np.all(var >= 0.0), "negative ICM variance"
        return float(np.abs(mean - mean_ref).max() / scale)
    check("icm decompose+predict_f", icm_predict)

    # ICM chol NLL (eigh(B)-only + batched-Cholesky tier, the frontier
    # MLE/NUTS log-density path) value+grad vs the Kronecker-eigh NLL, on
    # chip — guards the safe_eigh VJP lowering and the tier routing for
    # the (P, N, N) batch shape
    def icm_chol_nll():
        import jax.numpy as jnp
        from jax.flatten_util import ravel_pytree

        from portfoliooptgp_tpu.models import icm

        n, p = 261, 20
        X, _ = data(n)
        base = np.sin(np.asarray(X, dtype=np.float64))
        loadings = rng.normal(size=(1, p)) * 0.8 + 1.0
        Yp = jnp.asarray((base @ loadings
                          + 0.1 * rng.normal(size=(n, p))).astype(np.float32))
        model = icm.ICMGPR.create(
            km.SquaredExponential.create(1.0, 5.0), num_outputs=p, rank=3,
            noise_variance=0.05, w_scale=0.5)
        model = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), model)

        va, ga = jax.jit(jax.value_and_grad(
            lambda m: icm.neg_log_marginal_likelihood(m, X, Yp)))(model)
        vb, gb = jax.jit(jax.value_and_grad(
            lambda m: icm.neg_log_marginal_likelihood_chol(m, X, Yp)))(model)
        va, vb = float(va), float(vb)
        fa, _ = ravel_pytree(ga)
        fb, _ = ravel_pytree(gb)
        fa, fb = np.asarray(fa), np.asarray(fb)
        assert np.isfinite(va) and np.isfinite(vb), (va, vb)
        assert np.all(np.isfinite(fb)), "non-finite chol-NLL grad"
        verr = abs(va - vb) / max(abs(va), 1.0)
        assert verr < 1e-4, f"ICM NLL mismatch {va} vs {vb}"
        gscale = max(np.abs(fa).max(), 1.0)
        gerr = float(np.abs(fa - fb).max() / gscale)
        assert gerr < 2e-2, f"ICM NLL grad mismatch {gerr}"
        return max(verr, gerr)
    check("icm chol NLL N=261 P=20", icm_chol_nll)

    # one-jit portfolio horizon solve (the per-day SLSQP replacement,
    # Portfolio/portfolio.py:102-146): simplex feasibility + finiteness
    # for the tx-coupled scan strategy AND the vmapped min-vol strategy
    def portfolio_horizon():
        import jax.numpy as jnp

        from portfoliooptgp_tpu.portfolio import batched_eval

        D, A = 5, 5
        mu = jnp.asarray(rng.normal(size=(D, A)).astype(np.float32) * 0.01)
        var = jnp.asarray(rng.uniform(0.01, 0.05, (D, A)).astype(np.float32))
        prev0 = jnp.full((A,), 1.0 / A, jnp.float32)
        worst = 0.0
        for strat in ("sharpe", "min_volatility"):
            W, ret, vol = batched_eval.solve_horizon(
                strat, mu, var, prev0, 0.0, 0.001, 0.001, 1e-4, 0.02, 0.001)
            W, ret, vol = np.asarray(W), np.asarray(ret), np.asarray(vol)
            assert np.all(np.isfinite(W)), f"non-finite weights ({strat})"
            assert np.all(W >= -1e-6), f"negative weight ({strat})"
            serr = float(np.abs(W.sum(axis=1) - 1.0).max())
            assert serr < 1e-4, f"simplex violation {serr} ({strat})"
            assert np.all(np.isfinite(ret)) and np.all(np.isfinite(vol))
            worst = max(worst, serr)
        return worst
    check("portfolio solve_horizon", portfolio_horizon)

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
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1]
    results, _ = run_smoke(only)
    failures = [r["name"] for r in results if not r["ok"]]
    total = len(results)
    print(f"\n{'OK' if not failures else 'FAILED'}: "
          f"{total - len(failures)}/{total} checks passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
