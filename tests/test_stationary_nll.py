"""Fully-fused stationary NLL (ops/pallas/stationary_nll.py).

Interpret mode on the CPU mesh. The XLA autodiff reference uses a
sqrt(u + eps) softening on the Matérn families: plain autodiff through
sqrt at u=0 (the diagonal) yields NaN — the fused path's closed-form VJP is
exact there, which is itself asserted."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from portfoliooptgp_tpu.ops.pallas import stationary_nll as st

LOG2PI = np.log(2 * np.pi)
EPS = 1e-10


def _problem(B=5, N=200, seed=0):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(0, 50, (N, 1))).astype(np.float32)
    d2 = ((X[:, None, 0] - X[None, :, 0]) ** 2).astype(np.float32)
    err = rng.normal(size=(B, N)).astype(np.float32)
    v = np.linspace(0.5, 2.0, B).astype(np.float32)
    ell = np.linspace(2.0, 8.0, B).astype(np.float32)
    nz = np.linspace(0.05, 0.3, B).astype(np.float32)
    return tuple(map(jnp.asarray, (d2, err, v, ell, nz)))


def _phi_soft(family, u):
    if family == "se":
        return jnp.exp(-0.5 * u)
    r = jnp.sqrt(u + EPS)
    if family == "matern12":
        return jnp.exp(-r)
    if family == "matern32":
        return (1 + st.SQRT3 * r) * jnp.exp(-st.SQRT3 * r)
    return (1 + st.SQRT5 * r + 5 / 3 * u) * jnp.exp(-st.SQRT5 * r)


def _xla_nll(d2, err, v, ell, nz, family):
    N = err.shape[1]
    u = d2[None] / (ell ** 2)[:, None, None]
    K = v[:, None, None] * _phi_soft(family, u) + nz[:, None, None] * jnp.eye(N)
    L = jnp.linalg.cholesky(K)
    a = jax.scipy.linalg.solve_triangular(L, err[..., None], lower=True)[..., 0]
    return (0.5 * jnp.sum(a * a, -1)
            + jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
            + 0.5 * N * LOG2PI)


@pytest.mark.parametrize("family", st.FAMILIES)
def test_value_matches_xla(family):
    args = _problem()
    nll = st.batched_nll_stationary(*args, family)
    ref = _xla_nll(*args, family)
    # rtol accounts for the reference's sqrt(u+eps) softening: the Matérn
    # families shift near-diagonal entries by O(eps/r) relative
    np.testing.assert_allclose(np.asarray(nll), np.asarray(ref), rtol=3e-4)


@pytest.mark.parametrize("family", st.FAMILIES)
def test_grads_match_xla(family):
    args = _problem()
    g1 = jax.grad(lambda *a: jnp.sum(st.batched_nll_stationary(*a, family)),
                  argnums=(0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(lambda *a: jnp.sum(_xla_nll(*a, family)),
                  argnums=(0, 1, 2, 3, 4))(*args)
    d2 = np.asarray(args[0])
    for k, (a, b) in enumerate(zip(g1, g2)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a))
        if k == 0 and family != "se":
            # the reference's sqrt(u+eps) softening distorts dφ/du near the
            # diagonal (dr/du → 1/(2√eps) instead of 1/(2r)); compare only
            # where the softening is negligible
            mask = d2 > 1e-3
            a, b = a[mask], b[mask]
        scale = np.maximum(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-3)


def test_matern_grad_finite_where_xla_nans():
    """Diagonal u=0 makes plain-autodiff Matérn gradients NaN; the fused
    closed-form VJP stays finite and the ℓ-gradient of the diagonal is 0."""
    args = _problem()
    g = jax.grad(lambda *a: jnp.sum(st.batched_nll_stationary(*a, "matern12")),
                 argnums=(0, 1, 2, 3, 4))(*args)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in g)


def test_gpr_dispatch_uses_fused_stationary():
    """Public batched loss on an SE model equals the XLA fallback and its
    gradients stay finite through the full softplus-transform chain."""
    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr
    from portfoliooptgp_tpu.train import lbfgs

    rng = np.random.default_rng(1)
    N = 150
    X = jnp.asarray(np.sort(rng.uniform(0, 30, (N, 1))), jnp.float32)
    Y = jnp.asarray(np.sin(np.asarray(X)) + 0.1 * rng.normal(size=(N, 1)),
                    jnp.float32)
    ms = [gpr.GPR.create(km.SquaredExponential.create(variance=v, lengthscales=2.0),
                         noise_variance=0.1) for v in (0.5, 1.0, 2.0)]
    stacked = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                           lbfgs.stack_pytrees(ms))
    fast = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=True)
    ref = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=1e-4)

    gf = jax.grad(lambda s: jnp.sum(gpr.batched_neg_log_marginal_likelihood(s, X, Y)))(stacked)
    gr = jax.grad(lambda s: jnp.sum(
        gpr.batched_neg_log_marginal_likelihood(s, X, Y, fast=False)))(stacked)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_matern_menu_kernels_route_fused():
    """Matern12/32/52 models also round-trip through the fused dispatch."""
    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr
    from portfoliooptgp_tpu.train import lbfgs

    rng = np.random.default_rng(2)
    N = 96
    X = jnp.asarray(np.sort(rng.uniform(0, 30, (N, 1))), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(N, 1)), jnp.float32)
    for cls in (km.Matern12, km.Matern32, km.Matern52):
        ms = [gpr.GPR.create(cls.create(variance=v, lengthscales=3.0),
                             noise_variance=0.2) for v in (0.5, 1.5)]
        stacked = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                               lbfgs.stack_pytrees(ms))
        fast = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=True)
        ref = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=False)
        # the generic path's safe-sqrt softening shifts near-diagonal Matérn
        # entries; the fused path computes them exactly
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=2e-3)


def test_masked_general_matches_masked_nll():
    """The mask-aware fused path equals the dense pad-and-mask system
    (pipelines/walk_forward.py masked_nll) for growing prefixes."""
    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr
    from portfoliooptgp_tpu.pipelines.walk_forward import masked_nll
    from portfoliooptgp_tpu.train import lbfgs

    rng = np.random.default_rng(3)
    N, B = 120, 3
    X = jnp.asarray(np.sort(rng.uniform(0, 30, (N, 1))), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(N, 1)), jnp.float32)
    ms = [gpr.GPR.create(km.SquaredExponential.create(v, 2.0), noise_variance=0.1)
          for v in (0.5, 1.0, 2.0)]
    stacked = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                           lbfgs.stack_pytrees(ms))
    masks = jnp.asarray((np.arange(N)[None, :] < np.array([60, 90, 120])[:, None]),
                        jnp.float32)

    sp = gpr.fused_stationary_spec(stacked, X)
    noise = jax.vmap(lambda m: m.likelihood.variance)(stacked)
    err = Y[None, :, 0] * masks
    got = st.batched_nll_stationary_general(
        sp.families, sp.d2s, err, sp.vs, sp.ls, sp.als, noise, masks)
    # restate the 2π constant for the effective row counts
    n_eff = jnp.sum(masks, axis=1)
    got = got - 0.5 * (N - n_eff) * jnp.log(2.0 * jnp.pi)
    want = jax.vmap(lambda m, msk: masked_nll(m, X, Y, msk))(stacked, masks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4)

    # gradients agree with autodiff through the dense masked system
    def loss_f(s):
        sp2 = gpr.fused_stationary_spec(s, X)
        nz = jax.vmap(lambda m: m.likelihood.variance)(s)
        e = Y[None, :, 0] * masks
        return jnp.sum(st.batched_nll_stationary_general(
            sp2.families, sp2.d2s, e, sp2.vs, sp2.ls, sp2.als, nz, masks))

    def loss_r(s):
        return jnp.sum(jax.vmap(lambda m, msk: masked_nll(m, X, Y, msk))(s, masks))

    gf, gr = jax.grad(loss_f)(stacked), jax.grad(loss_r)(stacked)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-3)


def test_product_kernel_routes_fused():
    """Composite k1(features)×k2(time) models round-trip through the
    2-factor fused dispatch, values and gradients."""
    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr
    from portfoliooptgp_tpu.train import lbfgs

    rng = np.random.default_rng(4)
    N, D = 140, 4
    X = jnp.asarray(rng.uniform(0, 20, (N, D)), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(N, 1)), jnp.float32)
    ms = [gpr.GPR.create(km.composite_kernel(D, km.SquaredExponential,
                                             km.SquaredExponential),
                         noise_variance=0.1 * v) for v in (0.5, 1.5, 2.0)]
    stacked = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                           lbfgs.stack_pytrees(ms))
    fast = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=True)
    ref = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=2e-4)

    gf = jax.grad(lambda s: jnp.sum(
        gpr.batched_neg_log_marginal_likelihood(s, X, Y)))(stacked)
    gr = jax.grad(lambda s: jnp.sum(
        gpr.batched_neg_log_marginal_likelihood(s, X, Y, fast=False)))(stacked)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        scale = np.maximum(np.abs(np.asarray(b)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                                   atol=5e-3)


def test_rational_quadratic_routes_fused():
    """RQ models (GPR/main.py:108 menu) route through the general fused
    path (alpha carried as a per-factor scalar), values and gradients —
    including the alpha gradient."""
    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr
    from portfoliooptgp_tpu.train import lbfgs

    rng = np.random.default_rng(5)
    N = 130
    X = jnp.asarray(np.sort(rng.uniform(0, 30, (N, 1))), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(N, 1)), jnp.float32)
    ms = [gpr.GPR.create(
        km.RationalQuadratic.create(variance=v, lengthscales=3.0, alpha=a),
        noise_variance=0.2) for v, a in ((0.5, 0.7), (1.5, 2.5))]
    stacked = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                           lbfgs.stack_pytrees(ms))
    fast = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=True)
    ref = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=2e-4)

    gf = jax.grad(lambda s: jnp.sum(
        gpr.batched_neg_log_marginal_likelihood(s, X, Y)))(stacked)
    gr = jax.grad(lambda s: jnp.sum(
        gpr.batched_neg_log_marginal_likelihood(s, X, Y, fast=False)))(stacked)
    # raw_alpha gradient must flow (nonzero) and match autodiff
    assert np.abs(np.asarray(gf.kernel.raw_alpha)).min() > 0
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-3)


def test_rq_product_composite_routes_fused():
    """RQ × SE composite over column slices routes the 2-factor fused path."""
    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr
    from portfoliooptgp_tpu.train import lbfgs

    rng = np.random.default_rng(6)
    N, D = 110, 3
    X = jnp.asarray(rng.uniform(0, 20, (N, D)), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(N, 1)), jnp.float32)
    ms = [gpr.GPR.create(km.composite_kernel(D, km.RationalQuadratic,
                                             km.SquaredExponential),
                         noise_variance=0.1 * v) for v in (0.5, 1.5)]
    stacked = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                           lbfgs.stack_pytrees(ms))
    fast = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=True)
    ref = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=2e-4)

    gf = jax.grad(lambda s: jnp.sum(
        gpr.batched_neg_log_marginal_likelihood(s, X, Y)))(stacked)
    gr = jax.grad(lambda s: jnp.sum(
        gpr.batched_neg_log_marginal_likelihood(s, X, Y, fast=False)))(stacked)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        scale = np.maximum(np.abs(np.asarray(b)).max(), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale, np.asarray(b) / scale,
                                   atol=5e-3)


def _stack_f32(ms):
    from portfoliooptgp_tpu.train import lbfgs

    return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                        lbfgs.stack_pytrees(ms))


def _xy(N, seed, D=1, dup=False):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(0, 30, (N, D)), axis=0).astype(np.float32)
    if dup:
        # duplicated rows force off-diagonal u=0 entries — the hand-derived
        # periodic_se φ'(u→0) limit must stay finite and correct there
        X[1] = X[0]
        X[N // 2] = X[N // 2 - 1]
    Y = rng.normal(size=(N, 1)).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(Y)


def _assert_fast_matches_xla(ms, X, Y, rtol=3e-4, gtol=5e-3):
    """Value + gradient parity of the fused dispatch vs the dense XLA
    kernel.K path (fast=False) on the same stacked batch."""
    from portfoliooptgp_tpu.models import gpr

    stacked = _stack_f32(ms)
    fast = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=True)
    ref = gpr.batched_neg_log_marginal_likelihood(stacked, X, Y, fast=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), rtol=rtol)

    gf = jax.grad(lambda s: jnp.sum(
        gpr.batched_neg_log_marginal_likelihood(s, X, Y)))(stacked)
    gr = jax.grad(lambda s: jnp.sum(
        gpr.batched_neg_log_marginal_likelihood(s, X, Y, fast=False)))(stacked)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a))
        scale = np.maximum(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=gtol)
    return stacked


def test_linear_atom_routes_fused():
    """Single Linear kernel (menu entry 6 atom, GPR/main.py:110) through
    the fused general path: value + gradients vs dense kernel.K."""
    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr

    X, Y = _xy(100, 7)
    ms = [gpr.GPR.create(km.Linear.create(variance=v), noise_variance=0.3)
          for v in (0.05, 0.2)]
    # gtol 2e-2: the Gram entries reach ~900, and the f32 NLL gradient is
    # genuinely that sensitive — the fused path is *closer* to the f64
    # truth than the dense f32 reference here (checked offline)
    stacked = _assert_fast_matches_xla(ms, X, Y, gtol=2e-2)
    assert gpr.nll_tier(stacked, X, Y) == "fused_general_prod"


def test_periodic_se_atom_routes_fused():
    """Single Periodic(SE) atom (menu entries 6-7), with duplicated inputs
    so off-diagonal u=0 exercises the φ'(u→0) closed-form limit."""
    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr

    X, Y = _xy(110, 8, dup=True)
    ms = [gpr.GPR.create(
        km.Periodic.create(km.SquaredExponential.create(variance=v,
                                                        lengthscales=1.5),
                           period=p),
        noise_variance=0.2) for v, p in ((0.6, 5.0), (1.4, 9.0))]
    stacked = _assert_fast_matches_xla(ms, X, Y)
    assert gpr.nll_tier(stacked, X, Y) == "fused_general_prod"
    # period gradient must flow
    gf = jax.grad(lambda s: jnp.sum(
        gpr.batched_neg_log_marginal_likelihood(s, X, Y)))(stacked)
    assert np.abs(np.asarray(gf.kernel.raw_period)).min() > 0


def test_sum_se_linear_routes_fused():
    """Sum(SE + Linear): the sum-combine fused path and its VJP vs dense."""
    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr

    X, Y = _xy(120, 9)
    ms = [gpr.GPR.create(
        km.SquaredExponential.create(variance=v, lengthscales=3.0)
        + km.Linear.create(variance=0.1 * v),
        noise_variance=0.2) for v in (0.5, 1.0, 2.0)]
    stacked = _assert_fast_matches_xla(ms, X, Y, gtol=2e-2)
    assert gpr.nll_tier(stacked, X, Y) == "fused_general_sum"


def test_sum_with_periodic_routes_fused():
    """Menu entry 7 (Exponential + Periodic(SE)): sum-combine with the
    periodic family, values + gradients, duplicated inputs included."""
    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr

    X, Y = _xy(100, 10, dup=True)
    ms = [gpr.GPR.create(
        km.Exponential.create(variance=v, lengthscales=4.0)
        + km.Periodic.create(km.SquaredExponential.create(variance=0.8,
                                                          lengthscales=1.2),
                             period=p),
        noise_variance=0.25) for v, p in ((0.6, 6.0), (1.2, 11.0))]
    stacked = _assert_fast_matches_xla(ms, X, Y, rtol=2e-3)
    assert gpr.nll_tier(stacked, X, Y) == "fused_general_sum"


def test_menu_entry6_three_term_sum_routes_fused():
    """Menu entry 6 (Exponential + Periodic(SE) + Linear, GPR/main.py:110):
    the full 3-atom sum through the fused path, values + gradients."""
    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr

    X, Y = _xy(90, 11)
    ms = [gpr.GPR.create(
        km.Exponential.create(variance=v, lengthscales=5.0)
        + km.Periodic.create(km.SquaredExponential.create(), period=7.0)
        + km.Linear.create(variance=0.05),
        noise_variance=0.3) for v in (0.7, 1.3)]
    stacked = _assert_fast_matches_xla(ms, X, Y, rtol=2e-3)
    assert gpr.nll_tier(stacked, X, Y) == "fused_general_sum"


def test_ard_atom_routes_fused():
    """ARD SE with per-dim lengthscales (D=4): the fused kernel builds
    u = Σ_d d2_d/ℓ_d² from per-dim shared distance matrices (VERDICT r2
    item 5; restores the fused tier the isotropic-only spec dropped)."""
    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr

    X, Y = _xy(96, 12, D=4)
    ms = [gpr.GPR.create(
        km.SquaredExponential.create(variance=v,
                                     lengthscales=np.linspace(0.5, 2.0, 4) * v),
        noise_variance=0.1) for v in (0.5, 1.0, 1.5)]
    stacked = _assert_fast_matches_xla(ms, X, Y)
    assert gpr.nll_tier(stacked, X, Y) == "fused_general_prod"
    spec = gpr.fused_stationary_spec(stacked, X)
    assert spec.dims == (4,)
    # per-dim lengthscale gradients must flow independently
    gf = jax.grad(lambda s: jnp.sum(
        gpr.batched_neg_log_marginal_likelihood(s, X, Y)))(stacked)
    assert np.asarray(gf.kernel.raw_lengthscales).shape == (3, 4)
    assert np.all(np.abs(np.asarray(gf.kernel.raw_lengthscales)) > 0)


def test_ard_composite_product_routes_fused():
    """The multi-input composite (ARD SE over feature dims × SE over the
    time dim via active_dims, Multi-Input_GPR/main.py:118-135) with per-dim
    lengthscales enabled stays on the fused tier."""
    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr

    D = 3
    X, Y = _xy(88, 13, D=D + 1)
    comp = (km.SquaredExponential.create(lengthscales=np.ones(D),
                                         active_dims=slice(0, D))
            * km.SquaredExponential.create(lengthscales=2.0,
                                           active_dims=slice(D, D + 1)))
    ms = [gpr.GPR.create(jax.tree.map(lambda x: x * (1 + 0.1 * i), comp),
                         noise_variance=0.1) for i in range(3)]
    stacked = _assert_fast_matches_xla(ms, X, Y)
    assert gpr.nll_tier(stacked, X, Y) == "fused_general_prod"
    spec = gpr.fused_stationary_spec(stacked, X)
    assert spec.dims == (D, 1)


def test_ard_rq_atom_routes_fused():
    """RationalQuadratic with per-dim lengthscales: the α gradient and the
    per-dim ℓ gradients coexist in the fused general path."""
    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr

    X, Y = _xy(80, 14, D=2)
    ms = [gpr.GPR.create(
        km.RationalQuadratic.create(variance=v, lengthscales=np.array([1.0, 3.0]),
                                    alpha=1.5),
        noise_variance=0.2) for v in (0.8, 1.2)]
    stacked = _assert_fast_matches_xla(ms, X, Y, gtol=2e-2)
    assert gpr.nll_tier(stacked, X, Y) == "fused_general_prod"


def test_pick_b_tile_bounds_padding_waste():
    """Adaptive batch tiling: largest tile in (64, 32, 16, 8) whose batch
    padding stays within 25% — fatter tiles amortize the kernel's serial
    column loop (one pass per sequential grid program)."""
    cases = {128: 64, 64: 64, 96: 32, 32: 32, 16: 16, 8: 8, 24: 8,
             40: 16, 1: 8, 65: 16, 52: 64}
    for b, want in cases.items():
        got = st._pick_b_tile(b)
        assert got == want, (b, got, want)
        padded = -(-b // got) * got
        assert padded <= max(1.25 * b, 8.0)


def test_pick_b_tile_respects_vmem_at_512():
    """At Np=512 the with-inverse slabs cap the tile at 16 (VERDICT r4
    item 3: b_tile 32 would need ~98 MiB, over the 96 MiB compiler cap)."""
    assert st._pick_b_tile(128, 512) == 16
    assert st._pick_b_tile(32, 512) == 16
    assert st._pick_b_tile(8, 512) == 8
    # and every (B, Np) choice stays under 90% of the cap
    for b in (1, 8, 16, 32, 64, 128):
        for n_pad in (128, 256, 384, 512):
            t = st._pick_b_tile(b, n_pad)
            vmem = 3 * 4 * n_pad * t * n_pad + 2 * 4 * n_pad * n_pad
            assert vmem <= st.VMEM_LIMIT_BYTES * 0.9, (b, n_pad, t)


def test_fused_window_extends_to_512():
    """256 < N <= 512 routes to the fused in-VMEM tier — the NUTS bench
    posterior shape (VERDICT r4 item 3). Metadata-only (fast); the value/
    grad parity at the extended sizes is the slow test below plus the
    on-chip fused_stationary N=512 smoke check."""
    assert st.fused_nll_supported(512)
    assert st.fused_nll_supported(300)
    assert not st.fused_nll_supported(513)

    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr

    rng = np.random.default_rng(0)
    X = jnp.asarray(np.sort(rng.uniform(0, 50, (512, 1)), 0), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(512, 1)), jnp.float32)
    ms = [gpr.GPR.create(km.SquaredExponential.create(1.0 + 0.1 * i, 5.0),
                         noise_variance=0.1) for i in range(8)]
    stacked = jax.tree.map(
        lambda x: x.astype(jnp.float32) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, jax.tree.map(lambda *xs: jnp.stack(xs), *ms))
    assert gpr.nll_tier(stacked, X, Y) == "fused_stationary"


@pytest.mark.slow
def test_fused_window_512_parity():
    """Interpret-mode value+grad parity of the fused tier in the extended
    256 < N <= 512 window."""
    args = _problem(B=8, N=384, seed=3)
    nll = st.batched_nll_stationary(*args, "se")
    ref = _xla_nll(*args, "se")
    np.testing.assert_allclose(np.asarray(nll), np.asarray(ref), rtol=3e-4)
    g1 = jax.grad(lambda *a: jnp.sum(st.batched_nll_stationary(*a, "se")),
                  argnums=(1, 2, 3, 4))(*args)
    g2 = jax.grad(lambda *a: jnp.sum(_xla_nll(*a, "se")),
                  argnums=(1, 2, 3, 4))(*args)
    for a, b in zip(g1, g2):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a))
        scale = np.maximum(np.abs(b).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-3)
