"""Kernel-function correctness vs closed-form numpy formulas (the same math
GPflow implements; formulas documented at each kernel class)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from portfoliooptgp_tpu import kernels as km


def np_sqdist(X, X2, ell):
    X = np.asarray(X) / ell
    X2 = np.asarray(X2) / ell
    return ((X[:, None, :] - X2[None, :, :]) ** 2).sum(-1)


@pytest.fixture
def XY(rng):
    X = rng.normal(size=(7, 3))
    X2 = rng.normal(size=(5, 3))
    return X, X2


def test_squared_exponential(XY):
    X, X2 = XY
    k = km.SquaredExponential.create(variance=2.0, lengthscales=0.7)
    got = k.K(jnp.asarray(X), jnp.asarray(X2))
    want = 2.0 * np.exp(-0.5 * np_sqdist(X, X2, 0.7))
    np.testing.assert_allclose(got, want, rtol=1e-8)
    np.testing.assert_allclose(k.Kdiag(jnp.asarray(X)), 2.0 * np.ones(7), rtol=1e-12)


def test_matern12(XY):
    X, X2 = XY
    k = km.Matern12.create(variance=1.5, lengthscales=1.2)
    got = k.K(jnp.asarray(X), jnp.asarray(X2))
    want = 1.5 * np.exp(-np.sqrt(np_sqdist(X, X2, 1.2)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_exponential_is_matern12():
    assert km.Exponential is km.Matern12


def test_matern32_matern52(XY):
    X, X2 = XY
    r = np.sqrt(np_sqdist(X, X2, 0.9))
    k32 = km.Matern32.create(lengthscales=0.9)
    want32 = (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)
    np.testing.assert_allclose(k32.K(jnp.asarray(X), jnp.asarray(X2)), want32, rtol=1e-6)
    k52 = km.Matern52.create(lengthscales=0.9)
    want52 = (1 + np.sqrt(5) * r + 5 * r**2 / 3) * np.exp(-np.sqrt(5) * r)
    np.testing.assert_allclose(k52.K(jnp.asarray(X), jnp.asarray(X2)), want52, rtol=1e-6)


def test_rational_quadratic(XY):
    X, X2 = XY
    k = km.RationalQuadratic.create(variance=0.5, lengthscales=1.1, alpha=2.0)
    r2 = np_sqdist(X, X2, 1.1)
    want = 0.5 * (1 + r2 / 4.0) ** (-2.0)
    np.testing.assert_allclose(k.K(jnp.asarray(X), jnp.asarray(X2)), want, rtol=1e-8)


def test_periodic_sqexp(XY):
    X, X2 = XY
    base = km.SquaredExponential.create(variance=1.3, lengthscales=0.8)
    k = km.Periodic.create(base, period=2.0)
    d = np.asarray(X)[:, None, :] - np.asarray(X2)[None, :, :]
    sine2 = (np.sin(np.pi * d / 2.0) / 0.8) ** 2
    want = 1.3 * np.exp(-0.5 * sine2.sum(-1))
    np.testing.assert_allclose(k.K(jnp.asarray(X), jnp.asarray(X2)), want, rtol=1e-8)


def test_linear_polynomial(XY):
    X, X2 = XY
    k = km.Linear.create(variance=0.7)
    np.testing.assert_allclose(
        k.K(jnp.asarray(X), jnp.asarray(X2)), 0.7 * np.asarray(X) @ np.asarray(X2).T, rtol=1e-10
    )
    kp = km.Polynomial.create(degree=2.0, variance=0.7, offset=1.0)
    want = (0.7 * np.asarray(X) @ np.asarray(X2).T + 1.0) ** 2
    np.testing.assert_allclose(kp.K(jnp.asarray(X), jnp.asarray(X2)), want, rtol=1e-10)


def test_sum_product_algebra(XY):
    X, X2 = XY
    a = km.SquaredExponential.create()
    b = km.Matern12.create()
    Xj, X2j = jnp.asarray(X), jnp.asarray(X2)
    np.testing.assert_allclose((a + b).K(Xj, X2j), a.K(Xj, X2j) + b.K(Xj, X2j), rtol=1e-12)
    np.testing.assert_allclose((a * b).K(Xj, X2j), a.K(Xj, X2j) * b.K(Xj, X2j), rtol=1e-12)
    # three-term sum flattens
    s = a + b + km.Linear.create()
    assert len(s.terms) == 3


def test_active_dims_slice_and_composite(rng):
    X = jnp.asarray(rng.normal(size=(6, 4)))
    k = km.composite_kernel(4, km.Exponential, km.Exponential)
    k1 = km.Exponential.create()
    k2 = km.Exponential.create()
    want = k1.K(X[:, :3]) * k2.K(X[:, 3:4])
    np.testing.assert_allclose(k.K(X), want, rtol=1e-12)


def test_active_dims_indices(rng):
    X = jnp.asarray(rng.normal(size=(6, 4)))
    k = km.SquaredExponential.create(active_dims=[0, 2])
    want = km.SquaredExponential.create().K(X[:, [0, 2]])
    np.testing.assert_allclose(k.K(X), want, rtol=1e-12)


def test_kernel_is_vmappable_pytree(rng):
    """Stacked kernels vmapped — the restart batch axis (SURVEY.md §2.3)."""
    X = jnp.asarray(rng.normal(size=(5, 2)))
    ks = [km.SquaredExponential.create(variance=v) for v in (0.5, 1.0, 2.0)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *ks)
    out = jax.vmap(lambda k: k.K(X))(stacked)
    assert out.shape == (3, 5, 5)
    for i, v in enumerate((0.5, 1.0, 2.0)):
        np.testing.assert_allclose(out[i], ks[i].K(X), rtol=1e-12)


def test_kernel_grads_flow(rng):
    X = jnp.asarray(rng.normal(size=(5, 2)))
    k = km.SquaredExponential.create()

    def loss(k):
        return jnp.sum(k.K(X))

    g = jax.grad(loss)(k)
    assert jnp.isfinite(g.raw_variance)
    assert jnp.isfinite(g.raw_lengthscales)


def test_psd_property(rng):
    """Kernel matrices must be PSD (property test, SURVEY.md §4)."""
    X = jnp.asarray(rng.normal(size=(20, 2)))
    for k in km.default_kernel_menu():
        Kmat = np.asarray(k.K(X))
        eig = np.linalg.eigvalsh(Kmat + 1e-10 * np.eye(20))
        assert eig.min() > -1e-8, type(k).__name__


def test_default_menu_matches_reference_size():
    menu = km.default_kernel_menu()
    assert len(menu) == 8  # GPR/main.py:105-114


def test_periodic_matern_base_uses_kr(XY):
    X, X2 = XY
    base = km.Matern12.create(variance=0.9, lengthscales=0.6)
    k = km.Periodic.create(base, period=1.5)
    d = np.asarray(X)[:, None, :] - np.asarray(X2)[None, :, :]
    sine = np.abs(np.sin(np.pi * d / 1.5) / 0.6).sum(-1)
    want = 0.9 * np.exp(-sine)
    np.testing.assert_allclose(k.K(jnp.asarray(X), jnp.asarray(X2)), want, rtol=1e-8)


def test_constant_white_kernels(rng):
    X = jnp.asarray(rng.normal(size=(6, 2)))
    X2 = jnp.asarray(rng.normal(size=(4, 2)))
    c = km.Constant.create(variance=2.5)
    np.testing.assert_allclose(np.asarray(c.K(X, X2)), 2.5, rtol=1e-12)
    w = km.White.create(variance=0.3)
    np.testing.assert_allclose(np.asarray(w.K(X)), 0.3 * np.eye(6), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(w.K(X, X2)), 0.0, atol=0)
    np.testing.assert_allclose(np.asarray(w.Kdiag(X)), 0.3, rtol=1e-12)


def test_polynomial_mean_function():
    X = jnp.asarray(np.linspace(-1, 1, 7)[:, None])
    m = km.PolynomialMean.create(degree=2, w=[1.0, 2.0, 3.0])
    want = 1.0 + 2.0 * np.asarray(X) + 3.0 * np.asarray(X) ** 2
    np.testing.assert_allclose(np.asarray(m(X)), want, rtol=1e-12)
    lin = km.LinearMean.create(A=[2.0], b=0.5)
    np.testing.assert_allclose(np.asarray(lin(X)), 2.0 * np.asarray(X) + 0.5, rtol=1e-12)
