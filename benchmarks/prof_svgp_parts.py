"""Component breakdown of the SVGP ELBO train step on the v5e.

Times (interleaved, scan-chained, scalar-coupled) the pieces of the step at
the bench shape (M=128, B=2048): forward-only ELBO for both formulations,
value_and_grad without Adam, Adam alone, and microbenchmarks of the small-op
suspects (chol 128, triangular solves, Kuf build, the G syrk).

Run ON THE TPU HOST:  python benchmarks/prof_svgp_parts.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import svgp as svgp_mod

    print("backend:", jax.default_backend())

    N, M, B = 10_963, 128, 2048
    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(0, 44 * 365, size=(N, 1))).astype(np.float32)
    Y = (np.sin(X / 200.0) + 0.1 * rng.normal(size=(N, 1))).astype(np.float32)
    Z = np.linspace(0, X.max(), M)[:, None].astype(np.float32)

    model = svgp_mod.SVGP.create(
        km.SquaredExponential.create(variance=1.0, lengthscales=300.0),
        inducing_points=jnp.asarray(Z),
    )
    model = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), model)
    Xb = jnp.asarray(X[:B]); Yb = jnp.asarray(Y[:B])
    wb = jnp.ones((B,), jnp.float32)
    optimizer = optax.adam(1e-2)
    flat, unravel = jax.flatten_util.ravel_pytree(model)
    STEPS = 2000

    def timed(name, fn_of_scalar, steps=STEPS):
        """fn_of_scalar: scalar -> scalar, jitted chain of `steps` couplings."""
        f = jax.jit(fn_of_scalar)
        v = float(np.asarray(f(jnp.asarray(1.0, jnp.float32))))
        assert np.isfinite(v), (name, v)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            _ = float(np.asarray(f(jnp.asarray(1.0 + 1e-7 * (i + 1),
                                               jnp.float32))))
            ts.append(time.perf_counter() - t0)
        print(f"{name:34s} {min(ts)/steps*1e6:8.1f} us/iter")
        return min(ts) / steps

    def chain(body):
        """Return scalar->scalar running `body(flat_params)->scalar` STEPS
        times with scalar coupling through the params."""
        def run(s):
            def step(carry, _):
                p = flat * (1.0 + 1e-9 * carry * s)
                out = body(p)
                return out, None
            out, _ = jax.lax.scan(step, jnp.asarray(0.0, jnp.float32),
                                  None, length=STEPS)
            return out
        return run

    def loss_pointwise(m):
        mean, var = svgp_mod.predict_f_guarded(m, Xb)
        ve = m.likelihood.variational_expectations(mean, var, Yb)
        return -(jnp.sum(ve * wb[:, None]) * (N / B) - svgp_mod.prior_kl(m))

    def loss_gram(m):
        return -svgp_mod.gaussian_elbo_gram(m, Xb, Yb, weights=wb, num_data=N)

    # full forwards
    timed("fwd pointwise", chain(lambda p: loss_pointwise(unravel(p))))
    timed("fwd gram", chain(lambda p: loss_gram(unravel(p))))
    # value+grad (sum grads into the coupling scalar)
    def vg_of(loss):
        def body(p):
            v, g = jax.value_and_grad(lambda q: loss(unravel(q)))(p)
            return v + 1e-20 * jnp.sum(g)
        return body
    timed("vg pointwise", chain(vg_of(loss_pointwise)))
    timed("vg gram", chain(vg_of(loss_gram)))

    # Adam alone on the model pytree
    opt_state = optimizer.init(model)
    g0 = jax.grad(lambda m: loss_gram(m))(model)
    def adam_chain(s):
        def step(carry, _):
            st, mflat = carry
            m = unravel(mflat * (1.0 + 1e-12 * s))
            updates, st = optimizer.update(g0, st, m)
            m2 = optax.apply_updates(m, updates)
            return (st, jax.flatten_util.ravel_pytree(m2)[0]), None
        (st, mf), _ = jax.lax.scan(step, (opt_state, flat), None, length=STEPS)
        return jnp.sum(mf)
    timed("adam only (pytree)", adam_chain)

    # microbenchmarks
    d2uu = jnp.asarray(((Z[:, 0][:, None] - Z[:, 0][None, :]) ** 2)
                       .astype(np.float32))
    d2uf = jnp.asarray(((Z[:, 0][:, None] - X[:B, 0][None, :]) ** 2)
                       .astype(np.float32))
    eyeM = jnp.eye(M, dtype=jnp.float32)

    def chol_chain(s):
        def step(carry, _):
            K = jnp.exp(-0.5 * d2uu / (300.0 ** 2)) * (1 + 1e-9 * carry * s)
            K = K + 1e-3 * eyeM
            L = jnp.linalg.cholesky(K)
            return jnp.sum(L[-1]), None
        out, _ = jax.lax.scan(step, jnp.asarray(0.0, jnp.float32),
                              None, length=STEPS)
        return out
    timed("chol(128) + Kuu build", chol_chain)

    def chol_vjp_chain(s):
        def step(carry, _):
            K = jnp.exp(-0.5 * d2uu / (300.0 ** 2)) * (1 + 1e-9 * carry * s)
            K = K + 1e-3 * eyeM
            v, g = jax.value_and_grad(
                lambda K: jnp.sum(jnp.linalg.cholesky(K)))(K)
            return v + 1e-20 * jnp.sum(g), None
        out, _ = jax.lax.scan(step, jnp.asarray(0.0, jnp.float32),
                              None, length=STEPS)
        return out
    timed("chol(128) value+grad", chol_vjp_chain)

    def trisolve_chain(s):
        L = jnp.linalg.cholesky(jnp.exp(-0.5 * d2uu / (300.0 ** 2)) + 1e-3 * eyeM)
        Kuf0 = jnp.exp(-0.5 * d2uf / (300.0 ** 2))
        def step(carry, _):
            Kuf = Kuf0 * (1 + 1e-9 * carry * s)
            A = jax.scipy.linalg.solve_triangular(L, Kuf, lower=True)
            return jnp.sum(A[-1]), None
        out, _ = jax.lax.scan(step, jnp.asarray(0.0, jnp.float32),
                              None, length=STEPS)
        return out
    timed("trisolve L\\Kuf (128x2048)", trisolve_chain)

    def triinv_chain(s):
        def step(carry, _):
            K = jnp.exp(-0.5 * d2uu / (300.0 ** 2)) * (1 + 1e-9 * carry * s)
            L = jnp.linalg.cholesky(K + 1e-3 * eyeM)
            Li = jax.scipy.linalg.solve_triangular(L, eyeM, lower=True)
            return jnp.sum(Li[-1]), None
        out, _ = jax.lax.scan(step, jnp.asarray(0.0, jnp.float32),
                              None, length=STEPS)
        return out
    timed("chol + triangular inverse", triinv_chain)

    def kuf_chain(s):
        def step(carry, _):
            Kuf = jnp.exp(-0.5 * d2uf / (300.0 ** 2) * (1 + 1e-9 * carry * s))
            return jnp.sum(Kuf[-1]), None
        out, _ = jax.lax.scan(step, jnp.asarray(0.0, jnp.float32),
                              None, length=STEPS)
        return out
    timed("Kuf build exp(128x2048)", kuf_chain)

    def syrk_chain(s):
        Kuf0 = jnp.exp(-0.5 * d2uf / (300.0 ** 2))
        def step(carry, _):
            Kuf = Kuf0 * (1 + 1e-9 * carry * s)
            G = Kuf @ Kuf.T
            return jnp.sum(G[-1]), None
        out, _ = jax.lax.scan(step, jnp.asarray(0.0, jnp.float32),
                              None, length=STEPS)
        return out
    timed("syrk G=Kuf Kuf^T", syrk_chain)


if __name__ == "__main__":
    main()
