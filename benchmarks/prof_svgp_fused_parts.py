"""Isolated timings of the fused SVGP gram kernels vs their XLA equivalent.

Measures (scan-chained, scalar-coupled, interleaved):
  - fused gram_reduce forward alone / value+grad
  - XLA gram phase (Kuf build + G syrk + mean + sq_err) forward / value+grad
  - cholesky_inverse_pair value+grad vs chol+trisolve finish value+grad
  - full fast step (gaussian_elbo_gram_fused + Adam), pytree vs flattened Adam

Run ON THE TPU HOST:  python benchmarks/prof_svgp_fused_parts.py
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
    from portfoliooptgp_tpu.ops import linalg
    from portfoliooptgp_tpu.ops.pallas import svgp_gram

    print("backend:", jax.default_backend())
    N, M, B = 10_963, 128, 2048
    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(0, 44 * 365, size=(N, 1))).astype(np.float32)
    Y = (np.sin(X / 200.0) + 0.1 * rng.normal(size=(N, 1))).astype(np.float32)
    Z = np.linspace(0, X.max(), M)[:, None].astype(np.float32)
    model = svgp_mod.SVGP.create(
        km.SquaredExponential.create(variance=1.0, lengthscales=300.0),
        inducing_points=jnp.asarray(Z))
    model = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), model)
    Xb = jnp.asarray(X[:B]); Yb = jnp.asarray(Y[:B])
    wb = jnp.ones((B,), jnp.float32)
    yv = Yb[:, 0]
    tv = jnp.asarray(rng.normal(size=(M,)).astype(np.float32))
    Zj = jnp.asarray(Z)
    STEPS = 1000

    def timed(name, fn_of_scalar, steps=STEPS):
        f = jax.jit(fn_of_scalar)
        v = float(np.asarray(f(jnp.asarray(1.0, jnp.float32))))
        assert np.isfinite(v), (name, v)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            _ = float(np.asarray(f(jnp.asarray(1.0 + 1e-7 * (i + 1),
                                               jnp.float32))))
            ts.append(time.perf_counter() - t0)
        print(f"{name:36s} {min(ts)/steps*1e6:8.1f} us/iter")

    def chain(body):
        def run(s):
            def step(carry, _):
                out = body(carry * s)
                return out, None
            out, _ = jax.lax.scan(step, jnp.asarray(1.0, jnp.float32),
                                  None, length=STEPS)
            return out
        return run

    v0 = jnp.asarray(1.0, jnp.float32)
    s0 = jnp.asarray(1.0 / 300.0 ** 2, jnp.float32)

    def fused_fwd(c):
        G, sq = svgp_gram.gram_reduce(Zj * c, Xb, yv, wb, tv, v0 * c, s0)
        return jnp.sum(G[-1]) * 1e-6 + sq * 1e-6

    timed("fused gram_reduce fwd", chain(fused_fwd))

    def fused_vg(c):
        val, grads = jax.value_and_grad(
            lambda z, v, s, t: (lambda o: jnp.sum(o[0][-1]) * 1e-6 + o[1] * 1e-6)(
                svgp_gram.gram_reduce(z, Xb, yv, wb, t, v, s)),
            argnums=(0, 1, 2, 3))(Zj * c, v0 * c, s0, tv)
        return val + 1e-20 * sum(jnp.sum(g) for g in grads)

    timed("fused gram_reduce vg", chain(fused_vg))

    def xla_gram(z, v, s, t):
        d2 = (z[:, 0][:, None] - Xb[:, 0][None, :]) ** 2
        Kuf = v * jnp.exp(-0.5 * s * d2)
        m = t @ Kuf
        e = yv - m
        sq = jnp.sum(wb * e * e)
        G = (Kuf * wb[None, :]) @ Kuf.T
        return jnp.sum(G[-1]) * 1e-6 + sq * 1e-6

    timed("xla gram phase fwd",
          chain(lambda c: xla_gram(Zj * c, v0 * c, s0, tv)))

    def xla_vg(c):
        val, grads = jax.value_and_grad(xla_gram, argnums=(0, 1, 2, 3))(
            Zj * c, v0 * c, s0, tv)
        return val + 1e-20 * sum(jnp.sum(g) for g in grads)

    timed("xla gram phase vg", chain(xla_vg))

    # M-phase: chol_inverse_pair vs trisolve finish, value+grad
    d2uu = jnp.asarray(((Z[:, 0][:, None] - Z[:, 0][None, :]) ** 2)
                       .astype(np.float32))
    G0 = jnp.asarray(rng.normal(size=(M, M)).astype(np.float32))
    G0 = G0 @ G0.T
    eyeM = jnp.eye(M, dtype=jnp.float32)

    def m_phase_pair(c):
        def f(c):
            K = jnp.exp(-0.5 * d2uu / (300.0 ** 2) * c) + 1e-3 * eyeM
            L, W = linalg.cholesky_inverse_pair(K)
            C = (W @ G0) @ W.T
            return jnp.trace(C) * 1e-3 + jnp.sum(L[-1]) * 1e-3
        val, g = jax.value_and_grad(f)(c)
        return val + 1e-20 * g

    timed("M-phase chol_inverse_pair vg", chain(m_phase_pair))

    def m_phase_trisolve(c):
        def f(c):
            K = jnp.exp(-0.5 * d2uu / (300.0 ** 2) * c) + 1e-3 * eyeM
            L = jnp.linalg.cholesky(K)
            HG = jax.scipy.linalg.solve_triangular(L, G0, lower=True)
            C = jax.scipy.linalg.solve_triangular(L, HG.T, lower=True)
            return jnp.trace(C) * 1e-3 + jnp.sum(L[-1]) * 1e-3
        val, g = jax.value_and_grad(f)(c)
        return val + 1e-20 * g

    timed("M-phase chol+trisolve vg", chain(m_phase_trisolve))

    # full fast steps: pytree Adam vs flattened Adam
    def make_step(optimizer):
        def loss(m):
            return -svgp_mod.gaussian_elbo_gram_fused(m, Xb, Yb, weights=wb,
                                                      num_data=N)
        st0 = optimizer.init(model)
        def run(s):
            def step(carry, _):
                m, st = carry
                l, g = jax.value_and_grad(loss)(m)
                up, st = optimizer.update(g, st, m)
                m = optax.apply_updates(m, up)
                return (m, st), l
            (m, st), _ = jax.lax.scan(
                step,
                (jax.tree.map(lambda p: p * (1 + 1e-12 * (s - 1)), model), st0),
                None, length=STEPS)
            return jax.tree.leaves(m)[0].reshape(-1)[0]
        return run

    timed("full fast step (pytree adam)", make_step(optax.adam(1e-2)))
    timed("full fast step (flat adam)",
          make_step(optax.flatten(optax.adam(1e-2))))


if __name__ == "__main__" and "--ard" not in sys.argv:
    main()


def ard_compare():
    """Fused vs XLA gram phase at ARD D=4 (the multi-input shape)."""
    import jax
    import jax.numpy as jnp

    from portfoliooptgp_tpu.ops.pallas import svgp_gram

    print("--- ARD D=4 ---")
    M, B, D = 128, 2048, 4
    rng = np.random.default_rng(1)
    Xb = jnp.asarray(rng.uniform(0, 3000, (B, D)).astype(np.float32))
    Zj = jnp.asarray(rng.uniform(0, 3000, (M, D)).astype(np.float32))
    yv = jnp.asarray(rng.normal(size=(B,)).astype(np.float32))
    wb = jnp.ones((B,), jnp.float32)
    tv = jnp.asarray(rng.normal(size=(M,)).astype(np.float32))
    v0 = jnp.asarray(1.0, jnp.float32)
    s0 = jnp.asarray(1.0 / np.array([200., 300., 400., 500.]) ** 2,
                     jnp.float32)
    STEPS = 1000

    def timed(name, fn):
        f = jax.jit(fn)
        v = float(np.asarray(f(jnp.asarray(1.0, jnp.float32))))
        assert np.isfinite(v), (name, v)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            _ = float(np.asarray(f(jnp.asarray(1.0 + 1e-7 * (i + 1),
                                               jnp.float32))))
            ts.append(time.perf_counter() - t0)
        print(f"{name:36s} {min(ts)/STEPS*1e6:8.1f} us/iter")

    def chain(body):
        def run(s):
            def step(carry, _):
                return body(carry * s), None
            out, _ = jax.lax.scan(step, jnp.asarray(1.0, jnp.float32),
                                  None, length=STEPS)
            return out
        return run

    def fused_obj(z, v, s, t):
        G, sq = svgp_gram.gram_reduce(z, Xb, yv, wb, t, v, s)
        return jnp.sum(G[-1]) * 1e-6 + sq * 1e-6

    def xla_obj(z, v, s, t):
        d2 = jnp.sum(
            s[None, None, :] * (z[:, None, :] - Xb[None, :, :]) ** 2, -1)
        Kuf = v * jnp.exp(-0.5 * d2)
        e = yv - t @ Kuf
        return (jnp.sum((Kuf * wb[None, :]) @ Kuf.T * 1e-6)
                + jnp.sum(wb * e * e) * 1e-6)

    for name, obj in (("fused", fused_obj), ("xla", xla_obj)):
        timed(f"ard {name} fwd", chain(lambda c, o=obj: o(Zj * c, v0, s0, tv)))

        def vg(c, o=obj):
            val, gr = jax.value_and_grad(o, argnums=(0, 1, 2, 3))(
                Zj * c, v0 * c, s0, tv)
            return val + 1e-20 * sum(jnp.sum(g) for g in gr)
        timed(f"ard {name} vg", chain(vg))


if __name__ == "__main__" and "--ard" in sys.argv:
    ard_compare()
