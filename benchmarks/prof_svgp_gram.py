"""A/B profile: per-point SVGP ELBO step vs Gram-accumulation step (v5e).

Measures full Adam train steps/s at the bench shape (N=10963, M=128,
B=2048, SE kernel, Gaussian likelihood) for:
  a) the historical per-point path (predict_f_guarded -> variational
     expectations -> sum), with its M x B triangular solve;
  b) the Gram-accumulation path (svgp.gaussian_elbo_gram).

Protocol per BENCH_NOTES.md: both variants compiled up front, timed reps
interleaved in ONE process, STEPS=2000 inside one lax.scan, scalar output
pulled with np.asarray.

Run ON THE TPU HOST:  python benchmarks/prof_svgp_gram.py
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

    def loss_pointwise(m, X, Y, w):
        mean, var = svgp_mod.predict_f_guarded(m, X)
        ve = m.likelihood.variational_expectations(mean, var, Y)
        scale = N / jnp.maximum(jnp.sum(w), 1.0)
        return -(jnp.sum(ve * w[:, None]) * scale - svgp_mod.prior_kl(m))

    def loss_gram(m, X, Y, w):
        return -svgp_mod.gaussian_elbo_gram(m, X, Y, weights=w, num_data=N)

    def loss_fused(m, X, Y, w):
        return -svgp_mod.gaussian_elbo_gram_fused(m, X, Y, weights=w,
                                                  num_data=N)
    assert svgp_mod.svgp_gram_fused_supported(model, Xb)

    STEPS = 2000

    def make_chain(loss_fn):
        def one_step(state, X, Y, w):
            (m, opt_state) = state
            loss, grads = jax.value_and_grad(loss_fn)(m, X, Y, w)
            updates, opt_state = optimizer.update(grads, opt_state, m)
            m = optax.apply_updates(m, updates)
            return (m, opt_state), loss

        @jax.jit
        def chain(state, s):
            st0 = jax.tree.map(lambda p: p * (1 + 1e-12 * (s - 1)), state)
            def body(c, _):
                st, _ = c
                st, loss = one_step(st, Xb, Yb, wb)
                return (st, loss), None
            (st, loss), _ = jax.lax.scan(
                body, (st0, jnp.asarray(0.0)), None, length=STEPS)
            return loss
        return chain

    chains = {
        "gram": make_chain(loss_gram),
        "fused": make_chain(loss_fused),
    }
    if "--pointwise" in sys.argv:
        chains["pointwise"] = make_chain(loss_pointwise)
    state = (model, optimizer.init(model))

    # compile + health check
    for name, ch in chains.items():
        t0 = time.perf_counter()
        loss = float(np.asarray(ch(state, jnp.asarray(1.0, jnp.float32))))
        print(f"{name}: compile+first {time.perf_counter()-t0:.1f}s "
              f"loss={loss:.3f} finite={np.isfinite(loss)}")

    # interleaved timing
    times = {k: [] for k in chains}
    for rep in range(4):
        for name, ch in chains.items():
            t0 = time.perf_counter()
            _ = float(np.asarray(ch(state,
                                    jnp.asarray(1.0 + 1e-6 * (rep + 1),
                                                jnp.float32))))
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        best = min(ts)
        print(f"{name}: {STEPS/best:,.0f} steps/s  "
              f"({best/STEPS*1e6:.1f} us/step)  reps={[f'{t:.3f}' for t in ts]}")


if __name__ == "__main__":
    main()
