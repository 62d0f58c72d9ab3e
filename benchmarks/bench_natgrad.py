"""NatGrad+Adam vs plain Adam for the SVGP bench workload (VERDICT r4
item 5): steps/s AND ELBO-vs-wallclock at the bench shape (N=10,963,
M=128, minibatch=2048 — the full-AAPL SVGP scale, test_scripts/SVGP.py:473).

GPflow's canonical recipe pairs NaturalGradient on (q_mu, q_sqrt) with Adam
on the hyperparameters; this measures what that buys on-chip against the
fused plain-Adam step (elbo_sharded.make_elbo_train_step).

Run ON THE TPU HOST:  python benchmarks/bench_natgrad.py [--gamma 0.1]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, M, B = 10_963, 128, 2048


def arg(name, default, cast):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import svgp as svgp_mod
    from portfoliooptgp_tpu.parallel import elbo_sharded
    from portfoliooptgp_tpu.train import natgrad

    gamma = arg("--gamma", 0.1, float)
    print(f"backend={jax.default_backend()} N={N} M={M} B={B} gamma={gamma}",
          flush=True)

    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(0, 44 * 365, size=(N, 1))).astype(np.float32)
    Y = (np.sin(X / 200.0) + 0.1 * rng.normal(size=(N, 1))).astype(np.float32)
    Z = np.linspace(0, X.max(), M)[:, None].astype(np.float32)
    model0 = svgp_mod.SVGP.create(
        km.SquaredExponential.create(variance=1.0, lengthscales=300.0),
        inducing_points=jnp.asarray(Z),
    )
    model0 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), model0)
    Xb = jnp.asarray(X[:B]); Yb = jnp.asarray(Y[:B])
    wb = jnp.ones((B,), jnp.float32)
    Xe = jnp.asarray(X[B:2 * B]); Ye = jnp.asarray(Y[B:2 * B])  # held-out eval

    # --- the two contenders -------------------------------------------------
    adam_init, adam_step = elbo_sharded.make_elbo_train_step(
        num_data=N, optimizer=optax.adam(1e-2))
    ng_init, ng_step = natgrad.make_natgrad_train_step(
        num_data=N, hyper_optimizer=optax.adam(1e-2), gamma=gamma)

    def eval_elbo(model):
        return svgp_mod.elbo(model, Xe, Ye, num_data=N)

    def timed_chain(name, init, step, get_model, steps, reps=3):
        @jax.jit
        def chain(state, s):
            st0 = jax.tree.map(lambda p: p * (1 + 1e-12 * (s - 1)), state)
            def body(c, _):
                st, _ = c
                st, loss = step(st, Xb, Yb)
                return (st, loss), None
            (st, loss), _ = jax.lax.scan(
                body, (st0, jnp.asarray(0.0, jnp.float32)), None, length=steps)
            return loss

        state = init(model0)
        loss = float(np.asarray(chain(state, jnp.asarray(1.0, jnp.float32))))
        assert np.isfinite(loss), (name, loss)
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            _ = float(np.asarray(chain(
                state, jnp.asarray(1.0 + 1e-6 * (i + 1), jnp.float32))))
            times.append(time.perf_counter() - t0)
        rate = steps / min(times)
        print(f"{name:32s} {rate:10.1f} steps/s  ({1e6/rate:7.1f} us/step)",
              flush=True)
        return rate

    # adapt the plain-Adam step (state, X, Y, w) to the (state, X, Y) shape
    adam_rate = timed_chain(
        "plain Adam (fused gram)", adam_init,
        lambda st, X, Y: adam_step(st, X, Y, wb), None, steps=2000)
    ng_rate = timed_chain(
        "NatGrad(q) + Adam(hyper)", ng_init, ng_step, None, steps=500)

    # --- ELBO vs wallclock to a fixed target --------------------------------
    # run k steps from the same init, evaluate the held-out-batch ELBO; the
    # wallclock axis uses the measured steps/s above
    from functools import partial

    @partial(jax.jit, static_argnums=0)
    def run_adam(k):
        def body(c, _):
            st, _ = c
            st, loss = adam_step(st, Xb, Yb, wb)
            return (st, loss), None
        (st, _), _ = jax.lax.scan(
            body, (adam_init(model0), jnp.asarray(0.0, jnp.float32)),
            None, length=k)
        return eval_elbo(st.model)

    @partial(jax.jit, static_argnums=0)
    def run_ng(k):
        def body(c, _):
            st, _ = c
            st, loss = ng_step(st, Xb, Yb)
            return (st, loss), None
        (st, _), _ = jax.lax.scan(
            body, (ng_init(model0), jnp.asarray(0.0, jnp.float32)),
            None, length=k)
        return eval_elbo(st.model)

    print("\nELBO (held-out batch) vs wallclock:", flush=True)
    print(f"{'steps':>8s} {'adam ELBO':>12s} {'adam ms':>9s} "
          f"{'ng ELBO':>12s} {'ng ms':>9s}", flush=True)
    for k in (10, 30, 100, 300, 1000, 3000):
        ea = float(np.asarray(run_adam(k)))
        en = float(np.asarray(run_ng(k)))
        print(f"{k:8d} {ea:12.1f} {k/adam_rate*1e3:9.1f} "
              f"{en:12.1f} {k/ng_rate*1e3:9.1f}", flush=True)


if __name__ == "__main__":
    main()
