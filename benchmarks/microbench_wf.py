"""Microbench: walk-forward masked NLL value+grad — fused masked Pallas
kernel vs the dense pad-and-mask XLA path, on the real TPU chip.

Workload: D days × R restarts rows over growing prefixes of N=256 rows —
the hot loss of pipelines/walk_forward.batched_walk_forward
(Multi-Input_GPR/main.py:414 walk-forward retraining). Uses the on-device
chain protocol (outputs feed the next step's inputs; see BENCH_NOTES.md):
per-call timing through the axon tunnel is dominated by ~30 ms RPC latency.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 30


def main():
    import jax
    import jax.numpy as jnp

    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr
    from portfoliooptgp_tpu.ops.pallas import stationary_nll as st
    from portfoliooptgp_tpu.pipelines.walk_forward import masked_nll
    from portfoliooptgp_tpu.train import lbfgs

    rng = np.random.default_rng(0)
    N, DAYS, R = 256, 32, 2
    B = DAYS * R
    dtype = jnp.float32

    X = jnp.asarray(np.sort(rng.uniform(0, 60, (N, 1)), axis=0), dtype)
    Y = jnp.asarray(np.sin(np.asarray(X) / 6.0) + 0.1 * rng.normal(size=(N, 1)), dtype)
    models = [
        gpr.GPR.create(
            km.SquaredExponential.create(variance=1.0 + 0.01 * i, lengthscales=5.0),
            noise_variance=1e-2 * (1 + (i % R)),
        )
        for i in range(B)
    ]
    stacked = jax.tree.map(lambda a: jnp.asarray(a, dtype), lbfgs.stack_pytrees(models))
    n_train = N - DAYS
    days = np.repeat(np.arange(DAYS), R)
    masks = jnp.asarray(
        (np.arange(N)[None, :] < (n_train + days)[:, None]).astype(np.float32)
    )

    def loss_fused(ms, Yp):
        sp = gpr.fused_stationary_spec(ms, X)
        noise = jax.vmap(lambda m: m.likelihood.variance)(ms)
        err = Yp[None, :, 0] * masks
        return jnp.sum(
            st.batched_nll_stationary_general(
                sp.families, sp.d2s, err, sp.vs, sp.ls, sp.als, noise, masks,
                dims=sp.dims)
        )

    def loss_dense(ms, Yp):
        return jnp.sum(jax.vmap(lambda m, msk: masked_nll(m, X, Yp, msk))(ms, masks))

    def chain_time(name, loss, reps=4):
        vg = jax.value_and_grad(loss, argnums=1)

        @jax.jit
        def chain(ms, Yp):
            def body(carry, _):
                v, g = vg(ms, carry)
                return carry + 1e-12 * g, None
            Yf, _ = jax.lax.scan(body, Yp, None, length=STEPS)
            return Yf

        _ = np.asarray(chain(stacked, Y))
        times = []
        for i in range(reps):
            t0 = time.perf_counter()
            _ = np.asarray(chain(stacked, Y * (1.0 + 1e-7 * (i + 1))))
            times.append(time.perf_counter() - t0)
        ms_step = min(times) / STEPS * 1e3
        print(f"{name:24s} {ms_step:8.3f} ms/step")
        return ms_step

    t_f = chain_time("fused masked v+g", loss_fused)
    t_d = chain_time("dense masked v+g", loss_dense)
    print(f"speedup: {t_d / t_f:.2f}x   (B={B}, N={N}, f32)")


if __name__ == "__main__":
    main()
