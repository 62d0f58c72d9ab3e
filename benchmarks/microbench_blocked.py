"""Micro-bench the blocked large-N NLL vs XLA on the real TPU."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

from portfoliooptgp_tpu.ops.pallas import blocked_nll as bn

STEPS = 10


def bench(B, N):
    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(0, 360, size=N)).astype(np.float32)
    d2 = (X[:, None] - X[None, :]) ** 2
    ls = np.geomspace(3, 60, B).astype(np.float32)
    K = np.exp(-0.5 * d2[None] / (ls[:, None, None] ** 2)).astype(np.float32)
    y = (np.sin(X / 30) + 0.1 * rng.normal(size=N)).astype(np.float32)
    Kj = jnp.asarray(K); yj = jnp.broadcast_to(jnp.asarray(y), (B, N))
    noise = jnp.full((B,), 1e-2, jnp.float32)

    def chain_time(name, step, reps=3):
        @jax.jit
        def chain(K, y, noise):
            def body(carry, _):
                n = carry
                out = step(K, y, n)
                return n + 1e-12 * out[:B], None
            nf, _ = jax.lax.scan(body, noise, None, length=STEPS)
            return nf

        _ = np.asarray(chain(Kj, yj, noise))
        times = []
        for i in range(reps):
            n2 = noise + 1e-7 * (i + 1)
            t0 = time.perf_counter()
            _ = np.asarray(chain(Kj, yj, n2))
            times.append(time.perf_counter() - t0)
        per = min(times) / STEPS
        print(f"B={B} N={N} {name:34s} {per*1e3:9.3f} ms/call")

    chain_time("blocked pallas fwd",
               lambda K, y, n: bn._blocked_factor_solve(K, y, n, interpret=False)[0])
    chain_time("blocked pallas val+grad",
               lambda K, y, n: jax.value_and_grad(lambda nn: jnp.sum(bn.batched_nll_blocked(K, y, nn)))(n)[1])

    def xla_nll(K, y, n):
        Ks = K + n[:, None, None] * jnp.eye(N, dtype=K.dtype)
        L = jnp.linalg.cholesky(Ks)
        a = jax.scipy.linalg.solve_triangular(L, y[..., None], lower=True)[..., 0]
        return 0.5 * jnp.sum(a * a, -1) + jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1) + 0.5 * N * np.log(2 * np.pi)

    chain_time("XLA fwd", xla_nll)
    chain_time("XLA val+grad",
               lambda K, y, n: jax.value_and_grad(lambda nn: jnp.sum(xla_nll(K, y, nn)))(n)[1])


if __name__ == "__main__":
    shapes = [(32, 512), (8, 1024)] if len(sys.argv) < 2 else [tuple(map(int, sys.argv[1].split("x")))]
    for B, N in shapes:
        bench(B, N)
