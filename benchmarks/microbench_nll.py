"""Component micro-bench with perturbed inputs + forced host transfer."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

from portfoliooptgp_tpu.ops.pallas import nll as nm

B, N = 64, 256
STEPS = 50
rng = np.random.default_rng(0)
X = np.sort(rng.uniform(0, 360, size=(N, 1)), axis=0).astype(np.float32)
d2 = (X[:, None, 0] - X[None, :, 0]) ** 2
ls = np.geomspace(3, 60, B).astype(np.float32)
K = np.exp(-0.5 * d2[None] / (ls[:, None, None] ** 2)).astype(np.float32)
y = (np.sin(X[:, 0] / 30) + 0.1 * rng.normal(size=N)).astype(np.float32)
Kj = jnp.asarray(K); yj = jnp.broadcast_to(jnp.asarray(y), (B, N))
noise = jnp.full((B,), 1e-2, jnp.float32)


def chain_time(name, step, reps=4):
    @jax.jit
    def chain(K, y, noise):
        def body(carry, _):
            n = carry
            out = step(K, y, n)
            n = n + 1e-12 * out[:B]
            return n, None
        nf, _ = jax.lax.scan(body, noise, None, length=STEPS)
        return nf

    _ = np.asarray(chain(Kj, yj, noise))  # compile+warm
    times = []
    for i in range(reps):
        n2 = noise + 1e-7 * (i + 1)
        t0 = time.perf_counter()
        _ = np.asarray(chain(Kj, yj, n2))
        times.append(time.perf_counter() - t0)
    per = min(times) / STEPS
    print(f"{name:42s} {per*1e3:8.3f} ms/call")
    return per


chain_time("pallas factor_solve fwd",
           lambda K, y, n: nm._factor_solve(K, y, n, interpret=False)[0])

def fwd_plus_trinv(K, y, n):
    nll, L, a = nm._factor_solve(K, y, n, interpret=False)
    W = nm.triangular_inverse_pallas(L, interpret=False)
    return nll + W[0, :B, 0]

chain_time("pallas factor_solve + trinv", fwd_plus_trinv)

chain_time("pallas val+grad (custom VJP, full bwd)",
           lambda K, y, n: jax.value_and_grad(lambda nn: jnp.sum(nm.batched_nll(K, y, nn)))(n)[1])


def xla_nll(K, y, n):
    Ks = K + n[:, None, None] * jnp.eye(N, dtype=K.dtype)
    L = jnp.linalg.cholesky(Ks)
    a = jax.scipy.linalg.solve_triangular(L, y[..., None], lower=True)[..., 0]
    return 0.5 * jnp.sum(a * a, -1) + jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1) + 0.5 * N * np.log(2 * np.pi)

chain_time("XLA fwd", xla_nll)
chain_time("XLA val+grad",
           lambda K, y, n: jax.value_and_grad(lambda nn: jnp.sum(xla_nll(K, y, nn)))(n)[1])
