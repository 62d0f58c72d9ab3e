"""Micro-bench the fused stationary NLL path on the real TPU."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

from portfoliooptgp_tpu.ops.pallas import stationary_nll as st

B, N = 64, 256
STEPS = 50
rng = np.random.default_rng(0)
X = np.sort(rng.uniform(0, 360, size=N)).astype(np.float32)
d2 = ((X[:, None] - X[None, :]) ** 2).astype(np.float32)
err = (np.sin(X / 30)[None] + 0.1 * rng.normal(size=(B, N))).astype(np.float32)
v = np.geomspace(0.5, 5.0, B).astype(np.float32)
ell = np.geomspace(3, 60, B).astype(np.float32)
nz = np.full(B, 1e-2, np.float32)
args = tuple(map(jnp.asarray, (d2, err, v, ell, nz)))


def chain_time(name, step, reps=4):
    @jax.jit
    def chain(d2, err, v, ell, nz):
        def body(carry, _):
            n = carry
            out = step(d2, err, v, ell, n)
            return n + 1e-12 * out, None
        nf, _ = jax.lax.scan(body, nz, None, length=STEPS)
        return nf

    _ = np.asarray(chain(*args))
    times = []
    for i in range(reps):
        a2 = args[:4] + (args[4] + 1e-7 * (i + 1),)
        t0 = time.perf_counter()
        _ = np.asarray(chain(*a2))
        times.append(time.perf_counter() - t0)
    print(f"{name:44s} {min(times)/STEPS*1e3:8.3f} ms/call")


chain_time("fused stationary SE fwd",
           lambda d2, err, v, ell, n: st.batched_nll_stationary(d2, err, v, ell, n, "se"))
chain_time("fused stationary SE val+grad(v,l,nz,err)",
           lambda d2, err, v, ell, n: jax.grad(
               lambda vv, ee, ll, nn: jnp.sum(st.batched_nll_stationary(d2, ee, vv, ll, nn, "se")),
               argnums=(0, 1, 2, 3))(v, err, ell, n)[0])
