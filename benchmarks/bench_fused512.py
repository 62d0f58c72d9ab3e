"""A/B the extended N=512 build-in-VMEM fused stationary NLL vs the blocked
tier and XLA on the real TPU (VERDICT r4 item 3).

Protocol (BENCH_NOTES "Measurement-protocol correction"): interleaved in one
process, scan-chains with iteration coupling through the op's own gradients,
scalar output pulled with np.asarray, STEPS sized so the ~23 ms tunnel RPC is
≤10% of a rep.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

from portfoliooptgp_tpu.ops.pallas import blocked_nll as bn
from portfoliooptgp_tpu.ops.pallas import stationary_nll as st


def make_problem(B, N, seed=0):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(0, 360, size=N)).astype(np.float32)
    d2 = jnp.asarray((X[:, None] - X[None, :]) ** 2)
    y = (np.sin(X / 30) + 0.1 * rng.normal(size=N)).astype(np.float32)
    err = jnp.broadcast_to(jnp.asarray(y), (B, N))
    v = jnp.asarray(np.geomspace(0.5, 2.0, B), jnp.float32)
    l = jnp.asarray(np.geomspace(5, 60, B), jnp.float32)
    nz = jnp.full((B,), 1e-2, jnp.float32)
    return d2, err, v, l, nz


def chain_time(name, loss_vg, params0, steps, reps=4):
    """loss_vg(params) -> (scalar, grads-pytree). Couples iterations through
    the gradients so the tunnel cannot memoize; returns ms/step."""
    @jax.jit
    def chain(params):
        def body(p, _):
            val, g = loss_vg(p)
            p2 = jax.tree.map(lambda x, gx: x + 1e-9 * gx, p, g)
            return p2, None
        pf, _ = jax.lax.scan(body, params, None, length=steps)
        return sum(jnp.sum(x) for x in jax.tree.leaves(pf))

    _ = np.asarray(chain(params0))  # compile + warm
    times = []
    for i in range(reps):
        p = jax.tree.map(lambda x: x * (1.0 + 1e-6 * (i + 1)), params0)
        t0 = time.perf_counter()
        _ = np.asarray(chain(p))
        times.append(time.perf_counter() - t0)
    per = min(times) / steps
    print(f"  {name:28s} {per*1e3:9.3f} ms/step   (reps {['%.1f' % (t*1e3/steps) for t in times]})")
    return per


def bench(B, N, steps):
    print(f"B={B} N={N} value+grad (v, l, noise, err):")
    d2, err, v, l, nz = make_problem(B, N)

    def fused_loss(p):
        v, l, nz, err = p
        return jnp.sum(st.batched_nll_stationary(d2, err, v, l, nz, "se"))

    def xla_loss(p):
        v, l, nz, err = p
        K = v[:, None, None] * jnp.exp(-0.5 * d2[None] / (l[:, None, None] ** 2))
        Ks = K + nz[:, None, None] * jnp.eye(N, dtype=K.dtype)
        L = jnp.linalg.cholesky(Ks)
        a = jax.scipy.linalg.solve_triangular(L, err[..., None], lower=True)[..., 0]
        return jnp.sum(0.5 * jnp.sum(a * a, -1)
                       + jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
                       + 0.5 * N * np.log(2 * np.pi))

    def blocked_loss(p):
        v, l, nz, err = p
        K = v[:, None, None] * jnp.exp(-0.5 * d2[None] / (l[:, None, None] ** 2))
        return jnp.sum(bn.batched_nll_blocked(K, err, nz))

    p0 = (v, l, nz, err)
    out = {}
    out["fused"] = chain_time("fused stationary (new N=512)",
                              jax.value_and_grad(fused_loss), p0, steps)
    out["blocked"] = chain_time("blocked panel tier",
                                jax.value_and_grad(blocked_loss), p0, steps)
    out["xla"] = chain_time("XLA chol", jax.value_and_grad(xla_loss), p0, steps)
    print(f"  -> fused vs blocked {out['blocked']/out['fused']:.2f}x, "
          f"vs XLA {out['xla']/out['fused']:.2f}x")


if __name__ == "__main__":
    shapes = [(8, 512, 400), (32, 512, 200), (8, 384, 400)]
    if len(sys.argv) > 1:
        shapes = [tuple(map(int, s.split("x"))) for s in sys.argv[1:]]
    for B, N, steps in shapes:
        bench(B, N, steps)
