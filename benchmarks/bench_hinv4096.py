"""Interleaved A/B confirmation of the hinv tier at N=4096 (VERDICT r4
item 8): the round-4 1.73x came from separate chains; this pins the number
under the corrected protocol (one process, alternating variants, scan
chains coupled through gradients, scalar output pulled with np.asarray).

Large operands (d2 is 64 MB at N=4096) are passed as jit ARGUMENTS — a
closed-over device constant of that size trips the tunnel's HTTP 413
length limit on the remote-compile request (see prof_large_n2.py).

Run ON THE TPU HOST:  python benchmarks/bench_hinv4096.py [BxNxSTEPS ...]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

from portfoliooptgp_tpu.ops.pallas import blocked_nll as bn


def make_problem(B, N, seed=0):
    rng = np.random.default_rng(seed)
    X = np.sort(rng.uniform(0, 40 * N / 1024, size=N)).astype(np.float32)
    d2 = jnp.asarray((X[:, None] - X[None, :]) ** 2)
    y = (np.sin(X / 3.0) + 0.1 * rng.normal(size=N)).astype(np.float32)
    err = jnp.broadcast_to(jnp.asarray(y), (B, N))
    v = jnp.asarray(np.geomspace(0.5, 2.0, B), jnp.float32)
    l = jnp.asarray(np.geomspace(2, 16, B), jnp.float32)
    nz = jnp.full((B,), 1e-2, jnp.float32)
    return d2, err, v, l, nz


def chain_time(name, loss_vg, params0, d2, steps, reps):
    @jax.jit
    def chain(params, d2):
        def body(p, _):
            val, g = loss_vg(p, d2)
            p2 = jax.tree.map(lambda x, gx: x + 1e-9 * gx, p, g)
            return p2, None
        pf, _ = jax.lax.scan(body, params, None, length=steps)
        return sum(jnp.sum(x) for x in jax.tree.leaves(pf))

    _ = np.asarray(chain(params0, d2))  # compile + warm
    times = []
    for i in range(reps):
        p = jax.tree.map(lambda x: x * (1.0 + 1e-6 * (i + 1)), params0)
        t0 = time.perf_counter()
        _ = np.asarray(chain(p, d2))
        times.append(time.perf_counter() - t0)
    per = min(times) / steps
    print(f"  {name:24s} {per*1e3:9.3f} ms/step   "
          f"(reps {['%.1f' % (t*1e3/steps) for t in times]})", flush=True)
    return per


def bench(B, N, steps, reps=4):
    print(f"B={B} N={N} value+grad (v, l, noise, err), interleaved:",
          flush=True)
    d2, err, v, l, nz = make_problem(B, N)

    def hinv_loss(p, d2):
        v, l, nz, err = p
        K = v[:, None, None] * jnp.exp(-0.5 * d2[None] / (l[:, None, None] ** 2))
        return jnp.sum(bn.batched_nll_hinv(K, err, nz))

    def xla_loss(p, d2):
        v, l, nz, err = p
        K = v[:, None, None] * jnp.exp(-0.5 * d2[None] / (l[:, None, None] ** 2))
        Ks = K + nz[:, None, None] * jnp.eye(N, dtype=K.dtype)
        L = jnp.linalg.cholesky(Ks)
        a = jax.scipy.linalg.solve_triangular(L, err[..., None], lower=True)[..., 0]
        return jnp.sum(0.5 * jnp.sum(a * a, -1)
                       + jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
                       + 0.5 * N * np.log(2 * np.pi))

    p0 = (v, l, nz, err)
    hv = jax.value_and_grad(hinv_loss)
    xv = jax.value_and_grad(xla_loss)
    # interleave: alternate single-rep measurements A,B,A,B,... so chip-load
    # drift hits both variants equally; chain_time's reps loop does this by
    # being called twice per round below
    outs = {"hinv": [], "xla": []}
    for rnd in range(2):
        outs["hinv"].append(chain_time(f"hinv (round {rnd})", hv, p0, d2,
                                       steps, reps=2))
        outs["xla"].append(chain_time(f"XLA chol (round {rnd})", xv, p0, d2,
                                      steps, reps=2))
    hbest, xbest = min(outs["hinv"]), min(outs["xla"])
    print(f"  -> hinv {hbest*1e3:.2f} ms vs XLA {xbest*1e3:.2f} ms: "
          f"{xbest/hbest:.2f}x", flush=True)


if __name__ == "__main__":
    shapes = [(8, 4096, 12), (8, 2048, 24)]
    if len(sys.argv) > 1:
        shapes = [tuple(map(int, s.split("x"))) for s in sys.argv[1:]]
    for B, N, steps in shapes:
        bench(B, N, steps)
