"""CG+SLQ matrix-free NLL at the reference's maximum scale (VERDICT r4
item 1b): N=10,963 — the full AAPL history consumed at
test_scripts/SVGP.py:473 — B=1, f32, vs XLA's dense value+grad (350.7
ms/iter, BENCH_NOTES round-4).

Timed boundary matches prof_large_n2.py: value+grad of the NLL w.r.t. K
(and y, noise). Accuracy: value + grad projections vs a float64 dense
reference computed on the host (scipy), quantifying the SLQ stochastic
logdet budget.

Run ON THE TPU HOST:  python benchmarks/bench_cg_large.py [--n 10963]
    [--probes 16] [--lanczos 32] [--tol 1e-4] [--xla] [--acc-only]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def arg(name, default, cast):
    if name in sys.argv:
        return cast(sys.argv[sys.argv.index(name) + 1])
    return default


def main():
    import jax
    import jax.numpy as jnp

    from portfoliooptgp_tpu.ops import iterative

    n = arg("--n", 10963, int)
    probes = arg("--probes", 16, int)
    lanczos = arg("--lanczos", 32, int)
    tol = arg("--tol", 1e-4, float)
    prank = arg("--precond", 0, int)
    iters = 3
    print(f"backend={jax.default_backend()} N={n} probes={probes} "
          f"lanczos={lanczos} cg_tol={tol}", flush=True)

    rng = np.random.default_rng(0)
    # full-AAPL-like problem: day-index inputs, z-scored targets, SE kernel
    # at a realistic daily lengthscale
    x = np.arange(n, dtype=np.float64)
    ls, v, nz = 30.0, 1.0, 0.1
    d2 = (x[:, None] - x[None, :]) ** 2
    K64 = v * np.exp(-0.5 * d2 / ls**2)
    del d2
    y64 = rng.standard_normal((n, 1))
    K = jnp.asarray(K64.astype(np.float32))
    y = jnp.asarray(y64.astype(np.float32))
    noise = jnp.asarray(nz, jnp.float32)
    key = jax.random.PRNGKey(0)

    def cg_loss(K, y, nzs):
        return iterative.nll_cg(K, y, nzs, key, probes, lanczos, tol)

    def pcg_loss(K, y, nzs):
        return iterative.nll_cg(K, y, nzs, key, probes, lanczos, tol, prank)

    # ---- accuracy vs the dense float64 host reference -------------------
    if "--xla-only" not in sys.argv and "--no-acc" not in sys.argv:
        import scipy.linalg as sla

        t0 = time.perf_counter()
        Ks64 = K64 + nz * np.eye(n)
        L64 = sla.cholesky(Ks64, lower=True)
        a64 = sla.solve_triangular(L64, y64, lower=True)
        alpha64 = sla.solve_triangular(L64.T, a64)
        val64 = float(0.5 * (y64 * alpha64).sum() + np.log(np.diag(L64)).sum()
                      + 0.5 * n * np.log(2 * np.pi))
        Winv64 = sla.solve_triangular(L64, np.eye(n), lower=True)
        Kinv64 = Winv64.T @ Winv64
        del Winv64, L64, Ks64
        dK64 = 0.5 * (Kinv64 - alpha64 @ alpha64.T)
        dnz64 = 0.5 * (np.trace(Kinv64) - float((alpha64 * alpha64).sum()))
        del Kinv64
        print(f"host f64 dense reference: {time.perf_counter()-t0:.0f}s "
              f"val={val64:.4f} dnoise={dnz64:.4f}", flush=True)

        acc_loss = pcg_loss if prank > 0 else cg_loss
        vg = jax.jit(jax.value_and_grad(acc_loss, argnums=(0, 1, 2)))
        t0 = time.perf_counter()
        val, (dK, dy, dnz) = vg(K, y, noise)
        val = float(np.asarray(val))
        print(f"[cg vg compile+first {time.perf_counter()-t0:.0f}s]",
              flush=True)

        _, aux = iterative._nll_cg_fwd_impl(K, y, noise, key, probes,
                                            lanczos, tol, prank)
        print(f"cg iterations: {int(np.asarray(aux.cg_iters))}", flush=True)

        # projections of dK onto random directions (full f64 dK in memory)
        dK32 = np.asarray(dK, dtype=np.float64)
        proj_err = []
        for s in range(4):
            V = np.random.default_rng(s).standard_normal((n, n)) * (1.0 / n)
            p_got, p_want = float((dK32 * V).sum()), float((dK64 * V).sum())
            proj_err.append(abs(p_got - p_want) / max(abs(p_want), 1e-12))
        rel_val = abs(val - val64) / abs(val64)
        rel_dnz = abs(float(np.asarray(dnz)) - dnz64) / max(abs(dnz64), 1e-12)
        dk_fro = float(np.linalg.norm(dK32 - dK64) / np.linalg.norm(dK64))
        print(f"accuracy: |dNLL|/|NLL| = {rel_val:.2e}  dnoise rel = "
              f"{rel_dnz:.2e}  dK Fro rel = {dk_fro:.2e}  dK projections "
              f"rel = {['%.2e' % e for e in proj_err]}", flush=True)
        del dK32, dK64

    if "--acc-only" in sys.argv:
        return

    # ---- timing: scan-chain, scalar out, K as a jit ARGUMENT ------------
    def timed(name, body, *ops):
        f = jax.jit(body)
        t0 = time.perf_counter()
        v = float(np.asarray(f(jnp.asarray(1.0, jnp.float32), *ops)))
        print(f"  [{name}: compile+first {time.perf_counter()-t0:.0f}s]",
              flush=True)
        assert np.isfinite(v), (name, v)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            _ = float(np.asarray(f(jnp.asarray(1.0 + 1e-7 * (i + 1),
                                               jnp.float32), *ops)))
            ts.append(time.perf_counter() - t0)
        print(f"{name:44s} {min(ts)/iters*1e3:9.1f} ms/iter", flush=True)

    def chain(body):
        def run(s, *ops):
            def step(c, _):
                return body(c * s, *ops), None
            out, _ = jax.lax.scan(step, jnp.asarray(1.0, jnp.float32),
                                  None, length=iters)
            return out
        return run

    def vg_of(f):
        def body(c, Kop):
            val, g = jax.value_and_grad(
                lambda Kk: jnp.sum(f(Kk, y, noise)))(Kop + c * 1e-9)
            return val * 1e-3 + 1e-20 * jnp.sum(g[-1, :])
        return body

    if "--xla-only" not in sys.argv:
        timed(f"cg+slq nll value+grad N={n}", chain(vg_of(cg_loss)), K)
        timed(f"cg+slq nll fwd N={n}",
              chain(lambda c, Kop: cg_loss(Kop + c * 1e-9, y, noise) * 1e-3), K)
        if prank > 0:
            _, auxp = iterative._nll_cg_fwd_impl(K, y, noise, key, probes,
                                                 lanczos, tol, prank)
            print(f"pcg(rank={prank}) iterations: "
                  f"{int(np.asarray(auxp.cg_iters))}", flush=True)
            timed(f"pcg(rank={prank})+slq nll value+grad N={n}",
                  chain(vg_of(pcg_loss)), K)
            timed(f"pcg(rank={prank})+slq nll fwd N={n}",
                  chain(lambda c, Kop: pcg_loss(Kop + c * 1e-9, y, noise)
                        * 1e-3), K)

    if "--xla" in sys.argv:

        def xla_nll(Kk, y, nzs):
            # diagonal added via scatter, NOT a closed-over jnp.eye: an
            # (N, N) constant is serialized into the remote-compile body
            # and trips the tunnel's HTTP 413 limit at N >= 8192
            idx = jnp.arange(n)
            Kj = Kk.at[idx, idx].add(nzs)
            L = jnp.linalg.cholesky(Kj)
            a = jax.lax.linalg.triangular_solve(
                L, y, left_side=True, lower=True)[:, 0]
            return (0.5 * jnp.sum(a * a)
                    + jnp.sum(jnp.log(jnp.diag(L))))
        timed(f"xla dense nll value+grad N={n}", chain(vg_of(xla_nll)), K)


if __name__ == "__main__":
    main()
