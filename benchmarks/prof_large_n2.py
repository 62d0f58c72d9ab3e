"""Stage 2 of the large-N study: forward/backward pieces in isolation.

XLA's chol AND trisolve are per-column latency bound (~3.5 us/col at B=8),
so the lever is replacing serial loops, not re-blocking around them:
  - blocked_cholesky (Pallas 128-col panel factor + MXU syrk) fwd
  - XLA cholesky fwd
  - XLA triangular_solve vs identity (the backward's W)
  - blocked_triangular_inverse (Pallas diag blocks + MXU combine)
  - full batched_nll_blocked value+grad vs the XLA NLL value+grad

Run ON THE TPU HOST:
  python benchmarks/prof_large_n2.py --n2048 | --n4096
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

    from portfoliooptgp_tpu.ops.pallas import blocked_nll as bn

    print("backend:", jax.default_backend(), flush=True)
    n = 4096 if "--n4096" in sys.argv else 2048
    B = 8
    iters = 4 if n == 4096 else 8
    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(0, 40 * n / 1024, size=(n,))).astype(np.float32)
    d2 = (X[:, None] - X[None, :]) ** 2
    K = (np.exp(-0.5 * d2 / 16.0) + 1e-2 * np.eye(n)).astype(np.float32)
    Ks = jnp.asarray(np.broadcast_to(K, (B, n, n)).copy())
    y = jnp.asarray(rng.normal(size=(B, n)).astype(np.float32))
    noise = jnp.full((B,), 1e-2, jnp.float32)

    def timed(name, fn_of_scalar, *args):
        # big operands must be explicit jit ARGUMENTS: closed-over device
        # arrays are serialized into the remote-compile request body and a
        # (8, 4096, 4096) constant trips the tunnel's HTTP 413 length limit
        f = jax.jit(fn_of_scalar)
        t0 = time.perf_counter()
        v = float(np.asarray(f(jnp.asarray(1.0, jnp.float32), *args)))
        print(f"  [{name}: compile+first {time.perf_counter()-t0:.0f}s]",
              flush=True)
        assert np.isfinite(v), (name, v)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            _ = float(np.asarray(f(jnp.asarray(1.0 + 1e-7 * (i + 1),
                                               jnp.float32), *args)))
            ts.append(time.perf_counter() - t0)
        print(f"{name:40s} {min(ts)/iters*1e3:9.3f} ms/iter", flush=True)

    def chain(body):
        def run(s, *ops):
            def step(carry, _):
                return body(carry * s, *ops), None
            out, _ = jax.lax.scan(step, jnp.asarray(1.0, jnp.float32),
                                  None, length=iters)
            return out
        return run

    if "--vg-only" not in sys.argv:
        _fwd_pieces = True
    else:
        _fwd_pieces = False
    if _fwd_pieces:
        timed(f"xla cholesky fwd N={n}",
              chain(lambda c: jnp.sum(
                  jnp.linalg.cholesky(Ks + c * 1e-9)[..., -1, :]) * 1e-3))

        timed(f"pallas blocked_cholesky fwd N={n}",
              chain(lambda c: jnp.sum(
                  bn.blocked_cholesky(Ks + c * 1e-9)[0][..., -1, :]) * 1e-3))

        L0 = jnp.linalg.cholesky(Ks)
        eye = jnp.eye(n, dtype=jnp.float32)

        timed(f"xla trisolve vs I N={n}",
              chain(lambda c: jnp.sum(jax.lax.linalg.triangular_solve(
                  L0 + c * 1e-12, jnp.broadcast_to(eye, (B, n, n)),
                  left_side=True, lower=True)[..., -1, :]) * 1e-3))

        timed(f"pallas blocked_triangular_inverse N={n}",
              chain(lambda c: jnp.sum(
                  bn.blocked_triangular_inverse(L0 + c * 1e-12)[..., -1, :])
                  * 1e-3))
    eye = jnp.eye(n, dtype=jnp.float32)

    def xla_nll(K, y, noise):
        Kj = K + noise[:, None, None] * eye
        L = jnp.linalg.cholesky(Kj)
        a = jax.lax.linalg.triangular_solve(
            L, y[:, :, None], left_side=True, lower=True)[:, :, 0]
        return (0.5 * jnp.sum(a * a, -1)
                + jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1))

    def vg_of(f):
        def body(c, Kop):
            val, g = jax.value_and_grad(
                lambda K: jnp.sum(f(K, y, noise)))(Kop + c * 1e-9)
            return val * 1e-3 + 1e-20 * jnp.sum(g[..., -1, :])
        return body

    variants = {
        "xla": lambda: timed(f"xla nll value+grad N={n}",
                             chain(vg_of(xla_nll)), Ks),
        "blocked": lambda: timed(
            f"blocked nll value+grad N={n}",
            chain(vg_of(lambda K, y, nz: bn.batched_nll_blocked(K, y, nz))),
            Ks),
        "hinv": lambda: timed(
            f"hinv nll value+grad N={n}",
            chain(vg_of(lambda K, y, nz: bn.batched_nll_hinv(K, y, nz))), Ks),
        "hinvfwd": lambda: timed(
            f"hinv nll fwd N={n}",
            chain(lambda c, Kop: jnp.sum(bn.batched_nll_hinv(
                Kop + c * 1e-9, y, noise)) * 1e-3), Ks),
    }
    chosen = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--variant=")]
    for name in (chosen or list(variants)):
        variants[name]()


if __name__ == "__main__":
    main()
