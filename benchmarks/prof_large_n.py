"""Large-N exact-GPR factorization study (VERDICT r3 item 3).

Question: at N in {2048, 4096}, is XLA's batched Cholesky at the MXU
roofline, or can a blocked right-looking factorization with reduced-
precision trailing syrks beat it >= 1.2x?

Measures (interleaved, scan-chained, scalar outputs):
  - matmul ceilings: N^3 dots at DEFAULT / HIGHEST precision
  - jnp.linalg.cholesky at B=8, N in {2048, 4096}
  - blocked XLA cholesky (panel P in {512, 1024}): XLA chol on the diagonal
    block + batched trisolve panel + trailing syrk at each precision,
    with max-abs-err vs the reference factor

Run ON THE TPU HOST:  python benchmarks/prof_large_n.py
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

    print("backend:", jax.default_backend())
    DEF = jax.lax.Precision.DEFAULT
    HIGHEST = jax.lax.Precision.HIGHEST

    def timed(name, fn_of_scalar, iters):
        f = jax.jit(fn_of_scalar)
        v = float(np.asarray(f(jnp.asarray(1.0, jnp.float32))))
        assert np.isfinite(v), (name, v)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            _ = float(np.asarray(f(jnp.asarray(1.0 + 1e-7 * (i + 1),
                                               jnp.float32))))
            ts.append(time.perf_counter() - t0)
        per = min(ts) / iters
        print(f"{name:46s} {per*1e3:9.3f} ms/iter")
        return per

    def chain(body, iters):
        def run(s):
            def step(carry, _):
                return body(carry * s), None
            out, _ = jax.lax.scan(step, jnp.asarray(1.0, jnp.float32),
                                  None, length=iters)
            return out
        return run

    rng = np.random.default_rng(0)

    # --- matmul ceiling at N=4096
    A4 = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
    for prec, label in ((DEF, "default"), (HIGHEST, "highest")):
        per = timed(
            f"matmul 4096^3 {label}",
            chain(lambda c, p=prec: jnp.sum(
                jax.lax.dot_general(A4 + c * 1e-9, A4, (((1,), (0,)), ((), ())),
                                    precision=p)[-1]) * 1e-9, 20), 20)
        print(f"    -> {2 * 4096**3 / per / 1e12:.1f} TFLOP/s")

    B = 8

    def make_spd(n):
        X = np.sort(rng.uniform(0, 40 * n / 1024, size=(n,))).astype(np.float32)
        d2 = (X[:, None] - X[None, :]) ** 2
        K = np.exp(-0.5 * d2 / 16.0) + 1e-2 * np.eye(n)
        return jnp.asarray(np.broadcast_to(K, (B, n, n)).copy())

    def blocked_chol(Ks, panel, prec):
        n = Ks.shape[-1]
        cols = []
        work = Ks
        for p0 in range(0, n, panel):
            nt = n - p0
            diag = work[:, :panel, :panel]
            Ld = jnp.linalg.cholesky(diag)
            if nt > panel:
                off = work[:, panel:, :panel]  # (B, nt-panel, panel)
                # solve Lo Ld^T = off  ->  Lo = off Ld^-T
                Lo = jax.lax.linalg.triangular_solve(
                    Ld, off, left_side=False, lower=True, transpose_a=True)
                upd = jax.lax.dot_general(
                    Lo, Lo, (((2,), (2,)), ((0,), (0,))), precision=prec)
                work = work[:, panel:, panel:] - upd
                colblk = jnp.concatenate([Ld, Lo], axis=1)  # (B, nt, panel)
            else:
                colblk = Ld
            cols.append(jnp.pad(colblk, ((0, 0), (p0, 0), (0, 0))))
        return jnp.concatenate(cols, axis=2)  # (B, n, n) lower

    for n in ([2048] if '--n2048' in sys.argv else [4096] if '--n4096' in sys.argv else [2048, 4096]):
        Ks = make_spd(n)
        iters = 4 if n == 4096 else 10

        ref = np.asarray(jnp.linalg.cholesky(Ks[:1]))[0]

        timed(f"xla cholesky B={B} N={n}",
              chain(lambda c: jnp.sum(jnp.linalg.cholesky(
                  Ks + c * 1e-9)[..., -1, :]) * 1e-3, iters), iters)

        for panel in (512,):
            for prec, label in ((DEF, "default"), (HIGHEST, "highest")):
                out = np.asarray(jax.jit(
                    lambda Ks, p=panel, pr=prec: blocked_chol(Ks, p, pr)
                )(Ks[:1]))[0]
                err = np.abs(np.tril(out) - np.tril(ref)).max()
                timed(f"blocked P={panel} {label} N={n} (err {err:.1e})",
                      chain(lambda c, p=panel, pr=prec: jnp.sum(
                          blocked_chol(Ks + c * 1e-9, p, pr)[..., -1, :])
                          * 1e-3, iters), iters)


if __name__ == "__main__":
    main()
