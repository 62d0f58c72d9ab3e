"""Benchmark: batched exact-GPR marginal-likelihood evals/s/chip.

The hot primitive of the reference is one L-BFGS iteration: build K(X,X),
factor, solve, log-det, NLL + gradients (GPR/model_trainer.py:18-19 inner
loop; SURVEY.md §3.3). The reference runs these sequentially, one model at a
time, in float64 on a single CPU. Here a *batch* of restarts runs as one
vmapped value_and_grad on the TPU in float32.

Prints one JSON line:
  {"metric": "gpr_nll_grad_evals_per_s_per_chip", "value": ..., "unit":
   "evals/s/chip", "vs_baseline": ...}
where the baseline is the same batched workload evaluated with single-process
numpy (LAPACK Cholesky) — a faithful stand-in for the reference's
TF-on-CPU float64 path, measured on this host.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH = 128  # simultaneous restarts/models. The reference's natural product
# is 8 kernels x 4 noise inits (32); walk-forward day-batching multiplies it
# by the horizon (pipelines/walk_forward.py: D days x R restarts routinely
# exceeds 128). B=128 amortizes the fused kernel's serial column loop over
# twice the lanes of B=64 (~1.9x evals/s, BENCH_NOTES round-3 lever #2).
N = 256  # observations per model
MAXN_TIMING_S = 20.0


def _make_problem(dtype):
    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(0, 360, size=(N, 1)), axis=0).astype(dtype)
    Y = (np.sin(X / 30.0) + 0.1 * rng.normal(size=(N, 1))).astype(dtype)
    variances = np.geomspace(0.1, 10.0, BATCH).astype(dtype)
    lengthscales = np.geomspace(3.0, 60.0, BATCH).astype(dtype)
    return X, Y, variances, lengthscales


def bench_tpu():
    import jax
    import jax.numpy as jnp

    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr
    from portfoliooptgp_tpu.train import lbfgs

    dtype = np.float32
    X, Y, variances, lengthscales = _make_problem(dtype)
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)

    models = [
        gpr.GPR.create(
            km.SquaredExponential.create(variance=float(v), lengthscales=float(l)),
            noise_variance=1e-2,
        )
        for v, l in zip(variances, lengthscales)
    ]
    stacked = lbfgs.stack_pytrees(models)

    def vg(params):
        # fused Pallas factor+solve+logdet path with its custom VJP
        return jax.value_and_grad(
            lambda m: jnp.sum(gpr.batched_neg_log_marginal_likelihood(m, Xj, Yj)),
        )(params)

    STEPS = 50  # dependent chain of value+grad evals inside one executable,
    # like the L-BFGS inner loop — measures device throughput, not RPC latency

    @jax.jit
    def chain(stacked):
        def body(carry, _):
            params = carry
            v, g = vg(params)
            # couple successive evals (tiny SGD step) so XLA cannot reorder
            # or elide iterations; keeps the workload identical per step
            params = jax.tree.map(lambda p, gg: p - 1e-9 * gg, params, g)
            return params, v
        _, vs = jax.lax.scan(body, stacked, None, length=STEPS)
        return vs

    vs = np.asarray(chain(stacked))
    assert bool(np.all(np.isfinite(vs[0]))), "non-finite NLL in benchmark"

    # The remote-execution tunnel memoizes identical (executable, inputs)
    # pairs and resolves block_until_ready on unmaterialized futures, so each
    # rep must perturb the inputs AND pull the result to the host. The
    # perturbed input ring is pre-built and device_put OUTSIDE the timed loop
    # so host tree_map + H2D transfer don't bias the measurement (ADVICE r1).
    # Ring must be larger than any possible rep count — cycling back to a
    # previously-used input would hand the tunnel an identical
    # (executable, input) pair to memoize. Each entry is a few KB of params.
    RING = 512
    ring = [
        jax.device_put(jax.tree.map(lambda p: p * (1.0 + 1e-7 * (i + 1)), stacked))
        for i in range(RING)
    ]
    for r in ring:
        jax.block_until_ready(r)

    reps = 0
    t0 = time.perf_counter()
    while True:
        vs = np.asarray(chain(ring[reps]))
        reps += 1
        dt = time.perf_counter() - t0
        if dt > 3.0 and reps >= 3 or dt > MAXN_TIMING_S or reps >= RING:
            break
    return BATCH * STEPS * reps / dt


def bench_numpy_baseline():
    """Reference-style CPU path: sequential float64 NLL+grad per model.
    Gradient cost emulated by the standard 3x-forward factor of reverse-mode
    autodiff over the Cholesky pipeline (TF's grad of cholesky+solves costs
    ~2 extra triangular-solve passes)."""
    dtype = np.float64
    X, Y, variances, lengthscales = _make_problem(dtype)

    def nll(v, l):
        d2 = (X[:, None, 0] - X[None, :, 0]) ** 2 / (l * l)
        K = v * np.exp(-0.5 * d2) + 1e-2 * np.eye(N)
        L = np.linalg.cholesky(K)
        a = np.linalg.solve(K, Y)
        return 0.5 * float((Y * a).sum()) + np.log(np.diag(L)).sum() + 0.5 * N * np.log(2 * np.pi)

    # warmup
    nll(variances[0], lengthscales[0])
    t0 = time.perf_counter()
    evals = 0
    while time.perf_counter() - t0 < 2.0:
        nll(variances[evals % BATCH], lengthscales[evals % BATCH])
        evals += 1
    dt = time.perf_counter() - t0
    forward_rate = evals / dt
    return forward_rate / 3.0  # value+grad ≈ 3x forward


SVGP_N, SVGP_M, SVGP_BATCH = 10_963, 128, 2048


def _svgp_problem():
    rng = np.random.default_rng(0)
    X = np.sort(rng.uniform(0, 44 * 365, size=(SVGP_N, 1))).astype(np.float32)
    Y = (np.sin(X / 200.0) + 0.1 * rng.normal(size=(SVGP_N, 1))).astype(np.float32)
    Z = np.linspace(0, X.max(), SVGP_M)[:, None].astype(np.float32)
    return X, Y, Z


def bench_svgp():
    """SVGP ELBO Adam train steps/s at full-AAPL scale (BASELINE north star).
    STEPS=2000 keeps the ~23 ms tunnel overhead at ~10% (BENCH_NOTES.md)."""
    import jax
    import jax.numpy as jnp

    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import svgp as svgp_mod
    from portfoliooptgp_tpu.parallel import elbo_sharded

    X, Y, Z = _svgp_problem()
    model = svgp_mod.SVGP.create(
        km.SquaredExponential.create(variance=1.0, lengthscales=300.0),
        inducing_points=jnp.asarray(Z),
    )
    model = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), model)
    init_fn, step_fn = elbo_sharded.make_elbo_train_step(num_data=SVGP_N)
    state = init_fn(model)
    Xb = jnp.asarray(X[:SVGP_BATCH]); Yb = jnp.asarray(Y[:SVGP_BATCH])
    wb = jnp.ones((SVGP_BATCH,), jnp.float32)
    STEPS = 2000

    @jax.jit
    def chain(state, s):
        st0 = jax.tree.map(lambda p: p * (1 + 1e-12 * (s - 1)), state)
        def body(c, _):
            st, _ = c
            st, loss = step_fn(st, Xb, Yb, wb)
            return (st, loss), None
        (st, loss), _ = jax.lax.scan(body, (st0, jnp.asarray(0.0)), None, length=STEPS)
        return loss

    loss = float(np.asarray(chain(state, jnp.asarray(1.0, jnp.float32))))
    assert np.isfinite(loss), "non-finite SVGP loss in benchmark"
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(np.asarray(chain(state, jnp.asarray(1.0 + 1e-6 * (i + 1), jnp.float32))))
        times.append(time.perf_counter() - t0)
    return STEPS / min(times)


def bench_svgp_numpy_baseline():
    """Reference-style CPU unit: one float64 minibatch ELBO evaluation
    (Kuu chol + Kuf solves + expectations) in numpy; grad emulated by the
    3x-forward reverse-mode factor, as in the GPR baseline."""
    X, Y, Z = _svgp_problem()
    Xb = X[:SVGP_BATCH].astype(np.float64); Yb = Y[:SVGP_BATCH].astype(np.float64)
    Zb = Z.astype(np.float64)
    ell, v, s2 = 300.0, 1.0, 1.0

    def elbo():
        d2uu = (Zb[:, 0][:, None] - Zb[:, 0][None, :]) ** 2
        Kuu = v * np.exp(-0.5 * d2uu / ell**2) + 1e-6 * np.eye(SVGP_M)
        Luu = np.linalg.cholesky(Kuu)
        d2uf = (Zb[:, 0][:, None] - Xb[:, 0][None, :]) ** 2
        Kuf = v * np.exp(-0.5 * d2uf / ell**2)
        A = np.linalg.solve(Luu, Kuf)
        mean = A.T @ np.zeros((SVGP_M,))
        var = v - np.sum(A * A, axis=0)
        ve = -0.5 * np.log(2 * np.pi * s2) - ((Yb[:, 0] - mean) ** 2 + var) / (2 * s2)
        return ve.sum()

    elbo()
    t0 = time.perf_counter()
    evals = 0
    while time.perf_counter() - t0 < 2.0:
        elbo()
        evals += 1
    return evals / (time.perf_counter() - t0) / 3.0


NUTS_N, NUTS_D = 512, 4


def bench_nuts():
    """NUTS draws/s on a REALISTIC 8-chain GPR hyperposterior (VERDICT r3
    item 4): N=512 multi-input data, ARD SquaredExponential over D=4
    feature dims — 6 free hyperparameters (4 lengthscales, variance, noise,
    the Multi-Input_GPR/main.py:409-412 composite shape) — dense Welford
    mass for the correlated variance↔lengthscale ridge, fused joint
    value+grad per leapfrog. Returns (draws_per_s, numpy_baseline)."""
    import jax
    import jax.numpy as jnp

    from portfoliooptgp_tpu import kernels as km
    from portfoliooptgp_tpu.models import gpr
    from portfoliooptgp_tpu.inference.fused_logdensity import (
        gpr_logdensity_pair, gpr_logdensity_vg)
    from portfoliooptgp_tpu.inference.sampler import (
        sample_nuts, centered_normal_logprior)

    Ng, D, NC, NW, NS = NUTS_N, NUTS_D, 8, 100, 200
    rng = np.random.default_rng(0)
    Xg = jnp.asarray(rng.uniform(0, 60, (Ng, D)), jnp.float32)
    f = (jnp.sin(Xg[:, 0] / 8.0) + 0.3 * jnp.cos(Xg[:, 1] / 5.0)
         + 0.05 * Xg[:, 2] / 10.0)
    Yg = (f + 0.1 * jnp.asarray(rng.normal(size=(Ng,)), jnp.float32))[:, None]
    m0 = gpr.GPR.create(
        km.SquaredExponential.create(1.0, np.full(D, 8.0)),
        noise_variance=0.1,
    )
    m0 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), m0)
    logprior = centered_normal_logprior(m0)
    logp, _ = gpr_logdensity_pair(Xg, Yg, logprior_fn=logprior)
    vg = gpr_logdensity_vg(Xg, Yg, logprior_fn=logprior)

    @jax.jit
    def run(key):
        samples, stats = sample_nuts(logp, m0, key, num_warmup=NW,
                                     num_samples=NS, num_chains=NC,
                                     max_depth=8, vg_fn=vg, dense_mass=True)
        return (jax.tree.leaves(samples)[0], stats.accept_prob.mean(),
                stats.num_leaves)

    s0, acc, leaves = run(jax.random.key(0))
    _ = np.asarray(s0)
    assert 0.5 < float(acc) < 1.0, f"NUTS acceptance off: {float(acc)}"
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        s, acc, lv = run(jax.random.key(i + 1))
        _ = np.asarray(s)
        times.append(time.perf_counter() - t0)
    draws_per_s = NC * (NW + NS) / min(times)

    # numpy f64 baseline: sequential chains; cost/draw = mean leaves x one
    # NLL+grad (grad emulated by the 3x-forward reverse-mode factor)
    mean_leaves = float(np.asarray(leaves).mean())
    Xn = np.asarray(Xg, np.float64); Yn = np.asarray(Yg, np.float64)

    def nll():
        d2 = sum(
            (Xn[:, d][:, None] - Xn[:, d][None, :]) ** 2 / 64.0
            for d in range(D)
        )
        K = np.exp(-0.5 * d2) + 0.1 * np.eye(Ng)
        L = np.linalg.cholesky(K)
        a = np.linalg.solve(L, Yn)
        return 0.5 * float((a * a).sum()) + np.log(np.diag(L)).sum()

    nll()
    t0 = time.perf_counter()
    evals = 0
    while time.perf_counter() - t0 < 1.0:
        nll()
        evals += 1
    eval_rate = evals / (time.perf_counter() - t0) / 3.0
    baseline = eval_rate / max(mean_leaves, 1.0)
    return draws_per_s, baseline


def bench_portfolio_e2e():
    """Flagship end-to-end workflow (VERDICT r4 item 2): the full 5-asset
    portfolio pipeline — walk-forward batched MLE per asset, cross-asset
    correlations, 5 strategies evaluated per day, backtests — on the chip,
    with quality metrics checked against the committed float64 goldens.
    Returns (elapsed_s, quality_ok, worst, goldens)."""
    import os
    import tempfile

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
    from bench_portfolio_e2e import (GOLDENS_PATH, compare_to_goldens,
                                     make_market, run_workflow)

    with tempfile.TemporaryDirectory() as root:
        make_market(root)
        elapsed, quality = run_workflow(root)
    with open(GOLDENS_PATH) as fh:
        goldens = json.load(fh)
    ok, worst = compare_to_goldens(quality, goldens)
    return elapsed, quality, ok, worst, goldens


def run_smoke_tier():
    """Real-chip regression gate (VERDICT r3 item 1): run the per-tier smoke
    checks (tools/smoke_tpu.py) before any timing, write SMOKE.json at the
    repo root with per-check max-abs-err, and print a summary JSON line so
    the driver's recorded bench tail carries the pass/fail of every Pallas
    dispatch tier each round."""
    import contextlib
    import io
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tools"))
    from smoke_tpu import run_smoke

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        results, backend = run_smoke()
    passed = sum(1 for r in results if r["ok"])
    artifact = {
        "backend": backend,
        "passed": passed,
        "total": len(results),
        "checks": results,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SMOKE.json"), "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(json.dumps({
        "metric": "smoke_checks_passed",
        "value": passed,
        "unit": f"of {len(results)} on-{backend} tier checks (SMOKE.json)",
        "vs_baseline": 1.0 if passed == len(results) else 0.0,
        "failed": [r["name"] for r in results if not r["ok"]],
    }))


def main():
    import os

    import jax

    # Persistent compilation cache (see utils/compile_cache.py and the
    # BENCH_NOTES round-5 section): first run populates, driver rounds and
    # user runs after that pay near-zero compile cost.
    from portfoliooptgp_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()

    use_cpu = "--cpu" in sys.argv
    if use_cpu:
        jax.config.update("jax_platforms", "cpu")

    if "--no-smoke" not in sys.argv:
        try:
            run_smoke_tier()
        except Exception as e:  # noqa: BLE001 — smoke must not block timing
            print(json.dumps({
                "metric": "smoke_checks_passed", "value": 0,
                "unit": "smoke tier crashed", "vs_baseline": 0.0,
                "error": f"{type(e).__name__}: {e}",
            }))

    # secondary BASELINE metrics first; the headline line LAST so the
    # driver's parsed record stays the GPR evals/s series
    try:
        e2e, quality, qok, worst, goldens = bench_portfolio_e2e()
        print(json.dumps({
            "metric": "portfolio_e2e_s",
            "value": round(e2e, 2),
            "unit": ("s (5 assets x walk-forward MLE -> 5 strategies -> "
                     "backtest; persistent compile cache — cold adds ~100 s "
                     "of one-time compiles; quality "
                     + ("matches" if qok else "MISMATCHES") + " f64 goldens, "
                     f"worst {worst['metric']}={worst['diff']:.4f})"),
            # baseline: the reference-shaped sequential per-day retraining
            # loop on this host's CPU (stored in the goldens artifact)
            "vs_baseline": round(
                goldens.get("cpu_sequential_seconds", 0.0) / e2e, 2),
        }))
    except Exception as e:  # noqa: BLE001 — e2e must not block the headline
        print(json.dumps({
            "metric": "portfolio_e2e_s", "value": 0,
            "unit": "e2e workflow crashed", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }))
    svgp = bench_svgp()
    svgp_base = bench_svgp_numpy_baseline()
    print(json.dumps({
        "metric": "svgp_elbo_train_steps_per_s",
        "value": round(svgp, 2),
        "unit": "steps/s (N=10963, M=128, batch=2048)",
        "vs_baseline": round(svgp / svgp_base, 2),
    }))
    nuts, nuts_base = bench_nuts()
    print(json.dumps({
        "metric": "nuts_draws_per_s",
        "value": round(nuts, 2),
        "unit": (f"draws/s (8 chains, N={NUTS_N} ARD D={NUTS_D} GPR "
                 "posterior, 6 hyperparams, dense mass)"),
        "vs_baseline": round(nuts / nuts_base, 2),
    }))
    value = bench_tpu()
    baseline = bench_numpy_baseline()
    print(
        json.dumps(
            {
                "metric": "gpr_nll_grad_evals_per_s_per_chip",
                "value": round(value, 2),
                "unit": f"evals/s/chip (B={BATCH}, N={N})",
                "vs_baseline": round(value / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
