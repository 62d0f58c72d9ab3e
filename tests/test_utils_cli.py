"""Utils (metrics/checkpoint/profiling), visualizer, and CLI surface tests."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.models import gpr
from portfoliooptgp_tpu.utils import checkpoint, metrics


def test_metrics_definitions():
    assert metrics.mse([1.0, 2.0], [1.0, 4.0]) == 2.0
    np.testing.assert_allclose(
        metrics.cumulative_return([0.1, -0.05]), 1.1 * 0.95 - 1, rtol=1e-12
    )
    assert metrics.daily_sharpe(0.02, 0.0, 0.01) == 2.0


def test_metrics_logger_jsonl(tmp_path):
    path = str(tmp_path / "m.jsonl")
    log = metrics.MetricsLogger(path=path)
    log.log("nll", 1.5, step=3, ticker="AAPL")
    log.log("nll", jnp.asarray(1.25), step=4)
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["metric"] == "nll" and lines[0]["step"] == 3
    assert lines[1]["value"] == 1.25
    assert len(log.records) == 2


def test_checkpoint_roundtrip(tmp_path):
    model = gpr.GPR.create(km.SquaredExponential.create(variance=2.5), 0.07)
    path = str(tmp_path / "ck" / "model.msgpack")
    checkpoint.save_array_tree(path, model)
    template = gpr.GPR.create(km.SquaredExponential.create(), 1.0)
    restored = checkpoint.load(path, template)
    np.testing.assert_allclose(
        float(restored.kernel.variance), float(model.kernel.variance), rtol=1e-12
    )
    np.testing.assert_allclose(
        float(restored.likelihood.variance), 0.07, rtol=1e-6
    )


def test_visualizer_writes_pngs(tmp_path, rng):
    from portfoliooptgp_tpu.viz import Visualizer

    v = Visualizer()
    X = np.linspace(0, 10, 40)[:, None]
    Y = np.sin(X)
    v.plot_data(X, Y, title="t", filename=str(tmp_path / "a.png"))
    v.plot_gp(X, Y, Y, np.full_like(Y, 0.01), filename=str(tmp_path / "b.png"))
    v.plot_gp_with_removed(X, Y, Y, np.full_like(Y, 0.01), X[:3], Y[:3],
                           filename=str(tmp_path / "c.png"))
    v.plot_backtest_cml({"sharpe": [0, 0.01, 0.02], "constant": [0, 0.005, 0.01]},
                        filename=str(tmp_path / "d.png"))
    v.plot_asset_allocations([np.full(5, 0.2)] * 2, list("ABCDE"),
                             filename=str(tmp_path / "e.png"))
    for f in "abcde":
        assert os.path.getsize(tmp_path / f"{f}.png") > 1000


def test_cli_print_config(capsys):
    from portfoliooptgp_tpu.cli import main

    main(["print-config"])
    out = capsys.readouterr().out
    cfg = json.loads(out)
    assert cfg["train"]["maxiter"] == 100
    assert cfg["portfolio"]["correlation_threshold"] == 0.30


def test_cli_help_lists_commands(capsys):
    from portfoliooptgp_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["--help"])
    out = capsys.readouterr().out
    for cmd in ["single-asset", "multi-input", "portfolio", "svgp", "nuts"]:
        assert cmd in out


def test_xplane_trace_contains_tier_scopes(tmp_path, rng):
    """--profile traces must identify each dispatch tier by name: the
    jax.named_scope annotations around the NLL tiers (models/gpr.py) and the
    fused SVGP gram scope appear in the captured XPlane artifacts
    (SURVEY.md §5 tracing; VERDICT r3 item 9)."""
    import jax

    from portfoliooptgp_tpu.models import svgp
    from portfoliooptgp_tpu.models.likelihoods import Gaussian
    from portfoliooptgp_tpu.train import lbfgs
    from portfoliooptgp_tpu.utils.profiling import trace

    X = jnp.asarray(np.sort(rng.uniform(0, 30, (64, 1))), jnp.float32)
    Y = jnp.asarray(rng.normal(size=(64, 1)), jnp.float32)
    models = [gpr.GPR.create(km.SquaredExponential.create(v, 3.0), 0.1)
              for v in (0.5, 1.0)]
    stacked = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32),
                           lbfgs.stack_pytrees(models))
    sv = svgp.SVGP.create(km.SquaredExponential.create(),
                          inducing_points=X[::8],
                          likelihood=Gaussian.create(0.1))
    sv = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), sv)

    # the scope names land in the compiled programs' op metadata, which is
    # what XProf renders as the trace hierarchy: assert on the lowered HLO
    hlo_nll = jax.jit(
        lambda s: gpr.batched_neg_log_marginal_likelihood(s, X, Y)
    ).lower(stacked).as_text(debug_info=True)
    assert "nll/fused_stationary" in hlo_nll
    hlo_sv = jax.jit(
        lambda m: svgp.gaussian_elbo_gram_fused(m, X, Y, num_data=64)
    ).lower(sv).as_text(debug_info=True)
    assert "svgp/gram_fast" in hlo_sv or "svgp/gram_fused" in hlo_sv

    # and a --profile capture produces XPlane artifacts
    logdir = str(tmp_path / "xplane")
    with trace(logdir):
        jax.block_until_ready(
            gpr.batched_neg_log_marginal_likelihood(stacked, X, Y))
    artifacts = [os.path.join(r, f) for r, _, fs in os.walk(logdir) for f in fs]
    assert artifacts, "no trace artifacts written"
