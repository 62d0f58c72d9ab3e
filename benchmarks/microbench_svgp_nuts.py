"""SVGP ELBO steps/s and NUTS samples/s on the real TPU chip.

Memoization-proof protocol: perturb inputs per rep + force host transfer
(see BENCH_NOTES.md)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

from portfoliooptgp_tpu import kernels as km
from portfoliooptgp_tpu.models import gpr, svgp as svgp_mod
from portfoliooptgp_tpu.parallel import elbo_sharded

# ---- SVGP: full AAPL scale (N=10,963), M=128 inducing, batch 2048 ----
N, M, BATCH_SZ = 10_963, 128, 2048
rng = np.random.default_rng(0)
X = np.sort(rng.uniform(0, 44 * 365, size=(N, 1))).astype(np.float32)
Y = (np.sin(X / 200.0) + 0.1 * rng.normal(size=(N, 1))).astype(np.float32)
Z = np.linspace(0, X.max(), M)[:, None].astype(np.float32)

model = svgp_mod.SVGP.create(
    km.SquaredExponential.create(variance=1.0, lengthscales=300.0),
    inducing_points=jnp.asarray(Z),
)
model = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), model)
init_fn, step_fn = elbo_sharded.make_elbo_train_step(num_data=N)
state = init_fn(model)
Xb = jnp.asarray(X[:BATCH_SZ]); Yb = jnp.asarray(Y[:BATCH_SZ])
wb = jnp.ones((BATCH_SZ,), jnp.float32)

# STEPS must be large enough to amortize the ~23 ms fixed RPC overhead of one
# tunnel round-trip: at STEPS=50 that overhead alone is 460 us/step and
# dominates the measurement (this understated round-2's SVGP number by ~4x).
# At STEPS=2000 it contributes ~12 us/step (~10%).
STEPS = 2000

@jax.jit
def chain(state, Xb, Yb, wb):
    def body(carry, _):
        st, _ = carry
        st, loss = step_fn.__wrapped__(st, Xb, Yb, wb) if hasattr(step_fn, "__wrapped__") else step_fn(st, Xb, Yb, wb)
        return (st, loss), None
    (st, loss), _ = jax.lax.scan(body, (state, jnp.asarray(0.0)), None, length=STEPS)
    return loss

loss = np.asarray(chain(state, Xb, Yb, wb))
times = []
for i in range(4):
    t0 = time.perf_counter()
    _ = np.asarray(chain(state, Xb * (1 + 1e-7 * (i + 1)), Yb, wb))
    times.append(time.perf_counter() - t0)
sps = STEPS / min(times)
print(f"SVGP ELBO steps/s (N={N}, M={M}, batch={BATCH_SZ}): {sps:,.0f}  (loss {float(loss):.1f})")

# ---- NUTS: hyperparameter posterior of an exact GPR, 8 chains ----
# The target is the PROPER posterior: marginal likelihood x weak N(init, 2^2)
# prior on raw hyperparameters (centered_normal_logprior). The bare marginal
# likelihood is an improper ridge posterior that forces ~0.01 step sizes and
# 127-leaf trees; the proper target needs ~8 (see sampler.py docstring).
# One flat-prior line is kept to show that geometry cost explicitly.
from portfoliooptgp_tpu.inference.sampler import sample_nuts, centered_normal_logprior

Ng = 128
Xg = jnp.asarray(np.sort(rng.uniform(0, 60, (Ng, 1))), jnp.float32)
Yg = jnp.sin(Xg / 8.0) + 0.1 * jnp.asarray(rng.normal(size=(Ng, 1)), jnp.float32)
m0 = gpr.GPR.create(km.SquaredExponential.create(1.0, 5.0), noise_variance=0.1)
m0 = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), m0)
logprior = centered_normal_logprior(m0)

NW, NS, NC = 100, 200, 8

from portfoliooptgp_tpu.inference.fused_logdensity import (
    gpr_logdensity_pair, gpr_logdensity_vg)

def logdensity(m):
    return gpr.log_marginal_likelihood(m, Xg, Yg) + logprior(m)

fused_logp, fused_grad = gpr_logdensity_pair(Xg, Yg, logprior_fn=logprior)
fused_vg = gpr_logdensity_vg(Xg, Yg, logprior_fn=logprior)
flat_logp, _ = gpr_logdensity_pair(Xg, Yg)
flat_vg = gpr_logdensity_vg(Xg, Yg)

def measure(name, logp, grad, vg=None):
    @jax.jit
    def run(key):
        samples, stats = sample_nuts(logp, m0, key, num_warmup=NW,
                                     num_samples=NS, num_chains=NC,
                                     max_depth=8, grad_fn=grad, vg_fn=vg)
        return jax.tree.leaves(samples)[0], stats.accept_prob.mean()

    s0, acc = run(jax.random.key(0))
    _ = np.asarray(s0)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        s, acc = run(jax.random.key(i + 1))
        _ = np.asarray(s)
        times.append(time.perf_counter() - t0)
    total_draws = NC * (NW + NS)
    print(f"NUTS draws/s [{name}] (N={Ng} GPR posterior, {NC} chains, depth<=8): "
          f"{total_draws/min(times):,.0f}  (mean accept {float(acc):.2f})")

measure("vmapped XLA", logdensity, None)
measure("fused pallas joint v+g", fused_logp, None, fused_vg)
measure("fused pallas pair (sep logp/grad)", fused_logp, fused_grad)
measure("fused v+g, improper flat-prior ridge", flat_logp, None, flat_vg)
