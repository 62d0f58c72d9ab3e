"""Data-parallel SVGP ELBO across the mesh — the BASELINE.json north star.

The reference evaluates the SVGP ELBO full-batch in one process
(`training_loss_closure((X, Y))`, test_scripts/SVGP.py:530-533). Here the
observation axis is sharded over the mesh `data` axis: every device computes
the variational-expectation sum for its shard, a single `psum` combines them,
and the KL term is added once. Gradients flow through the collective, so one
`jax.grad` of this loss is the distributed training step — no parameter
server, no NCCL; XLA compiles the reduction onto ICI.

Padding rows (to make N divide the mesh) carry weight 0 and contribute
exactly nothing.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from portfoliooptgp_tpu.models import svgp as svgp_mod
from portfoliooptgp_tpu.models.likelihoods import Gaussian
from portfoliooptgp_tpu.parallel.mesh import DATA_AXIS, pad_to_multiple


def weighted_expectation_sum(model, X, Y, w):
    """Σ_n w_n E_q[log p(y_n | f_n)] for the local shard."""
    mean, var = svgp_mod.predict_f_guarded(model, X)
    ve = model.likelihood.variational_expectations(mean, var, Y)
    return jnp.sum(ve * w[:, None])


def _is_gaussian(model) -> bool:
    return isinstance(model.likelihood, Gaussian)


def sharded_neg_elbo(model, X, Y, w, num_data: int, mesh: Mesh):
    """Negative ELBO with the data axis sharded over `mesh`.

    X, Y, w must be sharded with rows over DATA_AXIS (mesh.shard_batch);
    the model is replicated. Returns a scalar identical (up to float
    reduction order) to the single-device `svgp.elbo`.

    Gaussian likelihood takes the Gram-accumulation route
    (svgp.gaussian_elbo_gram): each shard reduces its rows into the additive
    (G, sq_err, kdiag_w, W) tuple, ONE psum of ~M²+3 floats combines them,
    and the M×M finish runs replicated — the collective payload is
    independent of the shard batch size.
    """

    if _is_gaussian(model):

        def local(model, Xl, Yl, wl):
            Luu = svgp_mod.gram_chol(model)
            if svgp_mod.svgp_gram_fused_supported(model, Xl):
                partials = svgp_mod.gram_partials_fused(model, Luu, Xl, Yl, wl)
            else:
                partials = svgp_mod.gram_partials(model, Luu, Xl, Yl, wl)
            partials = jax.lax.psum(partials, DATA_AXIS)
            # scale matches the historical sharded path: num_data / Σw
            G, sq_err, kdiag_w, W = partials
            elbo = svgp_mod.gram_finish(
                model, Luu, (G, sq_err, kdiag_w, W), num_data)
            return -elbo

    else:

        def local(model, Xl, Yl, wl):
            ve_local = weighted_expectation_sum(model, Xl, Yl, wl)
            ve_total = jax.lax.psum(ve_local, DATA_AXIS)
            n_total = jax.lax.psum(jnp.sum(wl), DATA_AXIS)
            scale = num_data / n_total
            return -(ve_total * scale - svgp_mod.prior_kl(model))

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return f(model, X, Y, w)


class TrainState(NamedTuple):
    model: svgp_mod.SVGP
    opt_state: optax.OptState


def make_elbo_train_step(
    num_data: int,
    mesh: Optional[Mesh] = None,
    optimizer: Optional[optax.GradientTransformation] = None,
    frozen=None,
    inner_steps: int = 1,
):
    """Build (init_fn, step_fn) for minibatched SVGP training.

    With inner_steps=1: step_fn(state, X, Y, w) -> (state, neg_elbo); jitted,
    and when a mesh is given the minibatch is consumed pre-sharded over
    DATA_AXIS with the psum reduction inside. This is the "ELBO steps/s at N
    hosts" benchmark unit.

    With inner_steps=K>1: step_fn consumes a SUPERBATCH (K, batch, ...) and
    runs K Adam steps in one `lax.scan` inside a single dispatch — the
    measured 1-step cost at batch=2048/M=128 was ~0.67 ms, dominated by
    dispatch + many small XLA ops, so scanning K steps amortizes the launch
    to ~1/K (VERDICT r1 item 7). Inner batches whose weights sum to zero
    (group-tail padding from the iterator) are skipped exactly: no Adam
    moment decay, no model update, loss carried from the last real batch.
    """
    optimizer = optimizer or optax.adam(1e-2)

    def loss_fn(model, X, Y, w):
        if mesh is not None and mesh.size > 1:
            return sharded_neg_elbo(model, X, Y, w, num_data, mesh)
        if _is_gaussian(model):
            # Gram-accumulation ELBO: batch collapses into one MXU syrk,
            # no M×B trisolve in forward or VJP; eligible f32 models run
            # the batch phase in one fused Pallas kernel pair
            return -svgp_mod.gaussian_elbo_gram_fused(model, X, Y, weights=w,
                                                      num_data=num_data)
        ve = weighted_expectation_sum(model, X, Y, w)
        scale = num_data / jnp.maximum(jnp.sum(w), 1.0)
        return -(ve * scale - svgp_mod.prior_kl(model))

    def init_fn(model) -> TrainState:
        return TrainState(model=model, opt_state=optimizer.init(model))

    def one_step(state: TrainState, X, Y, w):
        loss, grads = jax.value_and_grad(loss_fn)(state.model, X, Y, w)
        if frozen is not None:
            grads = jax.tree.map(
                lambda g, m: jnp.zeros_like(g) if m else g, grads, frozen
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.model)
        model = optax.apply_updates(state.model, updates)
        return TrainState(model=model, opt_state=opt_state), loss

    if inner_steps == 1:

        @jax.jit
        def step_fn(state: TrainState, X, Y, w):
            return one_step(state, X, Y, w)

    else:

        @jax.jit
        def step_fn(state: TrainState, Xs, Ys, ws):
            # carry dtype = the actual loss dtype, NOT the data dtype —
            # cond branches must agree even for f64 inputs/f32 params
            loss_dtype = jax.eval_shape(
                loss_fn, state.model, Xs[0], Ys[0], ws[0]
            ).dtype

            def body(carry, batch):
                st, last = carry
                Xb, Yb, wb = batch
                real = jnp.sum(wb) > 0.0

                def do(_):
                    st2, loss = one_step(st, Xb, Yb, wb)
                    return st2, loss

                st2, loss = jax.lax.cond(real, do, lambda _: (st, last), None)
                return (st2, loss), None

            (state, loss), _ = jax.lax.scan(
                body, (state, jnp.asarray(jnp.inf, loss_dtype)), (Xs, Ys, ws)
            )
            return state, loss

    return init_fn, step_fn


def prepare_global_batch(mesh: Mesh, X, Y):
    """Pad rows to the mesh data-axis size and shard; returns (X, Y, w)."""
    from portfoliooptgp_tpu.parallel.mesh import data_sharding

    n_shards = mesh.shape[DATA_AXIS]
    Xp, Yp, w = pad_to_multiple(jnp.asarray(X), jnp.asarray(Y), n_shards)
    sh = data_sharding(mesh)
    wsh = jax.NamedSharding(mesh, P(DATA_AXIS))
    return (
        jax.device_put(Xp, sh),
        jax.device_put(Yp, sh),
        jax.device_put(w, wsh),
    )
