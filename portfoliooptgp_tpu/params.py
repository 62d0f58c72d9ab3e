"""Constrained-parameter transforms.

The reference relies on GPflow Parameters whose positive constraint is a
softplus bijector with a small lower shift; hyperparameter optimization runs in
the unconstrained space (reference: gpflow.optimizers.Scipy used at
GPR/model_trainer.py:18-19). We store *raw* (unconstrained) leaves in model
pytrees and apply `positive()` at use sites, so `jax.grad`/`vmap`/optimizers
all see a flat unconstrained pytree — the TPU-native analogue of GPflow's
bijector machinery.
"""

from __future__ import annotations

import jax.numpy as jnp

# Lower shift for the positive bijector (GPflow's positive_minimum analogue);
# keeps Cholesky-relevant parameters bounded away from zero.
POSITIVE_SHIFT = 1e-6


def softplus(x):
    return jnp.logaddexp(x, 0.0)


def softplus_inv(y):
    # inverse of log(1+exp(x)) computed stably: x = y + log(1 - exp(-y))
    y = jnp.asarray(y)
    return y + jnp.log(-jnp.expm1(-y))


def positive(raw):
    """Map unconstrained raw value -> positive constrained value."""
    return softplus(raw) + POSITIVE_SHIFT


def positive_inv(value):
    """Map positive constrained value -> unconstrained raw value."""
    value = jnp.asarray(value, dtype=jnp.result_type(float))
    return softplus_inv(jnp.maximum(value - POSITIVE_SHIFT, 1e-300))


def as_param(value, dtype=None):
    """Coerce a python scalar / array-like to a float array leaf."""
    return jnp.asarray(value, dtype=dtype or jnp.result_type(float))
