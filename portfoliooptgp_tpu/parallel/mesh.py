"""Device-mesh construction and sharding helpers.

The reference has no parallelism at all (single CPU process — SURVEY.md §2.3);
this layer is the net-new scale-out axis. A mesh has two named axes:

- `data`: shards the observation/minibatch axis (SVGP ELBO terms, MC samples)
- `restart`: shards the batched-restart axis of multi-restart training

Single-chip is the degenerate 1×1 mesh, so every code path is mesh-aware from
day one. Collectives are XLA's (`psum` etc.) over ICI — there is no custom
transport layer (SURVEY.md §5 distributed-communication backend).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
RESTART_AXIS = "restart"


def make_mesh(
    data: Optional[int] = None,
    restart: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, restart) mesh. Defaults: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // restart
    if data * restart != n:
        raise ValueError(f"mesh {data}x{restart} != {n} devices")
    arr = np.asarray(devices).reshape(data, restart)
    return Mesh(arr, (DATA_AXIS, RESTART_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Rows sharded over the data axis, features replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place (X, Y, ...) with rows split across the data axis. Row counts must
    divide the data-axis size (pad upstream if not)."""
    sh = data_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (e.g. model hyperparameters) over the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(X, Y, multiple: int):
    """Pad rows so the batch divides the mesh data axis; returns
    (X_pad, Y_pad, weights) where weights is 1 for real rows, 0 for padding —
    losses must be weighted sums so padding contributes exactly zero."""
    import jax.numpy as jnp

    n = X.shape[0]
    rem = (-n) % multiple
    w = jnp.concatenate([jnp.ones((n,), X.dtype), jnp.zeros((rem,), X.dtype)])
    if rem == 0:
        return X, Y, w
    Xp = jnp.concatenate([X, jnp.broadcast_to(X[-1:], (rem,) + X.shape[1:])])
    Yp = jnp.concatenate([Y, jnp.broadcast_to(Y[-1:], (rem,) + Y.shape[1:])])
    return Xp, Yp, w
