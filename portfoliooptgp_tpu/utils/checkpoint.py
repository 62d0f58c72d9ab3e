"""Checkpoint/resume for model pytrees and training state.

The reference serializes nothing — every run (and every walk-forward day)
retrains from scratch (Multi-Input_GPR/main.py:414-430; SURVEY.md §5). Here
any pytree (models, optimizer state, NUTS state) round-trips as an .npz of
its flattened leaves; structure comes from a template pytree on load, so
custom dataclass nodes need no serializers. Warm-starting walk-forward day
i+1 from day i's hyperparameters is an optional perf knob built on this
(off by default to preserve reference-parity retraining)."""

from __future__ import annotations

import io
import os

import jax
import numpy as np


def save(path: str, tree) -> None:
    """Write a pytree's leaves atomically (a crash never leaves a torn file)."""
    leaves = jax.tree.leaves(tree)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(x)) for i, x in enumerate(leaves)}
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def load(path: str, template):
    """Restore into the structure of `template` (same pytree structure)."""
    with np.load(path) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(data.files))]
    treedef = jax.tree.structure(template)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves but template expects "
            f"{treedef.num_leaves}"
        )
    import jax.numpy as jnp

    return jax.tree.unflatten(treedef, [jnp.asarray(x) for x in leaves])


# Backwards-compatible alias used by callers that checkpoint live device trees.
save_array_tree = save
