"""Host-side minibatch iterator with background device prefetch.

The reference's SVGP path is full-batch — `training_loss_closure((X, Y))`
holds the whole dataset in one closure (test_scripts/SVGP.py:530-533) — so it
has no input pipeline at all. For sharded minibatch training
(parallel/elbo_sharded.py) the feed becomes the bottleneck if every step
blocks on host slicing + H2D transfer. This iterator overlaps them:

- epochs are shuffled host-side with a NumPy RNG (deterministic per seed);
- every batch has the SAME static shape (`batch_size` rows): the final
  partial batch is zero-padded and its padding rows carry weight 0, so the
  train step compiles exactly once and padded rows contribute nothing
  (the elbo_sharded weighting contract);
- a daemon thread stages up to `prefetch` host batches ahead through a
  bounded queue (shuffling/slicing/padding are pure NumPy); the consumer
  thread issues the `jax.device_put` — async, so the transfer of batch i+1
  still rides along while the device runs step i. Device placement stays on
  the consumer thread on purpose: submitting XLA programs from a second
  Python thread deadlocks the CPU backend's in-process collective
  rendezvous (observed: 8-participant psum with 6 arrivals → abort), and
  the host-side work is the part worth overlapping anyway. With a mesh,
  rows are placed sharded over the data axis directly.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from portfoliooptgp_tpu.parallel.mesh import DATA_AXIS


class MinibatchIterator:
    """Iterate (X, Y, w) device minibatches of a fixed static shape.

    Args:
      X, Y: (N, D) / (N, P) arrays (host or device; copied to NumPy once).
      batch_size: rows per step; must divide by the mesh data-axis size.
      mesh: optional — place batches sharded over DATA_AXIS.
      num_epochs: None means cycle forever (use `take` or break manually).
      shuffle/seed: per-epoch host-side permutation, deterministic per seed.
      drop_remainder: skip the final partial batch instead of padding it.
      prefetch: batches staged ahead by the background thread.
      inner_steps: group this many consecutive batches into one stacked
        (inner_steps, batch_size, ...) superbatch — the unit consumed by the
        scanned multi-step trainer (elbo_sharded.make_elbo_train_step with
        inner_steps>1). The stream's tail is padded with all-zero-weight
        dummy batches so the superbatch shape stays static; the trainer
        skips those exactly.
    """

    def __init__(
        self,
        X,
        Y,
        batch_size: int,
        *,
        mesh: Optional[Mesh] = None,
        num_epochs: Optional[int] = None,
        shuffle: bool = True,
        seed: int = 0,
        drop_remainder: bool = False,
        prefetch: int = 2,
        inner_steps: int = 1,
    ):
        self._X = np.asarray(X)
        self._Y = np.asarray(Y)
        if self._X.shape[0] != self._Y.shape[0]:
            raise ValueError("X and Y row counts differ")
        self._n = self._X.shape[0]
        if batch_size <= 0:
            raise ValueError("batch_size must be positive")
        self._bs = int(batch_size)
        self._mesh = mesh
        if inner_steps < 1:
            raise ValueError("inner_steps must be >= 1")
        self._k = int(inner_steps)
        self._group: list = []
        if mesh is not None:
            n_shards = mesh.shape[DATA_AXIS]
            if self._bs % n_shards:
                raise ValueError(
                    f"batch_size={batch_size} must divide the data axis ({n_shards})"
                )
            if self._k == 1:
                self._x_sharding = NamedSharding(mesh, P(DATA_AXIS, None))
                self._w_sharding = NamedSharding(mesh, P(DATA_AXIS))
            else:
                self._x_sharding = NamedSharding(mesh, P(None, DATA_AXIS, None))
                self._w_sharding = NamedSharding(mesh, P(None, DATA_AXIS))
        else:
            self._x_sharding = self._w_sharding = None
        self._num_epochs = num_epochs
        self._shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._drop_remainder = drop_remainder
        self._queue: queue.Queue = queue.Queue(maxsize=max(prefetch, 1))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    @property
    def num_data(self) -> int:
        return self._n

    def steps_per_epoch(self) -> int:
        if self._drop_remainder:
            return self._n // self._bs
        return -(-self._n // self._bs)

    def _enqueue(self, item) -> bool:
        # bounded put so the producer cannot run arbitrarily far ahead;
        # poll the stop flag so close() never deadlocks on a full queue
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _stage(self, batch):
        """Enqueue one host batch, grouping into (k, ...) superbatches."""
        if self._k == 1:
            self._enqueue(batch)
            return
        self._group.append(batch)
        if len(self._group) == self._k:
            item = tuple(np.stack(parts) for parts in zip(*self._group))
            self._group = []
            self._enqueue(item)

    def _flush_group(self):
        """Pad a partial tail group with zero-weight dummy batches (the
        scanned trainer skips them exactly) so the shape stays static."""
        if self._k == 1 or not self._group:
            return
        dummy = (
            np.zeros((self._bs,) + self._X.shape[1:], self._X.dtype),
            np.zeros((self._bs,) + self._Y.shape[1:], self._Y.dtype),
            np.zeros((self._bs,), self._X.dtype),
        )
        while len(self._group) < self._k:
            self._group.append(dummy)
        item = tuple(np.stack(parts) for parts in zip(*self._group))
        self._group = []
        self._enqueue(item)

    def _put_batch(self, idx: np.ndarray):
        n_real = idx.shape[0]
        Xb = self._X[idx]
        Yb = self._Y[idx]
        w = np.ones((self._bs,), self._X.dtype)
        if n_real < self._bs:
            pad = self._bs - n_real
            Xb = np.concatenate([Xb, np.zeros((pad,) + Xb.shape[1:], Xb.dtype)])
            Yb = np.concatenate([Yb, np.zeros((pad,) + Yb.shape[1:], Yb.dtype)])
            w[n_real:] = 0.0
        self._stage((Xb, Yb, w))

    def _producer(self):
        epoch = 0
        try:
            while not self._stop.is_set():
                if self._num_epochs is not None and epoch >= self._num_epochs:
                    break
                order = (
                    self._rng.permutation(self._n)
                    if self._shuffle
                    else np.arange(self._n)
                )
                limit = (
                    (self._n // self._bs) * self._bs
                    if self._drop_remainder
                    else self._n
                )
                for start in range(0, limit, self._bs):
                    if self._stop.is_set():
                        return
                    self._put_batch(order[start : start + self._bs])
                epoch += 1
        finally:
            self._flush_group()
            while not self._stop.is_set():
                try:
                    self._queue.put(None, timeout=0.1)
                    return
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
        return self

    def __next__(self):
        item = self._queue.get()
        if item is None:
            raise StopIteration
        Xb, Yb, w = item
        return (
            jax.device_put(jnp.asarray(Xb), self._x_sharding),
            jax.device_put(jnp.asarray(Yb), self._x_sharding),
            jax.device_put(jnp.asarray(w), self._w_sharding),
        )

    def close(self):
        """Stop the producer thread and drop staged batches."""
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
