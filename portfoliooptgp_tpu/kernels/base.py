"""Kernel base classes — kernels are immutable pytree dataclasses.

Raw (unconstrained) parameters are pytree *data* leaves; structural config
(active_dims, degree, child kernels' classes) is static metadata. This makes a
whole GP model a flat pytree: `jax.grad` differentiates hyperparameters,
`jax.vmap` batches over stacked restarts, and `jax.jit` sees static structure.

Mirrors the behavioral surface of gpflow.kernels.* as used by the reference
(kernel menu at GPR/main.py:105-114; composite `k1 * k2` with `active_dims`
slices at Multi-Input_GPR/main.py:118-135) — but re-designed as functional
pytrees rather than TF Modules.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

from portfoliooptgp_tpu.params import as_param, positive, positive_inv

ActiveDims = Optional[tuple]  # None | ("slice", start, stop) | ("idx", i0, i1, ...)


def normalize_active_dims(active_dims) -> ActiveDims:
    if active_dims is None:
        return None
    if isinstance(active_dims, slice):
        if active_dims.step not in (None, 1):
            raise ValueError("active_dims slices must have step 1")
        return ("slice", active_dims.start or 0, active_dims.stop)
    if isinstance(active_dims, tuple) and active_dims and active_dims[0] in ("slice", "idx"):
        return active_dims
    return ("idx",) + tuple(int(i) for i in active_dims)


def pytree_dataclass(cls=None, *, meta: Sequence[str] = ()):
    """Register a frozen dataclass as a JAX pytree with the given meta fields."""

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        fields = [f.name for f in dataclasses.fields(c)]
        data_fields = [f for f in fields if f not in meta]
        jax.tree_util.register_dataclass(c, data_fields=data_fields, meta_fields=list(meta))
        return c

    return wrap(cls) if cls is not None else wrap


class Kernel:
    """Base kernel. Subclasses implement `_K(X, X2)` and `_Kdiag(X)` over the
    already-sliced inputs; `K`/`Kdiag` apply active_dims slicing first."""

    active_dims: ActiveDims = None

    # -- public API -----------------------------------------------------
    def K(self, X, X2=None):
        Xs = self.slice_x(X)
        X2s = Xs if X2 is None else self.slice_x(X2)
        return self._K(Xs, X2s)

    def Kdiag(self, X):
        return self._Kdiag(self.slice_x(X))

    def __call__(self, X, X2=None, *, diag=False):
        if diag:
            if X2 is not None:
                raise ValueError("diag=True requires X2=None")
            return self.Kdiag(X)
        return self.K(X, X2)

    def slice_x(self, X):
        ad = self.active_dims
        if ad is None:
            return X
        if ad[0] == "slice":
            return X[..., ad[1] : ad[2]]
        return jnp.take(X, jnp.array(ad[1:]), axis=-1)

    # -- algebra --------------------------------------------------------
    def __add__(self, other):
        return Sum(terms=_flatten_terms(Sum, (self, other)))

    def __mul__(self, other):
        return Product(terms=_flatten_terms(Product, (self, other)))

    def _K(self, X, X2):
        raise NotImplementedError

    def _Kdiag(self, X):
        raise NotImplementedError


def _flatten_terms(cls, kernels):
    out = []
    for k in kernels:
        if isinstance(k, cls) and k.active_dims is None:
            out.extend(k.terms)
        else:
            out.append(k)
    return tuple(out)


@pytree_dataclass(meta=("active_dims",))
class Sum(Kernel):
    """k(x,x') = Σ_i k_i(x,x') (reference composite menus, GPR/main.py:109-112)."""

    terms: tuple
    active_dims: ActiveDims = None

    def _K(self, X, X2):
        return sum(k.K(X, X2) for k in self.terms)

    def _Kdiag(self, X):
        return sum(k.Kdiag(X) for k in self.terms)


@pytree_dataclass(meta=("active_dims",))
class Product(Kernel):
    """k(x,x') = Π_i k_i(x,x') (composite feature×time kernel,
    Multi-Input_GPR/main.py:118-135)."""

    terms: tuple
    active_dims: ActiveDims = None

    def _K(self, X, X2):
        out = self.terms[0].K(X, X2)
        for k in self.terms[1:]:
            out = out * k.K(X, X2)
        return out

    def _Kdiag(self, X):
        out = self.terms[0].Kdiag(X)
        for k in self.terms[1:]:
            out = out * k.Kdiag(X)
        return out


@pytree_dataclass(meta=("active_dims",))
class Constant(Kernel):
    """k(x,x') = σ² (gpflow.kernels.Constant)."""

    raw_variance: jnp.ndarray
    active_dims: ActiveDims = None

    @classmethod
    def create(cls, variance=1.0, active_dims=None):
        return cls(
            raw_variance=positive_inv(as_param(variance)),
            active_dims=normalize_active_dims(active_dims),
        )

    @property
    def variance(self):
        return positive(self.raw_variance)

    def _K(self, X, X2):
        return jnp.full((X.shape[0], X2.shape[0]), 1.0, dtype=X.dtype) * self.variance

    def _Kdiag(self, X):
        return jnp.full((X.shape[0],), 1.0, dtype=X.dtype) * self.variance


@pytree_dataclass(meta=("active_dims",))
class White(Kernel):
    """k(x,x') = σ² δ(x,x') — only meaningful for X2 is X (gpflow.kernels.White)."""

    raw_variance: jnp.ndarray
    active_dims: ActiveDims = None

    @classmethod
    def create(cls, variance=1.0, active_dims=None):
        return cls(
            raw_variance=positive_inv(as_param(variance)),
            active_dims=normalize_active_dims(active_dims),
        )

    @property
    def variance(self):
        return positive(self.raw_variance)

    def _K(self, X, X2):
        if X.shape[0] == X2.shape[0]:
            return self.variance * jnp.eye(X.shape[0], dtype=X.dtype)
        return jnp.zeros((X.shape[0], X2.shape[0]), dtype=X.dtype)

    def _Kdiag(self, X):
        return jnp.full((X.shape[0],), 1.0, dtype=X.dtype) * self.variance
