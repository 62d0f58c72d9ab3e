"""Mean functions (gpflow.functions semantics).

The reference uses Zero (default), Constant (test_scripts/GPR_Class.py:101),
Linear (test_scripts/GPFlow.py:189), and Polynomial(2)
(test_scripts/GPR.py:103) mean functions.
"""

from __future__ import annotations

import jax.numpy as jnp

from portfoliooptgp_tpu.kernels.base import pytree_dataclass
from portfoliooptgp_tpu.params import as_param


class MeanFunction:
    def __call__(self, X):
        raise NotImplementedError


@pytree_dataclass
class Zero(MeanFunction):
    def __call__(self, X):
        return jnp.zeros((X.shape[0], 1), dtype=X.dtype)


@pytree_dataclass
class ConstantMean(MeanFunction):
    c: jnp.ndarray

    @classmethod
    def create(cls, c=0.0):
        return cls(c=as_param(c))

    def __call__(self, X):
        return jnp.full((X.shape[0], 1), 1.0, dtype=X.dtype) * self.c


@pytree_dataclass
class LinearMean(MeanFunction):
    """f(X) = X A + b, A: (D, 1), b: scalar."""

    A: jnp.ndarray
    b: jnp.ndarray

    @classmethod
    def create(cls, A=None, b=0.0, input_dim=1):
        A = jnp.ones((input_dim, 1)) if A is None else jnp.asarray(A, dtype=jnp.result_type(float))
        if A.ndim == 1:
            A = A[:, None]
        return cls(A=A, b=as_param(b))

    def __call__(self, X):
        return X @ self.A + self.b


@pytree_dataclass(meta=("degree",))
class PolynomialMean(MeanFunction):
    """f(x) = Σ_{k=0}^{degree} w_k * (Σ_d x_d)^k — 1-D polynomial trend on the
    summed input, matching how the reference applies Polynomial(2) to 1-D time
    inputs (test_scripts/GPR.py:103)."""

    w: jnp.ndarray
    degree: int = 2

    @classmethod
    def create(cls, degree=2, w=None):
        if w is None:
            w = jnp.zeros((degree + 1,)).at[0].set(1.0)
        return cls(w=jnp.asarray(w, dtype=jnp.result_type(float)), degree=int(degree))

    def __call__(self, X):
        s = jnp.sum(X, axis=-1, keepdims=True)
        powers = jnp.concatenate([s**k for k in range(self.degree + 1)], axis=-1)
        return powers @ self.w[:, None]
