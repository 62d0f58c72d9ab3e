"""Kernels and mean functions — pytree-native, GPflow-parity formulas."""

from portfoliooptgp_tpu.kernels.base import (
    Constant,
    Kernel,
    Product,
    Sum,
    White,
    normalize_active_dims,
    pytree_dataclass,
)
from portfoliooptgp_tpu.kernels.linear import Linear, Polynomial
from portfoliooptgp_tpu.kernels.means import (
    ConstantMean,
    LinearMean,
    MeanFunction,
    PolynomialMean,
    Zero,
)
from portfoliooptgp_tpu.kernels.periodic import Periodic
from portfoliooptgp_tpu.kernels.stationary import (
    Exponential,
    Matern12,
    Matern32,
    Matern52,
    RationalQuadratic,
    SquaredExponential,
    Stationary,
)


def default_kernel_menu():
    """The reference's 8-kernel selection menu (GPR/main.py:105-114), rebuilt
    as fresh pytrees per call (the reference reuses TF kernel objects across
    tickers; we deliberately return fresh parameters each call)."""
    SE, M12, RQ = SquaredExponential, Matern12, RationalQuadratic
    return [
        SE.create(),
        M12.create(),
        RQ.create(),
        Exponential.create(),
        SE.create() + M12.create(),
        Exponential.create() + Periodic.create(SE.create()) + Linear.create(),
        Exponential.create() + Periodic.create(SE.create()),
        SE.create() * M12.create(),
    ]


def composite_kernel(input_dim, kernel1_cls=Exponential, kernel2_cls=Exponential):
    """Feature-kernel × time-kernel composite over column slices, matching
    `create_composite_kernel` (Multi-Input_GPR/main.py:118-135): k1 acts on
    columns [0, D-1) (covariates), k2 on column D-1 (time)."""
    k1 = kernel1_cls.create(active_dims=slice(0, input_dim - 1))
    k2 = kernel2_cls.create(active_dims=slice(input_dim - 1, input_dim))
    return k1 * k2


__all__ = [
    "Kernel", "Sum", "Product", "Constant", "White",
    "SquaredExponential", "Matern12", "Matern32", "Matern52",
    "Exponential", "RationalQuadratic", "Periodic", "Linear", "Polynomial",
    "Stationary", "MeanFunction", "Zero", "ConstantMean", "LinearMean",
    "PolynomialMean", "default_kernel_menu", "composite_kernel",
    "normalize_active_dims", "pytree_dataclass",
]
