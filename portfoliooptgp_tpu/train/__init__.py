"""Trainers: jittable L-BFGS, batched restarts, kernel-menu selection."""

from portfoliooptgp_tpu.train import lbfgs as lbfgs
from portfoliooptgp_tpu.train.lbfgs import FitResult, fit, fit_batched, freeze_leaves
from portfoliooptgp_tpu.train import batched_lbfgs as batched_lbfgs
from portfoliooptgp_tpu.train import natgrad as natgrad
from portfoliooptgp_tpu.train import svgp_trainer as svgp_trainer
from portfoliooptgp_tpu.train.batched_lbfgs import fit_batched_fused
from portfoliooptgp_tpu.train.trainer import (
    MenuResult,
    TrainedModel,
    train_best_model,
    train_likelihood,
    train_model,
    train_restarts,
    train_restarts_fused,
)
