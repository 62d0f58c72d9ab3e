"""Bayesian inference: NUTS/HMC over model hyperparameters."""

from portfoliooptgp_tpu.inference import hmc as hmc
from portfoliooptgp_tpu.inference import nuts as nuts
from portfoliooptgp_tpu.inference.fused_logdensity import (
    gpr_logdensity_pair,
    gpr_logdensity_vg,
)
from portfoliooptgp_tpu.inference.sampler import (
    SampleStats,
    centered_normal_logprior,
    sample_nuts,
)
