"""Bayesian inference: NUTS/HMC over model hyperparameters."""

from portfoliooptgp_tpu.inference import hmc as hmc
from portfoliooptgp_tpu.inference import nuts as nuts
from portfoliooptgp_tpu.inference.sampler import SampleStats, sample_nuts
