"""Utilities: metrics, checkpointing, profiling."""

from portfoliooptgp_tpu.utils import checkpoint as checkpoint
from portfoliooptgp_tpu.utils import metrics as metrics
from portfoliooptgp_tpu.utils import profiling as profiling
from portfoliooptgp_tpu.utils.metrics import MetricsLogger
