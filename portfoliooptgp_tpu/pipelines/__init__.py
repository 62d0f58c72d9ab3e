"""Application pipelines: single-asset multi-timescale GPR and multi-input
portfolio workflows."""

from portfoliooptgp_tpu.pipelines import blend as blend
from portfoliooptgp_tpu.pipelines import walk_forward as walk_forward
from portfoliooptgp_tpu.pipelines.frontier_pipeline import run_frontier_pipeline
from portfoliooptgp_tpu.pipelines.multi_input import MultiInputGPR
from portfoliooptgp_tpu.pipelines.single_asset import StockPredictor
