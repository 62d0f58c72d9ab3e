"""Headless matplotlib visualization (reference plotting surface)."""

from portfoliooptgp_tpu.viz.visualizer import Visualizer, setup_plot_style
