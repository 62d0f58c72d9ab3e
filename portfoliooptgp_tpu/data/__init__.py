"""Data layer: CSV loaders, transforms, calendar grids, DataHandler."""

from portfoliooptgp_tpu.data import calendar as calendar
from portfoliooptgp_tpu.data import loader as loader
from portfoliooptgp_tpu.data import transforms as transforms
from portfoliooptgp_tpu.data.handler import DataHandler
from portfoliooptgp_tpu.data.iterator import MinibatchIterator
