"""GP model family: exact GPR, sparse/variational (SGPR/SVGP/VGP), likelihoods."""

from portfoliooptgp_tpu.models import gpr as gpr
from portfoliooptgp_tpu.models.gpr import GPR
from portfoliooptgp_tpu.models.likelihoods import Gaussian, StudentT
