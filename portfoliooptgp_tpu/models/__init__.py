"""GP model family: exact GPR, sparse/variational (SGPR/SVGP/VGP), likelihoods."""

from portfoliooptgp_tpu.models import gpr as gpr
from portfoliooptgp_tpu.models import sgpr as sgpr
from portfoliooptgp_tpu.models import svgp as svgp
from portfoliooptgp_tpu.models import vgp as vgp
from portfoliooptgp_tpu.models.gpr import GPR
from portfoliooptgp_tpu.models.likelihoods import Gaussian, StudentT
from portfoliooptgp_tpu.models.sgpr import SGPR
from portfoliooptgp_tpu.models.svgp import SVGP
from portfoliooptgp_tpu.models.vgp import VGP
