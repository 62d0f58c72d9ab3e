"""Mesh, shardings, and distributed training steps (net-new vs reference)."""

from portfoliooptgp_tpu.parallel import dist_cholesky as dist_cholesky
from portfoliooptgp_tpu.parallel import distributed as distributed
from portfoliooptgp_tpu.parallel import elbo_sharded as elbo_sharded
from portfoliooptgp_tpu.parallel.dist_cholesky import sharded_gpr_nll
from portfoliooptgp_tpu.parallel import mesh as mesh
from portfoliooptgp_tpu.parallel.mesh import (
    DATA_AXIS,
    RESTART_AXIS,
    make_mesh,
    replicate,
    shard_batch,
)
