"""Distributed blocked Cholesky + NLL for row-sharded Gram matrices.

The exact-GPR analogue of context parallelism (SURVEY.md §5 long-context):
when N is too large for one chip's HBM, partition the Gram matrix by rows
across the mesh `data` axis and run a right-looking blocked factorization
with collective panel exchanges:

  per panel k (block size nb, panels never straddle devices):
    1. the owner's rows of the diagonal block are psum-assembled (zeros
       elsewhere) so every device holds it; each factors it locally;
    2. every device computes its rows of the panel column
       L[:, k] = A[:, k·nb : (k+1)·nb] · L_kk⁻ᵀ (rows above the panel
       masked to zero; the owner's panel rows reproduce L_kk exactly);
    3. one all_gather shares the full panel column; the trailing update
       A_local −= P_local · P_gatheredᵀ touches only columns still unread;
    4. forward substitution on y rides the same panel: a_k = L_kk⁻¹(y_k −
       acc_k), every device accumulates acc_rows += P_rows a_k.

  NLL = ½ Σ a_k² + Σ log diag(L_kk) + N/2 log 2π, identical on all devices.

Communication per panel is one (nb×nb) psum + one (N×nb) all_gather — the
classic panel-broadcast pattern, compiled to XLA collectives over ICI.
Contiguous row ownership keeps the indexing simple at the cost of tail-end
imbalance; block-cyclic layout is a follow-up optimization. Forward-only:
training at this scale pairs it with NUTS/predictions or a custom VJP
(future work) rather than reverse-mode through the factorization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from portfoliooptgp_tpu.parallel.mesh import DATA_AXIS


def _local_nll(Kl, yl, noise, *, n_local: int, nb: int, axis: str):
    """shard_map body: Kl (n_local, N) rows of K+σ²I‐to‐be, yl (n_local, 1)."""
    d = jax.lax.axis_index(axis)
    n_dev = jax.lax.axis_size(axis)
    N = n_local * n_dev
    nblocks = N // nb
    dtype = Kl.dtype

    row_g = d * n_local + jnp.arange(n_local)  # global row indices (n_local,)
    # add noise on the local diagonal
    Kl = Kl + noise * (
        (row_g[:, None] == jnp.arange(N)[None, :]).astype(dtype)
    )

    def panel_step(k, carry):
        A, acc, quad, logdet = carry
        kb = jnp.asarray(k * nb, jnp.int32)
        zero = jnp.asarray(0, jnp.int32)
        owner = (kb // n_local) == jnp.asarray(d, jnp.int32)
        off = jnp.clip(kb - jnp.asarray(d, jnp.int32) * n_local, 0, n_local - nb)

        # 1. assemble the diagonal block on every device
        diag_rows = jax.lax.dynamic_slice(A, (off, kb), (nb, nb))
        diag_contrib = jnp.where(owner, diag_rows, jnp.zeros_like(diag_rows))
        Dblk = jax.lax.psum(diag_contrib, axis)
        Lkk = jnp.linalg.cholesky(Dblk)

        # 2. local panel rows of the L column
        cols = jax.lax.dynamic_slice(A, (zero, kb), (n_local, nb))
        Pl = jax.scipy.linalg.solve_triangular(Lkk, cols.T, lower=True).T
        Pl = jnp.where((row_g >= kb)[:, None], Pl, 0.0)

        # 3. share the panel and apply the trailing update
        gathered = jax.lax.all_gather(Pl, axis)  # (D, n_local, nb)
        panel_full = gathered.reshape(N, nb)
        A = A - Pl @ panel_full.T

        # 4. fused forward substitution on y
        yblk_rows = jax.lax.dynamic_slice(yl[:, 0], (off,), (nb,))
        accblk_rows = jax.lax.dynamic_slice(acc, (off,), (nb,))
        rhs = jnp.where(owner, yblk_rows - accblk_rows, jnp.zeros((nb,), dtype))
        rhs = jax.lax.psum(rhs, axis)
        ak = jax.scipy.linalg.solve_triangular(Lkk, rhs[:, None], lower=True)[:, 0]
        below = (row_g >= kb + nb)[:, None]
        acc = acc + (jnp.where(below, Pl, 0.0) @ ak)

        quad = quad + jnp.sum(ak * ak)
        logdet = logdet + jnp.sum(jnp.log(jnp.diagonal(Lkk)))
        return A, acc, quad, logdet

    acc0 = jnp.zeros((n_local,), dtype)
    _, _, quad, logdet = jax.lax.fori_loop(
        0, nblocks, panel_step, (Kl, acc0, jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype))
    )
    nll = 0.5 * quad + logdet + 0.5 * N * jnp.log(2.0 * jnp.pi)
    return nll[None]


def sharded_gpr_nll(K, y, noise, mesh: Mesh, block_size: int = 64):
    """Exact-GPR NLL with K's rows sharded over the mesh data axis.

    K: (N, N) kernel matrix (place rows over DATA_AXIS before calling, or
    pass a replicated array and let jit repartition); y: (N, 1);
    noise: scalar σ². N must divide by (devices · block_size) and panels
    must not straddle devices (block_size | N/devices).
    """
    n_dev = mesh.shape[DATA_AXIS]
    N = K.shape[0]
    if N % n_dev:
        raise ValueError(f"N={N} must divide the data axis ({n_dev})")
    n_local = N // n_dev
    if n_local % block_size:
        raise ValueError(f"block_size={block_size} must divide N/devices={n_local}")

    f = jax.shard_map(
        partial(_local_nll, n_local=n_local, nb=block_size, axis=DATA_AXIS),
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), P()),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    out = f(K, y, jnp.asarray(noise, K.dtype))
    return out[0]  # every shard computed the same value
