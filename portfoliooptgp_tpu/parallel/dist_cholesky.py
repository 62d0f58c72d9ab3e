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

Two row layouts (ScaLAPACK terminology):
- `contiguous`: device d owns rows [d·N/D, (d+1)·N/D) — simple, but once the
  panel frontier passes a device's rows it idles for the rest of the
  factorization (the classic tail imbalance);
- `cyclic` (1-D block-cyclic): device d owns row blocks {b : b mod D = d},
  so every device keeps rows in every trailing region and stays busy until
  the last panel. The matrix itself is NOT permuted — only the row→device
  assignment changes (row_g / owner / panel-reassembly formulas); the public
  wrapper permutes rows at the boundary and JAX transposes the permutation
  in the VJP automatically.

Training support: `sharded_gpr_nll` carries a custom VJP, so kernel
hyperparameters can be optimized by `jax.grad` straight through the
row-sharded NLL. The backward pass never materializes anything denser than
one row shard per device: it stores the local rows of L from the forward,
then computes the local rows of W = (K+σ²I)⁻¹ with nblocks blocked
two-triangular-solve sweeps over identity column blocks (the same
panel-psum pattern run forward and backward), and emits

  dNLL/dK  = ct · ½ (W − ααᵀ)   (row shard; α = W y)
  dNLL/dy  = ct · α
  dNLL/dσ² = ct · ½ (tr W − αᵀα)

— the classic closed-form GPR gradients (e.g. GPML eq. 5.9), assembled with
psum/all_gather instead of a replicated inverse.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from portfoliooptgp_tpu.parallel.mesh import DATA_AXIS


def _layout(cyclic: bool, d, n_local: int, nb: int, n_dev: int):
    """Row-ownership formulas for the two layouts.

    Returns (row_g, owner_off, assemble):
    - row_g (n_local,): global row index of each local row;
    - owner_off(kb) -> (owner: bool, off: local row offset of panel kb's
      diagonal block on its owner);
    - assemble(gathered (D, n_local, ...)) -> (N, ...) rows in global order.
    """
    j = jnp.arange(n_local)
    if not cyclic:
        row_g = d * n_local + j

        def owner_off(kb):
            owner = (kb // n_local) == jnp.asarray(d, jnp.int32)
            off = jnp.clip(kb - jnp.asarray(d, jnp.int32) * n_local, 0, n_local - nb)
            return owner, off

        def assemble(gathered):
            D = gathered.shape[0]
            return gathered.reshape((D * n_local,) + gathered.shape[2:])

    else:
        row_g = ((j // nb) * n_dev + d) * nb + (j % nb)

        def owner_off(kb):
            k = kb // nb
            owner = (k % n_dev) == jnp.asarray(d, jnp.int32)
            off = (k // n_dev) * nb
            return owner, off

        def assemble(gathered):
            # gathered[dev][b_local] is global block b_local·D + dev
            D = gathered.shape[0]
            nbl = n_local // nb
            tail = gathered.shape[2:]
            g = gathered.reshape((D, nbl, nb) + tail)
            g = jnp.moveaxis(g, 0, 1)  # (nbl, D, nb, ...)
            return g.reshape((D * n_local,) + tail)

    return row_g, owner_off, assemble


def _local_nll(Kl, yl, noise, *, n_local: int, nb: int, axis: str,
               store_l: bool = False, cyclic: bool = False):
    """shard_map body: Kl (n_local, N) rows of K+σ²I‐to‐be, yl (n_local, 1).

    With store_l=True additionally returns the local rows of the Cholesky
    factor L (n_local, N) — the residual needed by the custom VJP."""
    d = jax.lax.axis_index(axis)
    n_dev = jax.lax.axis_size(axis)
    N = n_local * n_dev
    nblocks = N // nb
    dtype = Kl.dtype

    row_g, owner_off, assemble = _layout(cyclic, d, n_local, nb, n_dev)
    # add noise on the local diagonal
    Kl = Kl + noise * (
        (row_g[:, None] == jnp.arange(N)[None, :]).astype(dtype)
    )

    def panel_step(k, carry):
        A, Ll, acc, quad, logdet = carry
        kb = jnp.asarray(k * nb, jnp.int32)
        zero = jnp.asarray(0, jnp.int32)
        owner, off = owner_off(kb)

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
        panel_full = assemble(gathered)  # (N, nb) rows in global order
        A = A - Pl @ panel_full.T
        if store_l:
            Ll = jax.lax.dynamic_update_slice(Ll, Pl, (zero, kb))

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
        return A, Ll, acc, quad, logdet

    acc0 = jnp.zeros((n_local,), dtype)
    Ll0 = jnp.zeros((n_local, N), dtype) if store_l else jnp.zeros((0, 0), dtype)
    _, Ll, _, quad, logdet = jax.lax.fori_loop(
        0, nblocks, panel_step,
        (Kl, Ll0, acc0, jnp.asarray(0.0, dtype), jnp.asarray(0.0, dtype)),
    )
    nll = 0.5 * quad + logdet + 0.5 * N * jnp.log(2.0 * jnp.pi)
    if store_l:
        return nll[None], Ll
    return nll[None]


def _local_vjp(Ll, yl, ct, *, n_local: int, nb: int, axis: str,
               cyclic: bool = False):
    """shard_map body of the backward pass.

    Ll: (n_local, N) local rows of L; yl: (n_local, 1); ct: scalar cotangent.
    Returns the local row shards (dK, dy) and the replicated scalar dnoise.
    """
    d = jax.lax.axis_index(axis)
    n_dev = jax.lax.axis_size(axis)
    N = n_local * n_dev
    nblocks = N // nb
    dtype = Ll.dtype
    zero = jnp.asarray(0, jnp.int32)
    row_g, owner_off, assemble = _layout(cyclic, d, n_local, nb, n_dev)

    def diag_block(kb):
        owner, off = owner_off(kb)
        rows = jax.lax.dynamic_slice(Ll, (off, kb), (nb, nb))
        return jax.lax.psum(jnp.where(owner, rows, jnp.zeros_like(rows)), axis)

    def panel_below(kb):
        """Local rows of L[:, kb:kb+nb] strictly below the diagonal block."""
        cols = jax.lax.dynamic_slice(Ll, (zero, kb), (n_local, nb))
        return jnp.where((row_g >= kb + nb)[:, None], cols, 0.0)

    def sweep(c, W):
        """Columns [c·nb, (c+1)·nb) of W = (LLᵀ)⁻¹ via forward+back subst
        on the identity column block; writes the local rows into W."""
        cb = jnp.asarray(c * nb, jnp.int32)

        # forward: U = L⁻¹ E_c, replicated (N, nb), panel by panel
        def fwd_body(j, carry):
            acc, U = carry
            jb = jnp.asarray(j * nb, jnp.int32)
            owner, off = owner_off(jb)
            Lkk = diag_block(jb)
            e = jnp.eye(nb, dtype=dtype) * (j == c).astype(dtype)
            acc_rows = jax.lax.dynamic_slice(acc, (off, zero), (nb, nb))
            rhs = jnp.where(owner, e - acc_rows, jnp.zeros((nb, nb), dtype))
            rhs = jax.lax.psum(rhs, axis)
            u_j = jax.scipy.linalg.solve_triangular(Lkk, rhs, lower=True)
            acc = acc + panel_below(jb) @ u_j
            U = jax.lax.dynamic_update_slice(U, u_j, (jb, zero))
            return acc, U

        _, U = jax.lax.fori_loop(
            c, nblocks, fwd_body,
            (jnp.zeros((n_local, nb), dtype), jnp.zeros((N, nb), dtype)),
        )

        # back: Z_local = local rows of L⁻ᵀ U, reverse panel loop
        def bwd_body(i, Z):
            k = nblocks - 1 - i
            kb = jnp.asarray(k * nb, jnp.int32)
            owner, off = owner_off(kb)
            Lkk = diag_block(kb)
            Pb = panel_below(kb)
            c_k = jax.lax.psum(Pb.T @ Z, axis)  # (nb, nb)
            u_k = jax.lax.dynamic_slice(U, (kb, zero), (nb, nb))
            z_k = jax.scipy.linalg.solve_triangular(
                Lkk.T, u_k - c_k, lower=False
            )
            Z_upd = jax.lax.dynamic_update_slice(Z, z_k, (off, zero))
            return jnp.where(owner, Z_upd, Z)

        # run all the way to panel 0: u vanishes above block c but the
        # back-substitution couples every row of the column block
        Z = jax.lax.fori_loop(
            0, nblocks, bwd_body, jnp.zeros((n_local, nb), dtype)
        )
        return jax.lax.dynamic_update_slice(W, Z, (zero, cb))

    W = jax.lax.fori_loop(0, nblocks, sweep, jnp.zeros((n_local, N), dtype))

    y_full = assemble(jax.lax.all_gather(yl, axis))  # (N, 1) global order
    alpha_l = W @ y_full  # (n_local, 1) local rows of α = (K+σ²I)⁻¹ y
    alpha_full = assemble(jax.lax.all_gather(alpha_l, axis))

    dK = ct * 0.5 * (W - alpha_l @ alpha_full.T)
    dy = ct * alpha_l
    trW = jax.lax.psum(
        jnp.sum(jnp.take_along_axis(W, row_g[:, None], axis=1)), axis
    )
    ata = jax.lax.psum(jnp.sum(alpha_l * alpha_l), axis)
    dnoise = ct * 0.5 * (trW - ata)
    return dK, dy, dnoise[None]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _sharded_nll(K, y, noise, mesh: Mesh, block_size: int, cyclic: bool):
    n_local = K.shape[0] // mesh.shape[DATA_AXIS]
    f = jax.shard_map(
        partial(_local_nll, n_local=n_local, nb=block_size, axis=DATA_AXIS,
                cyclic=cyclic),
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), P()),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    out = f(K, y, noise)
    return out[0]  # every shard computed the same value


def _sharded_nll_fwd(K, y, noise, mesh, block_size, cyclic):
    n_local = K.shape[0] // mesh.shape[DATA_AXIS]
    f = jax.shard_map(
        partial(_local_nll, n_local=n_local, nb=block_size, axis=DATA_AXIS,
                store_l=True, cyclic=cyclic),
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), P()),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS, None)),
        check_vma=False,
    )
    out, Ll = f(K, y, noise)
    return out[0], (Ll, y)


def _sharded_nll_bwd(mesh, block_size, cyclic, res, ct):
    Ll, y = res
    n_local = y.shape[0] // mesh.shape[DATA_AXIS]
    f = jax.shard_map(
        partial(_local_vjp, n_local=n_local, nb=block_size, axis=DATA_AXIS,
                cyclic=cyclic),
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), P()),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), P(DATA_AXIS)),
        check_vma=False,
    )
    dK, dy, dnoise = f(Ll, y, jnp.asarray(ct, Ll.dtype))
    return dK, dy, dnoise[0]


_sharded_nll.defvjp(_sharded_nll_fwd, _sharded_nll_bwd)


def cyclic_row_permutation(N: int, n_dev: int, block_size: int):
    """Row permutation placing 1-D block-cyclic shards contiguously: shard d
    holds global blocks {b : b mod D = d} in order. perm[new] = old."""
    import numpy as np

    blocks = np.arange(N // block_size)
    order = np.concatenate([blocks[blocks % n_dev == d] for d in range(n_dev)])
    return (order[:, None] * block_size + np.arange(block_size)[None, :]).reshape(-1)


def sharded_gpr_nll(K, y, noise, mesh: Mesh, block_size: int = 64,
                    layout: str = "contiguous"):
    """Exact-GPR NLL with K's rows sharded over the mesh data axis.

    K: (N, N) kernel matrix (place rows over DATA_AXIS before calling, or
    pass a replicated array and let jit repartition); y: (N, 1);
    noise: scalar σ². N must divide by (devices · block_size) and panels
    must not straddle devices (block_size | N/devices).

    layout: 'contiguous' (device d owns rows [d·N/D, (d+1)·N/D)) or 'cyclic'
    (1-D block-cyclic — device d owns row blocks {b : b mod D = d}, keeping
    every device busy through the whole factorization instead of idling once
    the panel frontier passes its rows). The cyclic wrapper permutes rows at
    the boundary; gradients are un-permuted automatically by JAX.

    Differentiable: `jax.grad` w.r.t. K, y, and noise flows through a custom
    VJP that assembles the closed-form GPR gradients with the same
    panel-sharded layout (see module docstring) — so kernel hyperparameters
    can be trained on Gram matrices that exceed one chip's HBM.
    """
    n_dev = mesh.shape[DATA_AXIS]
    N = K.shape[0]
    if N % n_dev:
        raise ValueError(f"N={N} must divide the data axis ({n_dev})")
    n_local = N // n_dev
    if n_local % block_size:
        raise ValueError(f"block_size={block_size} must divide N/devices={n_local}")
    if layout not in ("contiguous", "cyclic"):
        raise ValueError(f"unknown layout: {layout!r}")
    cyclic = layout == "cyclic"
    if cyclic:
        perm = jnp.asarray(cyclic_row_permutation(N, n_dev, block_size))
        K = K[perm]
        y = y[perm]
    return _sharded_nll(K, y, jnp.asarray(noise, K.dtype), mesh, block_size, cyclic)
