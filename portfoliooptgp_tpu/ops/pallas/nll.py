"""Fused batched GPR negative-log-marginal-likelihood Pallas kernel.

The hot primitive of every trainer is: factor K+σ²I, solve against the
targets, take the log-determinant (SURVEY.md §3.3). XLA's batched Cholesky +
triangular solve runs this at ~90 GFLOP/s on a v5e chip because each O(N³)
factorization is sequential per matrix. This kernel flips the layout: the
RESTART BATCH rides the sublane axis, so one pass of N sequential column
steps factors *all* B matrices simultaneously with full-width VPU work —
Cholesky, forward substitution, and log-det fused in one VMEM-resident loop.

Layout: A[c, b, r] = K_b[r, c] — (N columns, B batch sublanes, N rows on
lanes). Column step i:
    d_b     = sqrt(A[i, b, i])                      (one-hot lane reduction)
    m[b, r] = A[i, b, r] * (r > i) / d_b            (masked column of L)
    A      -= mᵀ[c, b, ·] * m[·, b, r]              (rank-1, zero outside
                                                     the trailing block
                                                     because m is masked)
    a[b, ·] = fwd-substitution update with m, d     (solve L a = y, fused)
accumulating Σ log d and finally ‖a‖². The backward pass (custom VJP) uses
the saved factor with XLA batched triangular solves — matmul-rich and cheap
relative to the factorization.

B must be a multiple of 8 (f32 sublane tile); callers pad. N must be a
multiple of 128 (lane tile).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2PI = 1.8378770664093453


PANEL = 64  # static column-panel width: the trailing rank-1 update is sliced
# to columns >= the panel start, shaving the already-factored leading block
# (average trailing fraction ~(1+1/nb)/2 of the full-width update)


def _nll_kernel(A_ref, y_ref, L_ref, a_ref, logdet_ref, *, n, b_tile):
    """One grid program: factor+solve `b_tile` matrices of size n×n.
    L_ref aliases A_ref (input_output_aliases) — the factorization happens
    in place in VMEM. The column loop is split into static panels so the
    rank-1 trailing update only touches columns >= the panel start."""
    dtype = y_ref.dtype
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)  # (1, n)
    # stage the input into the output VMEM buffer: the HBM alias shares
    # storage, but the pipeline's VMEM staging buffers are distinct
    L_ref[...] = A_ref[...]

    a0 = y_ref[...]
    logdet0 = jnp.zeros((b_tile, 1), dtype)
    carry = (a0, logdet0)
    for off in range(0, n, PANEL):

        def body(j, carry, off=off):
            a, logdet = carry
            i = off + j
            col = L_ref[i]  # (b, n): column i of each matrix over rows (lanes)
            onehot = (lanes == i).astype(dtype)  # (1, n)
            d2 = jnp.sum(col * onehot, axis=-1, keepdims=True)  # (b, 1)
            d = jnp.sqrt(d2)
            # masked, scaled column of L: zero at rows <= i (diag on store)
            below = (lanes > i).astype(dtype)
            m = col * below / d  # (b, n)
            # rank-1 trailing update: A[c, b, r] -= m[b, c] * m[b, r] for
            # c >= off only (m[b, c] = 0 for c <= i so columns off..i are
            # no-ops; columns < off never change again). Row i is untouched
            # (m[b, i] = 0), so overwriting it with the L column is safe.
            mT_full = jnp.swapaxes(m, 0, 1)[:, :, None]  # (n, b, 1)
            # value slicing must go through slice_in_dim: python [off:] on a
            # transposed value lowers to an unsupported Mosaic gather
            mT = jax.lax.slice_in_dim(mT_full, off, n, axis=0)
            # rows <= i never change either (m is masked), so lanes below the
            # 128-aligned r0 are skipped too
            r0 = (off // 128) * 128
            m_tail = jax.lax.slice_in_dim(m, r0, n, axis=1)
            L_ref[off:, :, r0:] = L_ref[off:, :, r0:] - mT * m_tail[None, :, :]
            L_ref[i, :, :] = m + d * onehot
            # fused forward substitution on y: a_i = a[.,i]/d; a -= m * a_i
            ai_orig = jnp.sum(a * onehot, axis=-1, keepdims=True)
            ai = ai_orig / d
            a = a - m * ai + (ai - ai_orig) * onehot
            logdet = logdet + jnp.log(d)
            return a, logdet

        carry = jax.lax.fori_loop(0, min(PANEL, n - off), body, carry)
    a, logdet = carry
    a_ref[...] = a
    logdet_ref[...] = jnp.broadcast_to(logdet, (b_tile, 128))


def _nll_inv_kernel(A_ref, y_ref, W_ref, a_ref, logdet_ref, L_s, *, n, b_tile):
    """Fused factor + solve + logdet + triangular inverse in ONE column loop.

    Used as the forward pass of the custom VJP: the backward needs only
    W = L⁻¹ (for Ks⁻¹ = WᵀW) and a = L⁻¹y, never L itself — so the factor
    lives in VMEM scratch `L_s` and is never written back to HBM, and the
    separate triangular-inverse kernel (its own n-step loop + staging) is
    eliminated. Per column i the factor's trailing update (columns > i) and
    the inverse's trailing update (rows > i) share the same masked column m
    and the same static panel slice.
    """
    dtype = y_ref.dtype
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)  # (1, n)
    L_s[...] = A_ref[...]
    # W starts as the identity in every batch slot; layout (row, b, col)
    eye_rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1, n), 0)
    eye_cols = jax.lax.broadcasted_iota(jnp.int32, (n, 1, n), 2)
    W_ref[...] = jnp.broadcast_to((eye_rows == eye_cols).astype(dtype), (n, b_tile, n))

    a0 = y_ref[...]
    logdet0 = jnp.zeros((b_tile, 1), dtype)
    carry = (a0, logdet0)
    for off in range(0, n, PANEL):

        def body(j, carry, off=off):
            a, logdet = carry
            i = off + j
            col = L_s[i]
            onehot = (lanes == i).astype(dtype)
            d2 = jnp.sum(col * onehot, axis=-1, keepdims=True)
            d = jnp.sqrt(d2)
            below = (lanes > i).astype(dtype)
            m = col * below / d  # (b, n): strictly-below L column, scaled
            mT_full = jnp.swapaxes(m, 0, 1)[:, :, None]  # (n, b, 1)
            mT = jax.lax.slice_in_dim(mT_full, off, n, axis=0)
            # two-sided static slicing (128-aligned): factor rows <= i never
            # change; W columns beyond the panel end are still zero
            r0 = (off // 128) * 128
            c1 = min(-(-(off + PANEL) // 128) * 128, n)
            m_tail = jax.lax.slice_in_dim(m, r0, n, axis=1)
            # factor trailing update (columns >= off); column i of L is never
            # re-read, so it is not stored at all
            L_s[off:, :, r0:] = L_s[off:, :, r0:] - mT * m_tail[None, :, :]
            # inverse: row i of W scales by 1/d, rows > i get the rank-1
            Wi = W_ref[i] / d  # (b, n)
            W_ref[i, :, :] = Wi
            Wi_head = jax.lax.slice_in_dim(Wi, 0, c1, axis=1)
            W_ref[off:, :, :c1] = W_ref[off:, :, :c1] - mT * Wi_head[None, :, :]
            # row i is in [off:] but m[b, i] = 0 keeps it intact
            # fused forward substitution on y
            ai_orig = jnp.sum(a * onehot, axis=-1, keepdims=True)
            ai = ai_orig / d
            a = a - m * ai + (ai - ai_orig) * onehot
            logdet = logdet + jnp.log(d)
            return a, logdet

        carry = jax.lax.fori_loop(0, min(PANEL, n - off), body, carry)
    a, logdet = carry
    a_ref[...] = a
    logdet_ref[...] = jnp.broadcast_to(logdet, (b_tile, 128))


def _pad(x, axis, multiple):
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad)


# Largest padded N whose (Np, 8, Np) f32 blocks fit VMEM with the pipeline's
# double-buffered input+output staging (4 buffers); beyond this callers
# should use the XLA path (see models/gpr.py fast-path dispatch).
MAX_PALLAS_N = 256


def pallas_nll_supported(n: int) -> bool:
    return n + ((-n) % 128) <= MAX_PALLAS_N


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_nll_pallas(K, y, noise, interpret: bool = False):
    """NLL of B GPR models at once.

    K: (B, N, N) symmetric kernel matrices (float32)
    y: (B, N) targets
    noise: (B,) Gaussian noise variances added to the diagonal
    returns: (B,) negative log marginal likelihoods
    """
    B, N, _ = K.shape
    dtype = K.dtype
    n_pad = (-N) % 128
    Np = N + n_pad
    # pad with identity blocks so the factorization stays valid; padded rows
    # of y are zero so they contribute nothing to quad/logdet beyond known
    # constants we subtract below
    Ks = K + noise[:, None, None] * jnp.eye(N, dtype=dtype)
    if n_pad:
        Ks = _pad(_pad(Ks, 1, 128), 2, 128)
        eye_tail = jnp.concatenate(
            [jnp.zeros((N,), dtype), jnp.ones((n_pad,), dtype)]
        )
        Ks = Ks + jnp.diag(eye_tail)[None]
        y = _pad(y, 1, 128)

    b_tile = 8
    Ks = _pad(Ks, 0, b_tile)
    y = _pad(y, 0, b_tile)
    Bp = Ks.shape[0]

    # layout: (columns, batch, rows)
    A = jnp.swapaxes(Ks, 0, 1)  # (N, B, N) with A[c, b, r] = Ks[b, c, r]

    grid = (Bp // b_tile,)
    L, a, logdet = pl.pallas_call(
        functools.partial(_nll_kernel, n=Np, b_tile=b_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Np, b_tile, Np), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, Np), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Np, b_tile, Np), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, Np), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Bp, Np), dtype),  # L in column layout
            jax.ShapeDtypeStruct((Bp, Np), dtype),  # a = L^{-1} y
            jax.ShapeDtypeStruct((Bp, 128), dtype),  # broadcast logdet halves
        ],
        input_output_aliases={0: 0},  # factor A -> L in place
        interpret=interpret,
    )(A, y)

    quad = jnp.sum(a[:, :N] * a[:, :N], axis=-1)
    half_logdet = logdet[:, 0]  # Σ log d over ALL Np columns; padding adds 0
    nll = 0.5 * quad + half_logdet + 0.5 * N * LOG2PI
    return nll[:B]


def _interpret_default() -> bool:
    """Run the kernels in interpreter mode off-TPU (tests on the CPU mesh)."""
    import jax

    return jax.default_backend() != "tpu"


def _factor_solve(K, y, noise, interpret=None):
    """Pallas factor+solve returning (nll (B,), L_layout (Np,Bp,Np), a (Bp,Np)).
    Same padding/layout conventions as batched_nll_pallas."""
    if interpret is None:
        interpret = _interpret_default()
    B, N, _ = K.shape
    dtype = K.dtype
    Np = N + ((-N) % 128)
    Ks = K + noise[:, None, None] * jnp.eye(N, dtype=dtype)
    if Np != N:
        Ks = _pad(_pad(Ks, 1, 128), 2, 128)
        eye_tail = jnp.concatenate([jnp.zeros((N,), dtype), jnp.ones((Np - N,), dtype)])
        Ks = Ks + jnp.diag(eye_tail)[None]
        y = _pad(y, 1, 128)
    b_tile = 8
    Ks = _pad(Ks, 0, b_tile)
    y = _pad(y, 0, b_tile)
    Bp = Ks.shape[0]
    A = jnp.swapaxes(Ks, 0, 1)
    grid = (Bp // b_tile,)
    L, a, logdet = pl.pallas_call(
        functools.partial(_nll_kernel, n=Np, b_tile=b_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Np, b_tile, Np), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, Np), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Np, b_tile, Np), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, Np), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Bp, Np), dtype),
            jax.ShapeDtypeStruct((Bp, Np), dtype),
            jax.ShapeDtypeStruct((Bp, 128), dtype),
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
    )(A, y)
    quad = jnp.sum(a[:, :N] * a[:, :N], axis=-1)
    nll = (0.5 * quad + logdet[:, 0] + 0.5 * N * LOG2PI)[:B]
    return nll, L, a


def _factor_solve_inv(K, y, noise, interpret=None):
    """Fused Pallas factor+solve+logdet+inverse (one kernel, one column loop).
    Returns (nll (B,), W_layout (Np,Bp,Np) with W[r,b,q] = (L_b⁻¹)[r,q],
    a (Bp,Np)). The Cholesky factor itself never leaves VMEM."""
    if interpret is None:
        interpret = _interpret_default()
    B, N, _ = K.shape
    dtype = K.dtype
    Np = N + ((-N) % 128)
    Ks = K + noise[:, None, None] * jnp.eye(N, dtype=dtype)
    if Np != N:
        Ks = _pad(_pad(Ks, 1, 128), 2, 128)
        eye_tail = jnp.concatenate([jnp.zeros((N,), dtype), jnp.ones((Np - N,), dtype)])
        Ks = Ks + jnp.diag(eye_tail)[None]
        y = _pad(y, 1, 128)
    b_tile = 8
    Ks = _pad(Ks, 0, b_tile)
    y = _pad(y, 0, b_tile)
    Bp = Ks.shape[0]
    A = jnp.swapaxes(Ks, 0, 1)
    grid = (Bp // b_tile,)
    W, a, logdet = pl.pallas_call(
        functools.partial(_nll_inv_kernel, n=Np, b_tile=b_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Np, b_tile, Np), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, Np), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Np, b_tile, Np), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, Np), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, Bp, Np), dtype),  # W = L^{-1}, row layout
            jax.ShapeDtypeStruct((Bp, Np), dtype),  # a = L^{-1} y
            jax.ShapeDtypeStruct((Bp, 128), dtype),
        ],
        scratch_shapes=[pltpu.VMEM((Np, b_tile, Np), dtype)],
        interpret=interpret,
    )(A, y)
    quad = jnp.sum(a[:, :N] * a[:, :N], axis=-1)
    nll = (0.5 * quad + logdet[:, 0] + 0.5 * N * LOG2PI)[:B]
    return nll, W, a


def _trinv_kernel(L_ref, W_ref, *, n, b_tile):
    """W = L⁻¹ by column-oriented forward substitution on identity RHS.
    L_ref layout (col, b, row); W_ref layout (row, b, col)."""
    dtype = L_ref.dtype
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    # W starts as the identity in every batch slot
    eye_rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1, n), 0)
    eye_cols = jax.lax.broadcasted_iota(jnp.int32, (n, 1, n), 2)
    W_ref[...] = jnp.broadcast_to(
        (eye_rows == eye_cols).astype(dtype), (n, b_tile, n)
    )

    def body(i, _):
        Lcol = L_ref[i]  # (b, n) column i of L over rows
        onehot = (lanes == i).astype(dtype)
        d = jnp.sum(Lcol * onehot, axis=-1, keepdims=True)  # diag (b, 1)
        below = (lanes > i).astype(dtype)
        m = Lcol * below  # strictly-below column: raw L[r, i] entries
        Wi = W_ref[i] / d  # (b, n): row i of W, scaled by 1/d
        W_ref[i, :, :] = Wi
        mT = jnp.swapaxes(m, 0, 1)[:, :, None]  # (n, b, 1) over rows
        W_ref[...] = W_ref[...] - mT * Wi[None, :, :]
        # row i was just overwritten by the rank-1 too: m[b, i] = 0 keeps it
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def triangular_inverse_pallas(L_layout, b_tile: int = 8, interpret=None):
    """Invert the batch of lower-triangular factors produced by
    `_factor_solve` (column layout). Returns W with W[r, b, q] = (L_b⁻¹)[r, q]."""
    if interpret is None:
        interpret = _interpret_default()
    Np, Bp, _ = L_layout.shape
    grid = (Bp // b_tile,)
    return pl.pallas_call(
        functools.partial(_trinv_kernel, n=Np, b_tile=b_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Np, b_tile, Np), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Np, b_tile, Np), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, Bp, Np), L_layout.dtype),
        interpret=interpret,
    )(L_layout)


@jax.custom_vjp
def batched_nll(K, y, noise):
    """Differentiable fused batched NLL (forward = Pallas factor+solve;
    backward = Pallas triangular inverse + MXU matmuls).

    ∂NLL/∂K = ½(Ks⁻¹ − ααᵀ), ∂NLL/∂y = α, ∂NLL/∂σ² = ½ tr(Ks⁻¹) − ½‖α‖²,
    with α = Ks⁻¹ y and Ks⁻¹ = L⁻ᵀL⁻¹ = WᵀW.
    """
    nll, _, _ = _factor_solve(K, y, noise)
    return nll


def _batched_nll_fwd(K, y, noise):
    nll, W, a = _factor_solve_inv(K, y, noise)
    return nll, (W, a, K.shape[1], K.shape[0])


def _batched_nll_bwd(res, g):
    W, a, N, B = res
    Wb = jnp.transpose(W, (1, 0, 2))[:B, :N, :N]  # (B, r, q)
    Kinv = jnp.einsum("brq,brp->bqp", Wb, Wb, precision="highest")  # L⁻ᵀ L⁻¹
    alpha = jnp.einsum("brq,br->bq", Wb, a[:B, :N], precision="highest")  # Wᵀ a = Ks⁻¹ y
    dK = 0.5 * (Kinv - alpha[:, :, None] * alpha[:, None, :])
    dnoise = 0.5 * (
        jnp.trace(Kinv, axis1=-2, axis2=-1) - jnp.sum(alpha * alpha, axis=-1)
    )
    gb = g[:, None, None]
    return gb * dK, g[:, None] * alpha, g * dnoise


batched_nll.defvjp(_batched_nll_fwd, _batched_nll_bwd)
