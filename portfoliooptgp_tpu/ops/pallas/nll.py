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

SUB = 64  # sub-panel width of the MXU-blocked column loop (_blocked_chol)

B_TILE = 8  # batch sublanes per grid program of the in-VMEM fused kernels


def _blocked_chol(L_s, W_ref, carry, lanes, dtype, n, b_tile):
    """Sub-panel-blocked right-looking factor + solve (+ inverse) loop.

    The column loop's rank-1 trailing updates are the VPU-bound heart of the
    fused NLL kernels. This restructures them so the MXU carries the O(N³):
    within a SUB-column sub-panel the rank-1 touches only the sub-panel's own
    columns (first-axis slices of the (col, b, row) slab are tile-free), and
    at each sub-panel boundary the deferred update of ALL trailing columns is
    applied as one 2D `dot_general` per batch sublane — Mosaic cannot lower a
    3D batched dot, so the batch axis is a static 8-iteration Python loop of
    middle-axis indexed 2D slices. Lane slices stay 128-aligned; the dot's
    extra rows land on lanes that are below the already-factored diagonal and
    are never read again. Precision pins HIGHEST: the TPU-default single
    bf16 pass loses ~1e-3 per boundary, which the parity gates (~1e-6 vs
    float64) would see immediately.

    L column i is stored into L_s[i] (masked + scaled, diag at lane i), so
    the boundary syrk can read the factored sub-panel as a (SUB, lanes) 2D
    value per b; callers that emit L as an output get the identical layout
    contract as the old per-column store.

    carry = (a, logdet): the fused forward substitution on the targets and
    the running Σ log diag, exactly as before. W_ref (optional) accumulates
    L⁻¹ with the same deferral: rows inside the sub-panel update per column,
    rows beyond it get one MXU dot per boundary.
    """
    hi = jax.lax.Precision.HIGHEST
    for off in range(0, n, SUB):
        p1 = min(off + SUB, n)
        r0 = (off // 128) * 128
        c1 = min(-(-p1 // 128) * 128, n)

        def body(j, carry, off=off, r0=r0, c1=c1, p1=p1):
            a, logdet = carry
            i = off + j
            col = L_s[i]
            onehot = (lanes == i).astype(dtype)
            d2v = jnp.sum(col * onehot, axis=-1, keepdims=True)
            d = jnp.sqrt(d2v)
            below = (lanes > i).astype(dtype)
            m = col * below / d  # (b, n) strictly-below column of L, scaled
            mT_full = jnp.swapaxes(m, 0, 1)[:, :, None]  # (n, b, 1)
            mT = jax.lax.slice_in_dim(mT_full, off, p1, axis=0)
            m_tail = jax.lax.slice_in_dim(m, r0, n, axis=1)
            # rank-1 restricted to the sub-panel's own columns
            L_s[off:p1, :, r0:] = L_s[off:p1, :, r0:] - mT * m_tail[None, :, :]
            # store the finished L column (m[b, c]=0 for c<=i keeps it safe
            # from the remaining in-panel rank-1s)
            L_s[i, :, :] = m + d * onehot
            if W_ref is not None:
                Wi = W_ref[i] / d
                W_ref[i, :, :] = Wi
                Wi_head = jax.lax.slice_in_dim(Wi, 0, c1, axis=1)
                W_ref[off:p1, :, :c1] = (
                    W_ref[off:p1, :, :c1] - mT * Wi_head[None, :, :]
                )
            ai_orig = jnp.sum(a * onehot, axis=-1, keepdims=True)
            ai = ai_orig / d
            a = a - m * ai + (ai - ai_orig) * onehot
            logdet = logdet + jnp.log(d)
            return a, logdet

        # i32 bounds: Python-int bounds become i64 carries under x64, and
        # Mosaic's convert_element_type lowering recurses on them
        carry = jax.lax.fori_loop(jnp.int32(0), jnp.int32(p1 - off), body, carry)

        if p1 < n:
            r1 = (p1 // 128) * 128
            for b in range(b_tile):
                M = L_s[off:p1, b, r1:]  # (SUB, n-r1): panel columns of L
                G = jax.lax.dot_general(
                    M, M, (((0,), (0,)), ((), ())),
                    preferred_element_type=dtype, precision=hi,
                )
                Gt = jax.lax.slice_in_dim(G, p1 - r1, n - r1, axis=0)
                L_s[p1:, b, r1:] = L_s[p1:, b, r1:] - Gt
                if W_ref is not None:
                    Wp = W_ref[off:p1, b, :c1]  # (SUB, c1): finished W rows
                    Gw = jax.lax.dot_general(
                        M, Wp, (((0,), (0,)), ((), ())),
                        preferred_element_type=dtype, precision=hi,
                    )
                    Gwt = jax.lax.slice_in_dim(Gw, p1 - r1, n - r1, axis=0)
                    W_ref[p1:, b, :c1] = W_ref[p1:, b, :c1] - Gwt
    return carry


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
    carry = (y_ref[...], jnp.zeros((b_tile, 1), dtype))
    a, logdet = _blocked_chol(L_ref, None, carry, lanes, dtype, n, b_tile)
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
    carry = (y_ref[...], jnp.zeros((b_tile, 1), dtype))
    a, logdet = _blocked_chol(L_s, W_ref, carry, lanes, dtype, n, b_tile)
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

    b_tile = B_TILE
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
        name="dense_factor_solve",
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
    b_tile = B_TILE
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
        name="dense_factor_solve_grid",
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
    b_tile = B_TILE
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
        name="dense_factor_inverse",
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
        return _

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n), body, jnp.int32(0))


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
        name="triangular_inverse",
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
