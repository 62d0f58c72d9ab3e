"""Large-N batched GPR NLL: blocked Cholesky with a Pallas panel kernel.

The in-VMEM fused kernel (ops/pallas/nll.py) holds the whole (N, 8, N) slab
per grid program and tops out at N=256. For larger N this module runs the
classic right-looking *blocked* factorization, mapped to the TPU units by
role:

- **panel factor** (the sequential, control-heavy part): a Pallas kernel in
  the same lanes-batched layout — 128 columns × 8 batch sublanes × nt trailing
  rows per program. VMEM per program is O(128·8·N), so N scales to a few
  thousand instead of 256.
- **trailing update** (the O(N³) FLOPs): one batched `L21 @ L21ᵀ` einsum per
  panel, lowered by XLA straight onto the MXU — exactly where a systolic
  array wants the work. No hand-written matmul can beat the compiler here.

The outer panel loop is a static Python loop over shrinking shapes (no
dynamic shapes under jit; SURVEY.md §7.1 mesh/XLA stance). Gradients come
from a custom VJP sharing the factor: Ks⁻¹ via two XLA batched triangular
solves against the identity.

Reference behavior replicated: exact log-marginal-likelihood of GPflow's GPR
(`GPR/model_trainer.py:18-19`), at N far beyond the reference's N≈60-90 and
the SVGP script's N=10,963 full-batch scale (`test_scripts/SVGP.py:473`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from portfoliooptgp_tpu.ops.pallas.nll import LOG2PI, _interpret_default, _pad

PW = 128  # panel width (columns factored per Pallas call)

# padded-N ceiling for the blocked path. One (PW=128, 8, N) f32 panel block
# is 4·PW·8·N bytes = 16 MiB at N=4096 — the whole 16 MiB v5e VMEM, viable
# only because the in/out alias folds to a single staged buffer under jit.
# Hardware-verified on v5e (2026-08-18): value+grad at N∈{2048,3072,4096}
# matches dense XLA to ~1e-6 relative. The *eager* (op-by-op) path OOMs
# scoped VMEM at N=2048+, so callers must jit — every library path does.
MAX_BLOCKED_N = 4096


def blocked_nll_supported(n: int) -> bool:
    return n + ((-n) % 128) <= MAX_BLOCKED_N


def _panel_kernel(P_ref, Lp_ref, logdet_ref, *, nt, b_tile):
    """Factor a (PW cols, b, nt rows) panel in place.

    The panel's diagonal block sits at rows 0..PW (row r of the panel is
    global row p0+r, column j is global column p0+j). Emits the panel of L
    and each program's Σ log diag contribution.
    """
    dtype = P_ref.dtype
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, nt), 1)  # (1, nt) row ids
    Lp_ref[...] = P_ref[...]

    def body(j, logdet):
        col = Lp_ref[j]  # (b, nt): column j over trailing rows
        onehot = (lanes == j).astype(dtype)
        d2 = jnp.sum(col * onehot, axis=-1, keepdims=True)
        d = jnp.sqrt(d2)
        below = (lanes > j).astype(dtype)
        m = col * below / d  # (b, nt) strictly-below column of L
        # rank-1 on the remaining panel columns c>j: multiplier is m at the
        # panel row matching column c (static lane slice [:PW] then swap)
        head = jax.lax.slice_in_dim(m, 0, PW, axis=1)  # (b, PW)
        mT = jnp.swapaxes(head, 0, 1)[:, :, None]  # (PW, b, 1)
        Lp_ref[...] = Lp_ref[...] - mT * m[None, :, :]
        Lp_ref[j, :, :] = m + d * onehot
        return logdet + jnp.log(d)

    # i32 bounds: i64 loop carries (x64 mode) break Mosaic lowering
    logdet = jax.lax.fori_loop(jnp.int32(0), jnp.int32(PW), body,
                               jnp.zeros((b_tile, 1), dtype))
    logdet_ref[...] = jnp.broadcast_to(logdet, (b_tile, 128))


def _factor_panel(panel, interpret):
    """panel: (B, nt, PW) rows×cols slice with the diagonal block on top.
    Returns (L_panel (B, nt, PW), logdet_contrib (B,))."""
    B, nt, _ = panel.shape
    b_tile = 8
    P = jnp.transpose(panel, (2, 0, 1))  # (PW cols, B, nt rows)
    grid = (B // b_tile,)
    Lp, logdet = pl.pallas_call(
        functools.partial(_panel_kernel, nt=nt, b_tile=b_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((PW, b_tile, nt), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((PW, b_tile, nt), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((PW, B, nt), panel.dtype),
            jax.ShapeDtypeStruct((B, 128), panel.dtype),
        ],
        input_output_aliases={0: 0},
        interpret=interpret,
    )(P)
    return jnp.transpose(Lp, (1, 2, 0)), logdet[:, 0]


def blocked_cholesky(Ks, interpret=None):
    """Batched lower-Cholesky of (B, N, N) SPD matrices via 128-column
    panels: Pallas panel factor + MXU trailing syrk. Also returns Σ log diag.
    B must be a multiple of 8 and N a multiple of 128 (callers pad)."""
    if interpret is None:
        interpret = _interpret_default()
    B, N, _ = Ks.shape
    L = jnp.zeros_like(Ks)
    logdet = jnp.zeros((B,), Ks.dtype)
    work = Ks  # trailing submatrix, shrinks by PW rows/cols per panel
    for p0 in range(0, N, PW):
        nt = N - p0
        panel = jax.lax.slice(work, (0, 0, 0), (B, nt, PW))  # (B, nt, PW)
        Lp, ld = _factor_panel(panel, interpret)
        logdet = logdet + ld
        L = jax.lax.dynamic_update_slice(L, Lp, (0, p0, p0))
        if nt > PW:
            L21 = jax.lax.slice(Lp, (0, PW, 0), (B, nt, PW))  # (B, nt-PW, PW)
            trail = jax.lax.slice(work, (0, PW, PW), (B, nt, nt))
            # the O(N³) syrk on the MXU. precision= must be full f32: the
            # TPU default (single bf16 pass) loses ~1e-2 per update, which
            # compounds across panels until the trailing submatrix goes
            # indefinite and the factor NaNs (observed on v5e at N>=512).
            work = trail - jnp.einsum(
                "brk,bqk->brq", L21, L21,
                preferred_element_type=Ks.dtype, precision="highest",
            )
    return L, logdet


def _prep(K, y, noise):
    B, N, _ = K.shape
    dtype = K.dtype
    Np = N + ((-N) % 128)
    Ks = K + noise[:, None, None] * jnp.eye(N, dtype=dtype)
    if Np != N:
        Ks = _pad(_pad(Ks, 1, 128), 2, 128)
        eye_tail = jnp.concatenate([jnp.zeros((N,), dtype), jnp.ones((Np - N,), dtype)])
        Ks = Ks + jnp.diag(eye_tail)[None]
        y = _pad(y, 1, 128)
    # Pad the batch with identity matrices (not zeros): padded lanes then
    # factor cleanly (chol(I)=I, logdet 0) instead of producing sqrt(0)=0,
    # 0/0 NaNs that trip jax_debug_nans (ADVICE r1).
    pb = (-B) % 8
    if pb:
        Ks = jnp.concatenate(
            [Ks, jnp.broadcast_to(jnp.eye(Np, dtype=dtype), (pb, Np, Np))], axis=0
        )
        y = jnp.concatenate([y, jnp.zeros((pb, Np), dtype)], axis=0)
    return Ks, y


def _blocked_factor_solve(K, y, noise, interpret=None):
    B, N, _ = K.shape
    Ks, yp = _prep(K, y, noise)
    L, logdet = blocked_cholesky(Ks, interpret=interpret)
    a = jax.lax.linalg.triangular_solve(
        L, yp[:, :, None], left_side=True, lower=True
    )[:, :, 0]
    quad = jnp.sum(a[:, :N] * a[:, :N], axis=-1)
    nll = (0.5 * quad + logdet + 0.5 * N * LOG2PI)[:B]
    return nll, L, a


@jax.custom_vjp
def batched_nll_blocked(K, y, noise):
    """Differentiable batched NLL for 256 < N ≤ MAX_BLOCKED_N (float32).
    Same contract as ops.pallas.nll.batched_nll."""
    nll, _, _ = _blocked_factor_solve(K, y, noise)
    return nll


def _fwd(K, y, noise):
    nll, L, a = _blocked_factor_solve(K, y, noise)
    return nll, (L, a, K.shape[1], K.shape[0])


def _bwd(res, g):
    L, a, N, B = res
    Np = L.shape[1]
    eye = jnp.broadcast_to(jnp.eye(Np, dtype=L.dtype), L.shape)
    W = jax.lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)
    Wb = W[:B, :N, :N]
    Kinv = jnp.einsum("brq,brp->bqp", Wb, Wb, preferred_element_type=L.dtype,
                      precision="highest")
    alpha = jnp.einsum("brq,br->bq", Wb, a[:B, :N],
                       preferred_element_type=L.dtype, precision="highest")
    dK = 0.5 * (Kinv - alpha[:, :, None] * alpha[:, None, :])
    dnoise = 0.5 * (
        jnp.trace(Kinv, axis1=-2, axis2=-1) - jnp.sum(alpha * alpha, axis=-1)
    )
    gb = g[:, None, None]
    return gb * dK, g[:, None] * alpha, g * dnoise


batched_nll_blocked.defvjp(_fwd, _bwd)
