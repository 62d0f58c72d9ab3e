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


# Measured on v5e (2026-08-20, value+grad vs XLA batched cholesky pipeline):
# the blocked path wins at N ≤ 1024 (1.3-1.6×) and loses beyond (0.8× at
# N=2048, ~0.4× at N=4096): the trailing syrk einsums run near the MXU
# roofline either way, while the panel factor's sequential column loop costs
# ~1 µs/column regardless of N — at large N, XLA's own blocked factorization
# amortizes that better. gpr dispatch prefers XLA above this cutoff.
BLOCKED_PREFERRED_N = 1024


def blocked_nll_preferred(n: int) -> bool:
    return n + ((-n) % 128) <= BLOCKED_PREFERRED_N


SUBP = 64  # sub-panel width: rank-1s stay inside their sub-panel's columns;
# the deferred update of the panel's remaining columns is one MXU dot per
# batch sublane at each sub-panel boundary (same scheme as nll._blocked_chol)


def _panel_kernel(P_ref, Lp_ref, logdet_ref, *, nt, b_tile):
    """Factor a (PW cols, b, nt rows) panel in place.

    The panel's diagonal block sits at rows 0..PW (row r of the panel is
    global row p0+r, column j is global column p0+j). Emits the panel of L
    and each program's Σ log diag contribution.

    The column loop is SUBP-blocked: each rank-1 touches only its own
    sub-panel's columns (×nt rows), and the update of the panel columns
    beyond the sub-panel is applied at the boundary as a per-sublane 2D
    `dot_general` on the MXU (Mosaic cannot lower a 3D batched dot). The
    multiplier rows live at lanes 0..PW (the diagonal block is the panel's
    top), so the gemm's left operand is a 128-aligned lane slice.
    """
    dtype = P_ref.dtype
    hi = jax.lax.Precision.HIGHEST
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, nt), 1)  # (1, nt) row ids
    Lp_ref[...] = P_ref[...]
    logdet = jnp.zeros((b_tile, 1), dtype)

    for off in range(0, PW, SUBP):
        p1 = off + SUBP

        def body(j, logdet, off=off, p1=p1):
            i = off + j
            col = Lp_ref[i]  # (b, nt): column i over trailing rows
            onehot = (lanes == i).astype(dtype)
            d2 = jnp.sum(col * onehot, axis=-1, keepdims=True)
            d = jnp.sqrt(d2)
            below = (lanes > i).astype(dtype)
            m = col * below / d  # (b, nt) strictly-below column of L
            # rank-1 restricted to this sub-panel's own columns c in (i, p1):
            # the multiplier is m at the panel row matching column c, i.e.
            # lanes off..p1 (zero at lanes <= i, so finished columns are safe)
            mT_full = jnp.swapaxes(m, 0, 1)[:, :, None]  # (nt, b, 1)
            mT = jax.lax.slice_in_dim(mT_full, off, p1, axis=0)  # (SUBP, b, 1)
            Lp_ref[off:p1, :, :] = Lp_ref[off:p1, :, :] - mT * m[None, :, :]
            Lp_ref[i, :, :] = m + d * onehot
            return logdet + jnp.log(d)

        # i32 bounds: i64 loop carries (x64 mode) break Mosaic lowering
        logdet = jax.lax.fori_loop(jnp.int32(0), jnp.int32(SUBP), body, logdet)

        if p1 < PW:
            # deferred update of panel columns p1..PW from this sub-panel's
            # SUBP finished columns: G[c, r] = Σ_j L[c, j]·L[r, j] with the
            # c-multipliers read from the stored columns' head lanes [0, 128)
            for b in range(b_tile):
                M = Lp_ref[off:p1, b, :]  # (SUBP, nt) finished columns
                Mh = jax.lax.slice_in_dim(M, 0, 128, axis=1)  # (SUBP, 128)
                G = jax.lax.dot_general(
                    Mh, M, (((0,), (0,)), ((), ())),
                    preferred_element_type=dtype, precision=hi,
                )  # (128, nt); rows < p1 are garbage and never read
                Gt = jax.lax.slice_in_dim(G, p1, PW, axis=0)  # (PW-p1, nt)
                Lp_ref[p1:PW, b, :] = Lp_ref[p1:PW, b, :] - Gt

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
        name="blocked_panel_chol",
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


def blocked_triangular_inverse(L, interpret=None):
    """W = L⁻¹ for a batch of (B, Np, Np) lower-triangular factors, built for
    the MXU instead of XLA's sequential `triangular_solve` (which was ~55% of
    the blocked NLL value+grad at N=512-1024 on v5e).

    Hierarchical block inversion:
    1. every PW-diagonal block is inverted by the lanes-batched Pallas
       forward-substitution kernel (ops/pallas/nll._trinv_kernel), all
       B·P blocks in one call;
    2. log2(P) pairwise-combine levels assemble ever-larger inverses with
        [[A, 0], [B, C]]⁻¹ = [[A⁻¹, 0], [−C⁻¹ B A⁻¹, C⁻¹]]
       — two batched einsums per level over all pairs at once, so the whole
       O(N³) off-diagonal work is a handful of MXU gemms.

    P is padded to a power of two with identity blocks (their inverse is
    identity, sliced away at the end). Precision pins HIGHEST like the
    forward syrk (bf16 passes compound across levels).
    """
    from portfoliooptgp_tpu.ops.pallas.nll import triangular_inverse_pallas

    if interpret is None:
        interpret = _interpret_default()
    B, Np, _ = L.shape
    dtype = L.dtype
    P = Np // PW
    P2 = 1 << (P - 1).bit_length()  # next power of two
    if P2 != P:
        pad_n = (P2 - P) * PW
        L = jnp.pad(L, ((0, 0), (0, pad_n), (0, pad_n)))
        eye_tail = jnp.concatenate(
            [jnp.zeros((Np,), dtype), jnp.ones((pad_n,), dtype)]
        )
        L = L + jnp.diag(eye_tail)[None]
        P = P2
    Npad = P * PW

    # 1) all diagonal PW-blocks in one Pallas call, batched on sublanes.
    # Grid programs execute sequentially on the core, so pack as many
    # blocks per program as VMEM allows — at b_tile=8 the 128-step column
    # loop repeats B·P/8 times and overhead dominates.
    blocks = L.reshape(B, P, PW, P, PW)
    diag = jnp.diagonal(blocks, axis1=1, axis2=3)  # (B, PW, PW, P)
    flat = jnp.transpose(diag, (0, 3, 1, 2)).reshape(B * P, PW, PW)
    BP = B * P
    # the Pallas inverse tiles the batch on sublanes in groups of 8; pad the
    # batch with identity blocks (whose inverse is identity, sliced away)
    # rather than failing on e.g. B=1 with an odd panel count
    b_tile = next((t for t in (32, 16, 8) if BP % t == 0), None)
    BPpad = BP
    if b_tile is None:
        BPpad = -(-BP // 8) * 8
        eye_pad = jnp.broadcast_to(jnp.eye(PW, dtype=dtype), (BPpad - BP, PW, PW))
        flat = jnp.concatenate([flat, eye_pad], axis=0)
        b_tile = next(t for t in (32, 16, 8) if BPpad % t == 0)
    A_layout = jnp.transpose(flat, (2, 0, 1))  # (col, B·P, row)
    W_layout = triangular_inverse_pallas(A_layout, b_tile=b_tile,
                                         interpret=interpret)
    W_flat = jnp.transpose(W_layout, (1, 0, 2))[:BP]
    cur = W_flat.reshape(B, P, PW, PW)

    # 2) pairwise combine: nb blocks of width w -> nb/2 blocks of width 2w
    # backward-only math: 3-pass bf16 ("high") is 1.5-2x faster than
    # "highest" on the MXU and costs ~1e-5 relative error in the gradient
    # (measured vs highest; the parity gates test grads at ~1e-4)
    hi = jax.lax.Precision.HIGH
    w = PW
    while cur.shape[1] > 1:
        nb2 = cur.shape[1] // 2
        WA = cur[:, 0::2]  # (B, nb2, w, w)
        WC = cur[:, 1::2]
        # subdiagonal L21 block of each pair: rows of C, columns of A
        Lp = L.reshape(B, nb2, 2, w, nb2, 2, w)
        L21 = jnp.transpose(
            jnp.diagonal(Lp[:, :, 1, :, :, 0, :], axis1=1, axis2=3),
            (0, 3, 1, 2),
        )  # (B, nb2, w, w)
        T = jnp.einsum("bpst,bptq->bpsq", L21, WA,
                       preferred_element_type=dtype, precision=hi)
        W21 = -jnp.einsum("bprs,bpsq->bprq", WC, T,
                          preferred_element_type=dtype, precision=hi)
        zero = jnp.zeros((B, nb2, w, w), dtype)
        top = jnp.concatenate([WA, zero], axis=-1)
        bot = jnp.concatenate([W21, WC], axis=-1)
        cur = jnp.concatenate([top, bot], axis=-2)  # (B, nb2, 2w, 2w)
        w *= 2
    W = cur[:, 0]
    return W[:, :Np, :Np]


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
    # Ks⁻¹ = WᵀW with W = L⁻¹ from XLA's triangular solve against the
    # identity. A hierarchical MXU block inversion (blocked_triangular_inverse)
    # was built and benchmarked as a replacement: isolated it is ~25% faster
    # than the trisolve, but interleaved inside the full value+grad program
    # the two designs time identically on v5e (2.10 vs 2.11 ms at B=8,
    # N=1024) — XLA overlaps the trisolve with the unrolled panel pipeline.
    # The simpler design stays; the block inverse remains available for
    # contexts without that overlap (see BENCH_NOTES.md roofline section).
    L, a, N, B = res
    Np = L.shape[1]
    eye = jnp.broadcast_to(jnp.eye(Np, dtype=L.dtype), L.shape)
    W = jax.lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)
    Wb = W[:B, :N, :N]
    Kinv = jnp.einsum("brq,brp->bqp", Wb, Wb, preferred_element_type=W.dtype,
                      precision="highest")
    alpha = jnp.einsum("brq,br->bq", Wb, a[:B, :N],
                       preferred_element_type=W.dtype, precision="highest")
    dK = 0.5 * (Kinv - alpha[:, :, None] * alpha[:, None, :])
    dnoise = 0.5 * (
        jnp.trace(Kinv, axis1=-2, axis2=-1) - jnp.sum(alpha * alpha, axis=-1)
    )
    gb = g[:, None, None]
    return gb * dK, g[:, None] * alpha, g * dnoise


batched_nll_blocked.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Large-N tier (1024 < padded N ≤ HINV_MAX_N): XLA cholesky forward +
# hierarchical MXU triangular inverse, all-matmul backward.
#
# Measured on v5e (benchmarks/prof_large_n*.py, B=8, N=2048, f32): BOTH
# XLA's cholesky (7.8 ms) and its triangular_solve-vs-identity (8.5 ms)
# are per-column latency bound (~6 TFLOP/s effective vs the 96-112 TFLOP/s
# matmul ceiling), and the Pallas 128-column panel factor is no better at
# this scale (10.5 ms). The one primitive that escapes the serial-column
# regime is the hierarchical block inverse (Pallas 128×128 diagonal-block
# inverses + log2(P) pairwise MXU combines): 6.1 ms vs the 8.5 ms trisolve.
# So this tier keeps XLA's factorization (its per-column loop is the best
# available) and removes every OTHER serial loop from the value+grad:
#   forward:  L = chol(Ks) (XLA), W = L⁻¹ (hierarchical), a = W y (matmul)
#   backward: Ks⁻¹ = WᵀW (syrk), α = Wᵀa (matvec), GPML eq. 5.9 — matmuls
# (the classic blocked tier's backward pays the trisolve-vs-I instead).
# ---------------------------------------------------------------------------

#: largest padded N for the hierarchical-inverse tier — its measured WIN
#: window. The uneven-split inverse (triangular_inverse_uneven) removes the
#: power-of-two padding waste inside the window (e.g. N=3000: 24 panels run
#: as 16+8 instead of padding to 32), but at the far end the tier loses:
#: at the reference's full-AAPL N=10,963 (B=1) it measured 639 ms value+grad
#: vs 351 ms for plain XLA — the O(N²) level-combine relayouts of the
#: hierarchical inverse dominate once N² buffers reach ~0.5 GB. Dispatch
#: hands N > 4096 back to XLA (or the CG/SLQ matrix-free tier).
HINV_MAX_N = 4096

#: B·Np² element budget: the value+grad keeps ~5 live (B, N, N) f32 buffers
#: (Ks, L, W, Ks⁻¹, dK) → 6e8 elements ≈ 12 GB of the 16 GB v5e HBM.
HINV_MAX_ELEMS = 600_000_000


def hinv_nll_preferred(n: int, b: int = 1) -> bool:
    np_ = n + ((-n) % 128)
    return (BLOCKED_PREFERRED_N < np_ <= HINV_MAX_N
            and b * np_ * np_ <= HINV_MAX_ELEMS)


def _hinv_factor(K, y, noise, interpret=None):
    B, N, _ = K.shape
    Ks, yp = _prep(K, y, noise)
    L = jnp.linalg.cholesky(Ks)
    W = triangular_inverse_uneven(L, interpret=interpret)
    a = jnp.einsum("bqr,br->bq", W, yp,
                   preferred_element_type=W.dtype, precision="highest")
    logdet = jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    quad = jnp.sum(a[:, :N] * a[:, :N], axis=-1)
    nll = (0.5 * quad + logdet + 0.5 * N * LOG2PI)[:B]
    return nll, W, a


@jax.custom_vjp
def batched_nll_hinv(K, y, noise):
    """Differentiable batched NLL for the large-N window (see module note).
    Same contract as ops.pallas.nll.batched_nll: K (B, N, N), y (B, N),
    noise (B,) → (B,) negative log marginal likelihoods."""
    nll, _, _ = _hinv_factor(K, y, noise)
    return nll


def _hinv_fwd(K, y, noise):
    nll, W, a = _hinv_factor(K, y, noise)
    return nll, (W, a, K.shape[1], K.shape[0])


def _hinv_bwd(res, g):
    W, a, N, B = res
    Wb = W[:B, :N, :N]
    Kinv = jnp.einsum("brq,brp->bqp", Wb, Wb, preferred_element_type=W.dtype,
                      precision="highest")
    alpha = jnp.einsum("brq,br->bq", Wb, a[:B, :N],
                       preferred_element_type=W.dtype, precision="highest")
    dK = 0.5 * (Kinv - alpha[:, :, None] * alpha[:, None, :])
    dnoise = 0.5 * (
        jnp.trace(Kinv, axis1=-2, axis2=-1) - jnp.sum(alpha * alpha, axis=-1)
    )
    gb = g[:, None, None]
    return gb * dK, g[:, None] * alpha, g * dnoise


batched_nll_hinv.defvjp(_hinv_fwd, _hinv_bwd)


def triangular_inverse_uneven(L, interpret=None):
    """W = L⁻¹ for (B, Np, Np) lower factors with Np ANY multiple of PW.

    `blocked_triangular_inverse` pads the panel count to a power of two —
    at the reference's full-AAPL N=10,963 (86 panels) that rounds to 128
    panels (N=16,384), a 2.2× FLOP/memory blowup. This wrapper instead
    splits off the largest power-of-two panel prefix and recurses on the
    remainder (86 → 64+22 → 64+(16+6) → …), combining with the same
    block-triangular identity:

        [[A, 0], [C, D]]⁻¹ = [[A⁻¹, 0], [−D⁻¹ C A⁻¹, D⁻¹]]

    Two batched MXU einsums per level; only true-size work is done."""
    B, Np, _ = L.shape
    P = Np // PW
    if P & (P - 1) == 0:  # power of two: the padded path is exact-size
        return blocked_triangular_inverse(L, interpret=interpret)
    P1 = 1 << (P.bit_length() - 1)  # largest power of two < P
    n1 = P1 * PW
    A = L[:, :n1, :n1]
    C = L[:, n1:, :n1]
    D = L[:, n1:, n1:]
    WA = blocked_triangular_inverse(A, interpret=interpret)
    WD = triangular_inverse_uneven(D, interpret=interpret)
    hi = jax.lax.Precision.HIGHEST
    T = jnp.einsum("brk,bkq->brq", C, WA,
                   preferred_element_type=L.dtype, precision=hi)
    W21 = -jnp.einsum("brs,bsq->brq", WD, T,
                      preferred_element_type=L.dtype, precision=hi)
    top = jnp.concatenate(
        [WA, jnp.zeros((B, n1, Np - n1), L.dtype)], axis=2)
    bot = jnp.concatenate([W21, WD], axis=2)
    return jnp.concatenate([top, bot], axis=1)
