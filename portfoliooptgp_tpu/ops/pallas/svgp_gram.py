"""Fused SVGP Gram-phase kernels: the B-dependent half of the Gaussian ELBO.

`svgp.gaussian_elbo_gram` collapses the minibatch into three reductions
(weighted Gram G = Kuf diag(w) Kufᵀ, weighted squared error, Σw) plus M×M
finishing ops. In XLA that phase is still a chain of latency-bound kernels
on the v5e — measured at M=128, B=2048 (benchmarks/prof_svgp_parts.py):
Kuf build 13.4 µs, G syrk 17.5 µs, plus the mean matvec and error reduction,
each a separate fusion region. This module fuses the whole phase into ONE
Pallas program per direction:

forward:  u = Σ_d s_d (z_d − x_d)² built elementwise per dim (exact f32 —
          see _u_of), Kuf = v φ(u), m = tᵀKuf,
          e = y_eff − m, outputs G = (Kuf∘w) Kufᵀ (MXU syrk),
          sq = Σ w e².
backward: recomputes Kuf once and produces ALL parameter cotangents in
          closed form — t̄ (via one MXU matvec), v̄, ARD s̄ (per-dim
          reductions of W2 = K̄uf ∘ v φ′(u)), Z̄ (MXU matvec per call, all
          dims at once), ȳ_eff — no (M,B) intermediate ever reaches HBM.

φ families reuse ops/pallas/stationary_nll._phi/_phi_prime (se, matern12/
32/52). Supports isotropic and ARD lengthscales via per-dim inverse-square
scales s. The q posterior must be single-latent (P = 1).

Replaces the per-step cost model of gpflow `SVGP.training_loss_closure`
(test_scripts/SVGP.py:515-533) for the Gaussian-likelihood training path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from portfoliooptgp_tpu.ops.pallas.nll import _interpret_default
from portfoliooptgp_tpu.ops.pallas.stationary_nll import _phi, _phi_prime

LANES = 128
MAX_FUSED_B = 8192  # single-program VMEM budget (~5 (M,B) f32 buffers)
# MXU precision for the f32 dots. Mosaic lowers only DEFAULT and HIGHEST;
# at (M, B) = (128, 2048) the dots are ~33 MMAC each, so even 6-pass
# HIGHEST costs ~2 us on the MXU -- the kernels are VPU-pass bound, not
# dot bound (benchmarks/prof_svgp_fused_parts.py)
HI = jax.lax.Precision.HIGHEST


def _pad_axis(a, axis, mult):
    pad = (-a.shape[axis]) % mult
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def _u_of(zcol, xt, s_row, ndim):
    """u = Σ_d s_d (z_d − x_d)², built ELEMENTWISE per dim (static D loop).

    The z²+x²−2zx MXU form is catastrophically inaccurate here: reference
    coordinates reach ~16k days, so a 3-pass bf16 cross term leaves ~3e-3
    absolute error in u — visible through exp(−u/2). D is small (1-8), so
    D exact broadcast-subtract passes on the VPU cost a few µs and keep u
    at full f32. zcol (M, L) lanes=dims, xt (L, B) sublanes=dims."""
    u = None
    for d in range(ndim):
        zd = jax.lax.slice_in_dim(zcol, d, d + 1, axis=1)   # (M, 1)
        xd = jax.lax.slice_in_dim(xt, d, d + 1, axis=0)     # (1, B)
        sd = jax.lax.slice_in_dim(s_row, d, d + 1, axis=1)  # (1, 1)
        diff = zd - xd  # (M, B)
        term = sd * (diff * diff)
        u = term if u is None else u + term
    return u


def _fwd_kernel(zcol_ref, xt_ref, s_ref, v_ref, t_ref, y_ref, w_ref,
                G_ref, sq_ref, *, family, ndim):
    u = _u_of(zcol_ref[...], xt_ref[...], s_ref[...], ndim)
    v = v_ref[0, 0]
    Kuf = v * _phi(family, u)  # (M, B)
    m = jax.lax.dot_general(t_ref[...], Kuf, (((1,), (0,)), ((), ())),
                            preferred_element_type=u.dtype,
                            precision=HI)  # (1, B)
    e = y_ref[...] - m
    w = w_ref[...]
    sq_ref[...] = jnp.sum(w * e * e).reshape(1, 1)
    Kw = Kuf * w  # (M, B)
    G_ref[...] = jax.lax.dot_general(Kw, Kuf, (((1,), (1,)), ((), ())),
                                     preferred_element_type=u.dtype,
                                     precision=HI)  # (M, M)


def _bwd_kernel(zcol_ref, xt_ref, s_ref, v_ref, t_ref, tcol_ref, y_ref,
                w_ref, gbar_ref, sqbar_ref,
                tbar_ref, vbar_ref, sbar_ref, zbar_ref, ybar_ref, *,
                family, ndim):
    zcol = zcol_ref[...]
    xt = xt_ref[...]
    s_row = s_ref[...]
    u = _u_of(zcol, xt, s_row, ndim)
    v = v_ref[0, 0]
    phi = _phi(family, u)
    Kuf = v * phi  # (M, B)
    m = jax.lax.dot_general(t_ref[...], Kuf, (((1,), (0,)), ((), ())),
                            preferred_element_type=u.dtype, precision=HI)
    w = w_ref[...]
    e = y_ref[...] - m  # (1, B)
    we = w * e
    sqbar = sqbar_ref[0, 0]
    gbar = gbar_ref[...]

    # t̄ᵀ = −2 s̄q · (w e) Kufᵀ          (1, M)
    tbar_ref[...] = -2.0 * sqbar * jax.lax.dot_general(
        we, Kuf, (((1,), (1,)), ((), ())),
        preferred_element_type=u.dtype, precision=HI)
    ybar_ref[...] = 2.0 * sqbar * we

    # K̄uf = (Ḡ + Ḡᵀ) Kuf ∘ w  −  2 s̄q · t ⊗ (w e)
    g1 = jax.lax.dot_general(gbar, Kuf, (((1,), (0,)), ((), ())),
                             preferred_element_type=u.dtype, precision=HI)
    g2 = jax.lax.dot_general(gbar, Kuf, (((0,), (0,)), ((), ())),
                             preferred_element_type=u.dtype, precision=HI)
    outer = jax.lax.dot_general(tcol_ref[...], we, (((1,), (0,)), ((), ())),
                                preferred_element_type=u.dtype, precision=HI)
    kbar = (g1 + g2) * w - 2.0 * sqbar * outer  # (M, B)

    vbar_ref[...] = jnp.sum(kbar * phi).reshape(1, 1)
    W2 = kbar * (v * _phi_prime(family, u))  # ∂L/∂u pointwise, (M, B)

    rW = jnp.sum(W2, axis=1, keepdims=True)  # (M, 1)
    cW = jnp.sum(W2, axis=0, keepdims=True)  # (1, B)
    # P@x for every dim at once: (M, B)·(L, B) contract B → (M, L)
    WX = jax.lax.dot_general(W2, xt, (((1,), (1,)), ((), ())),
                             preferred_element_type=u.dtype, precision=HI)
    # s̄_d = Σ W2 δ²_d = Σ_m z_d² rW + Σ_b x_d² cW − 2 Σ_m z_d (W2 x_d)
    A = jnp.sum(zcol * zcol * rW, axis=0, keepdims=True)  # (1, L)
    Bv = jax.lax.dot_general(cW, xt * xt, (((1,), (1,)), ((), ())),
                             preferred_element_type=u.dtype, precision=HI)
    C = jnp.sum(zcol * WX, axis=0, keepdims=True)  # (1, L)
    sbar_ref[...] = A + Bv - 2.0 * C
    # Z̄_d = 2 s_d (z_d ∘ rW − W2 @ x_d)
    zbar_ref[...] = 2.0 * s_row * (zcol * rW - WX)


def _prep(Z, X, y_eff, w, t, s, dtype):
    M, D = Z.shape
    if D > LANES:
        raise ValueError(f"D={D} exceeds the fused lane budget {LANES}")
    if M % 8:
        raise ValueError("fused gram path needs M % 8 == 0")
    zcol = _pad_axis(Z.astype(dtype), 1, LANES)  # (M, L) lanes=dims
    xt = _pad_axis(_pad_axis(X.T.astype(dtype), 0, LANES), 1, LANES)  # (L, Bp)
    s_iso = jnp.broadcast_to(jnp.asarray(s, dtype).reshape(-1), (D,))
    s_row = _pad_axis(s_iso.reshape(1, D), 1, LANES)  # (1, L)
    y_row = _pad_axis(y_eff.reshape(1, -1).astype(dtype), 1, LANES)
    w_row = _pad_axis(w.reshape(1, -1).astype(dtype), 1, LANES)
    t_row = t.reshape(1, M).astype(dtype)  # (1, M)
    return zcol, xt, s_row, y_row, w_row, t_row


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def gram_reduce(Z, X, y_eff, w, t, v, s, family="se", interpret=None):
    """Fused (G, sq_err) reduction of the SVGP Gaussian ELBO batch phase.

        Kuf[m, b] = v φ(Σ_d s_d (Z[m,d] − X[b,d])²)
        G = (Kuf ∘ w) Kufᵀ            (M, M)
        sq = Σ_b w_b (y_eff_b − (Kufᵀ t)_b)²

    Differentiable in Z, y_eff, t, v, s (X and w get zero cotangents — they
    are data/masks). M must be a multiple of 8; B is padded internally
    (padded rows must carry w = 0, which `svgp.gaussian_elbo_gram_fused`
    guarantees). φ families: se, matern12, matern32, matern52.
    """
    out, _ = _gram_fwd(Z, X, y_eff, w, t, v, s, family, interpret)
    return out


def _call(kernel, n_out, out_shapes, args, interpret, name):
    params = None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=64 * 1024 * 1024)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                   for _ in range(n_out)],
        out_shape=out_shapes,
        compiler_params=params,
        interpret=interpret,
        name=name,
    )(*args)


def _gram_fwd(Z, X, y_eff, w, t, v, s, family, interpret):
    if interpret is None:
        interpret = _interpret_default()
    M = Z.shape[0]
    dtype = jnp.result_type(Z.dtype, jnp.float32)
    zcol, xt, s_row, y_row, w_row, t_row = _prep(Z, X, y_eff, w, t, s, dtype)
    Mp = zcol.shape[0]
    v_s = jnp.asarray(v, dtype).reshape(1, 1)
    G, sq = _call(
        functools.partial(_fwd_kernel, family=family, ndim=Z.shape[1]), 2,
        [jax.ShapeDtypeStruct((Mp, Mp), dtype),
         jax.ShapeDtypeStruct((1, 1), dtype)],
        (zcol, xt, s_row, v_s, t_row, y_row, w_row), interpret,
        f"svgp_gram_fwd_{family}")
    out = (G[:M, :M].astype(Z.dtype), sq[0, 0].astype(Z.dtype))
    return out, (Z, X, y_eff, w, t, v, s)


def _gram_bwd(family, interpret, res, cots):
    if interpret is None:
        interpret = _interpret_default()
    Z, X, y_eff, w, t, v, s = res
    Gbar, sqbar = cots
    M, D = Z.shape
    dtype = jnp.result_type(Z.dtype, jnp.float32)
    zcol, xt, s_row, y_row, w_row, t_row = _prep(Z, X, y_eff, w, t, s, dtype)
    Mp = zcol.shape[0]
    B = X.shape[0]
    v_s = jnp.asarray(v, dtype).reshape(1, 1)
    t_col = t_row.reshape(-1, 1)
    gbar_p = Gbar.astype(dtype)
    sqbar_s = jnp.asarray(sqbar, dtype).reshape(1, 1)
    Bp = xt.shape[1]
    tbar, vbar, sbar, zbar, ybar = _call(
        functools.partial(_bwd_kernel, family=family, ndim=D), 5,
        [jax.ShapeDtypeStruct((1, Mp), dtype),
         jax.ShapeDtypeStruct((1, 1), dtype),
         jax.ShapeDtypeStruct((1, LANES), dtype),
         jax.ShapeDtypeStruct((Mp, LANES), dtype),
         jax.ShapeDtypeStruct((1, Bp), dtype)],
        (zcol, xt, s_row, v_s, t_row, t_col, y_row, w_row, gbar_p, sqbar_s),
        interpret, f"svgp_gram_bwd_{family}")
    zd = Z.dtype
    s_cot = sbar[0, :D]
    if jnp.ndim(s) == 0:  # isotropic: one shared scale, sum the per-dim bars
        s_cot = jnp.sum(s_cot)
    return (
        zbar[:M, :D].astype(zd),               # Z̄
        jnp.zeros_like(X),                     # X is data
        ybar[0, :B].reshape(y_eff.shape).astype(zd),
        jnp.zeros_like(w),                     # mask, non-diff
        tbar[0, :M].reshape(t.shape).astype(zd),
        vbar[0, 0].astype(zd).reshape(jnp.shape(v)),
        s_cot.astype(zd).reshape(jnp.shape(s)),
    )


gram_reduce.defvjp(_gram_fwd, _gram_bwd)
