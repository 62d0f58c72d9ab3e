"""No-U-Turn Sampler (iterative, multinomial) over parameter pytrees.

Net-new capability required by BASELINE.json ("hyperparam NUTS samples/s at
N hosts"). Design follows Hoffman & Gelman (2014) with the modern refinements
used by Stan/numpyro:

- multinomial (not slice) sampling of the proposal among trajectory leaves,
  with biased progressive subtree acceptance;
- iterative tree building: each depth-d subtree is 2^d single leapfrog steps
  with O(max_depth) checkpoint buffers for the intra-subtree U-turn checks.
  A subtree of size 2^k ends at leaf j iff 2^k | j; its start leaf is
  j − 2^k + 1, whose state is parked in checkpoint slot ctz(j − 2^k) (slots
  never collide because pending left-endpoints have distinct trailing-zero
  counts);
- generalized U-turn criterion on momentum sums, checked for every aligned
  power-of-two subtree and for the merged tree after each doubling;
- divergence at ΔH > 1000; dual-averaging step size + Welford diagonal mass
  warmup shared with inference/hmc.py, including cross-device psum of
  adaptation statistics for multi-host chain parallelism.

Everything is jit-compatible (`lax.while_loop` over depths and leaves), so a
batch of chains is one `vmap` and chains shard across the mesh.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

MAX_DELTA_ENERGY = 1000.0


def _ctz(n):
    """Count trailing zeros of a positive int32."""
    n = n.astype(jnp.uint32)
    return jax.lax.population_count((~n) & (n - 1)).astype(jnp.int32)


class _Leaf(NamedTuple):
    q: jnp.ndarray
    p: jnp.ndarray
    grad: jnp.ndarray
    logp: jnp.ndarray
    energy: jnp.ndarray


class _SubtreeState(NamedTuple):
    leaf: _Leaf  # integration frontier (last leaf)
    prop_q: jnp.ndarray
    prop_logp: jnp.ndarray
    prop_grad: jnp.ndarray
    log_w: jnp.ndarray  # logsumexp of leaf weights in subtree
    rho: jnp.ndarray  # momentum sum over subtree
    first_p: jnp.ndarray  # momentum of subtree's first leaf
    sum_accept: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray
    # checkpoint buffers, (max_depth+1, dim) / (max_depth+1,)
    ck_q: jnp.ndarray
    ck_p: jnp.ndarray
    ck_rho_before: jnp.ndarray
    key: jnp.ndarray


def _single_leapfrog(vg_fn, leaf: _Leaf, eps, inv_mass):
    from portfoliooptgp_tpu.inference.hmc import kinetic, velocity

    p_half = leaf.p + 0.5 * eps * leaf.grad
    q_new = leaf.q + eps * velocity(inv_mass, p_half)
    logp_new, g_new = vg_fn(q_new)  # ONE fused eval for value AND gradient
    p_new = p_half + 0.5 * eps * g_new
    energy = -logp_new + kinetic(p_new, inv_mass)
    energy = jnp.where(jnp.isfinite(energy), energy, jnp.inf)
    return _Leaf(q_new, p_new, g_new, logp_new, energy)


def _build_subtree(vg_fn, start: _Leaf, depth, eps, inv_mass, h0,
                   max_depth, key):
    """Integrate 2^depth leaves from `start` (exclusive) in the direction of
    the sign of eps, with streaming multinomial proposal and iterative
    U-turn checks. Returns a _SubtreeState."""
    dim = start.q.shape[0]
    dtype = start.q.dtype
    n_leaves = jnp.asarray(1, jnp.int32) << depth

    init = _SubtreeState(
        leaf=start,
        prop_q=start.q, prop_logp=start.logp, prop_grad=start.grad,
        log_w=jnp.asarray(-jnp.inf, dtype),
        rho=jnp.zeros((dim,), dtype),
        first_p=jnp.zeros((dim,), dtype),
        sum_accept=jnp.asarray(0.0, dtype),
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        ck_q=jnp.zeros((max_depth + 1, dim), dtype),
        ck_p=jnp.zeros((max_depth + 1, dim), dtype),
        ck_rho_before=jnp.zeros((max_depth + 1, dim), dtype),
        key=key,
    )

    def cond(carry):
        i, st = carry
        return (i < n_leaves) & ~st.turning & ~st.diverging

    slot_iota = jnp.arange(max_depth + 1, dtype=jnp.int32)
    ks = jnp.arange(1, max_depth + 1, dtype=jnp.int32)  # checked subtree depths

    def body(carry):
        i, st = carry
        j = i + 1  # 1-based leaf index within the subtree
        leaf = _single_leapfrog(vg_fn, st.leaf, eps, inv_mass)
        log_w_leaf = h0 - leaf.energy
        diverging = (leaf.energy - h0) > MAX_DELTA_ENERGY
        accept_stat = jnp.minimum(1.0, jnp.exp(log_w_leaf))

        # store checkpoint: this leaf may be the left endpoint of a later
        # aligned subtree; slot = ctz(j-1), with the first leaf in the top
        # slot. One-hot masked writes, NOT .at[slot].set: a traced index
        # under the chain vmap lowers to scatter, which serializes on TPU —
        # the masked dense write over the tiny (max_depth+1, dim) buffer is
        # a fused VPU op.
        slot = jnp.where(i == 0, max_depth, _ctz(jnp.maximum(i, 1)))
        write = (slot_iota == slot)[:, None]
        ck_q = jnp.where(write, leaf.q[None, :], st.ck_q)
        ck_p = jnp.where(write, leaf.p[None, :], st.ck_p)
        ck_rho_before = jnp.where(write, st.rho[None, :], st.ck_rho_before)

        rho = st.rho + leaf.p
        first_p = jnp.where(i == 0, leaf.p, st.first_p)

        # streaming multinomial proposal
        key, k_u = jax.random.split(st.key)
        log_w_new = jnp.logaddexp(st.log_w, log_w_leaf)
        take = jnp.log(jax.random.uniform(k_u, dtype=dtype)) < (log_w_leaf - log_w_new)
        prop_q = jnp.where(take, leaf.q, st.prop_q)
        prop_logp = jnp.where(take, leaf.logp, st.prop_logp)
        prop_grad = jnp.where(take, leaf.grad, st.prop_grad)

        # intra-subtree U-turn checks at every aligned power-of-two boundary,
        # vectorized over all candidate depths k=1..max_depth at once
        # (one-hot reads of the checkpoint buffers instead of gathers)
        tz = _ctz(j)
        sizes = jnp.asarray(1, jnp.int32) << ks
        s = j - sizes + 1  # start leaf (1-based) of each candidate subtree
        slot_k = jnp.where(s == 1, max_depth, _ctz(jnp.maximum(s - 1, 1)))
        # read the PRE-write buffers (st.ck_*): a checked subtree's start
        # leaf is always < j, so leaf j's own checkpoint is never needed
        onehot = (slot_k[:, None] == slot_iota[None, :]).astype(dtype)  # (K, S)
        rho_before_k = onehot @ st.ck_rho_before  # (K, dim)
        p_left_k = onehot @ st.ck_p
        is_first = (s == 1)[:, None]
        rho_sub = jnp.where(is_first, rho[None, :], rho[None, :] - rho_before_k)
        p_left = jnp.where(is_first, first_p[None, :], p_left_k)
        # generalized U-turn on VELOCITIES: ρᵀ M⁻¹ p endpoint checks (Stan's
        # criterion); with a dense metric the row-matvec is a (K,d)@(d,d)
        v_left = p_left @ inv_mass if inv_mass.ndim == 2 else p_left * inv_mass
        v_right = (leaf.p @ inv_mass if inv_mass.ndim == 2
                   else leaf.p * inv_mass)[None, :]
        turn_k = (jnp.sum(rho_sub * v_left, axis=1) < 0) | (
            jnp.sum(rho_sub * v_right, axis=1) < 0
        )
        applies = ks <= tz
        turning = st.turning | jnp.any(applies & turn_k)

        st = _SubtreeState(
            leaf=leaf, prop_q=prop_q, prop_logp=prop_logp,
            prop_grad=prop_grad, log_w=log_w_new,
            rho=rho, first_p=first_p,
            sum_accept=st.sum_accept + accept_stat,
            turning=turning, diverging=st.diverging | diverging,
            ck_q=ck_q, ck_p=ck_p, ck_rho_before=ck_rho_before, key=key,
        )
        return i + 1, st

    _, st = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), init))
    return st


class NUTSInfo(NamedTuple):
    accept_prob: jnp.ndarray
    num_leaves: jnp.ndarray
    diverging: jnp.ndarray
    depth: jnp.ndarray


def nuts_step(vg_fn, q, logp, key, step_size, inv_mass,
              max_depth: int = 10, grad0=None, mass_chol_factor=None):
    """One NUTS transition on flat parameters. `vg_fn(q) -> (logp, grad)`
    evaluates value and gradient jointly (one fused call per leapfrog).
    `grad0` (optional) is the gradient at q, carried over from the previous
    transition's final leaf so the root needs no extra evaluation.
    `inv_mass` is a (dim,) diagonal or (dim, dim) DENSE inverse metric Σ;
    `mass_chol_factor` (optional) caches hmc.mass_chol(inv_mass) so the
    momentum draw does not refactor Σ every transition.
    Returns (q', logp', grad', info)."""
    from portfoliooptgp_tpu.inference.hmc import (kinetic, sample_momentum,
                                                  velocity)

    dtype = q.dtype
    key, k_mom = jax.random.split(key)
    p0 = sample_momentum(k_mom, inv_mass, chol=mass_chol_factor,
                         shape=q.shape, dtype=dtype)
    g0 = grad0 if grad0 is not None else vg_fn(q)[1]
    h0 = -logp + kinetic(p0, inv_mass)
    root = _Leaf(q=q, p=p0, grad=g0, logp=logp, energy=h0)

    class Carry(NamedTuple):
        key: jnp.ndarray
        depth: jnp.ndarray
        left: _Leaf
        right: _Leaf
        rho: jnp.ndarray
        prop_q: jnp.ndarray
        prop_logp: jnp.ndarray
        prop_grad: jnp.ndarray
        log_w: jnp.ndarray
        sum_accept: jnp.ndarray
        num_leaves: jnp.ndarray
        turning: jnp.ndarray
        diverging: jnp.ndarray

    init = Carry(
        key=key, depth=jnp.asarray(0, jnp.int32), left=root, right=root,
        rho=p0, prop_q=q, prop_logp=logp, prop_grad=g0,
        log_w=jnp.asarray(0.0, dtype),
        sum_accept=jnp.asarray(0.0, dtype), num_leaves=jnp.asarray(0, jnp.int32),
        turning=jnp.asarray(False), diverging=jnp.asarray(False),
    )

    def cond(c: Carry):
        return (c.depth < max_depth) & ~c.turning & ~c.diverging

    def body(c: Carry):
        key, k_dir, k_sub, k_merge = jax.random.split(c.key, 4)
        go_right = jax.random.bernoulli(k_dir)
        eps = jnp.where(go_right, step_size, -step_size)
        start = jax.tree.map(
            lambda a, b: jnp.where(go_right, a, b), c.right, c.left
        )
        st = _build_subtree(
            vg_fn, start, c.depth, eps, inv_mass, h0, max_depth, k_sub
        )
        sub_leaves = jnp.asarray(1, jnp.int32) << c.depth
        sum_accept = c.sum_accept + st.sum_accept
        num_leaves = c.num_leaves + sub_leaves
        bad_subtree = st.turning | st.diverging

        # biased progressive merge (only when the subtree is clean)
        take = (
            jnp.log(jax.random.uniform(k_merge, dtype=dtype))
            < (st.log_w - c.log_w)
        ) & ~bad_subtree
        prop_q = jnp.where(take, st.prop_q, c.prop_q)
        prop_logp = jnp.where(take, st.prop_logp, c.prop_logp)
        prop_grad = jnp.where(take, st.prop_grad, c.prop_grad)
        log_w = jnp.where(bad_subtree, c.log_w, jnp.logaddexp(c.log_w, st.log_w))

        new_right = jax.tree.map(
            lambda new, old: jnp.where(go_right & ~bad_subtree, new, old),
            st.leaf, c.right,
        )
        new_left = jax.tree.map(
            lambda new, old: jnp.where(~go_right & ~bad_subtree, new, old),
            st.leaf, c.left,
        )
        rho = jnp.where(bad_subtree, c.rho, c.rho + st.rho)
        full_turn = (jnp.dot(rho, velocity(inv_mass, new_left.p)) < 0) | (
            jnp.dot(rho, velocity(inv_mass, new_right.p)) < 0)
        return Carry(
            key=key, depth=c.depth + 1, left=new_left, right=new_right,
            rho=rho, prop_q=prop_q, prop_logp=prop_logp, prop_grad=prop_grad,
            log_w=log_w,
            sum_accept=sum_accept, num_leaves=num_leaves,
            turning=c.turning | bad_subtree | (full_turn & ~bad_subtree),
            diverging=c.diverging | st.diverging,
        )

    out = jax.lax.while_loop(cond, body, init)
    accept_prob = out.sum_accept / jnp.maximum(out.num_leaves, 1).astype(dtype)
    info = NUTSInfo(
        accept_prob=accept_prob, num_leaves=out.num_leaves,
        diverging=out.diverging, depth=out.depth,
    )
    return out.prop_q, out.prop_logp, out.prop_grad, info
