"""Prototype: can the in-VMEM lanes-batched Cholesky use the MXU?

Tests the two Mosaic lowering questions behind the sub-panel-blocked
restructure of ops/pallas/nll.py's column loop:
  1. middle-axis (sublane) integer indexing of a 3D VMEM ref -> 2D value
  2. 2D dot_general on that value (MXU) and writing the result back through
     a sliced ref with a static middle index
Run on the real chip: python benchmarks/proto_mxu_block.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 256
BT = 8
SUB = 64


def kernel(A_ref, out_ref):
    # copy in
    out_ref[...] = A_ref[...]
    # per-b 2D dot on a middle-indexed slice, write back through sliced ref
    for b in range(BT):
        M = out_ref[0:SUB, b, :]  # (SUB, N) 2D value via middle int index
        G = jax.lax.dot_general(
            M, M, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (N, N)
        Gt = jax.lax.slice_in_dim(G, SUB, N, axis=0)  # rows SUB..N
        out_ref[SUB:, b, :] = out_ref[SUB:, b, :] - Gt


def main():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(N, BT, N)).astype(np.float32)
    f = jax.jit(
        lambda A: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, BT, N), jnp.float32),
            in_specs=[pl.BlockSpec((N, BT, N), lambda: (0, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((N, BT, N), lambda: (0, 0, 0), memory_space=pltpu.VMEM),
        )(A)
    )
    out = np.asarray(f(A))
    # reference
    ref = A.copy()
    for b in range(BT):
        M = A[0:SUB, b, :]
        G = M.T @ M
        ref[SUB:, b, :] -= G[SUB:, :]
    err = np.max(np.abs(out - ref)) / np.max(np.abs(ref))
    print("max rel err:", err)
    assert err < 1e-5, err

    # rough timing of the 8 dots
    reps = 200
    f(A)
    t0 = time.perf_counter()
    for i in range(reps):
        r = f(A * (1.0 + 1e-7 * i))
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"per-call (incl pipeline + copy): {dt*1e6:.1f} us")


if __name__ == "__main__":
    main()
