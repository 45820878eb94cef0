"""Pallas MXU kernel: fused greedy coordinate-descent steps.

Greedy CD's hot loop (reference lasso/linear/solvers/coordinate_descent.py:
31-48) updates, per sample, the coordinate with the largest candidate
change, then rank-1-corrects the correlation vector ``b`` with a row of
``S = I - W^T W``. Under XLA the data-dependent row gather ``S[k, :]``
lowers to a slow gather (measured 5.2 ms/iter at 16384x2048 on v5e, ~6x
off the bandwidth bound). On the MXU the gather IS a matmul: with S
resident in VMEM, ``onehot(k) @ S`` fetches every sample's row at full
MXU rate (one-hot entries are exactly representable in bf16, so the
gather itself is exact; in ``'f32'`` mode S is split into bf16 high +
residual parts and gathered in two passes, f32-grade).

``steps`` iterations run per kernel invocation with ``(b, z, active)``
resident in VMEM. Unlike the FISTA multi-step kernel this changes NO
stopping semantics even for tol > 0, because greedy CD's convergence
logic is the per-sample active mask (reference cd.py:40-48), and that
mask update runs in-kernel every sub-step: a sample that goes inactive is
frozen exactly, so extra sub-steps are no-ops for it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lasso_tpu.ops.fused_ista import _split_bf16_xla


def _dot_nn(a, b):
    return lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _make_cd_kernel(steps, split_float, K):
    def kernel(scal_ref, b_ref, z_ref, act_ref, *refs):
        if split_float:
            s_hi_ref, s_lo_ref, b_out_ref, z_out_ref, act_out_ref = refs
            s_hi, s_lo = s_hi_ref[:], s_lo_ref[:]
        else:
            s_ref, b_out_ref, z_out_ref, act_out_ref = refs
            s = s_ref[:]
        alpha = scal_ref[0, 0]
        tol_k = scal_ref[0, 1]
        b = b_ref[:]
        z = z_ref[:]
        act = act_ref[:]                      # [bn, 1] float 0/1
        bn = b.shape[0]
        iota = lax.broadcasted_iota(jnp.int32, (bn, K), 1)
        for _ in range(steps):
            z_cand = jnp.sign(b) * jnp.maximum(jnp.abs(b) - alpha, 0.0)
            diff = z_cand - z
            absdiff = jnp.abs(diff)
            m = jnp.max(absdiff, axis=1, keepdims=True)        # [bn, 1]
            # first-max index (argmax tie-breaking parity with XLA)
            k_idx = jnp.min(jnp.where(absdiff == m, iota, K),
                            axis=1, keepdims=True)             # [bn, 1]
            sel = (iota == k_idx)                              # [bn, K]
            sel_f = sel.astype(jnp.float32)
            dz = jnp.sum(diff * sel_f, axis=1, keepdims=True)  # [bn, 1]
            onehot = sel_f.astype(jnp.bfloat16)
            if split_float:
                rows = _dot_nn(onehot, s_hi) + _dot_nn(onehot, s_lo)
            else:
                rows = _dot_nn(onehot, s)                      # S[k, :]
            upd = act * dz                                     # [bn, 1]
            b = b + upd * rows
            z = z + upd * sel_f
            act = act * (jnp.abs(dz) > tol_k).astype(jnp.float32)
        b_out_ref[:] = b
        z_out_ref[:] = z
        act_out_ref[:] = act
    return kernel


def supports_fused_cd(b, weight):
    """Alignment + VMEM-residency check for the fused greedy-CD path:
    resident S (two bf16 split parts in f32 mode, 4K^2 bytes) plus the
    double-buffered minimum b/z tiles must fit the budget."""
    K = weight.shape[1]
    N = b.shape[0]
    min_tiles = 2 * (4 * 8 * K * 4)  # b, z in + b, z out at bn=8, x2 buf
    return (K % 128 == 0 and N % 8 == 0 and b.dtype == jnp.float32
            and K * K * 4 + min_tiles <= 64 * 1024 * 1024)


@functools.partial(jax.jit,
                   static_argnames=("steps", "block_n", "interpret",
                                    "kernel_precision"))
def fused_cd_steps(b, z, active, S, alpha, tol_k, steps=8, block_n=256,
                   interpret=False, kernel_precision="f32"):
    """``steps`` fused greedy-CD iterations. Returns ``(b, z, active)``.

    b, z: [N, K]; active: [N, 1] float 0/1 mask; S: [K, K] = I - W^T W.
    ``alpha`` (shrink threshold) and ``tol_k`` (per-sample deactivation
    threshold, tol * K) may be traced scalars.
    """
    N, K = b.shape
    block_n = min(block_n, N)
    while N % block_n != 0:
        block_n //= 2
    s_bytes = (4 if kernel_precision == "f32" else 2) * K * K
    while block_n > 8 and s_bytes + 2 * (4 * block_n * K * 4) \
            > 64 * 1024 * 1024:
        block_n //= 2
    grid = (N // block_n,)

    scal = jnp.stack([jnp.asarray(alpha, jnp.float32),
                      jnp.asarray(tol_k, jnp.float32)]).reshape(1, 2)

    smem = pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
    tile_k = lambda: pl.BlockSpec((block_n, K), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    tile_1 = lambda: pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    full_s = lambda: pl.BlockSpec((K, K), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)

    if kernel_precision == "f32":
        s_hi, s_lo = _split_bf16_xla(S)
        s_args = (s_hi, s_lo)
        s_specs = [full_s(), full_s()]
        passes = 2
    elif kernel_precision == "bf16":
        s_args = (S.astype(jnp.bfloat16),)
        s_specs = [full_s()]
        passes = 1
    else:
        raise ValueError(f"kernel_precision must be 'f32' or 'bf16', got "
                         f"{kernel_precision!r}")

    kernel = _make_cd_kernel(steps, kernel_precision == "f32", K)

    b_out, z_out, act_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem, tile_k(), tile_k(), tile_1()] + s_specs,
        out_specs=[tile_k(), tile_k(), tile_1()],
        out_shape=[
            jax.ShapeDtypeStruct((N, K), jnp.float32),
            jax.ShapeDtypeStruct((N, K), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=steps * passes * 2 * N * K * K,
            bytes_accessed=(4 * N * K + 2 * N + K * K) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(scal, b, z, active, *s_args)

    return b_out, z_out, act_out


def cd_steps_reference(b, z, active, S, alpha, tol_k, steps=1):
    """jnp twin of the fused kernel (fallback and tests). Performs the
    same arithmetic including the bf16-split gather rounding."""
    s_hi, s_lo = _split_bf16_xla(S)
    S_eff = s_hi.astype(jnp.float32) + s_lo.astype(jnp.float32)
    N, K = b.shape
    rows_i = jnp.arange(N)
    for _ in range(steps):
        z_cand = jnp.sign(b) * jnp.maximum(jnp.abs(b) - alpha, 0.0)
        diff = z_cand - z
        k = jnp.argmax(jnp.abs(diff), axis=1)                  # [N]
        dz = jnp.take_along_axis(diff, k[:, None], axis=1)     # [N, 1]
        upd = active * dz
        b = b + upd * S_eff[k, :]
        z = z + upd * jax.nn.one_hot(k, K, dtype=z.dtype)
        active = active * (jnp.abs(dz) > tol_k).astype(jnp.float32)
    return b, z, active
