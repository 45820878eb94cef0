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

from lasso_tpu.ops.precision import (dot_nn as _dot_nn,
                                     split_bf16_xla as _split_bf16_xla)
from lasso_tpu.ops.shrink import (soft_threshold,
                                  soft_threshold_nonneg)


def _make_cd_kernel(steps, split_float, K, nonneg=False, has_row=False):
    def kernel(scal_ref, b_ref, z_ref, act_ref, *refs):
        refs = list(refs)
        if split_float:
            s_hi, s_lo = refs.pop(0)[:], refs.pop(0)[:]
        else:
            s = refs.pop(0)[:]
        # per-feature [1, K] threshold row (weighted lasso) or scalar
        alpha = refs.pop(0)[:] if has_row else scal_ref[0, 0]
        b_out_ref, z_out_ref, act_out_ref = refs
        tol_k = scal_ref[0, 1]
        # scal[0, 2] = 1/(1 + l2): elastic-net coordinate contraction
        # (the exact coordinate minimizer for unit-norm atoms is
        # shrink(b_k, alpha)/(1 + l2))
        scale = scal_ref[0, 2]
        b = b_ref[:]
        z = z_ref[:]
        act = act_ref[:]                      # [bn, 1] float 0/1
        bn = b.shape[0]
        iota = lax.broadcasted_iota(jnp.int32, (bn, K), 1)
        prox = soft_threshold_nonneg if nonneg else soft_threshold
        for _ in range(steps):
            z_cand = prox(b, alpha) * scale
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
                                    "kernel_precision", "nonneg"))
def fused_cd_steps(b, z, active, S, alpha, tol_k, steps=8, block_n=256,
                   interpret=False, kernel_precision="f32", nonneg=False,
                   l2=0.0):
    """``steps`` fused greedy-CD iterations. Returns ``(b, z, active)``.

    b, z: [N, K]; active: [N, 1] float 0/1 mask; S: [K, K] = I - W^T W.
    ``alpha`` (shrink threshold) and ``tol_k`` (per-sample deactivation
    threshold, tol * K) may be traced scalars; ``alpha`` may also be a
    per-feature [1, K] row (weighted lasso) riding in VMEM.
    """
    from lasso_tpu.ops.common import largest_aligned_divisor

    N, K = b.shape
    a_arr = jnp.asarray(alpha, jnp.float32)
    has_row = a_arr.ndim == 2
    block_n = largest_aligned_divisor(N, min(block_n, N))
    s_bytes = (4 if kernel_precision == "f32" else 2) * K * K
    while block_n > 8 and s_bytes + 2 * (4 * block_n * K * 4) \
            > 64 * 1024 * 1024:
        block_n = largest_aligned_divisor(N, block_n // 2)
    assert N % block_n == 0
    grid = (N // block_n,)

    scal = jnp.stack([jnp.asarray(0.0, jnp.float32) if has_row
                      else a_arr,
                      jnp.asarray(tol_k, jnp.float32),
                      1.0 / (1.0 + jnp.asarray(l2, jnp.float32))]
                     ).reshape(1, 3)

    smem = pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM)
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

    if has_row:
        s_args = s_args + (a_arr,)
        s_specs = s_specs + [pl.BlockSpec((1, K), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM)]

    kernel = _make_cd_kernel(steps, kernel_precision == "f32", K,
                             nonneg=nonneg, has_row=has_row)

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


def cd_steps_reference(b, z, active, S, alpha, tol_k, steps=1, l2=0.0):
    """jnp twin of the fused kernel (fallback and tests). Performs the
    same arithmetic including the bf16-split gather rounding."""
    s_hi, s_lo = _split_bf16_xla(S)
    S_eff = s_hi.astype(jnp.float32) + s_lo.astype(jnp.float32)
    N, K = b.shape
    rows_i = jnp.arange(N)
    for _ in range(steps):
        z_cand = soft_threshold(b, alpha) / (1.0 + l2)
        diff = z_cand - z
        k = jnp.argmax(jnp.abs(diff), axis=1)                  # [N]
        dz = jnp.take_along_axis(diff, k[:, None], axis=1)     # [N, 1]
        upd = active * dz
        b = b + upd * S_eff[k, :]
        z = z + upd * jax.nn.one_hot(k, K, dtype=z.dtype)
        active = active * (jnp.abs(dz) > tol_k).astype(jnp.float32)
    return b, z, active


def _make_cd_mod_kernel(K, D):
    """One full cyclic-CD sweep per invocation (reference cd.py:104-131).

    Layouts chosen so every per-component access is a dynamic SUBLANE
    load/store (Mosaic supports those; dynamic lane indexing it does
    not): atoms as rows of Wt [K, D], codes transposed zT [K, bn], the
    residual R [bn, D] carried as a value. The only per-step relayout is
    one [1, bn] <-> [bn, 1] vector transpose.
    """
    def kernel(scal_ref, nrm_ref, wt_ref, r_ref, conv_ref,
               zT_in_ref, zT_ref, r_out_ref, zmax_ref, dzmax_ref):
        # zT_ref is the output aliased onto zT_in_ref's buffer: reads see
        # the input codes until the row is overwritten (in cyclic order),
        # which is exactly the in-place sweep semantics
        del zT_in_ref
        alpha = scal_ref[0, 0]
        l2 = scal_ref[0, 1]
        R = r_ref[:]                                   # [bn, D]
        active_s = conv_ref[:]                         # [bn, 1] 1=active
        bn = R.shape[0]
        zmax = jnp.zeros((bn, 1), jnp.float32)
        dzmax = jnp.zeros((bn, 1), jnp.float32)

        def comp(j, carry):
            R, zmax, dzmax = carry
            wj = wt_ref[pl.ds(j, 1), :]                # [1, D]
            nj = nrm_ref[pl.ds(j, 1), :]               # [1, 1]
            col_ok = (nj[0, 0] != 0).astype(jnp.float32)
            act = active_s * col_ok                    # [bn, 1]
            zj = jnp.swapaxes(zT_ref[pl.ds(j, 1), :], 0, 1)  # [bn, 1]

            add = act * jnp.where(zj != 0, zj, 0.0)
            # rho = sum((R + add*wj) * wj) = sum(R*wj) + add*||wj||^2 —
            # avoids materializing the add-back residual R1
            rho = (jnp.sum(R * wj, axis=1, keepdims=True)
                   + add * nj[0, 0])                         # [bn, 1]
            # elastic net: sklearn's enet denominator ||w_j||^2 + l2
            denom = jnp.where(nj[0, 0] != 0, nj[0, 0], 1.0) + l2
            z_new = soft_threshold(rho, alpha) / denom
            z_new = jnp.where(act > 0, z_new, zj)
            sub = act * jnp.where(z_new != 0, z_new, 0.0)
            # single fused rank-1 correction (add-back minus re-subtract)
            R = R + (add - sub) * wj
            zT_ref[pl.ds(j, 1), :] = jnp.swapaxes(z_new, 0, 1)
            dzmax = jnp.maximum(dzmax,
                                jnp.abs(z_new - zj) * act)
            zmax = jnp.maximum(zmax, jnp.abs(z_new) * act)
            return (R, zmax, dzmax)

        R, zmax, dzmax = lax.fori_loop(0, K, comp, (R, zmax, dzmax))
        r_out_ref[:] = R
        zmax_ref[:] = zmax
        dzmax_ref[:] = dzmax

    return kernel


def supports_fused_cd_mod(z, weight):
    # K <= 1792: K = 2048 (x D = 512) reproducibly CRASHES the remote
    # Mosaic compile pipeline ("tpu_compile_helper subprocess exit
    # code 1", 2026-08-20, 3 attempts across sessions) while 1024/
    # 1536/1792 compile and run; such shapes route to the XLA sweep
    # (9.3 s per 100 sweeps at the 16384x(512->2048) headline —
    # converged, just unfused).
    N, K = z.shape
    D = weight.shape[0]
    return (z.dtype == jnp.float32 and (N % 128 == 0 or N <= 128)
            and K <= 1792
            and K * D * 4 + 2 * 128 * (K + D) * 4 <= 48 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_cd_mod_sweep(z, R, converged, weight, norm_cols, alpha,
                       l2=0.0, interpret=False):
    """One cyclic coordinate-descent sweep over all K components.

    z, R: [N, K] / [N, D]; converged: [N] bool (frozen samples);
    weight: [D, K]; norm_cols: [K] column squared norms.
    Returns ``(z, R, z_max, d_z_max)`` with the same meanings as the
    reference's inner loop state (cd.py:104-131).
    """
    N, K = z.shape
    D = weight.shape[0]
    # wide lane tiles: the per-component fori overhead is paid per grid
    # step, so make batch tiles as wide as VMEM allows (zT + R + outputs
    # + Wt within budget), in multiples of 128 lanes
    budget = 48 * 1024 * 1024 - K * D * 4
    if N <= 128:
        bl = N
    else:
        from lasso_tpu.ops.common import largest_aligned_divisor
        # lane-axis tile: must be a multiple of 128 (supports_fused_cd_mod
        # guarantees 128 | N here)
        bl = largest_aligned_divisor(N, min(N, 4096), align=128)
        while bl > 128 and 2 * (bl * K * 4 + bl * D * 4) > budget:
            bl = largest_aligned_divisor(N, bl // 2, align=128)
    assert N % bl == 0
    grid = (N // bl,)

    scal = jnp.stack([jnp.asarray(alpha, jnp.float32),
                      jnp.asarray(l2, jnp.float32)]).reshape(1, 2)
    Wt = weight.T                                   # [K, D]
    nrm = jnp.asarray(norm_cols, jnp.float32).reshape(K, 1)
    zT = z.T                                        # [K, N]
    act = (~converged).astype(jnp.float32)[:, None]  # [N, 1]

    smem = pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
    full_nrm = pl.BlockSpec((K, 1), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    full_wt = pl.BlockSpec((K, D), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    tile_r = pl.BlockSpec((bl, D), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    tile_c = pl.BlockSpec((bl, 1), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    tile_zT = pl.BlockSpec((K, bl), lambda i: (0, i),
                           memory_space=pltpu.VMEM)

    zT_out, R_out, zmax, dzmax = pl.pallas_call(
        _make_cd_mod_kernel(K, D),
        grid=grid,
        in_specs=[smem, full_nrm, full_wt, tile_r, tile_c, tile_zT],
        out_specs=[tile_zT, tile_r, tile_c, tile_c],
        out_shape=[
            jax.ShapeDtypeStruct((K, N), jnp.float32),
            jax.ShapeDtypeStruct((N, D), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ],
        input_output_aliases={5: 0},   # zT is updated in place
        cost_estimate=pl.CostEstimate(
            flops=K * 6 * N * D,
            bytes_accessed=(2 * N * D + 2 * N * K + K * D) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(scal, nrm, Wt, R, act, zT)

    return zT_out.T, R_out, zmax[:, 0], dzmax[:, 0]
