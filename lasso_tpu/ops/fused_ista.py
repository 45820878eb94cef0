"""Pallas MXU kernel: fully-fused FISTA step.

One kernel per FISTA iteration computes, for an N-tile of the batch:

    resid  = y W^T - x            (MXU, contract K)
    grad   = resid W              (MXU, contract D)
    z_next = softshrink(y - lr * grad, alpha * lr)
    y_next = z_next + mom * (z_next - z)     (FISTA momentum)
    delta += sum |z_next - z|                (convergence partial sum)

vs. the unfused XLA path this removes the HBM round trip of the [N, D]
residual between the two matmuls and the separate momentum/convergence
passes over [N, K]: per-iteration HBM traffic drops from ~7NK+3ND to the
i/o minimum 4NK+ND (plus the resident dictionary). The dictionary W [D, K]
stays pinned in VMEM across the whole grid.

Matmul precision inside the kernel (``kernel_precision``):

* ``"bf16"`` — native MXU bf16 passes with f32 accumulation. Per-step
  elementwise error ~4e-3, but FISTA is a contractive fixed-point
  iteration: measured end-to-end objective agrees with full-f32 XLA to
  ~2e-6 relative. Fastest.
* ``"f32"`` — manual split-float (bf16x3): each operand is split into a
  bf16 high part and bf16 residual, and the cross terms hi*hi + hi*lo +
  lo*hi run as three full-rate MXU passes accumulated in f32. Neglected
  lo*lo term is ~2^-18 relative — f32-grade. (Mosaic supports only
  DEFAULT/HIGHEST dot precisions; HIGHEST's operand splitting triples
  VMEM and OOMs for resident-dictionary tiles, hence the manual scheme.
  The dictionary's split is computed once outside the kernel since W is
  iteration-invariant.)

Used by :func:`lasso_tpu.linear.solvers.ista.ista` on TPU backends for
aligned shapes; everything else falls back to the identical jnp step
(the kernel is also run in interpreter mode on CPU in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lasso_tpu.ops.precision import (dot_nn as _dot_nn,
                                     dot_nt as _dot_nt,
                                     round_bf16 as _round_bf16,
                                     split_bf16 as _split_bf16,
                                     split_bf16_xla as _split_bf16_xla)
from lasso_tpu.ops.shrink import (soft_threshold,
                                  soft_threshold_nonneg)


def _epilogue(scal_ref, y, z, grad, z_out_ref, delta_ref, nonneg=False,
              thresh=None):
    lr = scal_ref[0, 0]
    if thresh is None:
        thresh = scal_ref[0, 1]   # alpha * lr
    prox = soft_threshold_nonneg if nonneg else soft_threshold
    # scal[0, 3] = 1/(1 + l2*lr): the elastic-net prox is the lasso
    # shrink followed by a multiplicative contraction (1 for l2=0)
    z_next = prox(y - lr * grad, thresh) * scal_ref[0, 3]
    z_out_ref[:] = z_next

    # accumulate the convergence statistic across the (sequential) grid
    @pl.when(pl.program_id(0) == 0)
    def _():
        delta_ref[0, 0] = 0.0

    delta_ref[0, 0] += jnp.sum(jnp.abs(z_next - z))


def _fista_kernel_bf16(scal_ref, x_ref, z_ref, zp_ref, w_ref, *refs,
                       emulate=False, nonneg=False, has_row=False):
    if has_row:   # per-feature threshold row [1, K] (already * lr)
        trow_ref, z_out_ref, delta_ref = refs
        thresh = trow_ref[:]
    else:
        z_out_ref, delta_ref = refs
        thresh = None
    z = z_ref[:]
    # momentum point formed in-register: y = z + mom * (z - z_prev)
    y = z + scal_ref[0, 2] * (z - zp_ref[:])
    w = w_ref[:]
    if emulate:  # interpret only: round the DOT OPERANDS (and only
        # them) the way Mosaic's DEFAULT dot precision does on hardware;
        # y itself stays f32 for the epilogue
        w_d = _round_bf16(w)
        resid = _dot_nt(_round_bf16(y), w_d) - x_ref[:]
        grad = _dot_nn(_round_bf16(resid), w_d)
    else:
        # compiled bf16 mode: w arrives as a real bf16 array; explicit
        # activation casts match Mosaic's DEFAULT-precision truncation
        resid = _dot_nt(y.astype(w.dtype), w) - x_ref[:]
        grad = _dot_nn(resid.astype(w.dtype), w)
    _epilogue(scal_ref, y, z, grad, z_out_ref, delta_ref, nonneg, thresh)


def _fista_kernel_f32(scal_ref, x_ref, z_ref, zp_ref, w_hi_ref, w_lo_ref,
                      *refs, emulate=False, nonneg=False, has_row=False):
    if has_row:
        trow_ref, z_out_ref, delta_ref = refs
        thresh = trow_ref[:]
    else:
        z_out_ref, delta_ref = refs
        thresh = None
    z = z_ref[:]
    y = z + scal_ref[0, 2] * (z - zp_ref[:])
    w_hi = w_hi_ref[:]
    w_lo = w_lo_ref[:]

    y_hi, y_lo = _split_bf16(y, emulate)
    resid = (_dot_nt(y_hi, w_hi) + _dot_nt(y_hi, w_lo)
             + _dot_nt(y_lo, w_hi)) - x_ref[:]

    r_hi, r_lo = _split_bf16(resid, emulate)
    grad = (_dot_nn(r_hi, w_hi) + _dot_nn(r_hi, w_lo)
            + _dot_nn(r_lo, w_hi))
    _epilogue(scal_ref, y, z, grad, z_out_ref, delta_ref, nonneg, thresh)


# in/out tile budget; the split-float temporaries (y/resid hi+lo parts)
# add ~40% scratch on top, so this is deliberately well under the 96 MiB
# vmem_limit handed to the compiler (126 MB observed at a modeled 88 MB)
_VMEM_BUDGET = 64 * 1024 * 1024


def _tile_bytes(bn, D, K):
    """Double-buffered per-tile VMEM: one [bn,D] x tile + four [bn,K]
    z-class tiles (z, z_prev, z_out, zp_out), f32."""
    return 2 * (bn * D * 4 + 4 * bn * K * 4)


def _pick_block_n(N, D, K, w_bytes, requested):
    """Largest batch tile that divides N and fits the VMEM budget next to
    the resident dictionary. Every candidate is re-derived as an exact
    multiple-of-8 divisor of N, so the grid always covers the batch."""
    from lasso_tpu.ops.common import largest_aligned_divisor
    bn = largest_aligned_divisor(N, min(requested, N))
    while bn > 8 and w_bytes + _tile_bytes(bn, D, K) > _VMEM_BUDGET:
        bn = largest_aligned_divisor(N, bn // 2)
    assert N % bn == 0
    return bn


def supports_fused_step(x, z0, weight):
    """Alignment + VMEM-envelope check for the fast path: lane dims
    multiples of 128, batch divisible into sublane tiles, and the
    resident dictionary (two bf16 split parts in f32 mode) plus
    double-buffered minimum tiles within the kernel's VMEM budget."""
    N, D = x.shape
    K = weight.shape[1]
    w_bytes = 4 * D * K  # worst case: f32 split mode, two bf16 operands
    return (D % 128 == 0 and K % 128 == 0 and N % 8 == 0
            and x.dtype == jnp.float32
            and w_bytes + _tile_bytes(8, D, K) <= _VMEM_BUDGET)


@functools.partial(jax.jit,
                   static_argnames=("block_n", "interpret",
                                    "kernel_precision", "nonneg"))
def fused_fista_step(x, z, z_prev, weight, lr, alpha, mom, block_n=256,
                     interpret=False, kernel_precision="f32", nonneg=False,
                     l2=0.0):
    """One fused FISTA step. Returns ``(z_next, delta)`` where
    ``delta = sum|z_next - z|`` (the convergence statistic).

    ``l2 > 0`` solves the ELASTIC NET (+ 0.5*l2*||z||^2): the prox
    gains a multiplicative contraction 1/(1 + l2*lr) after the shrink —
    one VPU multiply, the smooth part (and so lr) is unchanged.

    The momentum point ``y = z + mom * (z - z_prev)`` is formed inside the
    kernel, so the iteration carries only ``(z, z_prev)`` — HBM traffic is
    the i/o minimum 3NK + ND per step.

    x: [N, D], z/z_prev: [N, K], weight: [D, K]; lr/alpha/mom may be
    traced. ``mom`` must be the momentum coefficient for *this* step's y
    (i.e. lagged one iteration relative to the t-update; see
    linear/solvers/ista.py). ``alpha`` may be a scalar or a per-feature
    [1, K] row (weighted lasso): the row rides in VMEM as a broadcast
    threshold — the elementwise prox costs the same either way.
    """
    N, D = x.shape
    K = weight.shape[1]
    w_bytes = (4 if kernel_precision == "f32" else 2) * D * K
    block_n = _pick_block_n(N, D, K, w_bytes, block_n)
    grid = (N // block_n,)

    a_arr = jnp.asarray(alpha, jnp.float32)
    has_row = a_arr.ndim > 0
    lr_f = jnp.asarray(lr, jnp.float32)
    scal = jnp.stack([
        lr_f,
        (jnp.asarray(0.0, jnp.float32) if has_row else a_arr) * lr_f,
        jnp.asarray(mom, jnp.float32),
        1.0 / (1.0 + jnp.asarray(l2, jnp.float32) * lr_f),
    ]).reshape(1, 4)

    smem = lambda: pl.BlockSpec((1, 4), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
    tile_d = lambda: pl.BlockSpec((block_n, D), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    tile_k = lambda: pl.BlockSpec((block_n, K), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    full_w = lambda: pl.BlockSpec((D, K), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)

    if kernel_precision == "f32":
        w_hi, w_lo = _split_bf16_xla(weight)
        kernel = functools.partial(_fista_kernel_f32, emulate=interpret,
                                   nonneg=nonneg, has_row=has_row)
        w_args = (w_hi, w_lo)
        w_specs = [full_w(), full_w()]
    elif kernel_precision == "bf16":
        kernel = functools.partial(_fista_kernel_bf16, emulate=interpret,
                                   nonneg=nonneg, has_row=has_row)
        # compiled: store the resident dictionary bf16 (half the VMEM,
        # numerically identical — the DEFAULT-precision dot truncates
        # it anyway); interpret keeps f32 + reduce_precision emulation
        w_args = (weight if interpret else weight.astype(jnp.bfloat16),)
        w_specs = [full_w()]
    else:
        raise ValueError(f"kernel_precision must be 'f32' or 'bf16', got "
                         f"{kernel_precision!r}")

    if has_row:
        w_args = w_args + (a_arr.reshape(1, K)
                           * jnp.asarray(lr, jnp.float32),)
        w_specs = w_specs + [pl.BlockSpec((1, K), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM)]

    z_next, delta = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem(), tile_d(), tile_k(), tile_k()] + w_specs,
        out_specs=[
            tile_k(),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, K), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(12 if kernel_precision == "f32" else 4) * N * K * D,
            bytes_accessed=(3 * N * K + N * D + D * K) * 4,
            transcendentals=0,
        ),
        # v5e has 128 MiB of VMEM; the default 16 MiB scoped limit forces
        # tiny batch tiles. 64 MiB comfortably fits block_n=256 tiles
        # (double-buffered) plus the resident dictionary split.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(scal, x, z, z_prev, *w_args)

    return z_next, delta[0, 0]


def _make_multistep_kernel(steps, split_float, restart=False,
                           emulate=False, nonneg=False, has_row=False):
    """Build an S-step fused FISTA kernel body.

    FISTA is row-parallel over the batch: z_next for a tile depends only on
    the same tile's rows of (z, z_prev, x) plus the resident dictionary, so
    any number of consecutive iterations can run per tile without leaving
    VMEM. Per-iteration HBM traffic drops from 3NK+ND to (4NK+ND)/S —
    measured 2.6x end-to-end at S=16 (bf16) on v5e vs the single-step
    kernel, which sits at the same ms/iter as a bare 2-matmul XLA chain.

    ``restart=True`` adds PER-ROW adaptive momentum restart (O'Donoghue &
    Candes 2015): the FISTA t-sequence is carried per row ([bn, 1] in
    VMEM), and a row whose gradient-mapping test
    ``<y - z_new, z_new - z> > 0`` fires resets its own t to 1 (zero
    momentum for its next step). FISTA is row-separable, so per-row
    restart is exact — and the test is one VPU multiply-reduce per
    sub-step over data already resident in VMEM, i.e. free next to the
    matmuls. This is the algorithmic lever that cuts iterations-to-gap:
    plain FISTA's momentum overshoots and oscillates near the optimum.
    """
    def kernel(scal_ref, x_ref, z_ref, zp_ref, *refs):
        # operand order: w refs, [thresh row], [t_in]; then outputs
        refs = list(refs)
        if split_float:
            w_hi, w_lo = refs.pop(0)[:], refs.pop(0)[:]
        else:
            w = refs.pop(0)[:]
        trow = refs.pop(0)[:] if has_row else None  # [1, K], already * lr
        if restart:
            t = refs.pop(0)[:]                          # [bn, 1]
            z_out_ref, zp_out_ref, t_out_ref, delta_ref = refs
        else:
            z_out_ref, zp_out_ref, delta_ref = refs
        z = z_ref[:]
        zp = zp_ref[:]
        x = x_ref[:]
        for s in range(steps):
            if restart:
                # carry convention: t entering iteration k is t_{k-1}
                # (init 0 so the first momentum coefficient is exactly 0
                # while z == z_prev)
                t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) * 0.5
                y = z + ((t - 1.0) / t_next) * (z - zp)
            else:
                y = z + scal_ref[s, 2] * (z - zp)
            if split_float:
                y_hi, y_lo = _split_bf16(y, emulate)
                resid = (_dot_nt(y_hi, w_hi) + _dot_nt(y_hi, w_lo)
                         + _dot_nt(y_lo, w_hi)) - x
                r_hi, r_lo = _split_bf16(resid, emulate)
                grad = (_dot_nn(r_hi, w_hi) + _dot_nn(r_hi, w_lo)
                        + _dot_nn(r_lo, w_hi))
            elif emulate:  # interpret only: Mosaic bf16 dot semantics
                # (w arrives f32 here; reduce_precision cannot be elided)
                resid = _dot_nt(_round_bf16(y), _round_bf16(w)) - x
                grad = _dot_nn(_round_bf16(resid), _round_bf16(w))
            else:
                # compiled bf16 mode: w arrives as a real bf16 array
                # (halves its VMEM residency); casting the activations
                # explicitly matches what Mosaic's DEFAULT dot precision
                # would do to f32 operands anyway
                resid = _dot_nt(y.astype(w.dtype), w) - x
                grad = _dot_nn(resid.astype(w.dtype), w)
            prox = soft_threshold_nonneg if nonneg else soft_threshold
            # scal[s, 3] = 1/(1 + l2*lr): elastic-net prox contraction
            z_new = prox(y - scal_ref[s, 0] * grad,
                         trow if has_row else scal_ref[s, 1]) \
                * scal_ref[s, 3]
            if restart:
                rdot = jnp.sum((y - z_new) * (z_new - z), axis=1,
                               keepdims=True)
                t = jnp.where(rdot > 0, 1.0, t_next)
            zp = z
            z = z_new
        z_out_ref[:] = z
        zp_out_ref[:] = zp
        if restart:
            t_out_ref[:] = t

        # convergence statistic of the LAST sub-step, accumulated across
        # the sequential grid
        @pl.when(pl.program_id(0) == 0)
        def _():
            delta_ref[0, 0] = 0.0

        delta_ref[0, 0] += jnp.sum(jnp.abs(z - zp))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("steps", "block_n", "interpret",
                                    "kernel_precision", "nonneg"))
def fused_fista_multistep(x, z, z_prev, weight, lrs, threshs, moms, steps,
                          block_n=512, interpret=False,
                          kernel_precision="f32", t_vec=None, nonneg=False,
                          l2=0.0):
    """``steps`` fused FISTA iterations in ONE kernel invocation.

    ``lrs``/``threshs``/``moms`` are length-``steps`` vectors giving the
    per-sub-step learning rate, shrink threshold (alpha*lr), and momentum
    coefficient (the same lagged-one convention as the single-step kernel).

    Returns ``(z_final, z_penultimate, delta)`` where ``z_penultimate`` is
    the sub-step ``steps-1`` iterate (the next carry's z_prev) and ``delta
    = sum|z_final - z_penultimate|`` — the convergence statistic of the
    last sub-step. The S sub-steps perform exactly the same arithmetic as
    S single-step kernel calls; only the HBM round trips between them are
    removed.

    ``t_vec`` ([N, 1] float32, carry convention t_{k-1} with init 0)
    switches the kernel to PER-ROW adaptive-restart momentum: ``moms`` is
    ignored, the t-sequence is advanced in-kernel per row, and rows whose
    gradient-mapping restart test fires reset their momentum. The return
    becomes ``(z_final, z_penultimate, t_out, delta)``.

    ``threshs`` may instead be a [1, K] per-feature threshold row
    (weighted lasso, already multiplied by the constant lr): it rides in
    VMEM and is shared by every sub-step.
    """
    N, D = x.shape
    K = weight.shape[1]
    restart = t_vec is not None
    w_bytes = (4 if kernel_precision == "f32" else 2) * D * K
    block_n = _pick_block_n(N, D, K, w_bytes, block_n)
    grid = (N // block_n,)

    th_arr = jnp.asarray(threshs, jnp.float32)
    has_row = th_arr.ndim == 2
    lrs_f = jnp.broadcast_to(jnp.asarray(lrs, jnp.float32), (steps,))
    scal = jnp.stack([
        lrs_f,
        (jnp.zeros((steps,), jnp.float32) if has_row
         else jnp.broadcast_to(th_arr, (steps,))),
        jnp.broadcast_to(jnp.asarray(moms, jnp.float32), (steps,)),
        1.0 / (1.0 + jnp.asarray(l2, jnp.float32) * lrs_f),
    ], axis=1)  # [S, 4]

    smem_in = pl.BlockSpec((steps, 4), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    tile_d = pl.BlockSpec((block_n, D), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    tile_k = lambda: pl.BlockSpec((block_n, K), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    tile_1 = lambda: pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    full_w = lambda: pl.BlockSpec((D, K), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)

    if kernel_precision == "f32":
        w_hi, w_lo = _split_bf16_xla(weight)
        w_args = (w_hi, w_lo)
        w_specs = [full_w(), full_w()]
        flops_per_step = 12 * N * K * D
    elif kernel_precision == "bf16":
        # compiled: resident dictionary stored bf16 (see fused_fista_step)
        w_args = (weight if interpret else weight.astype(jnp.bfloat16),)
        w_specs = [full_w()]
        flops_per_step = 4 * N * K * D
    else:
        raise ValueError(f"kernel_precision must be 'f32' or 'bf16', got "
                         f"{kernel_precision!r}")

    kernel = _make_multistep_kernel(steps, kernel_precision == "f32",
                                    restart=restart, emulate=interpret,
                                    nonneg=nonneg, has_row=has_row)

    in_specs = [smem_in, tile_d, tile_k(), tile_k()] + w_specs
    in_args = [scal, x, z, z_prev, *w_args]
    if has_row:
        in_specs.append(pl.BlockSpec((1, K), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_args.append(th_arr)
    out_specs = [tile_k(), tile_k()]
    out_shape = [jax.ShapeDtypeStruct((N, K), jnp.float32),
                 jax.ShapeDtypeStruct((N, K), jnp.float32)]
    if restart:
        in_specs.append(tile_1())
        in_args.append(t_vec)
        out_specs.append(tile_1())
        out_shape.append(jax.ShapeDtypeStruct((N, 1), jnp.float32))
    out_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM))
    out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=steps * flops_per_step,
            bytes_accessed=(4 * N * K + N * D + D * K) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*in_args)

    if restart:
        z_next, z_pen, t_out, delta = outs
        return z_next, z_pen, t_out, delta[0, 0]
    z_next, z_pen, delta = outs
    return z_next, z_pen, delta[0, 0]


def fista_step_reference(x, z, z_prev, weight, lr, alpha, mom,
                         precision=None, l2=0.0):
    """jnp twin of the fused kernel (used as fallback and in tests)."""
    from lasso_tpu.config import get_precision
    prec = get_precision(precision)
    y = z + mom * (z - z_prev)
    resid = jnp.matmul(y, weight.T, precision=prec) - x
    grad = jnp.matmul(resid, weight, precision=prec)
    z_next = soft_threshold(y - lr * grad, alpha * lr) / (1.0 + l2 * lr)
    return z_next, jnp.sum(jnp.abs(z_next - z))
