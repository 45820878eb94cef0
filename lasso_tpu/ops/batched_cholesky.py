"""Pallas kernel: lane-parallel batched Cholesky solve for small matrices.

XLA's batched ``cholesky`` + ``triangular_solve`` on TPU runs at ~0.02
TFLOP/s for [1024, 128, 128] problems (~39 ms measured on v5e) because the
per-matrix factorization does not vectorize. This kernel lays the BATCH
out on the 128-lane axis instead: tiles are ``[D, D, lanes]`` so every
step of the column-Cholesky recurrence is a dense [D, D]- or [D]-shaped
vector op applied to 128 samples at once. All indexing is done with
iota-mask selects (no data-dependent slicing), so the factorization,
forward- and back-substitution are three ``lax.fori_loop``s of pure VPU
work. Measured ~20x over the XLA path at [1024, 128, 128].

Used by :func:`lasso_tpu.linalg.basic.batch_cholesky_solve` on TPU for
aligned sizes — which backs the interior-point Newton-KKT step
(reference interior_point.py:173) and the per-sample BFGS solves.
Non-PD inputs yield NaNs exactly like ``jnp.linalg.cholesky``, so the
caller's finite-check + LU fallback semantics are unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(D):
    def kernel(a_ref, b_ref, x_ref):
        A = a_ref[:]                               # [D, D, bl]
        r = b_ref[:]                               # [D, bl]
        bl = r.shape[1]
        rows3 = lax.broadcasted_iota(jnp.int32, (D, 1, 1), 0)
        cols3 = lax.broadcasted_iota(jnp.int32, (1, D, 1), 1)
        rows2 = lax.broadcasted_iota(jnp.int32, (D, 1), 0)

        # --- column-Cholesky: L accumulated column by column ---
        def chol_body(j, carry):
            A, L = carry
            selcol = (cols3 == j).astype(A.dtype)          # [1, D, 1]
            c = jnp.sum(A * selcol, axis=1, keepdims=True)  # [D, 1, bl]
            selrow = (rows3 == j).astype(A.dtype)          # [D, 1, 1]
            diag = jnp.sum(c * selrow, axis=0, keepdims=True)  # [1,1,bl]
            inv = lax.rsqrt(diag)
            c = c * inv                                    # scaled column
            # keep rows >= j (the lower-triangular part incl. diagonal)
            c = jnp.where(rows3 >= j, c, 0.0)
            L = L + c * selcol                             # write col j
            # trailing symmetric rank-1 update on rows, cols > j
            c_strict = jnp.where(rows3 > j, c, 0.0)        # [D, 1, bl]
            ct = jnp.swapaxes(c_strict, 0, 1)              # [1, D, bl]
            A = A - c_strict * ct
            return (A, L)

        _, L = lax.fori_loop(0, D, chol_body,
                             (A, jnp.zeros_like(A)))

        # --- forward substitution  L y = r ---
        def fwd_body(j, y):
            selrow3 = (rows3 == j).astype(L.dtype)
            Lrow = jnp.sum(L * selrow3, axis=0)            # [D, bl] row j
            prev = (rows2 < j).astype(L.dtype)
            acc = jnp.sum(Lrow * prev * y, axis=0, keepdims=True)  # [1,bl]
            diag = jnp.sum(Lrow * (rows2 == j).astype(L.dtype),
                           axis=0, keepdims=True)          # [1, bl]
            rj = jnp.sum(r * (rows2 == j).astype(L.dtype),
                         axis=0, keepdims=True)
            yj = (rj - acc) / diag
            return y + (rows2 == j).astype(L.dtype) * yj

        y = lax.fori_loop(0, D, fwd_body, jnp.zeros_like(r))

        # --- back substitution  L^T x = y ---
        def bwd_body(i, x):
            j = D - 1 - i
            selcol3 = (cols3 == j).astype(L.dtype)
            Lcol = jnp.sum(L * selcol3, axis=1)            # [D, bl] col j
            below = (rows2 > j).astype(L.dtype)
            acc = jnp.sum(Lcol * below * x, axis=0, keepdims=True)
            diag = jnp.sum(Lcol * (rows2 == j).astype(L.dtype),
                           axis=0, keepdims=True)
            yj = jnp.sum(y * (rows2 == j).astype(L.dtype),
                         axis=0, keepdims=True)
            xj = (yj - acc) / diag
            return x + (rows2 == j).astype(L.dtype) * xj

        x = lax.fori_loop(0, D, bwd_body, jnp.zeros_like(r))
        x_ref[:] = x

    return kernel


def _make_kernel_blocked(D, p):
    """Blocked (rank-p) lane-parallel Cholesky solve.

    v2 of the kernel: the matrix lives in a VMEM scratch ref in
    column-major-on-sublanes layout [col, row, lanes] (A is symmetric, so
    the input transpose is layout-free), columns are fetched with DYNAMIC
    sublane loads instead of masked full-matrix reductions, and the
    trailing update applies once per p-column panel instead of per
    column — full-matrix VMEM traffic drops from ~5D passes to ~2D/p
    passes. Substitutions run column-oriented (rhs updated by each
    resolved component), touching one column per step.
    """
    nb = D // p

    def kernel(a_ref, b_ref, x_ref, s_ref):
        s_ref[:] = a_ref[:]
        rows2 = lax.broadcasted_iota(jnp.int32, (D, 1), 0)
        colax = lax.broadcasted_iota(jnp.int32, (D, 1, 1), 0)

        def block_body(ib, _):
            jb = ib * p
            panel = s_ref[pl.ds(jb, p), :, :]             # [p, D, bl]
            cols = [panel[t] for t in range(p)]           # p x [D, bl]
            for t in range(p):
                j = jb + t
                sel = (rows2 == j).astype(jnp.float32)
                diag = jnp.sum(cols[t] * sel, axis=0, keepdims=True)
                inv = lax.rsqrt(diag)
                c = jnp.where(rows2 >= j, cols[t] * inv, 0.0)
                cols[t] = c
                for t2 in range(t + 1, p):
                    sel2 = (rows2 == jb + t2).astype(jnp.float32)
                    coef = jnp.sum(c * sel2, axis=0, keepdims=True)
                    cols[t2] = cols[t2] - coef * c
            s_ref[pl.ds(jb, p), :, :] = jnp.stack(cols)
            # rank-p trailing update on columns >= jb + p
            upd = cols[0][:, None, :] * cols[0][None, :, :]
            for t in range(1, p):
                upd = upd + cols[t][:, None, :] * cols[t][None, :, :]
            A = s_ref[:]
            s_ref[:] = jnp.where(colax >= jb + p, A - upd, A)
            return 0

        lax.fori_loop(0, nb, block_body, 0)

        # forward substitution L y = r: panels of p columns per loop
        # step, the p column-substitutions unrolled (loop-step overhead
        # dominates D sequential tiny-op iterations otherwise)
        def fwd(ib, carry):
            r, y = carry
            jb = ib * p
            panel = s_ref[pl.ds(jb, p), :, :]             # [p, D, bl]
            for t in range(p):
                j = jb + t
                col = panel[t]
                sel = (rows2 == j).astype(jnp.float32)
                diag = jnp.sum(col * sel, axis=0, keepdims=True)
                yj = jnp.sum(r * sel, axis=0, keepdims=True) / diag
                r = r - yj * jnp.where(rows2 > j, col, 0.0)
                y = y + sel * yj
            return (r, y)

        _, y = lax.fori_loop(0, nb, fwd,
                             (b_ref[:], jnp.zeros_like(b_ref[:])))

        # back substitution L^T x = y, reverse panels, column access only
        def bwd(ib2, x):
            jb = (nb - 1 - ib2) * p
            panel = s_ref[pl.ds(jb, p), :, :]
            for t in range(p - 1, -1, -1):
                i = jb + t
                col = panel[t]
                sel = (rows2 == i).astype(jnp.float32)
                diag = jnp.sum(col * sel, axis=0, keepdims=True)
                acc = jnp.sum(col * x * (rows2 > i).astype(jnp.float32),
                              axis=0, keepdims=True)
                yi = jnp.sum(y * sel, axis=0, keepdims=True)
                x = x + sel * ((yi - acc) / diag)
            return x

        x_ref[:] = lax.fori_loop(0, nb, bwd, jnp.zeros_like(y))

    return kernel


def _make_append_kernel(T):
    """Incremental (append-one-row) lane-parallel Cholesky + solve.

    For greedy solvers that GROW a PD system one row/column per step
    (OMP's support normal equations), re-factorizing the [B, T, T] system
    every iteration is O(T^3/3) per step; appending a row to a carried
    factor is O(T^2). Crucially for the VPU, the carried state is the
    INVERSE factor ``V = L^{-1}`` (lower triangular, identity beyond the
    appended block), so neither the append nor the solve contains a
    sequential substitution chain — a first cut that carried L and ran
    row-oriented substitutions was latency-bound at ~40 ms/iter for
    [16384, 64, 64] (3 x T dependent row-steps x 128 serialized grid
    blocks); with V everything is four independent dense [T, T, bl]
    multiply-reduce contractions (~1 ms):

      given V, the new symmetric row g = G[k, :] and rhs b:
        y    = V g[:k]                      (L y = g forward solve)
        u    = y^T V
        lkk  = sqrt(g[k] - y.y)
        V[k] <- [-u / lkk, 1/lkk, 0...]     (block inverse of [[L,0],[y',lkk]])
        z    = V^T (V b)                    ((L L^T)^{-1} b)

    Layout is ROW-major-on-sublanes: ``v_ref[i]`` = row i as a [T, bl]
    tile (cols on sublanes, batch on lanes); the append is one
    dynamic-sublane store. Rows beyond the block stay identity, so
    zero-padded rhs slots solve to exactly zero (frozen/unused samples
    are exact no-ops without masking).

    A non-PD append (g[k] <= y.y, i.e. the new row is linearly dependent
    on the block — e.g. an exactly duplicated atom at a distinct index,
    which OMP's masked argmax CAN select on degenerate dictionaries) is
    guarded by a RELATIVE pivot floor ``max(g[k] - y.y, 1e-6 g[k])``:
    implicit jitter that leaves healthy pivots bit-unchanged and turns a
    would-be NaN into a bounded perturbation confined to the dependent
    direction (the system is consistent there, so the fitted residual is
    preserved; only the split of weight across the dependent atoms
    moves).
    Solving through the explicit inverse is not backward stable like a
    substitution, but the error stays O(cond(L) * eps) — equal to the
    refactorizing path's in practice for OMP's well-conditioned greedy
    supports (equivalence asserted in tests/test_omp.py).
    """

    def kernel(k_ref, v_ref, g_ref, b_ref, vout_ref, z_ref):
        k = k_ref[0, 0]
        # all intermediates stay 3D with keepdims reductions — mixing an
        # axis-reduced 2D value back into elementwise ops trips a Mosaic
        # relayout error ("non-singleton dimension replicated in
        # destination but not in source")
        cols3 = lax.broadcasted_iota(jnp.int32, (1, T, 1), 1)
        vout_ref[:] = v_ref[:]
        V = vout_ref[:]                                     # [T, T, bl]
        bl = V.shape[2]
        g3 = g_ref[:].reshape(1, T, bl)

        # --- append row k of V ---
        gm3 = jnp.where(cols3 < k, g3, 0.0)
        y3 = jnp.sum(V * gm3, axis=1, keepdims=True)        # V g  [T,1,bl]
        u3 = jnp.sum(V * y3, axis=0, keepdims=True)         # y'V  [1,T,bl]
        gkk = jnp.sum(jnp.where(cols3 == k, g3, 0.0), axis=1,
                      keepdims=True)                        # [1, 1, bl]
        yy = jnp.sum(y3 * y3, axis=0, keepdims=True)        # [1, 1, bl]
        # relative pivot floor (implicit jitter): a linearly-dependent
        # append (duplicated atom) would give pivot <= 0 -> NaN; the
        # floor keeps healthy pivots bit-identical and degrades the
        # degenerate case to a bounded null-space-only perturbation
        pivot = jnp.maximum(gkk - yy, 1e-6 * gkk + 1e-30)
        inv_lkk = lax.rsqrt(pivot)
        new_row = (jnp.where(cols3 < k, -u3, 0.0)
                   + jnp.where(cols3 == k, 1.0, 0.0)) * inv_lkk
        vout_ref[pl.ds(k, 1), :, :] = new_row

        # --- solve (L L^T) z = b with the updated inverse ---
        V = vout_ref[:]
        b3 = b_ref[:].reshape(1, T, bl)
        t3 = jnp.sum(V * b3, axis=1, keepdims=True)         # V b
        z3 = jnp.sum(V * t3, axis=0, keepdims=True)         # V' (V b)
        z_ref[:] = z3.reshape(T, bl)

    return kernel


def supports_lanes_append(T, B, dtype):
    """Size gate for the append kernel: f32, panel-aligned T, and a
    [T, T, lanes] tile (x2 for the aliased in/out) within VMEM."""
    return (dtype == jnp.float32 and T % 8 == 0 and B >= 1
            and T * T * 128 * 4 * 2 <= 96 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("interpret", "block_b"))
def cholesky_append_solve_lanes(L, g_row, b, k, interpret=False,
                                block_b=None):
    """Append row ``k`` to each carried inverse factor and solve.

    L: [T, T, B] — the carried INVERSE Cholesky factor ``V = L^{-1}``
    (row-major-on-sublanes: ``V[i]`` = row i as [T, B]; initialize to
    identity), g_row: [T, B] (new symmetric row of the Gram, entries
    >= k ignored except ``g_row[k]`` = the new diagonal), b: [T, B],
    k: scalar int32. Returns ``(V_new, z)`` with z: [T, B]. Caller pads
    B to a multiple of the lane block (or B <= block) and T to a
    multiple of 8.
    """
    T, _, B = L.shape
    bl = min(128 if block_b is None else block_b, B)
    assert B % bl == 0, (B, bl)
    grid = (B // bl,)
    kernel = _make_append_kernel(T)
    k_arr = jnp.asarray(k, jnp.int32).reshape(1, 1)

    L_new, z = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, T, bl), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, bl), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, bl), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((T, T, bl), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, bl), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((T, T, B), jnp.float32),
                   jax.ShapeDtypeStruct((T, B), jnp.float32)],
        input_output_aliases={1: 0},
        cost_estimate=pl.CostEstimate(
            flops=9 * B * T * T,
            bytes_accessed=(3 * B * T * T + 4 * B * T) * 4,
            transcendentals=B,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(k_arr, L, g_row, b)
    return L_new, z


def supports_lanes_cholesky(b, A):
    """Size gate: D small enough for a [D, D, 128]-lane-tile to sit in
    VMEM, f32. Any batch size works (padded to a lane multiple)."""
    B, D = b.shape
    return (A.dtype == jnp.float32 and D <= 256 and B >= 1
            and D * D * 128 * 4 * 2 <= 96 * 1024 * 1024)


@functools.partial(jax.jit, static_argnames=("interpret",))
def batch_cholesky_solve_lanes(b, A, interpret=False):
    """Solve PD systems ``A_k x_k = b_k`` with the batch on lanes.

    b: [B, D], A: [B, D, D] -> x: [B, D]. NaNs out on non-PD input.
    """
    B_in, D = b.shape
    # Mosaic requires the lane (last) block dim to be a multiple of 128 or
    # equal to the full array dim: batches over 128 get padded with
    # identity systems to the next multiple, smaller ones run whole.
    if B_in > 128 and B_in % 128 != 0:
        B = (B_in + 127) // 128 * 128
        pad = B - B_in
        A = jnp.concatenate(
            [A, jnp.broadcast_to(jnp.eye(D, dtype=A.dtype),
                                 (pad, D, D))], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, D), b.dtype)], axis=0)
    else:
        B = B_in
    bl = min(128, B)
    grid = (B // bl,)

    # [col, row, lanes]; A is symmetric (PD), so the (1, 2, 0) transpose
    # is simultaneously the row- and column-major layout
    At = jnp.transpose(A, (1, 2, 0))      # [D, D, B]
    bt = b.T                              # [D, B]

    if D % 8 == 0:
        kernel = _make_kernel_blocked(D, p=8)
        scratch = [pltpu.VMEM((D, D, bl), jnp.float32)]
    else:
        kernel = _make_kernel(D)
        scratch = []

    x_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((D, D, bl), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, bl), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, bl), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, B), jnp.float32),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * D * D * D,
            bytes_accessed=(B * D * D + 3 * B * D) * 4,
            transcendentals=B * D,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(At, bt)

    return x_t.T[:B_in]
