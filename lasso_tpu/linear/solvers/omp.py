"""Batched Orthogonal Matching Pursuit (TPU extension).

The reference library has no greedy L0 solver; OMP is the standard
companion to the lasso for sparse coding (sklearn's
``orthogonal_mp`` / ``SparseCoder(transform_algorithm='omp')``), so the
framework ships one. The design is TPU-first rather than a port of the
sklearn Cholesky-update recursion:

* a STATIC iteration count (``n_nonzero_coefs``) — every shape is fixed,
  the whole solve jits into one ``lax.while_loop``;
* per-sample atom selection is a masked argmax on ``c = r W``; the
  support lives as a [N, T] index matrix plus validity mask (no dynamic
  shapes);
* the loop is GATHER-FREE: the selected atoms are carried densely as
  ``W_S`` [N, T, D] (one dynamic_update_slice per iteration), so the
  residual is ``r = x - einsum(z_s, W_S)``, the new Gram row is
  ``einsum(W_S, w_sel)`` and the new rhs entry is a masked row-sum of
  ``x W`` — all dense contractions. Every indexed alternative lowers
  catastrophically on TPU: the naive per-iteration ``G[idx, idx]``
  [N, T, T] gather measured ~1 s/iter at 16384x2048 T=64, and even
  [N, K] -> [N, T] ``take_along_axis`` + the [N, K] code scatter
  measured ~35 of 59 ms/iter. ``w_sel = onehot(k*) W^T`` stays a
  one-hot MXU matmul (exact row gather on the MXU);
* the support normal equations are solved per sample by an INCREMENTAL
  lane-parallel Cholesky: the factor L is carried across iterations and
  each step APPENDS one row (one O(T^2) substitution) instead of
  re-factorizing the [N, T, T] system (O(T^3/3)) — a fused Pallas
  append+solve kernel (:func:`lasso_tpu.ops.batched_cholesky.
  cholesky_append_solve_lanes`). Profiled at 16384x(512->2048), T=64:
  the per-iteration re-factorization was ~45 of the 59 ms/iter (76%);
  the append kernel removes almost all of it. Alternatives:
  ``solver='chol-full'`` re-factorizes each iteration (the off-TPU
  fallback, with batch-global LU rescue on non-PD supports), and
  ``solver='cg'`` runs WARM-STARTED per-row CG in T-space.

Per-sample ``tol`` stopping (on the squared residual norm, sklearn
semantics) freezes finished samples exactly: their support stops
growing, and the frozen rows of the carried system reproduce their
solution unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from lasso_tpu.config import get_precision
from lasso_tpu.linalg.basic import batch_cholesky_solve
from lasso_tpu.linalg.conjgrad import conjgrad_per_row
from lasso_tpu.ops.batched_cholesky import (cholesky_append_solve_lanes,
                                            supports_lanes_append)
from lasso_tpu.ops.common import resolve_pallas
from lasso_tpu.ops.fused_omp import fused_omp_solve, supports_fused_omp


def orthogonal_matching_pursuit(x, weight, n_nonzero_coefs=None, tol=None,
                                precision=None, gram_jitter=0.0,
                                solver="auto", cg_tol=1e-10,
                                use_pallas="auto", ws_fast="auto",
                                kernel_precision="f32",
                                verbose=False, return_iters=False):
    """Batched OMP: ``min_z ||z W^T - x||^2  s.t. ||z||_0 <= T`` (greedy).

    x: [N, D], weight W: [D, K] -> codes z: [N, K].

    ``n_nonzero_coefs``: support budget T (static; default
    ``max(1, K // 10)`` capped at D, sklearn's default heuristic).
    ``tol``: optional per-sample stop on the squared residual norm
    ``||x_i - z_i W^T||^2 <= tol`` (sklearn ``orthogonal_mp(tol=...)``
    semantics); a stopped sample's support is frozen exactly.
    ``gram_jitter``: optional diagonal jitter for the support Gram solve
    (0 by default; raise for nearly-collinear dictionaries).
    ``solver``: 'fused' runs the ENTIRE greedy solve in one Pallas
    invocation per 128-sample tile (QR-OMP via modified Gram-Schmidt,
    :func:`lasso_tpu.ops.fused_omp.fused_omp_solve`) — residual, basis
    and selection state VMEM-resident, zero per-iteration HBM traffic;
    the LS fit is f32-grade (vs the exact-Cholesky paths) and
    ``kernel_precision`` ('f32' split-float default, or 'bf16') sets
    the selection-correlation matmul precision. 'chol' carries the
    Cholesky factor and APPENDS
    one row per iteration (fused Pallas append+solve kernel, O(T^2) per
    step; a degenerate support — e.g. exactly duplicated atoms — hits
    the kernel's relative pivot floor, implicit jitter that preserves
    the fitted residual; raise ``gram_jitter`` for nearly-collinear
    dictionaries); 'chol-full' re-factorizes the carried [N, T, T]
    support system with the batched (lane-parallel Pallas when
    ``use_pallas``) Cholesky each iteration (O(T^3/3) per step, but with
    batch-global LU rescue on non-PD supports); 'cg' uses warm-started
    per-row conjugate gradient (tolerance ``cg_tol`` on the T-space
    residual norm, max T+8 iters — typically a handful thanks to the
    warm start). 'auto' = 'fused' when the whole-solve kernel is
    available (TPU or ``use_pallas=True``; f32, 128-aligned D/K, VMEM
    fit, ``verbose=False``, ``gram_jitter=0``), then 'chol' when the
    append kernel is; otherwise 'chol-full' or 'cg' by the measured
    size crossover. An EXPLICIT ``solver='fused'``/'chol' whose kernel
    is unavailable warns and falls back ('fused' -> 'auto'; 'chol' ->
    the exact 'chol-full' only — never to the ``cg_tol``-inexact CG,
    that size-based remap is 'auto'-only).

    ``ws_fast``: gate for the gather-free W_S-carry loop body ('auto' =
    on under the append solver while the [N, T, D] W_S footprint stays
    under 6 GB; True/False force). The legacy gather body computes the
    same recursion (parity pinned in tests/test_omp.py).

    Atom selection normalizes correlations by column norms (exact greedy
    residual-decrease criterion; a no-op for unit-norm dictionaries).

    Returns ``z`` ([N, K]; the LS fit on the selected support — exact
    under 'chol', ``cg_tol``-tight under 'cg'), plus the executed
    iteration count when ``return_iters``.
    """
    prec = get_precision(precision)
    N, D = x.shape
    K = weight.shape[1]
    if n_nonzero_coefs is None:
        n_nonzero_coefs = max(1, K // 10)
    T = int(n_nonzero_coefs)
    if not 0 < T <= min(D, K):
        raise ValueError(
            f"n_nonzero_coefs must be in [1, min(D, K)] = "
            f"[1, {min(D, K)}], got {T}")
    Tp = -(-T // 8) * 8          # append kernel wants panel-aligned T
    # whole-solve fused kernel (ops/fused_omp.py): residual, Q/R factor
    # and selection mask VMEM-resident for all T iterations — the TPU
    # default. verbose needs per-iteration host prints and an explicit
    # gram_jitter bypasses the kernel's own relative pivot floor, so
    # both route to the while_loop paths.
    # Pad-and-mask onto the fused kernel's 128-aligned (D, K) grid when
    # only alignment blocks it (exactness: zero feature rows leave every
    # correlation/residual unchanged; zero atoms score |c_k| * invn_k =
    # 0 exactly — even in bf16, a zero column's dot is exact — so the
    # masked argmax never selects them and the [:, :K] slice-back is the
    # identical greedy solve).
    if (solver in ("auto", "fused") and not verbose and not gram_jitter
            and not supports_fused_omp(N, D, K, T, x.dtype)):
        Dp, Kp = -(-D // 128) * 128, -(-K // 128) * 128
        if ((Dp, Kp) != (D, K)
                and supports_fused_omp(N, Dp, Kp, T, x.dtype)
                and resolve_pallas(use_pallas, True)[0]):
            out = orthogonal_matching_pursuit(
                jnp.pad(x, ((0, 0), (0, Dp - D))),
                jnp.pad(weight, ((0, Dp - D), (0, Kp - K))),
                n_nonzero_coefs=T, tol=tol, precision=precision,
                solver=solver, cg_tol=cg_tol, use_pallas=use_pallas,
                ws_fast=ws_fast, kernel_precision=kernel_precision,
                return_iters=return_iters)
            if return_iters:
                z_u, it = out
                return z_u[:, :K], it
            return out[:, :K]

    fused_on, fused_interp = resolve_pallas(
        use_pallas, supports_fused_omp(N, D, K, T, x.dtype)
        and not verbose and not gram_jitter)
    if solver == "fused" and not fused_on:
        import warnings
        warnings.warn(
            "solver='fused' requested but the whole-solve kernel is "
            "unavailable here (needs float32, 128-aligned D and K, a "
            "VMEM-sized working set, verbose=False, gram_jitter=0, and "
            "a TPU backend or use_pallas=True); falling back to "
            "solver='auto'.", stacklevel=2)
        solver = "auto"
    if solver == "auto" and fused_on:
        solver = "fused"
    if solver == "fused":
        idx, valid, z_s = fused_omp_solve(
            x, weight, T, tol=tol, interpret=fused_interp,
            kernel_precision=kernel_precision)
        z = jnp.zeros((N, K), x.dtype).at[
            jnp.arange(N)[:, None], idx].add(z_s)
        if return_iters:
            return z, jnp.max(jnp.sum(valid.astype(jnp.int32), axis=1))
        return z
    inc, inc_interpret = resolve_pallas(
        use_pallas, supports_lanes_append(Tp, N, x.dtype))
    if solver == "auto" and not inc:
        # no append kernel here: fall back by the measured crossover —
        # the refactorizing lane-parallel Cholesky stays ahead of
        # warm-started CG through [16384, 64, 64] (3.8 vs 4.3 s/solve);
        # CG takes over when the [N, T, T] factorization truly bites
        solver = "cg" if N * T * T > (1 << 27) else "chol-full"
    elif solver == "chol" and not inc:
        # an EXPLICIT exact-solver request never remaps to inexact CG:
        # warn and take the exact refactorizing path instead
        import warnings
        warnings.warn(
            "solver='chol' requested but the incremental append kernel "
            "is unavailable here (needs float32 and a TPU backend, or "
            "use_pallas=True for the interpreted kernel); falling back "
            "to the exact refactorizing 'chol-full' path.",
            stacklevel=2)
        solver = "chol-full"
    elif solver == "auto":
        solver = "chol"
    if solver not in ("chol", "chol-full", "cg"):
        raise ValueError(f"solver must be 'fused', 'chol', 'chol-full', "
                         f"'cg' or 'auto', got {solver!r}")
    inc = solver == "chol"
    # lane padding for the append kernel (Mosaic: lane block must be a
    # multiple of 128 or the whole axis); padded lanes carry identity
    # appends and zero rhs, solving to exactly zero
    Np = (N + 127) // 128 * 128 if (inc and N > 128 and N % 128) else N

    G = jnp.matmul(weight.T, weight, precision=prec)        # [K, K]
    b = jnp.matmul(x, weight, precision=prec)               # [N, K]
    col_norm = jnp.sqrt(jnp.clip(jnp.diagonal(G), 1e-30))   # [K]
    rows = jnp.arange(N)
    eyeT = jnp.eye(T, dtype=x.dtype)

    tol_v = None if tol is None else jnp.asarray(tol, x.dtype)

    def scatter_codes(idx, z_s):
        # unused slots carry z_s = 0, so duplicate index-0 adds nothing
        return jnp.zeros((N, K), x.dtype).at[rows[:, None], idx].add(z_s)

    # gather-free fast path: carry the selected-atom matrix W_S [N, T, D]
    # so the residual (einsum against z_s), the new Gram row (einsum
    # against w_sel) and the new rhs entry (masked row-sum of b) are all
    # dense contractions. The loop's take_along_axis gathers + the [N, K]
    # scatter measured ~35 of the 59 ms/iter at the 16384x(512->2048)
    # T=64 headline (XLA gather/scatter lower catastrophically on TPU);
    # the contraction replacements are plain HBM bandwidth (~2 GB/iter).
    # Gated on the W_S footprint; beyond it the legacy gather body runs.
    # ws_fast=True/False forces the gate (test hook + large-W_S escape).
    if ws_fast == "auto":
        ws_fast = inc and N * T * D * x.dtype.itemsize <= (6 << 30)
    else:
        ws_fast = bool(ws_fast) and inc

    def select(idx, valid, sel, active, k, r):
        """Shared per-iteration atom selection from the residual."""
        if tol_v is not None or verbose:
            rss = jnp.sum(jnp.square(r), axis=1)               # [N]
        if verbose:
            jax.debug.print("iter {i} - mean rss: {v:.6f}", i=k,
                            v=jnp.mean(rss))
        if tol_v is not None:
            active = jnp.logical_and(active, rss > tol_v)
        c = jnp.matmul(r, weight, precision=prec)              # [N, K]
        score = jnp.where(sel, -1.0, jnp.abs(c) / col_norm)
        k_star = jnp.argmax(score, axis=1)                     # [N]
        onehot_b = jax.nn.one_hot(k_star, K, dtype=bool)
        sel = jnp.logical_or(sel, jnp.logical_and(onehot_b,
                                                  active[:, None]))
        idx = idx.at[:, k].set(jnp.where(active, k_star, 0))
        valid = valid.at[:, k].set(active)
        # W[:, k*] per sample via a one-hot MXU matmul (a dynamic row
        # gather lowers catastrophically)
        onehot_f = jax.nn.one_hot(k_star, K, dtype=x.dtype)
        w_sel = jnp.matmul(onehot_f, weight.T, precision=prec)  # [N, D]
        return idx, valid, sel, active, onehot_f, w_sel

    def append_solve(V, g_k, b_s, active, k):
        """Kernel-layout shim around the Pallas append+solve: frozen
        samples (and padded lanes) append an identity row, which leaves
        their solution exactly unchanged."""
        ek = (jnp.arange(Tp) == k).astype(x.dtype)              # [Tp]
        if T != Tp:
            g_k = jnp.pad(g_k, ((0, 0), (0, Tp - T)))
        if gram_jitter:
            g_k = g_k + gram_jitter * ek
        g_app = jnp.where(active[:, None], g_k, ek)             # [N, Tp]
        gt, bt = g_app.T, b_s.T
        if T != Tp:
            bt = jnp.pad(bt, ((0, Tp - T), (0, 0)))
        if Np != N:
            gt = jnp.concatenate(
                [gt, jnp.broadcast_to(ek[:, None], (Tp, Np - N))], 1)
            bt = jnp.pad(bt, ((0, 0), (0, Np - N)))
        V, z_t = cholesky_append_solve_lanes(
            V, gt, bt, k, interpret=inc_interpret)
        return V, z_t[:T, :N].T

    def cond(state):
        return jnp.logical_and(jnp.any(state[5]), state[6] < T)

    def body_fast(state):
        idx, valid, z_s, V, sel, active, k, W_S, b_s = state
        r = x - jnp.einsum("nt,ntd->nd", z_s, W_S, precision=prec)
        idx, valid, sel, active, onehot_f, w_sel = select(
            idx, valid, sel, active, k, r)
        W_S = lax.dynamic_update_slice(
            W_S, jnp.where(active[:, None], w_sel, 0.0)[:, None, :],
            (0, k, 0))
        # new Gram row (slot k lands |w_sel|^2 since W_S was updated
        # first); inactive/unused slots hold zero atoms -> exact zeros
        g_row = jnp.einsum("ntd,nd->nt", W_S, w_sel, precision=prec)
        b_sk = jnp.sum(onehot_f * b, axis=1)                    # [N]
        b_s = lax.dynamic_update_slice(
            b_s, jnp.where(active, b_sk, 0.0)[:, None], (0, k))
        V, z_new = append_solve(V, g_row, b_s, active, k)
        z_new = jnp.where(valid, z_new, 0.0)
        return (idx, valid, z_new, V, sel, active, k + 1, W_S, b_s)

    def body(state):
        idx, valid, z_s, sys, sel, active, k = state
        z_dense = scatter_codes(idx, z_s)
        r = x - jnp.matmul(z_dense, weight.T, precision=prec)  # [N, D]
        idx, valid, sel, active, _, w_sel = select(
            idx, valid, sel, active, k, r)
        g_full = jnp.matmul(w_sel, weight, precision=prec)      # [N, K]
        g_row = jnp.take_along_axis(g_full, idx, axis=1)        # [N, T]
        b_s = jnp.where(valid, jnp.take_along_axis(b, idx, axis=1), 0.0)
        if inc:
            g_k = jnp.where(valid, g_row, 0.0)                  # [N, T]
            sys, z_new = append_solve(sys, g_k, b_s, active, k)
        else:
            row_k = jnp.where(active[:, None],
                              jnp.where(valid, g_row, 0.0),
                              eyeT[k])
            sys = sys.at[:, k, :].set(row_k)
            sys = sys.at[:, :, k].set(row_k)
            G_sys = sys + gram_jitter * eyeT if gram_jitter else sys
            if solver == "chol-full":
                z_new = batch_cholesky_solve(b_s, G_sys,
                                             use_pallas=use_pallas)
            else:
                Adot = lambda u: jnp.matmul(
                    G_sys, u[:, :, None], precision=prec)[:, :, 0]
                dot = lambda a, c2: jnp.sum(a * c2, axis=1, keepdims=True)
                z_new = conjgrad_per_row(b_s, Adot, dot, maxiter=T + 8,
                                         tol=cg_tol, x0=z_s)
        z_new = jnp.where(valid, z_new, 0.0)
        return (idx, valid, z_new, sys, sel, active, k + 1)

    if inc:
        sys0 = jnp.broadcast_to(
            jnp.eye(Tp, dtype=x.dtype)[:, :, None], (Tp, Tp, Np))
    else:
        sys0 = jnp.broadcast_to(eyeT, (N, T, T))
    init = (jnp.zeros((N, T), jnp.int32),
            jnp.zeros((N, T), bool),
            jnp.zeros((N, T), x.dtype),
            sys0,
            jnp.zeros((N, K), bool),
            jnp.ones((N,), bool),
            jnp.asarray(0))
    if ws_fast:
        init = init + (jnp.zeros((N, T, D), x.dtype),
                       jnp.zeros((N, T), x.dtype))
        out = lax.while_loop(cond, body_fast, init)
    else:
        out = lax.while_loop(cond, body, init)
    idx, _, z_s, _, _, _, k = out[:7]
    z = scatter_codes(idx, z_s)
    if return_iters:
        return z, k
    return z
