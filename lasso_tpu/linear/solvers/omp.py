"""Batched Orthogonal Matching Pursuit (TPU extension).

The reference library has no greedy L0 solver; OMP is the standard
companion to the lasso for sparse coding (sklearn's
``orthogonal_mp`` / ``SparseCoder(transform_algorithm='omp')``), so the
framework ships one. The design is TPU-first rather than a port of the
sklearn Cholesky-update recursion:

* a STATIC iteration count (``n_nonzero_coefs``) — every shape is fixed,
  the whole solve jits into one ``lax.while_loop``;
* residual correlations are two dense MXU matmuls per iteration
  (``r = x - z W^T``, ``c = r W``) — the same cost as one FISTA step, so
  one OMP solve ~ ``n_nonzero_coefs`` FISTA iterations;
* per-sample atom selection is a masked argmax; the support lives as a
  [N, T] index matrix plus validity mask (no dynamic shapes);
* instead of per-sample incremental Cholesky updates, each iteration
  re-solves the support normal equations ``G_SS z_S = b_S`` exactly with
  the batched lane-parallel Cholesky (``linalg.batch_cholesky_solve``,
  [N, T, T] with identity padding on unused slots) — T is small
  (<= a few hundred), so the solve is negligible next to the matmuls
  and the result is the exact LS fit on the support every iteration.

Per-sample ``tol`` stopping (on the squared residual norm, sklearn
semantics) freezes finished samples exactly: their support stops
growing, and the padded re-solve reproduces their solution unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from lasso_tpu.config import get_precision
from lasso_tpu.linalg.basic import batch_cholesky_solve


def orthogonal_matching_pursuit(x, weight, n_nonzero_coefs=None, tol=None,
                                precision=None, gram_jitter=0.0,
                                use_pallas="auto", verbose=False,
                                return_iters=False):
    """Batched OMP: ``min_z ||z W^T - x||^2  s.t. ||z||_0 <= T`` (greedy).

    x: [N, D], weight W: [D, K] -> codes z: [N, K].

    ``n_nonzero_coefs``: support budget T (static; default
    ``max(1, K // 10)`` capped at D, sklearn's default heuristic).
    ``tol``: optional per-sample stop on the squared residual norm
    ``||x_i - z_i W^T||^2 <= tol`` (sklearn ``orthogonal_mp(tol=...)``
    semantics); a stopped sample's support is frozen exactly.
    ``gram_jitter``: optional diagonal jitter for the support Gram solve
    (0 by default; raise for nearly-collinear dictionaries).
    ``use_pallas`` routes the [N, T, T] support solve through the
    lane-parallel Pallas Cholesky when supported.

    Atom selection normalizes correlations by column norms (exact greedy
    residual-decrease criterion; a no-op for unit-norm dictionaries).

    Returns ``z`` ([N, K]; exactly the LS fit on the selected support),
    plus the executed iteration count when ``return_iters``.
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

    G = jnp.matmul(weight.T, weight, precision=prec)        # [K, K]
    b = jnp.matmul(x, weight, precision=prec)               # [N, K]
    col_norm = jnp.sqrt(jnp.clip(jnp.diagonal(G), 1e-30))   # [K]
    rows = jnp.arange(N)
    eyeT = jnp.eye(T, dtype=x.dtype)

    tol_v = None if tol is None else jnp.asarray(tol, x.dtype)

    def scatter_codes(idx, z_s):
        # unused slots carry z_s = 0, so duplicate index-0 adds nothing
        return jnp.zeros((N, K), x.dtype).at[rows[:, None], idx].add(z_s)

    def cond(state):
        _, _, _, _, active, k = state
        return jnp.logical_and(jnp.any(active), k < T)

    def body(state):
        idx, valid, z_s, sel, active, k = state
        z_dense = scatter_codes(idx, z_s)
        r = x - jnp.matmul(z_dense, weight.T, precision=prec)  # [N, D]
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

        onehot = jax.nn.one_hot(k_star, K, dtype=bool)
        sel = jnp.logical_or(sel, jnp.logical_and(onehot,
                                                  active[:, None]))
        idx = idx.at[:, k].set(jnp.where(active, k_star, 0))
        valid = valid.at[:, k].set(active)

        # support normal equations with identity padding on unused slots
        G_ss = G[idx[:, :, None], idx[:, None, :]]             # [N, T, T]
        v2 = jnp.logical_and(valid[:, :, None], valid[:, None, :])
        G_ss = jnp.where(v2, G_ss, eyeT)
        if gram_jitter:
            G_ss = G_ss + gram_jitter * eyeT
        b_s = jnp.where(valid, jnp.take_along_axis(b, idx, axis=1), 0.0)
        z_s = batch_cholesky_solve(b_s, G_ss, use_pallas=use_pallas)
        z_s = jnp.where(valid, z_s, 0.0)
        return (idx, valid, z_s, sel, active, k + 1)

    init = (jnp.zeros((N, T), jnp.int32),
            jnp.zeros((N, T), bool),
            jnp.zeros((N, T), x.dtype),
            jnp.zeros((N, K), bool),
            jnp.ones((N,), bool),
            jnp.asarray(0))
    idx, valid, z_s, _, _, k = lax.while_loop(cond, body, init)
    z = scatter_codes(idx, z_s)
    if return_iters:
        return z, k
    return z
