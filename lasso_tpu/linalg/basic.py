"""Dense linear-algebra helpers (TPU-native layer L1).

Functional equivalents of the reference's shared helpers
(/root/reference/lasso/linear/utils.py:5-58): QR-based least squares /
least norm, Cholesky ridge regression, and a batched PSD solve with a
general-solve fallback. All run fully on device under jit; the reference's
host-side ``info != 0`` checks become in-graph ``lax.cond`` branches keyed on
finiteness of the Cholesky factor (JAX signals factorization failure with
NaNs instead of an info flag).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from lasso_tpu.config import get_precision


def qr(A):
    """Reduced QR factorization (reference: utils.py:5-10)."""
    return jnp.linalg.qr(A, mode="reduced")


def lstsq(b, A, precision=None):
    """Solve ``A x = b`` by QR.

    Mirrors reference utils.py:13-25: for wide ``A`` (m < n) returns the
    least-norm solution via QR of ``A^T``; otherwise the least-squares
    solution via QR of ``A``.

    b: [..., m, k], A: [..., m, n] -> x: [..., n, k]
    """
    prec = get_precision(precision)
    m, n = A.shape[-2:]
    if m < n:
        Q, R = qr(jnp.swapaxes(A, -1, -2))
        d = solve_triangular(jnp.swapaxes(R, -1, -2), b, lower=True)
        x = jnp.matmul(Q, d, precision=prec)
    else:
        Q, R = qr(A)
        d = jnp.matmul(jnp.swapaxes(Q, -1, -2), b, precision=prec)
        x = solve_triangular(R, d, lower=False)
    return x


def ridge(b, A, alpha=1e-4, precision=None):
    """Ridge regression ``(A^T A + alpha I) x = A^T b`` via Cholesky.

    Reference: utils.py:28-40. The reference raises when the Gram matrix is
    not PD; here a failed factorization yields NaNs (detectable by the
    caller) — raising is impossible inside a traced program.
    """
    prec = get_precision(precision)
    At = jnp.swapaxes(A, -1, -2)
    rhs = jnp.matmul(At, b, precision=prec)
    M = jnp.matmul(At, A, precision=prec)
    M = M + alpha * jnp.eye(M.shape[-1], dtype=M.dtype)
    L = jnp.linalg.cholesky(M)
    y = solve_triangular(L, rhs, lower=True)
    x = solve_triangular(jnp.swapaxes(L, -1, -2), y, lower=False)
    return x


def cholesky_solve(b, L):
    """Solve ``(L L^T) x = b`` given a lower-triangular Cholesky factor."""
    y = solve_triangular(L, b, lower=True)
    return solve_triangular(jnp.swapaxes(L, -1, -2), y, lower=False)


def batch_cholesky_solve(b, A, use_pallas="auto"):
    """Solve a batch of PSD systems ``A_k x_k = b_k``.

    b: [B, D], A: [B, D, D] -> x: [B, D]

    Reference: utils.py:43-58. The torch version falls back to an LU solve
    when any per-sample Cholesky fails; here the fallback is an in-graph
    ``lax.cond`` on finiteness of the batched factor, choosing
    ``jnp.linalg.solve`` for the whole batch (same batch-global semantics
    as the reference).

    On TPU, small aligned problems route to the lane-parallel Pallas
    Cholesky (:mod:`lasso_tpu.ops.batched_cholesky`, batch on the lane
    axis — ~2x over XLA's batched cholesky+triangular_solve), with the
    same NaN-on-non-PD + fallback semantics.
    """
    assert b.ndim == 2 and A.ndim == 3, (b.shape, A.shape)
    from lasso_tpu.ops.batched_cholesky import (batch_cholesky_solve_lanes,
                                                supports_lanes_cholesky)
    from lasso_tpu.ops.common import resolve_pallas

    lanes, interpret = resolve_pallas(use_pallas,
                                      supports_lanes_cholesky(b, A))

    b3 = b[:, :, None]

    if lanes:
        x = batch_cholesky_solve_lanes(b, A, interpret=interpret)
        ok = jnp.all(jnp.isfinite(x))
        return lax.cond(ok, lambda _: x,
                        lambda _: jnp.linalg.solve(A, b3)[:, :, 0],
                        operand=None)

    L = jnp.linalg.cholesky(A)
    ok = jnp.all(jnp.isfinite(L))

    def chol_path(_):
        return cholesky_solve(b3, L)

    def lu_path(_):
        return jnp.linalg.solve(A, b3)

    x = lax.cond(ok, chol_path, lu_path, operand=None)
    return x[:, :, 0]


def cholesky_inverse(M):
    """Inverse of an SPD matrix via its Cholesky factorization.

    Equivalent of ``torch.cholesky_inverse(torch.linalg.cholesky(M))`` used
    by the reference's split-Bregman (split_bregman.py:58) and orthant-wise
    Newton (orthant_wise_newton.py:87) precomputations.
    """
    L = jnp.linalg.cholesky(M)
    eye = jnp.eye(M.shape[-1], dtype=M.dtype)
    return cholesky_solve(eye, L)
