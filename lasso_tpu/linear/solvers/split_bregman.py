"""Split Bregman for L1-regularized least squares.

TPU-native rebuild of /root/reference/lasso/linear/solvers/split_bregman.py:
precompute ``(A^T A / alpha + lambd I)^{-1}`` once (Cholesky inverse), then
alternate a fixed count of inner ridge-solve + shrinkage steps with an
outer Bregman update, in the reference's transposed ``[K, N]`` layout.

The outer loop's host-synced ``update <= tol`` break (split_bregman.py:61-62)
becomes the ``lax.while_loop`` predicate; the fixed inner iteration count is
a ``fori_loop`` (documented reference quirk: inner iterations never early-
exit).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from lasso_tpu.config import get_precision
from lasso_tpu.linalg.basic import cholesky_inverse
from lasso_tpu.ops.shrink import soft_threshold


def split_bregman(A, y, x0=None, alpha=1.0, lambd=1.0, maxiter=20,
                  niter_inner=5, tol=1e-10, tau=1.0, precision=None,
                  verbose=False):
    """Split-Bregman lasso (reference split_bregman.py:5-85).

    A: [D, K] dictionary, y: [N, D] targets -> (x: [N, K], itn: iterations).

    ``verbose`` prints the per-outer-iteration cost
    ``0.5||Ax - y||^2 + alpha||x||_1`` (reference split_bregman.py:80-82).
    """
    prec = get_precision(precision)
    assert y.ndim == 2 and A.ndim == 2
    assert y.shape[1] == A.shape[0]
    n_features, n_components = A.shape
    n_samples = y.shape[0]

    yT = y.T                                                   # [D, N]
    if x0 is None:
        x = jnp.zeros((n_components, n_samples), y.dtype)
    else:
        assert x0.shape == (n_samples, n_components)
        x = x0.T

    b0 = jnp.zeros_like(x)
    d0 = jnp.zeros_like(x)

    # normal equations, factored once (split_bregman.py:55-58)
    Aty = jnp.matmul(A.T, yT, precision=prec) / alpha          # [K, N]
    AtA = jnp.matmul(A.T, A, precision=prec) / alpha
    AtA = AtA + lambd * jnp.eye(n_components, dtype=A.dtype)
    AtA_inv = cholesky_inverse(AtA)

    def inner(_, carry):
        x, b, d = carry
        rhs = Aty + lambd * (d - b)
        x = jnp.matmul(AtA_inv, rhs, precision=prec)
        d = soft_threshold(x + b, 1.0 / lambd)
        return (x, b, d)

    def cond(state):
        _, _, _, update, itn = state
        return jnp.logical_and(update > tol, itn < maxiter)

    def body(state):
        x, b, d, _, itn = state
        x_old = x
        x, b, d = lax.fori_loop(0, niter_inner, inner, (x, b, d))
        b = b + tau * (x - d)
        update = jnp.linalg.norm((x - x_old).ravel())
        if verbose:
            import jax
            cost = (0.5 * jnp.sum(jnp.square(
                jnp.matmul(A, x, precision=prec) - yT))
                + alpha * jnp.sum(jnp.abs(x)))
            jax.debug.print("iter {i} - cost: {c:.4f}", i=itn + 1, c=cost)
        return (x, b, d, update, itn + 1)

    init = (x, b0, d0, jnp.asarray(jnp.inf, y.dtype), jnp.asarray(0))
    x, _, _, _, itn = lax.while_loop(cond, body, init)
    return x.T, itn
