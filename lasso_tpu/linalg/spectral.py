"""On-device spectral-norm estimation.

Replaces every host-side ``scipy.sparse.linalg.eigsh`` call in the reference
(linear/solvers/ista.py:8-14, conv2d/lip_const.py:8-31) with a
``lax.while_loop`` power iteration that never leaves the device. The same
operator-form routine serves dense dictionaries and convolutional operators.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from lasso_tpu.config import get_precision


def power_iteration(matvec, v0, maxiter=500, tol=1e-9):
    """Estimate the top eigenvalue of a symmetric PSD operator.

    Runs Rayleigh-quotient power iteration until the eigenvalue estimate is
    relatively converged (``|lam - lam_prev| <= tol * lam``) or ``maxiter``.
    Returns ``(eigenvalue, eigenvector)``.
    """
    v0 = v0 / (jnp.linalg.norm(v0) + 1e-30)

    def cond(state):
        _, lam, lam_prev, k = state
        not_conv = jnp.abs(lam - lam_prev) > tol * jnp.maximum(jnp.abs(lam), 1e-30)
        return jnp.logical_and(k < maxiter, not_conv)

    def body(state):
        v, lam, _, k = state
        w = matvec(v)
        lam_new = jnp.vdot(v, w).real.astype(v.dtype)
        v_new = w / (jnp.linalg.norm(w) + 1e-30)
        return (v_new, lam_new, lam, k + 1)

    init = (v0, jnp.asarray(0.0, v0.dtype), jnp.asarray(jnp.inf, v0.dtype), 0)
    v, lam, _, _ = lax.while_loop(cond, body, init)
    return lam, v


def lipschitz_constant(weight, maxiter=500, tol=1e-9, safety=1e-4, key=None,
                       precision=None):
    """Top eigenvalue of ``W^T W`` — the Lipschitz constant of the RSS
    gradient used to set ISTA's step size.

    TPU-native replacement for the reference's device->host eigsh round trip
    (linear/solvers/ista.py:8-14). Power iteration converges to the true
    eigenvalue from below, and FISTA requires ``lr <= 1/L``, so the estimate
    is inflated by ``1 + safety`` to stay on the safe side of the bound.
    """
    prec = get_precision(precision)
    if key is None:
        key = jax.random.PRNGKey(0)
    v0 = jax.random.normal(key, (weight.shape[1],), dtype=weight.dtype)

    def matvec(v):
        Wv = jnp.matmul(weight, v, precision=prec)
        return jnp.matmul(Wv, weight, precision=prec)

    lam, _ = power_iteration(matvec, v0, maxiter=maxiter, tol=tol)
    return lam * (1.0 + safety)
