"""Scalar line searches expressible inside jit.

The reference leans on host-side ``scipy.optimize.minimize_scalar(...,
method='bounded')`` in four solvers (iterative_ridge.py:105-113,
orthant_wise_newton.py:114-123, nonlinear/owlqn.py:152-160,
nonlinear/iterative_ridge_bfgs.py:112-116) — a per-iteration device->host
round trip that is untenable under XLA. Here the bounded minimization is a
fixed-length golden-section reduction inside ``lax.fori_loop``: branch-free,
device-resident, and accurate to ``(hi-lo) * 0.618**maxiter`` (~5e-6 of the
interval at the default 30 iterations, comparable to scipy's xatol=1e-5).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax

_INVPHI = (math.sqrt(5.0) - 1.0) / 2.0  # 1/phi ~ 0.618
_INVPHI2 = (3.0 - math.sqrt(5.0)) / 2.0  # 1/phi^2 ~ 0.382


def golden_section(fn, lo=0.0, hi=1.0, maxiter=30):
    """Minimize ``fn`` over ``[lo, hi]``; returns ``(t_min, f_min)``.

    ``fn`` must be a traceable function. Fully vectorized: when ``lo``/``hi``
    are arrays and ``fn`` maps elementwise (e.g. a per-sample objective
    ``[B] -> [B]``), the search runs independently per element — this is
    the per-sample line-search upgrade over the reference's batch-shared
    scipy Brent step.
    """
    lo = jnp.asarray(lo, jnp.result_type(float))
    hi = jnp.broadcast_to(jnp.asarray(hi, lo.dtype), lo.shape)

    a0 = lo
    b0 = hi
    h0 = b0 - a0
    c0 = a0 + _INVPHI2 * h0
    d0 = a0 + _INVPHI * h0
    fc0 = fn(c0)
    fd0 = fn(d0)

    def body(_, state):
        a, b, c, d, fc, fd = state
        go_left = fc < fd

        a_new = jnp.where(go_left, a, c)
        b_new = jnp.where(go_left, d, b)
        h = b_new - a_new
        c_new = jnp.where(go_left, a_new + _INVPHI2 * h, d)
        d_new = jnp.where(go_left, c, a_new + _INVPHI * h)
        # one new evaluation per iteration: left branch evaluates c_new,
        # right branch evaluates d_new
        t_eval = jnp.where(go_left, c_new, d_new)
        f_eval = fn(t_eval)
        fc_new = jnp.where(go_left, f_eval, fd)
        fd_new = jnp.where(go_left, fc, f_eval)
        return (a_new, b_new, c_new, d_new, fc_new, fd_new)

    a, b, c, d, fc, fd = lax.fori_loop(
        0, maxiter, body, (a0, b0, c0, d0, fc0, fd0))

    t = jnp.where(fc < fd, c, d)
    f = jnp.minimum(fc, fd)
    return t, f


def backtracking_armijo(fn, f0, slope, t0, decay=0.95, sufficient=0.1,
                        maxiter=500):
    """Backtracking line search with a sufficient-decrease test.

    Mirrors the reference's shared ``backtracking`` helper
    (orthant_wise_newton.py:20-29, nonlinear/owlqn.py:68-77): shrink ``t`` by
    ``decay`` until ``fn(t) <= f0 - sufficient * slope(t)``, where ``slope(t)``
    is the caller-supplied directional-decrease term. On failure after
    ``maxiter`` trials, returns the last ``t`` (the reference warns and
    proceeds identically).

    ``fn``: scalar t -> objective value; ``slope``: scalar t -> decrease term.
    Returns ``(t, n_iters)``.
    """
    def cond(state):
        t, k, done = state
        return jnp.logical_and(jnp.logical_not(done), k < maxiter)

    def body(state):
        t, k, _ = state
        ok = fn(t) <= f0 - sufficient * slope(t)
        t_new = jnp.where(ok, t, t * decay)
        return (t_new, k + 1, ok)

    t0 = jnp.asarray(t0, jnp.result_type(float))
    t, k, _ = lax.while_loop(cond, body, (t0, jnp.asarray(0), jnp.asarray(False)))
    return t, k
