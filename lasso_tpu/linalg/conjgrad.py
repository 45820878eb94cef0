"""Generic operator-form conjugate gradient, fully on device.

TPU-native rebuild of /root/reference/lasso/conjgrad.py:13-106. The
reference's Python loop with per-iteration host syncs becomes a single
``lax.while_loop`` whose termination logic (absolute/relative tolerance,
curvature convergence, negative curvature with steepest-descent fallback,
maxiter) is carried as an on-device status code.

Status codes (mirroring conjgrad.py:4-10):
    0: absolute tolerance reached
    1: relative tolerance reached
    2: curvature has converged
    3: curvature is negative
    4: maximum iterations reached
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from lasso_tpu.config import get_precision

STATUS_MESSAGES = {
    0: "Absolute tolerance reached.",
    1: "Relative tolerance reached.",
    2: "Curvature has converged.",
    3: "Curvature is negative.",
    4: "Maximum iterations reached.",
}

_RUNNING = -1


def conjgrad(b, Adot, dot, maxiter=None, tol=1e-10, rtol=1e-1,
             return_status=False, verbose=0):
    """Solve ``A x = b`` for a PSD operator ``A`` given as a matvec closure.

    ``dot(u, v)`` defines the (possibly per-sample, keepdim) inner product;
    global termination decisions sum it over the whole batch, matching the
    reference's batch-global semantics (conjgrad.py:37-45).

    ``verbose`` mirrors the reference (conjgrad.py:30,54-55): >=1 prints
    the terminal status message, >1 adds a per-iteration residual-norm
    line.
    """
    verbose = int(verbose)
    if maxiter is None:
        maxiter = 20 * (b.size if b.ndim == 1 else b[0].size)

    b_abs = jnp.sum(jnp.abs(b))
    termcond = rtol * b_abs * jnp.clip(jnp.sqrt(b_abs), 0.0, 0.5)
    float_eps = jnp.finfo(b.dtype).eps

    x0 = jnp.zeros_like(b)
    r0 = -b
    p0 = b
    rs0 = dot(r0, r0)

    def cond_fn(state):
        _, _, _, _, k, status = state
        return jnp.logical_and(status == _RUNNING, k < maxiter)

    def body_fn(state):
        x, r, p, rs_old, k, status = state

        # top-of-iteration relative-tolerance check (conjgrad.py:34-35)
        rel_done = jnp.sum(jnp.abs(r)) <= termcond

        Ap = Adot(p)
        curv = dot(p, Ap)
        curv_sum = jnp.sum(curv)

        curv_conv = jnp.logical_and(curv_sum >= 0, curv_sum <= 3 * float_eps)
        curv_neg = curv_sum < 0

        # per-sample inner products can be exactly zero for converged /
        # fully-masked rows; guard the divisions so a 0/0 in one sample
        # cannot poison the batch (the torch reference NaNs here)
        def safe_div(num, den):
            ok = den != 0
            return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)

        # steepest-descent fallback on first-iteration negative curvature
        # (conjgrad.py:41-45)
        x_fallback = -safe_div(rs_old, curv) * b
        x_negcurv = jnp.where(jnp.logical_and(curv_neg, k == 0), x_fallback, x)

        alpha = safe_div(rs_old, curv)
        x_new = x + alpha * p
        r_new = r + alpha * Ap
        rs_new = dot(r_new, r_new)
        abs_done = jnp.sqrt(jnp.sum(rs_new)) < tol
        beta = safe_div(rs_new, rs_old)
        p_new = -r_new + beta * p

        # resolve this iteration's outcome in priority order
        stop_early = rel_done | curv_conv | curv_neg
        new_status = jnp.where(
            rel_done, 1,
            jnp.where(curv_conv, 2,
                      jnp.where(curv_neg, 3,
                                jnp.where(abs_done, 0, _RUNNING))))

        keep = jnp.logical_not(stop_early)

        def sel(new, old):
            return jnp.where(keep, new, old)

        if verbose > 1:
            # per-iteration residual norm (reference conjgrad.py:54-55)
            jax.debug.print("iter: {i} - rs: {r:.4f}",
                            i=k, r=jnp.sqrt(jnp.sum(rs_new)))

        x_out = sel(x_new, x_negcurv)
        r_out = sel(r_new, r)
        p_out = sel(p_new, p)
        rs_out = sel(rs_new, rs_old)
        return (x_out, r_out, p_out, rs_out, k + 1, new_status)

    init = (x0, r0, p0, rs0, jnp.asarray(0), jnp.asarray(_RUNNING))
    x, _, _, _, _, status = lax.while_loop(cond_fn, body_fn, init)
    status = jnp.where(status == _RUNNING, 4, status)
    if verbose:
        # terminal status message (reference conjgrad.py:30); the host
        # callback maps the device status code to the message table
        jax.debug.callback(
            lambda s: print("CG: " + STATUS_MESSAGES[int(s)]), status)
    if return_status:
        return x, status
    return x


def conjgrad_per_row(b, Adot, dot, maxiter, tol, x0=None):
    """Batched CG with per-ROW semantics (vs :func:`conjgrad`'s
    batch-global stops) for PSD-per-sample operators.

    ``dot(u, v)`` must return a per-sample keepdim inner product (e.g.
    ``sum(u*v, axis=1, keepdims=True)``). Each row stops on its own
    tolerance — absolute ``tol`` on the residual norm with an
    eps-relative floor so f32 never chases an unreachable residual —
    freezes on non-positive curvature (f32 rounding can push a
    near-singular row's ``p^T A p`` below zero), and returns its
    BEST-residual iterate, so one ill-conditioned sample can neither
    NaN-poison the batch nor stop the other rows early. Built for the
    implicit-function-theorem backward solves (linear + conv), where
    support-restricted Hessians routinely hit singularity at maximal
    support on overcomplete dictionaries.

    ``x0`` warm-starts the iteration (e.g. OMP's support solve, where
    the previous iteration's solution is one rank-1 update away); the
    eps-relative tolerance floor is then relative to the *warm*
    residual, which is the desired behavior — a good start means less
    residual left to chase.
    """
    if x0 is None:
        u0 = jnp.zeros_like(b)
        r_init = -b
    else:
        u0 = x0
        r_init = Adot(x0) - b
    rs0 = dot(r_init, r_init)
    eps = jnp.finfo(b.dtype).eps
    tol_row = jnp.maximum(jnp.asarray(tol, b.dtype) ** 2,
                          (100 * eps) ** 2 * rs0)
    # headroom for CG's non-monotone residual 2-norm; past this the row
    # has truly diverged and is frozen at its best iterate
    rs_blowup = 1e8 * jnp.maximum(rs0, jnp.asarray(1.0, b.dtype))

    def cond_fn(state):
        _, _, _, _, _, _, active, k = state
        return jnp.logical_and(jnp.any(active), k < maxiter)

    def body_fn(state):
        u, r, p, rs, u_best, rs_best, active, k = state
        Ap = Adot(p)
        curv = dot(p, Ap)
        step = jnp.logical_and(active, curv > 0)
        alpha = jnp.where(step, rs / jnp.where(curv > 0, curv, 1.0), 0.0)
        u = u + alpha * p
        r = r + alpha * Ap
        rs_new = jnp.where(step, dot(r, r), rs)
        improved = rs_new < rs_best
        u_best = jnp.where(improved, u, u_best)
        rs_best = jnp.where(improved, rs_new, rs_best)
        beta = jnp.where(step, rs_new / jnp.where(rs > 0, rs, 1.0), 0.0)
        p = jnp.where(step, -r + beta * p, p)
        active = (step & (rs_new > tol_row) & jnp.isfinite(rs_new)
                  & (rs_new <= rs_blowup))
        return (u, r, p, rs_new, u_best, rs_best, active, k + 1)

    init = (u0, r_init, -r_init, rs0, u0, rs0, rs0 > tol_row,
            jnp.asarray(0))
    *_, u_best, _, _, _ = lax.while_loop(cond_fn, body_fn, init)
    return u_best


def cg(A, b, maxiter=None, tol=1e-10, rtol=1.0, precision=None, **kwargs):
    """Single-vector CG: ``A`` dense [n, n], ``b`` [n] (conjgrad.py:60-69)."""
    assert A.ndim == 2 and b.ndim == 1
    prec = get_precision(precision)
    if maxiter is None:
        maxiter = 20 * b.shape[0]
    Adot = lambda v: jnp.matmul(A, v, precision=prec)
    dot = lambda u, v: jnp.vdot(u, v)
    return conjgrad(b, Adot, dot, maxiter, tol, rtol, **kwargs)


def batch_cg(A, b, maxiter=None, tol=1e-10, rtol=1.0, precision=None, **kwargs):
    """Batched CG with a shared matrix: ``A`` [n, n], ``b`` [B, n]
    (conjgrad.py:72-81). Per-sample inner products, batch-global stops."""
    assert A.ndim == 2 and b.ndim == 2
    prec = get_precision(precision)
    if maxiter is None:
        maxiter = 20 * b.shape[1]
    Adot = lambda v: jnp.matmul(v, A.T, precision=prec)
    dot = lambda u, v: jnp.sum(u * v, axis=1, keepdims=True)
    return conjgrad(b, Adot, dot, maxiter, tol, rtol, **kwargs)


def batch_cg_conv2d(kernel, b, tik=0.0, maxiter=None, tol=1e-10, rtol=1.0,
                    stride=1, padding=0, **kwargs):
    """CG on the conv normal operator ``W^T W + tik I`` where
    ``y = conv_transpose2d(x, kernel)`` (conjgrad.py:84-106).

    kernel: [C_z, C_x, kh, kw] in the reference's torch layout
    b:      [B, C_z, H, W]
    """
    from lasso_tpu.conv2d.ops import conv2d, conv_transpose2d

    assert kernel.ndim == 4 and b.ndim == 4
    if maxiter is None:
        maxiter = 20 * b[0].size

    def Adot(v):
        Av = conv_transpose2d(v, kernel, stride=stride, padding=padding)
        Av = conv2d(Av, kernel, stride=stride, padding=padding)
        if tik > 0:
            Av = Av + tik * v
        return Av

    dot = lambda u, v: jnp.sum(u * v, axis=(1, 2, 3), keepdims=True)
    return conjgrad(b, Adot, dot, maxiter, tol, rtol, **kwargs)
