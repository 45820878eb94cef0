"""Gauss-Newton split Bregman for nonlinear residual functions.

TPU-native rebuild of /root/reference/lasso/nonlinear/split_bregman.py.
Two inner least-squares solvers, as in the reference:

* ``solver='exact'`` — explicit Jacobian Gauss-Newton. The reference builds
  J row-by-row with torch's private ``_vmap`` of vjps (nl/sb.py:96-101);
  here it is one ``jax.jacrev``. Singular-Cholesky fallback becomes an
  in-graph NaN-triggered general solve.
* ``solver='cg'`` — matrix-free ``(mu J^T J + lambd I)`` CG using
  ``jax.jvp``/``jax.vjp``. The reference requires the never-shipped
  ``ptkit`` package for this path (nl/sb.py:108-112) — dead code there,
  fully functional here. The torch ``_strong_wolfe`` line search is
  replaced by an in-jit golden-section search on the Gauss-Newton step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from lasso_tpu.linalg.basic import cholesky_solve
from lasso_tpu.linalg.conjgrad import conjgrad
from lasso_tpu.linalg.line_search import golden_section
from lasso_tpu.ops.shrink import soft_threshold


def _lstsq_exact(fun, x, d, b, max_iter, mu, lambd, lr, xtol):
    """Explicit-Jacobian Gauss-Newton subproblem (reference nl/sb.py:15-34)."""
    n = x.size
    eye = jnp.eye(n, dtype=x.dtype)

    def body(state):
        x, k, _ = state
        fv = fun(x)
        J = jax.jacrev(fun)(x).reshape(fv.size, n)
        grad = mu * jnp.matmul(J.T, fv.ravel())
        grad = grad - lambd * (d - x - b)
        JtJ = mu * jnp.matmul(J.T, J) + lambd * eye
        L = jnp.linalg.cholesky(JtJ)
        p_chol = cholesky_solve(grad[:, None], L)[:, 0]
        p = jnp.where(jnp.all(jnp.isfinite(p_chol)), p_chol,
                      jnp.linalg.solve(JtJ, grad))
        x_new = x - lr * p
        done = jnp.sum(jnp.abs(lr * p)) <= xtol
        return (x_new, k + 1, done)

    def cond(state):
        _, k, done = state
        return jnp.logical_and(jnp.logical_not(done), k < max_iter)

    x, _, _ = lax.while_loop(cond, body, (x, jnp.asarray(0),
                                          jnp.asarray(False)))
    return x


def _lstsq_cg(fun, x, d, b, max_iter, mu, lambd, lr, xtol, cg_kwargs,
              ls_maxiter=20):
    """Matrix-free Gauss-Newton subproblem (reference nl/sb.py:37-70,
    without the ptkit dependency)."""
    if cg_kwargs is None:
        cg_kwargs = {}

    def obj(u):
        return 0.5 * (mu * jnp.sum(jnp.square(fun(u)))
                      + lambd * jnp.sum(jnp.square(d - u - b)))

    def body(state):
        x, k, _ = state
        fv, vjp_fn = jax.vjp(fun, x)
        grad = mu * vjp_fn(fv)[0]
        grad = grad - lambd * (d - x - b)

        def JtJ_mv(v):
            Jv = jax.jvp(fun, (x,), (v,))[1]
            return mu * vjp_fn(Jv)[0] + lambd * v

        p = -conjgrad(grad, JtJ_mv, lambda u, v: jnp.vdot(u, v), **cg_kwargs)
        t, _ = golden_section(lambda t: obj(x + t * p), 0.0, 2.0 * lr,
                              maxiter=ls_maxiter)
        x_new = x + t * p
        done = jnp.sum(jnp.abs(t * p)) <= xtol
        return (x_new, k + 1, done)

    def cond(state):
        _, k, done = state
        return jnp.logical_and(jnp.logical_not(done), k < max_iter)

    x, _, _ = lax.while_loop(cond, body, (x, jnp.asarray(0),
                                          jnp.asarray(False)))
    return x


def split_bregman_nl(fun, x0, lr=1.0, alpha=1.0, lambd=1.0, tau=1.0,
                     max_iter=None, inner_iter=5, lstsq_iter=5, xtol=1e-5,
                     disp=0, solver="cg", cg_kwargs=None,
                     return_iters=False):
    """Nonlinear split Bregman (reference nl/sb.py:73-168).

    fun: traceable residual function ``x -> f(x)`` (vector output);
    minimizes ``0.5 ||f(x)||^2 + alpha ||x||_1`` on the flattened x.

    ``disp`` mirrors the reference's verbosity levels (nl/sb.py:150-168):
    ``> 1`` prints the cost after every outer Bregman iteration, any
    truthy value prints the final cost.
    """
    disp = int(disp)
    shape = x0.shape
    x = x0.ravel()
    fun_flat = lambda u: fun(u.reshape(shape)).ravel()
    f0 = fun_flat(x)
    input_size = x.size
    output_size = f0.size
    xtol_total = input_size * xtol
    if max_iter is None:
        max_iter = min(input_size, output_size)

    def cost_fn(u):
        return 0.5 * jnp.sum(jnp.square(fun_flat(u))) \
            + alpha * jnp.sum(jnp.abs(u))

    if solver == "exact":
        subproblem = lambda x, d, b: _lstsq_exact(
            fun_flat, x, d, b, lstsq_iter, 1.0 / alpha, lambd, lr, xtol_total)
    elif solver == "cg":
        subproblem = lambda x, d, b: _lstsq_cg(
            fun_flat, x, d, b, lstsq_iter, 1.0 / alpha, lambd, lr,
            xtol_total, cg_kwargs)
    else:
        raise ValueError(
            'Expected `solver` to be one of "exact" or "cg" '
            f"but got {solver}")

    def inner(_, carry):
        x, b, d = carry
        x = subproblem(x, d, b)
        d = soft_threshold(x + b, 1.0 / lambd)
        return (x, b, d)

    def body(state):
        x, b, d, cost, update, nit = state
        x_old = x
        x, b, d = lax.fori_loop(0, inner_iter, inner, (x, b, d))
        b = b + tau * (x - d)
        update = jnp.linalg.norm(x - x_old)
        cost = cost_fn(x)
        if disp > 1:
            jax.debug.print("iter {k} - cost: {c:.4f}", k=nit + 1, c=cost)
        return (x, b, d, cost, update, nit + 1)

    def cond(state):
        _, _, _, cost, update, nit = state
        ok = jnp.logical_and(update > xtol_total, jnp.isfinite(cost))
        return jnp.logical_and(ok, nit < max_iter)

    init = (x, jnp.zeros_like(x), jnp.zeros_like(x), cost_fn(x),
            jnp.asarray(jnp.inf, x.dtype), jnp.asarray(0))
    x, _, _, cost, _, nit = lax.while_loop(cond, body, init)
    if disp:
        jax.debug.print("final cost: {c:.4f}", c=cost)
    if return_iters:
        return x.reshape(shape), nit
    return x.reshape(shape)
