"""Constrained sparse-inference formulations, solved natively on device.

TPU-native replacement for
/root/reference/lasso/linear/solvers/scipy_inference.py, which reformulates
the lasso as scipy.optimize NLPs and fans the batch out over a
``multiprocessing.Pool`` on CPU (scipy_inference.py:251-263). Both of the
reference's problem classes are solved here fully batched on device:

* ``constr=True`` — the *constrained* form
  ``min ||z||_1  s.t.  0.5 ||W z - x||^2 <= rss_lim`` (per sample).
  RSS at the lasso solution is monotonically nondecreasing in the penalty
  ``alpha``, so the constrained optimum is found by a per-sample bisection
  on ``alpha`` over warm-started FISTA solves (a Pareto-frontier root find,
  SPGL1-style). The positive/negative-split + bounds variants of the
  reference (`_solve_constr`, `_solve_constr_bound`) have the same optima.

* ``constr=False, bound=True`` — the *penalized* form
  (`_solve_bound`): exactly the lasso objective; solved directly by FISTA.

Unlike the reference this never leaves the device, supports any batch size
without process pools, and is differentiable end to end.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from lasso_tpu.config import get_precision
from lasso_tpu.linalg.spectral import lipschitz_constant
from lasso_tpu.ops.shrink import soft_threshold


def _fista_per_sample_alpha(x, weight, alpha, z0, lr, n_iters, prec):
    """FISTA with a per-sample [B, 1] penalty vector."""
    def body(_, carry):
        z, y, t = carry
        resid = jnp.matmul(y, weight.T, precision=prec) - x
        grad = jnp.matmul(resid, weight, precision=prec)
        z_next = soft_threshold(y - lr * grad, alpha * lr)
        t_next = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
        y_next = z_next + ((t - 1) / t_next) * (z_next - z)
        return (z_next, y_next, t_next)

    z, _, _ = lax.fori_loop(
        0, n_iters, body, (z0, z0, jnp.asarray(1.0, x.dtype)))
    return z


def constrained_inference(x, weight, z0=None, constr=True, bound=True,
                          alpha=1.0, rss_lim=0.1, fista_iters=200,
                          bisect_iters=25, precision=None):
    """Batched constrained / penalized sparse inference
    (drop-in capability match for reference scipy_inference.py:211-268).

    x: [B, D], weight: [D, K] -> z: [B, K]

    Infeasibility: when ``rss_lim`` is below a sample's attainable
    minimum RSS (possible only for undercomplete / rank-deficient W —
    any overcomplete full-row-rank dictionary can drive RSS to 0), no
    bisection midpoint is ever feasible, the bracket collapses to its
    low end, and the returned code is the best-effort minimum-RSS
    solution (FISTA at the vanishing penalty ``alpha_max * 1e-7``) —
    its RSS will exceed ``rss_lim``, which the caller can check. The
    reference's scipy solvers return their own best iterate in the same
    situation.
    """
    prec = get_precision(precision)
    if x.ndim == 1:
        return constrained_inference(
            x[None], weight, None if z0 is None else z0[None], constr,
            bound, alpha, rss_lim, fista_iters, bisect_iters, precision)[0]

    B = x.shape[0]
    K = weight.shape[1]
    if z0 is None:
        z0 = jnp.zeros((B, K), x.dtype)

    L = lipschitz_constant(weight, precision=prec)
    lr = 1.0 / L

    if not constr:
        if not bound:
            raise NotImplementedError(
                "unbounded & unconstrained optimizer not yet implemented.")
        a = jnp.full((B, 1), alpha, x.dtype)
        return _fista_per_sample_alpha(x, weight, a, z0, lr,
                                       fista_iters, prec)

    # --- constrained form: bisection on the per-sample penalty ---
    def rss(z):
        resid = jnp.matmul(z, weight.T, precision=prec) - x
        return 0.5 * jnp.sum(jnp.square(resid), axis=1, keepdims=True)

    # alpha >= ||W^T x||_inf gives z = 0 and the max possible RSS
    alpha_max = jnp.max(
        jnp.abs(jnp.matmul(x, weight, precision=prec)), axis=1,
        keepdims=True) * 1.001                                  # [B, 1]
    alpha_lo0 = alpha_max * 1e-7
    rss_cap = 0.5 * jnp.sum(jnp.square(x), axis=1, keepdims=True)
    # samples whose zero-solution already satisfies the constraint
    trivially_feasible = rss_cap <= rss_lim

    def bisect_body(_, carry):
        lo, hi, z = carry
        mid = jnp.sqrt(lo * hi)  # geometric midpoint (alpha spans decades)
        z_mid = _fista_per_sample_alpha(x, weight, mid, z, lr,
                                        fista_iters, prec)
        feasible = rss(z_mid) <= rss_lim
        # RSS grows with alpha; the constrained optimum sits at the LARGEST
        # alpha still feasible (largest penalty = smallest l1), so move the
        # feasible end of the bracket up
        lo_new = jnp.where(feasible, mid, lo)
        hi_new = jnp.where(feasible, hi, mid)
        return (lo_new, hi_new, z_mid)

    lo, hi, z = lax.fori_loop(
        0, bisect_iters, bisect_body, (alpha_lo0, alpha_max, z0))
    # final solve at the feasible end of the bracket
    z_final = _fista_per_sample_alpha(x, weight, lo, z, lr,
                                      fista_iters * 2, prec)
    return jnp.where(trivially_feasible, 0.0, z_final)


# capability-parity alias for the reference's public name
scipy_inference = constrained_inference
