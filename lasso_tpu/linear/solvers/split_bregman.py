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
from lasso_tpu.ops.precision import round_bf16 as _round_bf16
from lasso_tpu.ops.shrink import soft_threshold


def split_bregman(A, y, x0=None, alpha=1.0, lambd=1.0, maxiter=20,
                  niter_inner=5, tol=1e-10, tau=1.0, precision=None,
                  kernel_precision="f32", mixed_tail="auto",
                  verbose=False):
    """Split-Bregman lasso (reference split_bregman.py:5-85).

    A: [D, K] dictionary, y: [N, D] targets -> (x: [N, K], itn: iterations).

    ``verbose`` prints the per-outer-iteration cost
    ``0.5||Ax - y||^2 + alpha||x||_1`` (reference split_bregman.py:80-82).

    ``kernel_precision`` (TPU extension): 'f32' (default, reference
    parity — every matmul at ``lax.Precision.HIGHEST``), 'bf16' (the
    dominant ``AtA_inv @ rhs`` inner solve on bf16-grid operands with
    one MXU pass; measured throughput vs f32 in docs/PERFORMANCE.md),
    or 'mixed' (bf16 bulk, then the last
    ``mixed_tail`` *outer* iterations re-polished in f32; 'auto' tail =
    max(1, maxiter // 8)). The outer Bregman recursion is a contraction
    toward the L1 fixed point, so the f32 tail removes the bf16 floor
    the same way the FISTA tail does (docs/PERFORMANCE.md error model).
    Operand rounding uses ``lax.reduce_precision`` so CPU runs emulate
    TPU numerics (excess-precision rules elide plain cast round-trips).
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

    if kernel_precision not in ("f32", "bf16", "mixed"):
        raise ValueError(f"kernel_precision must be 'f32', 'bf16' or "
                         f"'mixed', got {kernel_precision!r}")
    if mixed_tail != "auto" and kernel_precision != "mixed":
        # same contract as ista(mixed_tail_iters=...): a tail without
        # 'mixed' would be silently ignored
        raise ValueError("mixed_tail requires kernel_precision='mixed'")
    if kernel_precision == "mixed":
        if mixed_tail == "auto":
            tail = max(1, maxiter // 8)
        else:
            tail = int(mixed_tail)
            if tail < 1:
                raise ValueError(
                    f"mixed_tail must be >= 1 outer iteration, got "
                    f"{mixed_tail}")
        tail = min(tail, maxiter)
        phases = [("bf16", maxiter - tail), ("f32", maxiter)]
    else:
        phases = [(kernel_precision, maxiter)]
    AtA_inv_b = (_round_bf16(AtA_inv) if phases[0][0] == "bf16" else None)

    def make_inner(mode):
        def inner(_, carry):
            x, b, d = carry
            rhs = Aty + lambd * (d - b)
            if mode == "bf16":
                x = jnp.matmul(AtA_inv_b, _round_bf16(rhs),
                               precision=lax.Precision.DEFAULT)
            else:
                x = jnp.matmul(AtA_inv, rhs, precision=prec)
            d = soft_threshold(x + b, 1.0 / lambd)
            return (x, b, d)
        return inner

    def make_cond(limit):
        def cond(state):
            _, _, _, update, itn = state
            return jnp.logical_and(update > tol, itn < limit)
        return cond

    def make_body(mode):
        inner = make_inner(mode)

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
                jax.debug.print("iter {i} - cost: {c:.4f}", i=itn + 1,
                                c=cost)
            return (x, b, d, update, itn + 1)
        return body

    state = (x, b0, d0, jnp.asarray(jnp.inf, y.dtype), jnp.asarray(0))
    for mode, limit in phases:
        state = lax.while_loop(make_cond(limit), make_body(mode), state)
        # a bf16 phase's ||x - x_old|| statistic carries bf16 rounding
        # noise: discard it so the f32 tail always runs
        state = state[:3] + (jnp.asarray(jnp.inf, y.dtype), state[4])
    x, _, _, _, itn = state
    return x.T, itn
