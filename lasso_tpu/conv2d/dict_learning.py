"""Convolutional dictionary learning (TPU extension).

The reference (rfeinman/pytorch-lasso) ships conv sparse CODING only
(/root/reference/lasso/conv2d/ista.py) — the filters are caller-provided
and never learned. This module closes the loop with the conv analogue of
:func:`lasso_tpu.linear.dict_learning`: alternating conv-FISTA encoding
and a filter update, entirely on device as one ``lax.scan``.

The M-step ``min_W 0.5 ||conv_transpose2d(Z, W) - X||^2`` is linear least
squares in the filter stack, solved matrix-free by conjugate gradient on
the normal equations in FILTER space: the decode map ``V ->
conv_transpose2d(Z, V)`` and its adjoint (one ``jax.vjp`` — XLA lowers it
to a conv over the batch) give the normal operator ``A(V) = adj(dec(V)) +
lambd V`` whose domain is just the [C_z, C_x, kh, kw] filter tensor
(thousands of unknowns), so CG converges in a handful of MXU-dominated
iterations and nothing Gram-sized is ever materialized. Warm-started from
the current filters (solve for the correction), which cuts the per-EM-step
CG work sharply once training settles.

Constrained mode (default, mirroring the linear ``dict_learning``'s
unit-norm atoms): fit, project each filter onto the unit sphere, and
re-randomize degenerate filters (zeroing their code channel) — the conv
analogue of :func:`lasso_tpu.linear.dict_learning.update_dict_block`.

Under a data-sharded mesh the ONLY cross-shard quantities are the adjoint
reductions over the batch (``adj`` sums sample contributions): pass
``axis_name`` and they psum; the CG state itself lives in replicated
filter space. See :func:`lasso_tpu.parallel.make_conv_train_step`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from lasso_tpu.conv2d.ista import ista_conv2d
from lasso_tpu.conv2d.ops import conv2d, conv_transpose2d
from lasso_tpu.linalg.conjgrad import conjgrad


def conv_lasso_loss(X, Z, weight, alpha=1.0, stride=1, padding=0):
    """Per-sample-mean conv lasso objective (the conv analogue of
    :func:`lasso_tpu.linear.lasso_loss`)."""
    X_hat = conv_transpose2d(Z, weight, stride=stride, padding=padding)
    loss = (0.5 * jnp.sum(jnp.square(X - X_hat))
            + jnp.sum(alpha * jnp.abs(Z)))
    return loss / X.shape[0]


def update_kernel(X, Z, weight, stride=1, padding=0, lambd=0.0,
                  cg_iters=30, cg_tol=1e-9, axis_name=None):
    """Least-squares filter refit ``min_V 0.5||conv_t(Z, V) - X||^2 +
    0.5 lambd ||V||^2``, warm-started from ``weight``.

    Matrix-free CG on the normal equations in filter space; the adjoint
    of the (linear-in-V) decode map comes from one ``jax.vjp``. With
    ``axis_name`` set the adjoint outputs psum over the sharded batch
    axis, making the fit global while CG state stays replicated.
    """
    dec = lambda V: conv_transpose2d(Z, V, stride=stride, padding=padding)
    _, dec_vjp = jax.vjp(dec, jnp.zeros_like(weight))

    def adj(R):
        g = dec_vjp(R)[0]
        if axis_name is not None:
            g = lax.psum(g, axis_name)
        return g

    def Adot(V):
        AV = adj(dec(V))
        if lambd:
            AV = AV + lambd * V
        return AV

    b = adj(X)
    # warm start: solve A d = b - A(W) for the correction. rtol=0
    # disables the generic CG's coarse relative exit (reference
    # conjgrad semantics stop at ~5% residual — far too loose for an
    # M-step that the EM loop trusts to be a descent step).
    r0 = b - Adot(weight)
    dot = lambda u, v: jnp.sum(u * v)
    d = conjgrad(r0, Adot, dot, maxiter=cg_iters, tol=cg_tol, rtol=0.0)
    return weight + d


def update_kernel_constrained(X, Z, weight, key, stride=1, padding=0,
                              lambd=1e-6, cg_iters=30, eps=1e-10,
                              axis_name=None):
    """Constrained filter update: CG refit, unit-norm projection per
    filter, degenerate-filter re-randomization (zeroing its code
    channel) — the conv analogue of
    :func:`lasso_tpu.linear.dict_learning.update_dict_block`.

    Returns ``(weight, Z)``.
    """
    V = update_kernel(X, Z, weight, stride=stride, padding=padding,
                      lambd=lambd, cg_iters=cg_iters, axis_name=axis_name)
    norms = jnp.sqrt(jnp.sum(jnp.square(V), axis=(1, 2, 3)))  # [C_z]
    degenerate = norms < eps

    rand = jax.random.normal(key, weight.shape, dtype=weight.dtype)
    rand = rand / (jnp.sqrt(jnp.sum(jnp.square(rand), axis=(1, 2, 3),
                                    keepdims=True)) + 1e-30)

    scale = jnp.where(degenerate, 1.0, norms)[:, None, None, None]
    W_new = jnp.where(degenerate[:, None, None, None], rand, V / scale)
    Z_new = jnp.where(degenerate[None, :, None, None], 0.0, Z)
    return W_new, Z_new


def conv_dict_learning(X, n_filters, kernel_size, alpha=0.1, steps=30,
                       stride=1, padding=0, constrained=True, lambd=None,
                       persist=False, key=None, cg_iters=30, eps=1e-10,
                       progbar=False, **solver_kwargs):
    """Alternating conv sparse-coding / filter-update EM loop.

    X: [N, C_x, H, W]; learns ``weight: [n_filters, C_x, kh, kw]``
    (the ``conv_transpose2d`` layout — code channels first). The whole
    run is one jitted ``lax.scan``; returns ``(weight, losses)`` with
    ``losses: [steps]`` tracked on device.

    ``constrained=True`` (default) keeps filters unit-norm with
    degenerate re-randomization (``lambd`` then defaults to a 1e-6
    stabilizer); ``constrained=False`` runs the plain ridge refit
    (``lambd`` defaults to 1e-4, scaled by nothing — filter space is
    small). ``persist=True`` warm-starts each E-step from the previous
    step's codes (the reference's ``persist`` semantics).
    ``solver_kwargs`` thread to :func:`ista_conv2d` (e.g. ``maxiter``,
    ``kernel_precision``, ``restart``, ``nonneg``).
    """
    if lambd is None:
        lambd = 1e-6 if constrained else 1e-4
    kh, kw = (kernel_size if isinstance(kernel_size, (tuple, list))
              else (kernel_size, kernel_size))
    if key is None:
        key = jax.random.PRNGKey(0)
    key, init_key = jax.random.split(key)

    weight = jax.random.normal(
        init_key, (n_filters, X.shape[1], kh, kw), dtype=X.dtype)
    weight = weight / (jnp.sqrt(jnp.sum(jnp.square(weight), axis=(1, 2, 3),
                                        keepdims=True)) + 1e-30)

    code = jax.eval_shape(
        lambda xx, ww: conv2d(xx, ww, stride=stride, padding=padding),
        jax.ShapeDtypeStruct(X.shape, X.dtype),
        jax.ShapeDtypeStruct(weight.shape, weight.dtype))
    Z0_init = jnp.zeros(code.shape, X.dtype)
    step_keys = jax.random.split(key, steps)

    solver_kwargs.setdefault("maxiter", 100)

    def em_step(carry, step_key):
        weight, Z0 = carry
        z0 = Z0 if persist else Z0_init
        Z = ista_conv2d(X, z0, weight, alpha, stride=stride,
                        padding=padding, **solver_kwargs)
        loss = conv_lasso_loss(X, Z, weight, alpha, stride=stride,
                               padding=padding)
        if progbar:
            jax.debug.print("conv_dict_learning loss: {l}", l=loss)
        if constrained:
            weight_new, Z = update_kernel_constrained(
                X, Z, weight, step_key, stride=stride, padding=padding,
                lambd=lambd, cg_iters=cg_iters, eps=eps)
        else:
            weight_new = update_kernel(X, Z, weight, stride=stride,
                                       padding=padding, lambd=lambd,
                                       cg_iters=cg_iters)
        return (weight_new, Z), loss

    (weight, _), losses = lax.scan(em_step, (weight, Z0_init), step_keys)
    return weight, losses
