"""Implicit differentiation through the CONV lasso solution.

TPU-native extension with no reference counterpart (the reference's
``ista_conv2d``, /root/reference/lasso/conv2d/ista.py:7-48, is terminal):
the conv sparse-coding layer becomes differentiable in (x, kernel, alpha)
via the implicit function theorem, so convolutional sparse coding can sit
inside any end-to-end ``jax.grad`` pipeline — task-driven convolutional
dictionary learning, bilevel tuning of per-channel penalties, supervised
heads over sparse feature maps.

Math mirrors :mod:`lasso_tpu.linear.implicit` with the dictionary matmul
replaced by the adjoint conv pair ``A = conv_transpose2d(., W)``,
``A^T = conv2d(., W)``. At an (a.e. unique-support) solution the KKT
system on the support S is

    c(z_S; x, W, alpha) = A^T(A z - x)|_S + alpha * sign(z_S) = 0

and every VJP flows through one linear solve with the support-restricted
conv normal operator ``H = mask * A^T A * mask``:

    u        = H^{-1} (zbar * mask)        (masked per-sample CG)
    x_bar    = conv_transpose2d(u, W)      (A applied to u)
    W_bar    = -vjp_W[ A^T_W (A_W z - x) ](u)   (XLA conv kernel grads)
    alpha_bar = -sum u * sign(z)           (reduced to alpha's shape)

The solve is :func:`~lasso_tpu.linalg.conjgrad.conjgrad_per_row` — two
conv passes per CG iteration, per-sample stopping/curvature guards so an
ill-conditioned sample freezes at its best iterate instead of
NaN-poisoning the batch (same f32 robustness story as the linear path).
``nonneg=True`` composes automatically: on a nonneg support sign(z) = +1
and the formulas are unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lasso_tpu.conv2d.ista import ista_conv2d
from lasso_tpu.conv2d.ops import conv2d, conv_transpose2d
from lasso_tpu.linalg.conjgrad import conjgrad_per_row
from lasso_tpu.ops.common import (per_feature_alpha_row,
                                  per_sample_alpha_column)


def make_implicit_conv_encoder(support_eps=1e-7, ridge=0.0, cg_iters=200,
                               cg_tol=1e-12, stride=1, padding=0,
                               **solver_kwargs):
    """Build ``encode(x, kernel, alpha) -> z`` differentiable in all
    three arguments via the implicit function theorem.

    The forward pass runs :func:`~lasso_tpu.conv2d.ista.ista_conv2d`
    from a zero code (``solver_kwargs`` thread through — run it tight,
    e.g. ``maxiter=500, tol=0.0``, since IFT gradients assume an actual
    optimum); the backward never differentiates through the solver loop.

    Layouts match the solver: ``x [N, C_x, H, W]``,
    ``kernel [C_z, C_x, kh, kw]``, codes ``z [N, C_z, H_z, W_z]``.

    ``alpha`` may be a scalar, per-sample ``[N]`` / ``[N, 1]``, or
    per-channel ``(1, C_z)`` (bare ``(C_z,)`` when unambiguous);
    ``alpha_bar`` comes back in the matching shape. ``ridge`` adds
    Tikhonov stabilization to the support Hessian for heavily
    overcomplete filter banks.
    """
    @jax.custom_vjp
    def encode4(x, kernel, alpha, z0):
        return ista_conv2d(x, z0, kernel, alpha, stride=stride,
                           padding=padding, **solver_kwargs)

    def fwd(x, kernel, alpha, z0):
        z = encode4(x, kernel, alpha, z0)
        return z, (x, kernel, jnp.asarray(alpha), z)

    def bwd(res, zbar):
        x, kernel, alpha, z = res
        mask = (jnp.abs(z) > support_eps).astype(z.dtype)

        def Adot(u):
            um = u * mask
            Hu = conv2d(conv_transpose2d(um, kernel, stride=stride,
                                         padding=padding),
                        kernel, stride=stride, padding=padding)
            if ridge:
                Hu = Hu + ridge * um
            return mask * Hu

        dot = lambda a, c: jnp.sum(a * c, axis=(1, 2, 3), keepdims=True)
        u = conjgrad_per_row(zbar * mask, Adot, dot,
                             maxiter=cg_iters, tol=cg_tol) * mask

        x_bar = conv_transpose2d(u, kernel, stride=stride, padding=padding)

        def kkt_smooth(w):
            r = conv_transpose2d(z, w, stride=stride, padding=padding) - x
            return conv2d(r, w, stride=stride, padding=padding)

        W_bar = -jax.vjp(kkt_smooth, kernel)[1](u)[0]

        ds = -u * jnp.sign(z)
        n, c_z = x.shape[0], z.shape[1]
        if alpha.ndim == 0:
            a_bar = jnp.sum(ds)
        elif per_feature_alpha_row(alpha, c_z, n) is not None:
            a_bar = jnp.sum(ds, axis=(0, 2, 3)).reshape(alpha.shape)
        elif per_sample_alpha_column(alpha, n) is not None:
            a_bar = jnp.sum(ds, axis=(1, 2, 3)).reshape(alpha.shape)
        else:
            raise ValueError(f"unsupported alpha shape {alpha.shape}")
        return x_bar, W_bar, a_bar.astype(alpha.dtype), jnp.zeros_like(z)

    encode4.defvjp(fwd, bwd)

    def encode(x, kernel, alpha, z0=None):
        # z0 warm start: a solver input with zero cotangent (the optimum
        # does not depend on it) — persist codes across training steps
        if z0 is None:
            code = jax.eval_shape(
                lambda xx, ww: conv2d(xx, ww, stride=stride,
                                      padding=padding),
                x, kernel)
            z0 = jnp.zeros(code.shape, x.dtype)
        return encode4(x, kernel, jnp.asarray(alpha), z0)

    return encode


def implicit_conv_encode(x, kernel, alpha, support_eps=1e-7, ridge=0.0,
                         cg_iters=200, cg_tol=1e-12, stride=1, padding=0,
                         **solver_kwargs):
    """One-shot form of :func:`make_implicit_conv_encoder`."""
    enc = make_implicit_conv_encoder(
        support_eps=support_eps, ridge=ridge, cg_iters=cg_iters,
        cg_tol=cg_tol, stride=stride, padding=padding, **solver_kwargs)
    return enc(x, kernel, jnp.asarray(alpha))
