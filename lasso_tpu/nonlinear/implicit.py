"""Implicit differentiation through the NONLINEAR lasso solution.

TPU-native extension with no reference counterpart (the reference's
nonlinear solvers, /root/reference/lasso/nonlinear/ista.py:55-128, are
terminal): sparse coding through an arbitrary differentiable decoder
becomes itself differentiable — in the observations ``x``, the decoder
PARAMETERS, and ``alpha`` — via the implicit function theorem, so a
nonlinear sparse-coding layer can train end-to-end under ``jax.grad``
(task-driven training of deep decoders, bilevel alpha tuning).

Math. Let ``f(z; params, x) = 0.5 ||decoder(params, z) - x||^2`` and
``g = grad_z f``. At an (a.e. unique-support, second-order-regular)
solution the KKT system on the support S is

    c(z_S; params, x, alpha) = g(z)|_S + alpha * sign(z_S) = 0

and for a cotangent zbar every VJP flows through ONE linear solve with
the support-restricted HESSIAN ``H = mask * (grad^2_z f) * mask``:

    u          = H^{-1} (zbar * mask)       (masked per-row CG, H via HVP)
    x_bar      = -vjp_x[g](u)               (= J u for a linear decoder)
    params_bar = -vjp_params[g](u)
    alpha_bar  = -sum u * sign(z)           (reduced to alpha's shape)

The Hessian is never materialized: ``Adot(u) = mask * jvp(g)(u * mask)``
is one forward-over-reverse pass through the decoder per CG iteration
(the same HVP machinery as :func:`~lasso_tpu.nonlinear.ista
.hessian_2norm`'s power iteration). The CG is
:func:`~lasso_tpu.linalg.conjgrad.conjgrad_per_row`: per-row stopping
and curvature freezing matter MORE here than in the linear case — a
nonconvex decoder's support Hessian need not be PSD, and a row at an
indefinite point freezes at its best iterate instead of NaN-poisoning
the batch (``ridge`` adds Levenberg-style stabilization).

Contract: ``decoder(params, z) -> x_hat`` with ``params`` any pytree
(use ``params=None`` and a closure for parameterless decoders; its
cotangent is then an empty tree). The forward solve is
:func:`~lasso_tpu.nonlinear.ista.ista_nl` with the decoder bound to the
traced ``params`` — run it tight, IFT gradients assume an actual
optimum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lasso_tpu.linalg.conjgrad import conjgrad_per_row
from lasso_tpu.nonlinear.ista import ista_nl


def make_implicit_nl_encoder(decoder, support_eps=1e-7, ridge=0.0,
                             cg_iters=100, cg_tol=1e-12, **solver_kwargs):
    """Build ``encode(x, params, alpha) -> z`` differentiable in all
    three arguments via the implicit function theorem.

    ``decoder(params, z) -> x_hat`` (params: any pytree, or None).
    ``solver_kwargs`` thread to :func:`~lasso_tpu.nonlinear.ista.ista_nl`
    (``z0`` is required there — pass it here; it is treated as a
    constant, not differentiated). ``alpha`` may be a scalar, per-sample
    [N] / [N, 1], or per-feature [1, K].
    """
    z0_fixed = solver_kwargs.pop("z0", None)
    if z0_fixed is None:
        raise ValueError("make_implicit_nl_encoder requires z0 (the "
                         "nonlinear solver has no canonical zero-code "
                         "shape inference)")

    def smooth_grad(z, params, x):
        f = lambda zz: 0.5 * jnp.sum(
            jnp.square(decoder(params, zz) - x))
        return jax.grad(f)(z)

    @jax.custom_vjp
    def encode(x, params, alpha):
        return ista_nl(x, z0_fixed, lambda z: decoder(params, z),
                       alpha=alpha, **solver_kwargs)

    def fwd(x, params, alpha):
        z = encode(x, params, alpha)
        return z, (x, params, jnp.asarray(alpha), z)

    def bwd(res, zbar):
        x, params, alpha, z = res
        mask = (jnp.abs(z) > support_eps).astype(z.dtype)

        g_of_z = lambda zz: smooth_grad(zz, params, x)

        def Adot(u):
            um = u * mask
            Hu = jax.jvp(g_of_z, (z,), (um,))[1]
            if ridge:
                Hu = Hu + ridge * um
            return mask * Hu

        dot = lambda a, c: jnp.sum(a * c, axis=1, keepdims=True)
        u = conjgrad_per_row(zbar * mask, Adot, dot,
                             maxiter=cg_iters, tol=cg_tol) * mask

        _, vjp_px = jax.vjp(lambda p, xx: smooth_grad(z, p, xx),
                            params, x)
        p_bar, x_bar = vjp_px(u)
        p_bar = jax.tree_util.tree_map(jnp.negative, p_bar)
        x_bar = -x_bar

        ds = -u * jnp.sign(z)
        if alpha.ndim == 0:
            a_bar = jnp.sum(ds)
        elif alpha.ndim == 1:                                     # [N]
            a_bar = jnp.sum(ds, axis=1)
        elif alpha.shape[0] == 1:                                 # [1, K]
            a_bar = jnp.sum(ds, axis=0, keepdims=True)
        else:                                                     # [N, 1]
            a_bar = jnp.sum(ds, axis=1, keepdims=True)
        return x_bar, p_bar, a_bar.astype(alpha.dtype)

    encode.defvjp(fwd, bwd)
    return encode
