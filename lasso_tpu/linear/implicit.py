"""Implicit differentiation through the lasso solution.

TPU-native extension with no reference counterpart: the reference's
solvers are terminal — codes come out, gradients do not go back in. In
JAX the natural upgrade is to make ``sparse_encode`` a differentiable
layer via the implicit function theorem (Bertrand et al. 2020; the
task-driven dictionary learning gradients of Mairal, Bach & Ponce 2012),
so sparse coding can sit inside any end-to-end ``jax.grad`` pipeline
(supervised dictionary learning, bilevel hyperparameter optimization of
``alpha``, unrolled-free LISTA-style training targets).

Math. At an (a.e. unique-support) lasso solution the KKT system on the
support S pins z_S as an implicit function of (x, W, alpha):

    c(z_S; x, W, alpha) = W_S^T (W_S z_S - x) + alpha * sign(z_S) = 0

so for a cotangent zbar the VJPs all flow through ONE linear solve with
the restricted Gram H_SS = W_S^T W_S:

    u_S       = H_SS^{-1} zbar_S                  (off-support u = 0)
    x_bar     = u W^T                             ([N, D])
    W_bar     = -(R^T u + W (u^T z))              ([D, K]; R = z W^T - x)
    alpha_bar = -sum u * sign(z)                  (reduced to alpha's shape)

The solve is matrix-free masked CG — ``A(u) = M * ((u*M) W^T W)`` with M
the support mask — batched over samples with per-sample inner products
(the same masked-CG machinery as GPSR's debias step), so nothing
[B, K, K]-sized is ever built and the whole backward is two matmul
passes per CG iteration on the MXU.

Caveats (standard for lasso IFT): the map is differentiable wherever the
support is locally constant (a.e. under continuous data); at support
boundaries the returned gradient is the one-sided limit. For strongly
overcomplete W with support size > D, H_SS is singular and the lasso
solution (not its fitted values) is non-unique — CG then returns the
minimal-residual u and the ``ridge`` knob adds Tikhonov stabilization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lasso_tpu.config import get_precision
from lasso_tpu.linalg.conjgrad import conjgrad_per_row
from lasso_tpu.linear.sparse_encode import sparse_encode


def _support_linear_solve(weight, mask, b, ridge, cg_iters, cg_tol, prec):
    """Solve H_SS u_S = b_S per sample, matrix-free masked CG.

    mask: [N, K] 0/1 support indicator; b: [N, K] (already masked).
    Returns u [N, K] with zeros off-support. Per-row stopping,
    curvature freezing, and best-iterate return come from
    :func:`~lasso_tpu.linalg.conjgrad.conjgrad_per_row` — in f32 a
    near-singular row (support size = D on an overcomplete dictionary)
    must freeze rather than NaN-poison the batch.
    """
    def Adot(u):
        um = u * mask
        Hu = jnp.matmul(jnp.matmul(um, weight.T, precision=prec), weight,
                        precision=prec)
        if ridge:
            Hu = Hu + ridge * um
        return mask * Hu

    dot = lambda a, c: jnp.sum(a * c, axis=1, keepdims=True)
    u = conjgrad_per_row(b, Adot, dot, maxiter=cg_iters, tol=cg_tol)
    return u * mask


def make_implicit_encoder(algorithm="ista", support_eps=1e-7, ridge=0.0,
                          cg_iters=200, cg_tol=1e-12, **solver_kwargs):
    """Build ``encode(x, weight, alpha) -> z`` differentiable in all
    three arguments via the implicit function theorem.

    The forward pass is a plain :func:`sparse_encode` call (any
    dispatched ``algorithm``; ``solver_kwargs`` thread through — run it
    tight, e.g. ``maxiter=500, tol=1e-9``, since IFT gradients assume an
    actual optimum). The backward pass never differentiates through the
    solver loop: it solves the support-restricted normal equations with
    masked matrix-free CG (``cg_iters``/``cg_tol``), so its cost is
    independent of how many FISTA iterations the forward took.

    ``support_eps``: |z| threshold defining the support mask (solver
    output is exactly sparse thanks to the shrink, so the default is a
    safety net against denormal dust). ``ridge``: optional Tikhonov term
    for heavily overcomplete dictionaries where H_SS can be singular.

    ``alpha`` may be a scalar, per-sample [N] / [N, 1], or per-feature
    [1, K] array; ``alpha_bar`` comes back in the matching shape.

    Elastic net composes exactly: passing ``l2 > 0`` through
    ``solver_kwargs`` adds the same quadratic to the KKT system, so the
    backward solve uses ``H_SS + l2 I`` (folded into the CG ridge) and
    every VJP formula is otherwise unchanged.

    The returned ``encode(x, weight, alpha, z0=None)`` accepts an
    optional WARM-START code (e.g. the previous training step's ``z``
    under slowly-moving ``weight`` — the same ``persist`` trick as
    ``dict_learning``): with ``tol > 0`` the forward converges in a
    fraction of the cold iterations. ``z0`` is a solver input, not a
    differentiation variable — at the optimum the solution does not
    depend on it, so its cotangent is zero by IFT semantics.
    """
    prec = get_precision(None)
    # elastic-net quadratic enters the support Hessian exactly as a ridge
    ridge = ridge + float(solver_kwargs.get("l2", 0.0))

    @jax.custom_vjp
    def encode4(x, weight, alpha, z0):
        return sparse_encode(x, weight, alpha, z0=z0,
                             algorithm=algorithm, **solver_kwargs)

    def fwd(x, weight, alpha, z0):
        z = encode4(x, weight, alpha, z0)
        return z, (x, weight, jnp.asarray(alpha), z)

    def bwd(res, zbar):
        x, weight, alpha, z = res
        mask = (jnp.abs(z) > support_eps).astype(z.dtype)
        u = _support_linear_solve(weight, mask, zbar * mask, ridge,
                                  cg_iters, cg_tol, prec)

        x_bar = jnp.matmul(u, weight.T, precision=prec)           # [N, D]
        R = jnp.matmul(z, weight.T, precision=prec) - x           # [N, D]
        W_bar = -(jnp.matmul(R.T, u, precision=prec)
                  + jnp.matmul(weight, jnp.matmul(u.T, z, precision=prec),
                               precision=prec))                   # [D, K]

        ds = -u * jnp.sign(z)                                     # [N, K]
        if alpha.ndim == 0:
            a_bar = jnp.sum(ds)
        elif alpha.ndim == 1:                                     # [N]
            a_bar = jnp.sum(ds, axis=1)
        elif alpha.shape[0] == 1:                                 # [1, K]
            a_bar = jnp.sum(ds, axis=0, keepdims=True)
        else:                                                     # [N, 1]
            a_bar = jnp.sum(ds, axis=1, keepdims=True)
        return x_bar, W_bar, a_bar.astype(alpha.dtype), jnp.zeros_like(z)

    encode4.defvjp(fwd, bwd)

    def encode(x, weight, alpha, z0=None):
        if z0 is None:
            z0 = jnp.zeros((x.shape[0], weight.shape[1]), x.dtype)
        return encode4(x, weight, jnp.asarray(alpha), z0)

    return encode


def make_implicit_group_encoder(groups, group_weights=None, l1_alpha=0.0,
                                support_eps=1e-7, ridge=0.0, cg_iters=200,
                                cg_tol=1e-12, **solver_kwargs):
    """Build ``encode(x, weight, alpha) -> z`` for the GROUP lasso /
    sparse-group lasso, differentiable in (x, weight, alpha) via the
    implicit function theorem.

    Forward: :func:`~lasso_tpu.linear.solvers.group_lasso.group_ista`
    (``groups`` / ``group_weights`` / ``l1_alpha`` as there;
    ``solver_kwargs`` thread through). Backward: at a solution, on the
    coordinate support S (coordinates of groups with ``||z_g|| > 0``;
    a sparse-group l1 term may zero coordinates WITHIN an active group
    — the group-norm term is smooth there, so the plain ``|z| > eps``
    mask stays exact a.e.), the KKT system

        W_S^T (W_S z - x) + alpha * w_g * z_g / ||z_g|| + l1 sign(z_S) = 0

    has support Jacobian ``H = W_S^T W_S + alpha * sum_g w_g B_g`` with
    the group-norm curvature ``B_g = (I - n_g n_g^T) / ||z_g||``,
    ``n_g = z_g / ||z_g||``. ``Adot`` applies H matrix-free: two
    dictionary matmuls plus the B-blocks via the same one-hot
    membership matmuls as the solver's prox — nothing [B, K, K]-sized
    exists. VJPs:

        u         = H^{-1} zbar_S            (per-row guarded CG)
        x_bar     = u W^T
        W_bar     = -(R^T u + W (u^T z))     (penalty is W-free)
        alpha_bar = -sum u * w_g * n         (per alpha's shape)

    ``alpha`` may be a scalar or per-sample [N] / [N, 1]. ``l1_alpha``
    and ``group_weights`` are treated as constants (not differentiated).
    B_g is singular along n_g (curvature only ACROSS the group sphere),
    so H inherits W_S^T W_S's conditioning there — the per-row CG's
    freeze/best-iterate guards and the ``ridge`` knob apply as in
    :func:`make_implicit_encoder`.
    """
    import numpy as np

    from lasso_tpu.linear.solvers.group_lasso import (group_ista,
                                                      resolve_groups)

    prec = get_precision(None)

    def _member(K):
        kind, data, n_groups = resolve_groups(groups, K)
        ids = (np.repeat(np.arange(n_groups, dtype=np.int32), data)
               if kind == "block" else data)
        member = np.zeros((K, n_groups), np.float32)
        member[np.arange(K), ids] = 1.0
        w = (np.ones((n_groups,), np.float32) if group_weights is None
             else np.asarray(group_weights, np.float32))
        return jnp.asarray(member), jnp.asarray(w)

    @jax.custom_vjp
    def encode4(x, weight, alpha, z0):
        return group_ista(x, z0, weight, alpha, groups=groups,
                          group_weights=group_weights, l1_alpha=l1_alpha,
                          **solver_kwargs)

    def fwd(x, weight, alpha, z0):
        z = encode4(x, weight, alpha, z0)
        return z, (x, weight, jnp.asarray(alpha), z)

    def bwd(res, zbar):
        x, weight, alpha, z = res
        K = weight.shape[1]
        member, w_g = _member(K)
        mask = (jnp.abs(z) > support_eps).astype(z.dtype)

        a_col = alpha if alpha.ndim == 0 else alpha.reshape(-1, 1)

        hp = lambda m: jnp.matmul(m, member.T, precision=prec)  # [N,G]->[N,K]
        gsum = lambda v: jnp.matmul(v, member, precision=prec)  # [N,K]->[N,G]

        norms_g = jnp.sqrt(gsum(jnp.square(z)))                 # [N, G]
        act = norms_g > support_eps
        inv_n = jnp.where(act, 1.0 / jnp.where(act, norms_g, 1.0), 0.0)
        n_dir = z * hp(inv_n)                                   # unit dirs
        w_coord = hp(jnp.broadcast_to(w_g[None, :],
                                      (1, w_g.shape[0])))       # [1, K]

        def Adot(u):
            um = u * mask
            Hu = jnp.matmul(jnp.matmul(um, weight.T, precision=prec),
                            weight, precision=prec)
            # group-norm curvature: w_g/||z_g|| * (u_g - n_g <n_g, u_g>)
            proj = n_dir * hp(gsum(n_dir * um))
            Hu = Hu + a_col * w_coord * hp(inv_n) * (um - proj)
            if ridge:
                Hu = Hu + ridge * um
            return mask * Hu

        dot = lambda a, c: jnp.sum(a * c, axis=1, keepdims=True)
        u = conjgrad_per_row(zbar * mask, Adot, dot,
                             maxiter=cg_iters, tol=cg_tol) * mask

        x_bar = jnp.matmul(u, weight.T, precision=prec)
        R = jnp.matmul(z, weight.T, precision=prec) - x
        W_bar = -(jnp.matmul(R.T, u, precision=prec)
                  + jnp.matmul(weight, jnp.matmul(u.T, z, precision=prec),
                               precision=prec))

        ds = -u * w_coord * n_dir
        if alpha.ndim == 0:
            a_bar = jnp.sum(ds)
        elif alpha.ndim == 1:                                     # [N]
            a_bar = jnp.sum(ds, axis=1)
        else:                                                     # [N, 1]
            a_bar = jnp.sum(ds, axis=1, keepdims=True)
        return x_bar, W_bar, a_bar.astype(alpha.dtype), jnp.zeros_like(z)

    encode4.defvjp(fwd, bwd)

    def encode(x, weight, alpha, z0=None):
        # z0 warm start with zero cotangent (see make_implicit_encoder)
        if z0 is None:
            z0 = jnp.zeros((x.shape[0], weight.shape[1]), x.dtype)
        return encode4(x, weight, jnp.asarray(alpha), z0)

    return encode


def implicit_sparse_encode(x, weight, alpha, algorithm="ista",
                           support_eps=1e-7, ridge=0.0, cg_iters=200,
                           cg_tol=1e-12, **solver_kwargs):
    """One-shot form of :func:`make_implicit_encoder` — a
    ``sparse_encode`` call whose output carries implicit-function-theorem
    gradients w.r.t. ``x``, ``weight``, and ``alpha``."""
    enc = make_implicit_encoder(algorithm=algorithm,
                                support_eps=support_eps, ridge=ridge,
                                cg_iters=cg_iters, cg_tol=cg_tol,
                                **solver_kwargs)
    return enc(x, weight, jnp.asarray(alpha))
