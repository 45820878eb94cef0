"""Group lasso and sparse-group lasso (proximal gradient / FISTA).

TPU extension — the reference (rfeinman/pytorch-lasso) is plain-lasso
only; this solver reuses its (F)ISTA iteration structure
(/root/reference/lasso/linear/solvers/ista.py:57-103) with the l1 prox
replaced by the blockwise group shrink, giving the framework the
standard structured-sparsity family:

    min_z 0.5 ||z W^T - x||^2 + alpha * sum_g w_g ||z_g||_2
                              + l1_alpha * ||z||_1

(Yuan & Lin 2006 group lasso; with ``l1_alpha > 0`` the sparse-group
lasso of Simon, Friedman, Hastie & Tibshirani 2013, whose prox is the
exact composition ``group_shrink(soft_threshold(.))``).

TPU-first design notes:

* groups given as an int ``gs`` (contiguous equal-size blocks) reduce
  the prox to a ``[N, G, gs]`` reshape + a lane-parallel VPU reduce —
  no gathers, fully fused by XLA into the adjacent matmuls;
* arbitrary group id vectors use a one-hot f32 membership matrix: the
  per-group sum-of-squares and the scatter of the per-group scale back
  to coordinates are two MXU matmuls (the same exact one-hot-matmul
  gather trick as ops/fused_cd.py) instead of data-dependent
  segment ops that lower badly on TPU;
* the whole solve is one ``lax.while_loop`` with an on-device global
  convergence predicate (psum-reduced under ``axis_name`` for mesh
  sharding), like every other solver in the package.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from lasso_tpu.config import get_precision
from lasso_tpu.linalg.spectral import lipschitz_constant
from lasso_tpu.ops.shrink import soft_threshold


def resolve_groups(groups, n_components):
    """Normalize the ``groups`` argument to ``(kind, data, n_groups)``.

    ``groups`` may be:
      * an int ``gs`` — contiguous equal-size blocks ``[0:gs), [gs:2gs),
        ...`` (requires ``gs | K``); returns ``('block', gs, K // gs)``;
      * an integer array of shape [K] assigning each coordinate a group
        id in ``[0, G)`` (any order, any sizes; ids must be concrete —
        they are solver *structure*, not data); returns
        ``('ids', ids, G)``.
    """
    if groups is None:
        raise ValueError("group_ista requires groups (an int block size "
                         "or a [K] int array of group ids)")
    if isinstance(groups, (int, np.integer)):
        gs = int(groups)
        if gs < 1:
            raise ValueError(f"group size must be >= 1, got {gs}")
        if n_components % gs != 0:
            raise ValueError(
                f"group size {gs} does not divide n_components "
                f"{n_components}; pass an explicit id array for ragged "
                f"groups")
        return "block", gs, n_components // gs
    ids = np.asarray(groups)
    if ids.shape != (n_components,) or ids.dtype.kind not in "iu":
        raise ValueError(
            f"groups must be an int or an int array of shape "
            f"({n_components},), got shape {ids.shape} dtype {ids.dtype}")
    uniq = np.unique(ids)
    n_groups = int(uniq[-1]) + 1
    if int(uniq[0]) < 0 or len(uniq) != n_groups:
        raise ValueError("group ids must be 0..G-1 with every id used")
    return "ids", ids.astype(np.int32), n_groups


def _make_group_prox(kind, data, n_groups, n_components, weights):
    """Build ``prox(v, theta) -> argmin_u 0.5||u-v||^2 +
    theta * sum_g w_g ||u_g||_2`` for [N, K] inputs.

    The blockwise shrink is ``u_g = v_g * max(1 - theta*w_g/||v_g||, 0)``
    with the 0/0 at ``||v_g|| = 0`` resolved to scale 0 (the group is
    already at the prox's fixed point).
    """
    if weights is None:
        w = None
    else:
        w = jnp.asarray(weights, jnp.float32)
        if w.shape != (n_groups,):
            raise ValueError(f"group_weights must have shape "
                             f"({n_groups},), got {w.shape}")

    if kind == "block":
        gs = data

        def prox(v, theta):
            n = v.shape[0]
            vb = v.reshape(n, n_groups, gs)
            sq = jnp.sum(jnp.square(vb), axis=-1)               # [N, G]
            nz = sq > 0.0
            # double-where: sqrt'(0) = inf would NaN reverse-mode through
            # zeroed groups (e.g. unrolled autodiff of the solve)
            norms = jnp.where(nz, jnp.sqrt(jnp.where(nz, sq, 1.0)), 0.0)
            th = theta if w is None else theta * w
            scale = jnp.where(
                nz, jnp.maximum(1.0 - th / jnp.where(nz, norms, 1.0), 0.0),
                0.0)
            return (vb * scale[..., None]).reshape(n, n_components)

        return prox

    ids = data
    # one-hot membership [K, G]: per-group sums and the per-coordinate
    # scatter-back are MXU matmuls (exact in f32 — entries are 0/1)
    member = jnp.asarray(np.eye(n_groups, dtype=np.float32)[ids])

    def prox(v, theta):
        sq = jnp.square(v)
        gsq = jnp.matmul(sq, member, precision=lax.Precision.HIGHEST)
        nz = gsq > 0.0
        # double-where (see the block branch): keep reverse-mode finite
        # through zeroed groups
        norms = jnp.where(nz, jnp.sqrt(jnp.where(nz, gsq, 1.0)), 0.0)
        th = theta if w is None else theta * w
        scale = jnp.where(
            nz, jnp.maximum(1.0 - th / jnp.where(nz, norms, 1.0), 0.0),
            0.0)
        coord_scale = jnp.matmul(scale, member.T,
                                 precision=lax.Precision.HIGHEST)
        return v * coord_scale

    return prox


def _l1_engaged(l1_alpha):
    """Whether the l1 term participates (concrete-zero scalars skip the
    extra shrink entirely; traced values always engage it)."""
    if isinstance(l1_alpha, jax.core.Tracer):
        return True
    return bool(np.any(np.asarray(l1_alpha) != 0.0))


def group_soft_threshold(v, theta, groups, weights=None):
    """prox of ``theta * sum_g w_g ||.||_2`` over groups of the last axis
    of a [N, K] array (blockwise soft threshold / group shrink)."""
    kind, data, n_groups = resolve_groups(groups, v.shape[-1])
    prox = _make_group_prox(kind, data, n_groups, v.shape[-1], weights)
    return prox(v, theta)


def group_lasso_objective(x, weight, z, alpha, groups, weights=None,
                          l1_alpha=0.0, precision=None):
    """``0.5||zW^T - x||^2 + alpha sum_g w_g ||z_g|| + l1_alpha ||z||_1``
    (total over the batch, not per-sample-mean)."""
    prec = get_precision(precision)
    kind, data, n_groups = resolve_groups(groups, weight.shape[1])
    resid = jnp.matmul(z, weight.T, precision=prec) - x
    def _safe_sqrt(sq):
        # double-where: keep the objective reverse-differentiable at
        # exactly-zeroed groups (sqrt'(0) = inf otherwise)
        nz = sq > 0.0
        return jnp.where(nz, jnp.sqrt(jnp.where(nz, sq, 1.0)), 0.0)

    if kind == "block":
        zb = z.reshape(z.shape[0], n_groups, data)
        norms = _safe_sqrt(jnp.sum(jnp.square(zb), axis=-1))
    else:
        member = jnp.asarray(np.eye(n_groups, dtype=np.float32)[data])
        norms = _safe_sqrt(jnp.matmul(jnp.square(z), member,
                                      precision=lax.Precision.HIGHEST))
    w = jnp.ones((n_groups,)) if weights is None else jnp.asarray(weights)
    # sum(l1_alpha * |z|) also covers the internal per-sample [N, 1] form
    pen = alpha * jnp.sum(norms * w) + jnp.sum(l1_alpha * jnp.abs(z))
    return 0.5 * jnp.sum(jnp.square(resid)) + pen


def group_ista(x, z0, weight, alpha=1.0, groups=None, group_weights=None,
               l1_alpha=0.0, fast=True, lr="auto", maxiter=100, tol=1e-5,
               power_iters=500, precision=None, axis_name=None,
               restart=False, use_pallas="auto", fuse_steps="auto",
               kernel_precision="f32", mixed_tail="auto",
               mixed_tail_iters=None, verbose=False, return_iters=False):
    """(F)ISTA for the batched group lasso / sparse-group lasso.

    Problem: ``min_z 0.5||z W^T - x||^2 + alpha sum_g w_g ||z_g||_2
    + l1_alpha ||z||_1`` with x [N, D], W [D, K], z [N, K] and ``groups``
    partitioning the K coordinates (int block size or [K] id array —
    see :func:`resolve_groups`). ``group_weights`` defaults to uniform;
    pass ``sqrt(group size)`` for the classical Yuan-Lin weighting of
    ragged groups.

    The smooth part is the same RSS as plain lasso, so ``lr='auto'`` is
    the identical ``1/L`` power-iteration step; only the prox changes
    (group shrink, preceded by the l1 shrink when ``l1_alpha > 0`` —
    the exact sparse-group prox composition). Iteration structure,
    convergence semantics (global ``sum|dz| <= numel * tol``,
    psum-reduced under ``axis_name``), ``restart`` (per-row O'Donoghue-
    Candes momentum restart), ``verbose`` and ``return_iters`` all match
    :func:`lasso_tpu.linear.solvers.ista`.

    ``alpha`` may be a scalar or an [N]-vector of per-sample penalties
    (the group norm is 1-homogeneous, so the same row-rescaling
    reduction as plain lasso applies exactly; ``l1_alpha`` is scaled by
    the same per-sample factor). Per-feature [1, K] alphas are NOT
    accepted — per-coordinate weighting inside a group changes the prox;
    use ``group_weights`` for per-group penalties.

    ``use_pallas='auto'``: on TPU backends with aligned shapes the
    iteration runs as the S-step fused Pallas kernel of
    :mod:`lasso_tpu.ops.fused_group` (group prox via one-hot MXU
    matmuls, iterates resident in VMEM across ``fuse_steps``
    sub-iterations — the same multi-step-fusion lever as plain
    :func:`~lasso_tpu.linear.solvers.ista.ista`, with the identical
    ``kernel_precision`` 'f32'/'bf16'/'mixed' continuation and
    ``mixed_tail``). The kernel checks convergence at S-step block
    boundaries, so it never stops before the unfused path would.

    Returns codes ``z`` [N, K]; with ``return_iters=True`` also the
    executed iteration count (device scalar).
    """
    from lasso_tpu.ops.common import per_sample_alpha_column

    n_components = weight.shape[1]
    a_arr = jnp.asarray(alpha)
    if a_arr.ndim == 2:
        raise ValueError("group_ista takes scalar or per-sample [N] "
                         "alpha; use group_weights for per-group "
                         "penalties")
    a_col = per_sample_alpha_column(alpha, x.shape[0])
    if a_col is not None:
        # row rescale to the alpha=1 problem (1-homogeneous penalty);
        # the l1 term picks up a per-sample [N, 1] threshold, which the
        # elementwise soft_threshold broadcasts natively
        a_col = a_col.astype(x.dtype)
        if jnp.asarray(l1_alpha).ndim != 0:
            raise ValueError("l1_alpha must be a scalar")
        l1_scaled = (l1_alpha / a_col
                     if _l1_engaged(l1_alpha) else 0.0)
        out = group_ista(
            x / a_col, z0 / a_col, weight, 1.0, groups=groups,
            group_weights=group_weights, l1_alpha=l1_scaled,
            fast=fast, lr=lr, maxiter=maxiter, tol=tol,
            power_iters=power_iters, precision=precision,
            axis_name=axis_name, restart=restart, use_pallas=use_pallas,
            fuse_steps=fuse_steps, kernel_precision=kernel_precision,
            mixed_tail=mixed_tail, mixed_tail_iters=mixed_tail_iters,
            verbose=verbose, return_iters=return_iters)
        if return_iters:
            z_u, k = out
            return z_u * a_col, k
        return out * a_col

    # Pad-and-mask onto the fused kernel's lane grid when only alignment
    # blocks it (exact: zero feature rows / batch rows as in
    # ops.common.pad_lasso_operands; padded zero ATOMS are assigned to
    # group 0, where they contribute exactly 0 to the group norm — the
    # real coordinates' shrink scale is unchanged and the padded ones
    # stay 0 under any multiplicative prox). tol is rescaled so the
    # global numel * tol threshold keeps the ORIGINAL numel. verbose is
    # excluded (the printed loss divides by the padded batch size).
    if not verbose and groups is not None:
        from lasso_tpu.ops.common import (pad_lasso_operands,
                                          resolve_pallas)
        from lasso_tpu.ops.fused_group import supports_fused_group_step
        _k0, _d0, _ng0 = resolve_groups(groups, n_components)
        _pad = (None if supports_fused_group_step(x, z0, weight, _ng0)
                else pad_lasso_operands(x, z0, weight))
        if (_pad is not None
                and supports_fused_group_step(_pad[0], _pad[1], _pad[2],
                                              _ng0)
                and resolve_pallas(use_pallas, True)[0]):
            x_p, z0_p, w_p, _, (N0, K0) = _pad
            ids_p = np.zeros((w_p.shape[1],), np.int32)
            ids_p[:K0] = (np.repeat(np.arange(_ng0, dtype=np.int32), _d0)
                          if _k0 == "block" else np.asarray(_d0, np.int32))
            l1_p = l1_alpha
            if jnp.asarray(l1_alpha).ndim == 2:
                l1_p = jnp.pad(jnp.asarray(l1_alpha),
                               ((0, x_p.shape[0] - N0), (0, 0)),
                               constant_values=1.0)
            out = group_ista(
                x_p, z0_p, w_p, alpha, groups=ids_p,
                group_weights=group_weights, l1_alpha=l1_p, fast=fast,
                lr=lr, maxiter=maxiter,
                tol=tol * (N0 * K0) / z0_p.size,
                power_iters=power_iters, precision=precision,
                axis_name=axis_name, restart=restart,
                use_pallas=use_pallas, fuse_steps=fuse_steps,
                kernel_precision=kernel_precision,
                mixed_tail=mixed_tail, mixed_tail_iters=mixed_tail_iters,
                return_iters=return_iters)
            if return_iters:
                z_u, k = out
                return z_u[:N0, :K0], k
            return out[:N0, :K0]

    kind, data, n_groups = resolve_groups(groups, n_components)
    gprox = _make_group_prox(kind, data, n_groups, n_components,
                             group_weights)
    l1_arr = jnp.asarray(l1_alpha)
    if l1_arr.ndim not in (0, 2):
        raise ValueError("l1_alpha must be a scalar (internal per-sample "
                         "column allowed)")
    use_l1 = _l1_engaged(l1_alpha)

    def prox(v, lr_val):
        if use_l1:
            v = soft_threshold(v, l1_arr * lr_val)
        return gprox(v, alpha * lr_val)

    prec = get_precision(precision)
    if isinstance(lr, str):
        if lr != "auto":
            raise ValueError(f"invalid lr {lr!r}")
        L = lipschitz_constant(weight, maxiter=power_iters, precision=prec)
        lr = 1.0 / L
    lr = jnp.asarray(lr, x.dtype)
    tol_total = z0.size * tol
    if axis_name is not None:
        tol_total = lax.psum(jnp.asarray(tol_total, x.dtype), axis_name)

    # ---- fused-kernel routing (ops/fused_group) -------------------------
    from lasso_tpu.linear.solvers.ista import _resolve_tail_iters
    from lasso_tpu.ops.common import resolve_pallas
    from lasso_tpu.ops.fused_group import (build_membership,
                                           fused_group_fista_multistep,
                                           pad_group_count,
                                           supports_fused_group_step)
    if kernel_precision not in ("f32", "bf16", "mixed"):
        raise ValueError(f"kernel_precision must be 'f32', 'bf16' or "
                         f"'mixed', got {kernel_precision!r}")
    if mixed_tail_iters is not None and kernel_precision != "mixed":
        raise ValueError("mixed_tail_iters requires "
                         "kernel_precision='mixed'")
    # the kernel takes a scalar l1 threshold; the per-sample-alpha
    # rescale turns l1_alpha into an [N, 1] column -> XLA fallback
    fusable = (supports_fused_group_step(x, z0, weight, n_groups)
               and l1_arr.ndim == 0)
    fused, interpret = resolve_pallas(use_pallas, fusable)
    if verbose:
        S = 1   # per-iteration loss prints live in the XLA body
    elif fuse_steps == "auto":
        if fused:
            S = next((s for s in range(min(32, maxiter), 0, -1)
                      if maxiter % s == 0), 1)
            if S < 8:
                S = min(16, maxiter)
        else:
            S = 1
    else:
        S = max(1, int(fuse_steps)) if fused else 1
    S = min(S, maxiter)

    if fused and S > 1:
        ids_full = (np.repeat(np.arange(n_groups, dtype=np.int32), data)
                    if kind == "block" else data)
        m_fwd, m_bwd = build_membership(ids_full, n_groups)
        g_pad = pad_group_count(n_groups)
        w_row = (jnp.ones((n_groups,), jnp.float32) if group_weights is None
                 else jnp.asarray(group_weights, jnp.float32))
        thg_row = jnp.zeros((1, g_pad), jnp.float32).at[0, :n_groups].set(
            jnp.asarray(alpha, jnp.float32)
            * jnp.asarray(lr, jnp.float32) * w_row)
        l1_th = jnp.asarray(l1_alpha, jnp.float32) \
            * jnp.asarray(lr, jnp.float32)
    # ---------------------------------------------------------------------

    def rss_grad(z_k):
        resid = jnp.matmul(z_k, weight.T, precision=prec) - x
        return jnp.matmul(resid, weight, precision=prec)

    def loss_print(z):
        lv = group_lasso_objective(x, weight, z, alpha, groups,
                                   weights=group_weights,
                                   l1_alpha=l1_alpha,
                                   precision=precision) / x.shape[0]
        jax.debug.print("loss: {l:.4f}", l=lv)

    if restart:
        if not fast:
            raise ValueError("restart=True requires fast=True")

        def body_r(state):
            z, z_prev, t_vec, k, _ = state
            if verbose:
                loss_print(z)
            t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t_vec * t_vec)) * 0.5
            y = z + ((t_vec - 1.0) / t_next) * (z - z_prev)
            z_new = prox(y - lr * rss_grad(y), lr)
            rdot = jnp.sum((y - z_new) * (z_new - z), axis=1,
                           keepdims=True)
            t_new = jnp.where(rdot > 0, 1.0, t_next)
            delta = jnp.sum(jnp.abs(z_new - z))
            if axis_name is not None:
                delta = lax.psum(delta, axis_name)
            return (z_new, z, t_new, k + 1, delta <= tol_total)

        def cond_r(state):
            _, _, _, k, done = state
            return jnp.logical_and(jnp.logical_not(done), k < maxiter)

        t0_vec = jnp.zeros((x.shape[0], 1), jnp.float32)
        state = (z0, z0, t0_vec, jnp.asarray(0), jnp.asarray(False))

        if fused and S > 1:
            def make_rm(kp, limit, steps):
                def cond_rm(st):
                    _, _, _, k, done = st
                    return jnp.logical_and(jnp.logical_not(done),
                                           k + steps <= limit)

                def body_rm(st):
                    z, z_prev, t_vec, k, _ = st
                    z_new, z_pen, t_new, delta = \
                        fused_group_fista_multistep(
                            x, z, z_prev, weight, lr, thg_row, l1_th,
                            jnp.zeros((steps,)), m_fwd, m_bwd,
                            steps=steps, interpret=interpret,
                            kernel_precision=kp,
                            t_vec=t_vec, use_l1=use_l1)
                    if axis_name is not None:
                        delta = lax.psum(delta, axis_name)
                    return (z_new, z_pen, t_new, k + steps,
                            delta <= tol_total)

                return cond_rm, body_rm

            if kernel_precision == "mixed":
                # full S-blocks + one remainder block per phase — the
                # same sub-block-tail structure as linear ista
                # (mixed_tail_iters opens any iteration split)
                tail_iters = _resolve_tail_iters(
                    mixed_tail, mixed_tail_iters, maxiter, S)
                n_bf16 = maxiter - tail_iters
                state = lax.while_loop(*make_rm("bf16", n_bf16, S), state)
                r1 = n_bf16 % S
                if r1:
                    state = lax.while_loop(*make_rm("bf16", n_bf16, r1),
                                           state)
                state = state[:4] + (jnp.asarray(False),)
                S_t = min(S, tail_iters)
                r2 = tail_iters % S_t
                state = lax.while_loop(*make_rm("f32", maxiter - r2, S_t),
                                       state)
                if r2:
                    state = lax.while_loop(*make_rm("f32", maxiter, r2),
                                           state)
            else:
                c, b = make_rm(kernel_precision, maxiter, S)
                state = lax.while_loop(c, b, state)

        z, _, _, k, _ = lax.while_loop(cond_r, body_r, state)
        if return_iters:
            return z, k
        return z

    def cond(state):
        _, _, _, _, k, done = state
        return jnp.logical_and(jnp.logical_not(done), k < maxiter)

    def body(state):
        z, z_prev, t, mom, k, _ = state
        if verbose:
            loss_print(z)
        y = z + mom * (z - z_prev)
        z_next = prox(y - lr * rss_grad(y), lr)
        delta = jnp.sum(jnp.abs(z - z_next))
        if axis_name is not None:
            delta = lax.psum(delta, axis_name)
        if fast:
            t_next = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
            mom_next = (t - 1) / t_next
        else:
            t_next, mom_next = t, mom
        return (z_next, z, t_next, mom_next, k + 1, delta <= tol_total)

    t0 = jnp.asarray(1.0, x.dtype)
    mom0 = jnp.asarray(0.0, x.dtype)
    init = (z0, z0, t0, mom0, jnp.asarray(0), jnp.asarray(False))

    if fused and S > 1:
        def make_multi(kp, limit, steps):
            def cond_multi(state):
                _, _, _, _, k, done = state
                return jnp.logical_and(jnp.logical_not(done),
                                       k + steps <= limit)

            def body_multi(state):
                z, z_prev, t, mom, k, _ = state
                # unroll the (data-independent) t/momentum recurrence
                mom_list = []
                t_c, m_c = t, mom
                for _ in range(steps):
                    mom_list.append(m_c)
                    if fast:
                        t_n = (1 + jnp.sqrt(1 + 4 * t_c * t_c)) / 2
                        m_c = (t_c - 1) / t_n
                        t_c = t_n
                z_next, z_pen, delta = fused_group_fista_multistep(
                    x, z, z_prev, weight, lr, thg_row, l1_th,
                    jnp.stack(mom_list), m_fwd, m_bwd, steps=steps,
                    interpret=interpret, kernel_precision=kp,
                    use_l1=use_l1)
                if axis_name is not None:
                    delta = lax.psum(delta, axis_name)
                return (z_next, z_pen, t_c, m_c, k + steps,
                        delta <= tol_total)

            return cond_multi, body_multi

        if kernel_precision == "mixed":
            # full S-blocks + one remainder block per phase (sub-block
            # f32 tails via mixed_tail_iters — see linear ista)
            tail_iters = _resolve_tail_iters(
                mixed_tail, mixed_tail_iters, maxiter, S)
            n_bf16 = maxiter - tail_iters
            st = lax.while_loop(*make_multi("bf16", n_bf16, S), init)
            r1 = n_bf16 % S
            if r1:
                st = lax.while_loop(*make_multi("bf16", n_bf16, r1), st)
            # bf16-grade convergence statistic: drop it so the f32 tail
            # always runs (never stops earlier than an all-f32 run)
            st = st[:5] + (jnp.asarray(False),)
            S_t = min(S, tail_iters)
            r2 = tail_iters % S_t
            st = lax.while_loop(*make_multi("f32", maxiter - r2, S_t), st)
            if r2:
                st = lax.while_loop(*make_multi("f32", maxiter, r2), st)
            init = st
        else:
            c, b = make_multi(kernel_precision, maxiter, S)
            init = lax.while_loop(c, b, init)

    z, _, _, _, k, _ = lax.while_loop(cond, body, init)
    if return_iters:
        return z, k
    return z
