"""Batched coordinate descent, two variants.

TPU-native rebuild of /root/reference/lasso/linear/solvers/coordinate_descent.py.

``coord_descent`` — Li & Osher's greedy CD: per sample, update the
coordinate with the largest candidate change each iteration. The
reference's dynamically-shrinking active-sample set (cd.py:40-48) becomes a
converged *mask* under XLA (static shapes; masked lanes ride along for
free on the VPU).

``coord_descent_mod`` — the cyclic, sklearn-compatible variant with a
per-sample duality-gap stopping test (cd.py:57-138). The reference's
``z0`` handling has a shape bug (cd.py:73-75 validates z0 against
``[n_features, n_components]`` where ``[n_samples, n_components]`` is
meant); we implement the correct shape and document the divergence here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from lasso_tpu.config import get_precision
from lasso_tpu.ops.shrink import (soft_threshold,
                                  soft_threshold_nonneg)


def coord_descent(x, W, z0=None, alpha=1.0, maxiter=1000, tol=1e-6,
                  precision=None, use_pallas="auto", kernel_precision="f32",
                  fuse_steps=8, nonneg=False, l2=0.0, verbose=False,
                  return_iters=False):
    """Greedy batched CD (reference cd.py:5-54).

    x: [N, D], W: [D, K] -> z: [N, K]

    ``verbose`` prints the lasso objective of ``softshrink(b, alpha)``
    per iteration (reference cd.py:49-50) and forces the unfused XLA
    path (the fused kernel runs ``fuse_steps`` iterations per
    invocation). ``return_iters`` also returns the executed iteration
    count (device scalar).

    On TPU backends the hot loop runs as a fused Pallas kernel
    (:mod:`lasso_tpu.ops.fused_cd`): the data-dependent row gather
    ``S[k, :]`` becomes a one-hot MXU matmul against a VMEM-resident S,
    and ``fuse_steps`` iterations run per kernel invocation. The
    per-sample active-set logic moves in-kernel, so fusion preserves the
    reference's stopping semantics exactly (inactive samples are frozen).
    ``use_pallas``: 'auto' / True / False as in :func:`ista`.

    ``kernel_precision``: 'f32' (default), 'bf16' (native MXU gather,
    ~1.6x, bf16-grade codes), or 'mixed' — precision continuation for
    CD: the first ~75% of the budget runs bf16; at the phase switch
    ``b`` is REBUILT from the invariant ``b = x W + z (I - W^T W)`` in
    f32 (repairing the bf16 phase's accumulated rank-1 rounding in one
    pair of matmuls) and every row is reactivated; the f32 tail then
    re-polishes the largest-error coordinates and re-applies the exact
    stopping test. Requires the fused path (plain XLA runs f32).
    ``alpha`` may also be an [N]-vector of per-sample penalties (exact
    via lasso homogeneity — see ista's docstring and
    ops.common.per_sample_alpha_column) or a [1, K] row of per-feature
    penalties, threaded natively as an elementwise shrink threshold
    (ops.common.per_feature_alpha_row); the per-sample deactivation
    threshold acts in penalty-normalized units only for the [N] form.

    ``l2 > 0`` solves the ELASTIC NET (+ 0.5*l2*||z||^2, TPU
    extension): for unit-norm atoms the exact coordinate minimizer is
    ``shrink(b_k, alpha)/(1 + l2)``; the b-invariant is l2-independent,
    so the greedy machinery (and the fused kernel) is otherwise
    unchanged.
    """
    from lasso_tpu.ops.common import (per_feature_alpha_row,
                                      per_sample_alpha_column)
    a_row = per_feature_alpha_row(alpha, W.shape[1], x.shape[0])
    if a_row is not None:
        # threads NATIVELY: greedy CD's coordinate update is
        # shrink(b_k, a_k) (exact coordinate minimizer for unit-norm
        # atoms), so the row broadcasts through the XLA path and rides
        # the fused kernel as a VMEM threshold row. (Column rescaling
        # would break the unit-norm assumption S = I - W^T W rests on.)
        alpha = a_row.astype(jnp.float32)
    a_col = (None if a_row is not None
             else per_sample_alpha_column(alpha, x.shape[0]))
    if a_col is not None:
        a_col = a_col.astype(x.dtype)
        out = coord_descent(
            x / a_col, W, None if z0 is None else z0 / a_col, 1.0,
            maxiter=maxiter, tol=tol, precision=precision,
            use_pallas=use_pallas, kernel_precision=kernel_precision,
            fuse_steps=fuse_steps, nonneg=nonneg, l2=l2, verbose=verbose,
            return_iters=return_iters)
        if return_iters:
            z_u, it = out
            return z_u * a_col, it
        return out * a_col

    from lasso_tpu.ops.fused_cd import fused_cd_steps, supports_fused_cd

    # Pad-and-mask onto the fused kernel's (K % 128, N % 8) grid when
    # the problem is unaligned but the padded one fits (exactness:
    # ops.common.pad_lasso_operands — zero atoms give b_k = 0, so
    # shrink(b_k) - z_k = 0 and the greedy argmax never selects them;
    # zero rows deactivate with dz = 0). The per-sample deactivation
    # threshold tol * K is rescaled to the ORIGINAL K. verbose already
    # forces the unfused path, so padding is skipped there.
    if not verbose:
        import jax as _jax
        from lasso_tpu.ops.common import (pad_lasso_operands,
                                          resolve_pallas)
        _b_s = _jax.ShapeDtypeStruct((x.shape[0], W.shape[1]), x.dtype)
        _pad = (None if supports_fused_cd(_b_s, W)
                else pad_lasso_operands(x, z0, W, alpha))
        if _pad is not None:
            _b_p = _jax.ShapeDtypeStruct(
                (_pad[0].shape[0], _pad[2].shape[1]), x.dtype)
            if (supports_fused_cd(_b_p, _pad[2])
                    and resolve_pallas(use_pallas, True)[0]):
                x_p, z0_p, w_p, a_p, (N0, K0) = _pad
                out = coord_descent(
                    x_p, w_p, z0_p, alpha if a_p is None else a_p,
                    maxiter=maxiter,
                    tol=tol * K0 / w_p.shape[1],
                    precision=precision, use_pallas=use_pallas,
                    kernel_precision=kernel_precision,
                    fuse_steps=fuse_steps, nonneg=nonneg, l2=l2,
                    return_iters=return_iters)
                if return_iters:
                    z_u, it = out
                    return z_u[:N0, :K0], it
                return out[:N0, :K0]

    prec = get_precision(precision)
    input_dim, code_dim = W.shape
    batch_size = x.shape[0]
    assert x.shape[1] == input_dim
    tol_k = tol * code_dim

    # S = I - W^T W (symmetric)
    S = jnp.eye(code_dim, dtype=W.dtype) - jnp.matmul(W.T, W, precision=prec)

    if z0 is None:
        z0 = jnp.zeros((batch_size, code_dim), dtype=x.dtype)
        b0 = jnp.matmul(x, W, precision=prec)
    else:
        assert z0.shape == (batch_size, code_dim)
        # maintain the CD invariant b = x W + z (I - W^T W): the
        # reference leaves b = x W for any z0 (open TODO at cd.py:16-18),
        # which silently treats a warm start as inconsistent state —
        # with the invariant, z0 at the solution converges immediately
        # (docs/DIVERGENCES.md #17)
        b0 = jnp.matmul(x, W, precision=prec) \
            + jnp.matmul(z0, S, precision=prec)

    rows = jnp.arange(batch_size)

    def cond(state):
        _, _, active, k = state
        return jnp.logical_and(jnp.any(active), k < maxiter)

    prox = soft_threshold_nonneg if nonneg else soft_threshold
    # elastic-net coordinate contraction: shrink(b_k, alpha)/(1 + l2) is
    # the exact coordinate minimizer for unit-norm atoms (1 for l2=0)
    cd_scale = 1.0 / (1.0 + jnp.asarray(l2, x.dtype))

    def body(state):
        z, b, active, it = state
        z_cand = prox(b, alpha) * cd_scale
        if verbose:
            # per-iteration loss of softshrink(b, alpha) (cd.py:49-50)
            resid_v = jnp.matmul(z_cand, W.T, precision=prec) - x
            loss_v = (0.5 * jnp.sum(jnp.square(resid_v))
                      + jnp.sum(alpha * jnp.abs(z_cand))
                      + 0.5 * l2 * jnp.sum(jnp.square(z_cand)))
            jax.debug.print("iter {i} - loss: {l:.4f}", i=it, l=loss_v)
        diff = z_cand - z
        k = jnp.argmax(jnp.abs(diff), axis=1)                  # [N]
        dz = jnp.take_along_axis(diff, k[:, None], axis=1)     # [N, 1]
        # S is symmetric, so S[:, k].T == S[k, :]
        b_new = b + S[k, :] * dz
        z_new = z.at[rows, k].set(
            jnp.take_along_axis(z_cand, k[:, None], axis=1)[:, 0])
        # only one coordinate changes per sample: per-sample update = |dz|
        update = jnp.abs(dz)[:, 0]
        active_new = jnp.logical_and(active, update > tol_k)

        mask = active[:, None]
        b_out = jnp.where(mask, b_new, b)
        z_out = jnp.where(mask, z_new, z)
        return (z_out, b_out, active_new, it + 1)

    from lasso_tpu.ops.common import resolve_pallas
    fused, interpret = resolve_pallas(
        use_pallas, not verbose and supports_fused_cd(b0, W))

    T = max(1, int(fuse_steps)) if fused else 1

    if kernel_precision not in ("f32", "bf16", "mixed"):
        raise ValueError(f"kernel_precision must be 'f32', 'bf16' or "
                         f"'mixed', got {kernel_precision!r}")

    state = (z0, b0, jnp.ones((batch_size,), dtype=bool), jnp.asarray(0))

    if fused and T > 1:
        def make_f(kp, limit):
            def cond_f(state):
                _, _, act, it = state
                return jnp.logical_and(jnp.any(act[:, 0] > 0),
                                       it + T <= limit)

            def body_f(state):
                z, b, act, it = state
                b_new, z_new, act_new = fused_cd_steps(
                    b, z, act, S, alpha, tol_k, steps=T,
                    interpret=interpret, kernel_precision=kp,
                    nonneg=nonneg, l2=l2)
                return (z_new, b_new, act_new, it + T)

            return cond_f, body_f

        init_f = (z0, b0, jnp.ones((batch_size, 1), jnp.float32),
                  jnp.asarray(0))
        if kernel_precision == "mixed":
            bulk = (max(1, (3 * maxiter) // 4) // T) * T
            c1, b1 = make_f("bf16", bulk)
            z_c, b_c, act_c, it_c = lax.while_loop(c1, b1, init_f)
            # phase switch: rebuild b from the invariant in f32 and
            # reactivate every row — the bf16 phase's active-set
            # decisions and accumulated b rounding are both discarded
            b_c = jnp.matmul(x, W, precision=prec) \
                + jnp.matmul(z_c, S, precision=prec)
            st = (z_c, b_c, jnp.ones((batch_size, 1), jnp.float32), it_c)
            c2, b2 = make_f("f32", maxiter)
            z_c, b_c, act_c, it_c = lax.while_loop(c2, b2, st)
        else:
            c, b_fn = make_f(kernel_precision, maxiter)
            z_c, b_c, act_c, it_c = lax.while_loop(c, b_fn, init_f)
        state = (z_c, b_c, act_c[:, 0] > 0, it_c)

    z, b, _, it = lax.while_loop(cond, body, state)
    zf = prox(b, alpha) * cd_scale
    if return_iters:
        return zf, it
    return zf


def coord_descent_mod(x, W, z0=None, alpha=1.0, max_iter=1000, tol=1e-4,
                      l2=0.0, precision=None, use_pallas="auto",
                      return_iters=False):
    """Cyclic CD with duality-gap convergence (reference cd.py:57-138).

    Returns ``(z, gap)`` with ``gap`` the per-sample duality gap at the last
    convergence check (plus the executed sweep count when
    ``return_iters``). Slower but certifiably accurate — its gap oracle is
    also reused by the test suite as a solver-independent certificate.

    On TPU the K-component cyclic sweep runs as one Pallas kernel per
    sweep (residual and transposed codes resident in VMEM, atoms fetched
    by dynamic sublane loads — :func:`lasso_tpu.ops.fused_cd.
    fused_cd_mod_sweep`); the duality-gap check between sweeps stays in
    XLA. Identical arithmetic to the unfused sweep.

    ``l2 > 0`` solves the ELASTIC NET (+ 0.5*l2*||z||^2, TPU
    extension): this is the sklearn ``enet_coordinate_descent`` beta
    term the reference's port dropped — the coordinate denominator
    becomes ``||w_j||^2 + l2`` and the duality gap takes the enet form
    (XtA gains ``-l2*z``, the gap the
    ``0.5*l2*(1+const^2)*||z||^2`` term).
    """
    from lasso_tpu.ops.common import resolve_pallas
    from lasso_tpu.ops.fused_cd import (fused_cd_mod_sweep,
                                        supports_fused_cd_mod)
    prec = get_precision(precision)
    n_features, n_components = W.shape
    n_samples = x.shape[0]
    assert x.shape[1] == n_features

    if z0 is None:
        z0 = jnp.zeros((n_samples, n_components), dtype=x.dtype)
    else:
        # NOTE: correct [n_samples, n_components]; the reference's shape
        # check here is buggy (cd.py:73-75)
        assert z0.shape == (n_samples, n_components)

    d_w_tol = tol
    tol_per_sample = tol * jnp.sum(jnp.square(x), axis=1)      # [N]
    norm_cols_X = jnp.sum(jnp.square(W), axis=0)               # [K]

    def check_convergence(z, R, tol_s):
        """Per-sample duality gap (reference cd.py:87-99); with
        ``l2 > 0`` the elastic-net form (sklearn enet_coordinate_descent:
        XtA gains -l2*z and the gap the 0.5*l2*(1+const^2)*||z||^2
        term)."""
        XtA = jnp.matmul(R, W, precision=prec) - l2 * z        # [N, K]
        dual_norm = jnp.max(jnp.abs(XtA), axis=1)              # [N]
        R_norm2 = jnp.sum(jnp.square(R), axis=1)               # [N]
        small = dual_norm <= alpha
        const = jnp.where(small, 1.0, alpha / jnp.where(small, 1.0, dual_norm))
        gap = jnp.where(small, R_norm2, 0.5 * R_norm2 * (1 + const ** 2))
        gap = gap + alpha * jnp.sum(jnp.abs(z), axis=1) \
            - const * jnp.sum(R * x, axis=1) \
            + 0.5 * l2 * (1 + const ** 2) * jnp.sum(jnp.square(z), axis=1)
        return gap < tol_s, gap

    R0 = x - jnp.matmul(z0, W.T, precision=prec)

    def sweep_component(i, carry):
        """One cyclic component update over all non-converged samples."""
        z, R, z_max, d_z_max, converged = carry
        atom = W[:, i]                                         # [D]
        col_ok = norm_cols_X[i] != 0
        active = jnp.logical_and(jnp.logical_not(converged), col_ok)  # [N]

        z_i = z[:, i]
        # add back current contribution for active samples with z_i != 0
        add_mask = jnp.logical_and(active, z_i != 0)
        R1 = R + jnp.where(add_mask, z_i, 0.0)[:, None] * atom[None, :]

        rho = jnp.matmul(R1, atom, precision=prec)             # [N]
        z_i_new = soft_threshold(rho, alpha) \
            / (jnp.where(col_ok, norm_cols_X[i], 1.0) + l2)
        z_i_new = jnp.where(active, z_i_new, z_i)

        sub_mask = jnp.logical_and(active, z_i_new != 0)
        R2 = R1 - jnp.where(sub_mask, z_i_new, 0.0)[:, None] * atom[None, :]

        z_new = z.at[:, i].set(z_i_new)
        d_z_max = jnp.where(active,
                            jnp.maximum(d_z_max, jnp.abs(z_i_new - z_i)),
                            d_z_max)
        z_max = jnp.where(active, jnp.maximum(z_max, jnp.abs(z_i_new)), z_max)
        return (z_new, R2, z_max, d_z_max, converged)

    def cond(state):
        _, _, _, converged, n_iter = state
        return jnp.logical_and(jnp.logical_not(jnp.all(converged)),
                               n_iter < max_iter)

    fused_sweep, interpret = resolve_pallas(
        use_pallas, supports_fused_cd_mod(z0, W))

    def body(state):
        z, R, gap, converged, n_iter = state
        if fused_sweep:
            z, R, z_max, d_z_max = fused_cd_mod_sweep(
                z, R, converged, W, norm_cols_X, alpha, l2=l2,
                interpret=interpret)
        else:
            z_max0 = jnp.zeros((n_samples,), x.dtype)
            d_z_max0 = jnp.zeros((n_samples,), x.dtype)
            z, R, z_max, d_z_max, _ = lax.fori_loop(
                0, n_components, sweep_component,
                (z, R, z_max0, d_z_max0, converged))

        # reference cd.py:132-137: gap check only for samples whose sweep
        # stalled (or on the final iteration)
        check = (z_max == 0) | (d_z_max / jnp.where(z_max == 0, 1.0, z_max)
                                < d_w_tol) | (n_iter == max_iter - 1)
        check = jnp.logical_and(check, jnp.logical_not(converged))
        conv_new, gap_new = check_convergence(z, R, tol_per_sample)
        converged = jnp.where(check, conv_new, converged)
        gap = jnp.where(check, gap_new, gap)
        return (z, R, gap, converged, n_iter + 1)

    gap0 = jnp.full((n_samples,), tol + 1.0, x.dtype)
    converged0 = jnp.zeros((n_samples,), bool)
    z, R, gap, converged, n_it = lax.while_loop(
        cond, body, (z0, R0, gap0, converged0, jnp.asarray(0)))
    if return_iters:
        return z, gap, n_it
    return z, gap
