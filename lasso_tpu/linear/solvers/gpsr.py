"""GPSR-Basic: gradient projection for sparse reconstruction.

TPU-native rebuild of /root/reference/lasso/linear/solvers/gpsr.py
(Figueiredo et al. 2007): the positive/negative split turns the lasso into
a bound-constrained QP solved by projected gradient steps with Armijo
backtracking, optional continuation over a tau ladder, and an optional
masked-CG debiasing phase.

Like the reference, GPSR treats the whole batch as one flattened problem
(global inner products and a batch-shared step size, gpsr.py:257) — a
documented behavioral quirk the test suite pins down.

Structural changes vs the reference (math preserved):
* outer GP iteration and inner Armijo search are nested ``lax.while_loop``s
  with device-resident stopping criteria (the 5 criteria of gpsr.py:85-117
  are selected statically);
* the continuation ladder (gpsr.py:282-295) computes its tau factors with
  jnp so a traced ``tau`` works; the ladder itself is a static Python loop;
* the trivial-solution early return for ``tau >= ||A^T y||_inf``
  (gpsr.py:276-279) becomes a final ``jnp.where`` select.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

_INF = float("inf")


def _dot(u, v):
    return jnp.sum(u * v)


def _gpsr_core(x0, u0, v0, y, tau, A, AT, Ay, mu, lambda_backtrack,
               maxiter, miniter, tol, stop_criterion, ls_maxiter=50,
               verbose=False):
    """Inner GP loop (reference gpsr.py:9-129). Returns (x, u, v, n_iter)."""
    relu = lambda a: jnp.maximum(a, 0.0)

    resid0 = y - A(x0)
    f0 = 0.5 * _dot(resid0, resid0) + tau * (jnp.sum(u0) + jnp.sum(v0))
    nz0 = x0 != 0
    verbose = int(verbose)
    if verbose:
        # initial-objective report (reference gpsr.py:23-24)
        jax.debug.print("Initial obj = {f:.6e}, nz = {n}",
                        f=f0, n=jnp.sum(nz0))

    def cond(state):
        (x, u, v, f, prev_f, nz_x, resid_base, n_iter, done) = state
        return jnp.logical_not(done)

    def body(state):
        (x, u, v, f, prev_f, nz_x, resid_base, n_iter, _) = state

        resid = y - resid_base
        tmp = AT(resid_base) - Ay
        gradu = tmp + tau
        gradv = -tmp + tau
        old_u, old_v = u, v

        # first-guess step from conditional gradients (gpsr.py:36-40)
        condgradu = jnp.where((old_u <= 0) & (gradu >= 0), 0.0, gradu)
        condgradv = jnp.where((old_v <= 0) & (gradv >= 0), 0.0, gradv)
        auv_cond = A(condgradu - condgradv)
        lambd0 = (_dot(gradu, condgradu) + _dot(gradv, condgradv)) \
            / (_dot(auv_cond, auv_cond) + 1e-7)

        # Armijo backtracking on the projected step (gpsr.py:43-63)
        def trial(lambd):
            du = relu(u - lambd * gradu) - u
            dv = relu(v - lambd * gradv) - v
            u_new = u + du
            v_new = v + dv
            x_new = x + (du - dv)
            rb_new = A(x_new)
            r_new = y - rb_new
            f_new = 0.5 * _dot(r_new, r_new) \
                + tau * (jnp.sum(u_new) + jnp.sum(v_new))
            ok = f_new <= f + mu * (_dot(gradu, du) + _dot(gradv, dv))
            return (u_new, v_new, x_new, rb_new, f_new, du, dv), ok

        def ls_cond(s):
            lambd, _, ok, k = s
            return jnp.logical_and(jnp.logical_not(ok), k < ls_maxiter)

        def ls_body(s):
            lambd, _, _, k = s
            out, ok = trial(lambd)
            lambd_next = jnp.where(ok, lambd, lambd * lambda_backtrack)
            if verbose > 1:
                # inner line-search report (reference gpsr.py:62-63):
                # printed only when the step is rejected and lambda shrinks
                lax.cond(ok, lambda l: None,
                         lambda l: jax.debug.print(
                             "    line-search reducing lambda to {l:.2e}",
                             l=l), lambd_next)
            return (lambd_next, out, ok, k + 1)

        # cheap init carry (never used: the loop body always runs once)
        dummy = (u, v, x, resid_base, f, jnp.zeros_like(u), jnp.zeros_like(v))
        lambd_acc, (u_new, v_new, x_new, rb_new, f_new, du, dv), _, _ = \
            lax.while_loop(ls_cond, ls_body,
                           (lambd0, dummy, jnp.asarray(False), 0))

        # min-shift (gpsr.py:67-69)
        uvmin = jnp.minimum(u_new, v_new)
        u_out = u_new - uvmin
        v_out = v_new - uvmin
        x_out = u_out - v_out
        dx = x_out - x

        nz_prev = nz_x
        nz_new = x_out != 0
        num_nz = jnp.sum(nz_new)

        n_iter_new = n_iter + 1

        if verbose:
            # per-iteration report (reference gpsr.py:79-82): objective,
            # accepted step size, support size
            jax.debug.print(
                "It = {i}, obj = {f:.5e}, lambda = {l:.2e}, nz = {n}",
                i=n_iter_new, f=f_new, l=lambd_acc, n=num_nz)

        # stopping criterion (static selection; gpsr.py:85-117)
        if stop_criterion == 0:
            criterion = jnp.where(
                num_nz >= 1,
                jnp.sum(nz_new != nz_prev).astype(x.dtype),
                -jnp.inf)
        elif stop_criterion == 1:
            criterion = jnp.abs(f_new - f) / f
        elif stop_criterion == 2:
            criterion = jnp.linalg.norm(dx.ravel()) \
                / (jnp.linalg.norm(x_out.ravel()) + 1e-30)
        elif stop_criterion == 3:
            tmp_u = jnp.minimum(gradu, old_u)
            tmp_v = jnp.minimum(gradv, old_v)
            numer = jnp.maximum(jnp.max(jnp.abs(tmp_u)),
                                jnp.max(jnp.abs(tmp_v)))
            denom = jnp.maximum(jnp.max(jnp.abs(old_u)),
                                jnp.max(jnp.abs(old_v)))
            criterion = numer / jnp.clip(denom, 1e-6, None)
        elif stop_criterion == 4:
            criterion = f_new
        else:
            raise ValueError("Unknown stopping criterion")

        if verbose:
            # criterion-name/value/target line (reference gpsr.py:119-121);
            # the name is static because the criterion is selected statically
            criterion_name = {0: "d_nz", 1: "d_f", 2: "||d_x|| / ||x||",
                              3: "LCP", 4: "f"}[stop_criterion]
            jax.debug.print(
                "    " + criterion_name + " = {c:e} (target = {t:e})",
                c=criterion, t=tol)

        done = jnp.logical_and(n_iter_new > miniter, criterion <= tol)
        done = jnp.logical_or(done, n_iter_new >= maxiter)

        return (x_out, u_out, v_out, f_new, f, nz_new, rb_new,
                n_iter_new, done)

    init = (x0, u0, v0, f0, f0, nz0, y - resid0,
            jnp.asarray(0), jnp.asarray(False))
    x, u, v, f, _, _, _, n_iter, _ = lax.while_loop(cond, body, init)
    return x, u, v, n_iter


def _debias(x, y, tau, A, AT, tol=1e-4, miniter=0, maxiter=500):
    """CG restricted to the nonzero support of x (reference gpsr.py:132-206).

    The reference skips debiasing when x has no nonzeros or too many; that
    data-dependent skip becomes a final select.
    """
    is_zero = x == 0
    num_nz = jnp.sum(~is_zero)
    skip = jnp.logical_or(num_nz > y.size, num_nz == 0)

    resid0 = A(x) - y
    rvec0 = jnp.where(is_zero, 0.0, AT(resid0))
    rtr0 = _dot(rvec0, rvec0)
    cg_tol = tol * rtr0
    pvec0 = -rvec0

    def cond(state):
        _, _, _, _, rtr, k, done = state
        return jnp.logical_not(done)

    def body(state):
        x, resid, rvec, pvec, rtr, k, _ = state
        RWp = A(pvec)
        Ap = jnp.where(is_zero, 0.0, AT(RWp))
        alpha_cg = rtr / (_dot(pvec, Ap) + 1e-30)
        x_new = x + alpha_cg * pvec
        resid_new = resid + alpha_cg * RWp
        rvec_new = rvec + alpha_cg * Ap
        rtr_new = _dot(rvec_new, rvec_new)
        beta = rtr_new / (rtr + 1e-30)
        pvec_new = -rvec_new + beta * pvec
        k_new = k + 1
        keep_going = jnp.logical_or(
            k_new <= miniter,
            jnp.logical_and(rtr_new > cg_tol, k_new <= maxiter))
        return (x_new, resid_new, rvec_new, pvec_new, rtr_new, k_new,
                jnp.logical_not(keep_going))

    xf, *_ = lax.while_loop(
        cond, body,
        (x, resid0, rvec0, pvec0, rtr0, jnp.asarray(0), skip))
    return jnp.where(skip, x, xf)


def gpsr_basic(y, A, tau, AT=None, x0=None, stop_criterion=3, tol=1e-2,
               maxiter=1000, miniter=5, init=0, continuation=False,
               debias=False, cont_steps=5, first_tau_factor=None,
               mu=0.1, lambda_backtrack=0.5, tol_debias=1e-4,
               maxiter_debias=500, miniter_debias=0, key=None,
               per_sample=False, verbose=False, return_iters=False,
               **kwargs):
    """GPSR-Basic front-end (reference gpsr.py:209-365).

    ``A``/``AT`` are matvec closures over the flattened batch (built by
    ``sparse_encode`` for the dense-dictionary case), or ``A`` may be a
    dense matrix for 1-D problems.

    ``per_sample=True`` (batched ``y`` only) upgrades the reference's
    whole-batch coupling — global dot products, one shared Armijo step,
    one shared stopping test (gpsr.py:257) — to fully independent
    per-sample solves (vmapped core: per-sample step sizes, line
    searches, continuation ladders, and stopping; converged samples
    freeze). The debias phase, when enabled, is also vmapped per sample
    (independent support masks, CG stops, and skip decisions).
    Default False for reference parity.

    ``verbose`` prints the reference's per-iteration report line
    (objective, accepted step, support size; gpsr.py:79-82) — batch
    mode only. ``return_iters`` also returns the total GP iteration
    count across the continuation ladder.
    """
    if stop_criterion not in (0, 1, 2, 3, 4):
        raise ValueError("Unknown stopping criterion")

    if callable(A):
        if not callable(AT):
            raise ValueError("The function handle for transpose of A is missing")
    else:
        A_mat = A
        AT = lambda v: jnp.matmul(A_mat.T, v)
        A = lambda v: jnp.matmul(A_mat, v)

    Ay = AT(y)

    if x0 is not None:
        x = x0
    elif init == 0:
        x = jnp.zeros_like(Ay)
    elif init == 1:
        if key is None:
            key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, Ay.shape, Ay.dtype)
    elif init == 2:
        x = Ay
    else:
        raise ValueError("Unknown initialization option")

    per_sample = per_sample and y.ndim == 2

    # trivial-solution check (gpsr.py:276-279): data-dependent -> resolve
    # with a final select instead of an early return
    if per_sample:
        max_tau = jnp.max(jnp.abs(Ay), axis=1)      # [N]
    else:
        max_tau = jnp.max(jnp.abs(Ay))
    trivial = tau >= max_tau

    # continuation ladder (gpsr.py:282-295)
    if continuation:
        if first_tau_factor is None:
            ftf = 0.8 * max_tau / tau
        else:
            ftf = jnp.where(first_tau_factor * tau >= max_tau,
                            0.8 * max_tau / tau,
                            jnp.asarray(first_tau_factor, Ay.dtype))
        exps = jnp.linspace(jnp.log10(ftf), 0.0, cont_steps)
        cont_factors = 10.0 ** exps
        n_steps = cont_steps
    else:
        cont_factors = jnp.ones((1,), Ay.dtype)
        n_steps = 1

    u = jnp.maximum(x, 0.0)
    v = jnp.maximum(-x, 0.0)

    def _final_summary(x_cur, label=""):
        # reference gpsr.py:325-333 / 354-362: after the continuation
        # ladder (and again after debias) print the final objective and
        # support size
        r = y - A(x_cur)
        f = 0.5 * _dot(r, r) + tau * jnp.sum(jnp.abs(x_cur))
        jax.debug.print(
            label + "Final obj = {f:.6e}, nz = {n}",
            f=f, n=jnp.sum(x_cur != 0))

    n_iter_total = 0
    for i in range(n_steps):
        tau_i = tau * cont_factors[i]
        is_last = i + 1 == n_steps
        tol_i = tol if is_last else 1e-3
        crit_i = stop_criterion if is_last else 3
        if per_sample:
            # verbose is not supported inside the vmapped per-sample core
            # (a debug.print per sample per iteration is unreadable)
            core = jax.vmap(
                lambda x_, u_, v_, y_, Ay_, t_, _tol=tol_i, _crit=crit_i:
                _gpsr_core(x_, u_, v_, y_, t_, A, AT, Ay_, mu,
                           lambda_backtrack, maxiter, miniter, _tol, _crit))
            tau_vec = jnp.broadcast_to(jnp.asarray(tau_i, Ay.dtype),
                                       (y.shape[0],))
            x, u, v, n_it = core(x, u, v, y, Ay, tau_vec)
        else:
            x, u, v, n_it = _gpsr_core(
                x, u, v, y, tau_i, A, AT, Ay, mu, lambda_backtrack,
                maxiter, miniter, tol_i, crit_i, verbose=verbose)
        n_iter_total = n_iter_total + n_it

    if verbose and not per_sample:
        _final_summary(x)

    if debias:
        if per_sample:
            # per-sample masked-CG debias: each sample gets its own
            # support mask, CG tolerance ladder, and skip decision
            # (num_nz_i == 0 or > D), completing the per-sample upgrade —
            # the batch-global version couples step sizes across rows
            x = jax.vmap(
                lambda x_, y_: _debias(x_, y_, tau, A, AT, tol=tol_debias,
                                       miniter=miniter_debias,
                                       maxiter=maxiter_debias))(x, y)
        else:
            x = _debias(x, y, tau, A, AT, tol=tol_debias,
                        miniter=miniter_debias, maxiter=maxiter_debias)
            if verbose:
                _final_summary(x, label="debiased: ")

    if per_sample:
        xf = jnp.where(trivial[:, None], jnp.zeros_like(x), x)
    else:
        xf = jnp.where(trivial, jnp.zeros_like(x), x)
    if return_iters:
        return xf, n_iter_total
    return xf
