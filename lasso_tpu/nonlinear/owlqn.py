"""OWL-QN: orthant-wise limited-memory quasi-Newton for nonlinear lasso.

TPU-native rebuild of /root/reference/lasso/nonlinear/owlqn.py. The
reference's ``L_BFGS`` object keeps Python lists of (s, y, rho) pairs
(owlqn.py:7-51); under XLA the memory is a fixed-size circular buffer of
``[history, numel]`` arrays, the two-loop recursion is a pair of
``fori_loop``s masked on the fill count, and curvature-rejected updates
(owlqn.py:38-40) simply skip the buffer write. The whole optimizer is one
``lax.while_loop`` over a pure carried state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from lasso_tpu.linalg.line_search import golden_section


def project(x, y):
    """Zero entries of x whose sign disagrees with y (owlqn.py:54-55)."""
    return jnp.where(jnp.sign(x) != jnp.sign(y), 0.0, x)


def pseudo_grad(x, grad_f, alpha):
    """Orthant-wise pseudo-gradient (owlqn.py:58-65)."""
    grad_r = alpha * jnp.sign(x)
    at_zero = x == 0
    grad_right = grad_f + jnp.where(at_zero, alpha, grad_r)
    grad_left = grad_f + jnp.where(at_zero, -alpha, grad_r)
    pgrad = jnp.zeros_like(x)
    pgrad = jnp.where(grad_right < 0, grad_right, pgrad)
    pgrad = jnp.where(grad_left > 0, grad_left, pgrad)
    return pgrad


class LbfgsState(NamedTuple):
    s_hist: jnp.ndarray    # [m, n]
    y_hist: jnp.ndarray    # [m, n]
    rho: jnp.ndarray       # [m]
    h_diag: jnp.ndarray    # scalar
    head: jnp.ndarray      # next write slot
    count: jnp.ndarray     # number of valid entries
    x_prev: jnp.ndarray    # [n]
    g_prev: jnp.ndarray    # [n]


def lbfgs_init(x, g, history_size):
    n = x.size
    return LbfgsState(
        s_hist=jnp.zeros((history_size, n), x.dtype),
        y_hist=jnp.zeros((history_size, n), x.dtype),
        rho=jnp.zeros((history_size,), x.dtype),
        h_diag=jnp.asarray(1.0, x.dtype),
        head=jnp.asarray(0),
        count=jnp.asarray(0),
        x_prev=x.ravel(),
        g_prev=g.ravel(),
    )


def lbfgs_solve(state, d):
    """Two-loop recursion (owlqn.py:20-32) over the circular buffer."""
    m = state.s_hist.shape[0]
    shape = d.shape
    q = d.ravel()

    def slot(i):
        # i-th newest entry: i=0 is the most recent
        return (state.head - 1 - i) % m

    def bwd(i, carry):
        q, alphas = carry
        idx = slot(i)
        valid = i < state.count
        a = jnp.where(valid, state.rho[idx] * jnp.dot(state.s_hist[idx], q),
                      0.0)
        q = q - a * state.y_hist[idx]
        return (q, alphas.at[idx].set(a))

    q, alphas = lax.fori_loop(0, m, bwd, (q, jnp.zeros((m,), q.dtype)))
    q = q * state.h_diag

    def fwd(j, q):
        # oldest to newest: j=0 is the oldest valid entry
        i = state.count - 1 - j          # newest-index of this entry
        idx = slot(i)
        valid = j < state.count
        b = jnp.where(valid, state.rho[idx] * jnp.dot(state.y_hist[idx], q),
                      0.0)
        return q + jnp.where(valid, alphas[idx] - b, 0.0) * state.s_hist[idx]

    q = lax.fori_loop(0, m, fwd, q)
    return q.reshape(shape)


def lbfgs_update(state, x, g):
    """Curvature-guarded memory update (owlqn.py:34-51)."""
    s = x.ravel() - state.x_prev
    y = g.ravel() - state.g_prev
    rho_inv = jnp.dot(y, s)
    ok = rho_inv > 1e-10

    head = state.head
    s_hist = jnp.where(ok, state.s_hist.at[head].set(s), state.s_hist)
    y_hist = jnp.where(ok, state.y_hist.at[head].set(y), state.y_hist)
    rho = jnp.where(ok, state.rho.at[head].set(
        1.0 / jnp.where(ok, rho_inv, 1.0)), state.rho)
    m = state.s_hist.shape[0]
    return LbfgsState(
        s_hist=s_hist,
        y_hist=y_hist,
        rho=rho,
        h_diag=jnp.where(ok, rho_inv / (jnp.dot(y, y) + 1e-30), state.h_diag),
        head=jnp.where(ok, (head + 1) % m, head),
        count=jnp.where(ok, jnp.minimum(state.count + 1, m), state.count),
        x_prev=jnp.where(ok, x.ravel(), state.x_prev),
        g_prev=jnp.where(ok, g.ravel(), state.g_prev),
    )


def _owlqn_per_sample(fun_vec, x0, alpha, lr, max_iter, xtol,
                      history_size, ls_maxiter, return_iters,
                      line_search="brent", ls_options=None):
    """Per-row OWL-QN: batched circular-buffer L-BFGS where every
    cross-sample reduction of the batch core becomes a per-row one.

    ``fun_vec``: [B, K] -> [B] per-row smooth losses. Rejected curvature
    updates and frozen (converged) rows write INERT slots (s = y = 0,
    rho = 0 — exact no-ops in the two-loop recursion), so the buffer
    head/count stay row-uniform and the recursion needs no per-row
    indexing. All three line searches are supported: 'brent'
    (vmapped golden section), 'backtrack' (per-row Armijo test with a
    per-row step vector; accepted rows freeze their t while the rest
    keep shrinking), and 'none' (reference owlqn.py:139-146 init step).
    """
    if ls_options is None:
        ls_options = {}
    ls_tol = ls_options.get("tol", 0.1)
    ls_decay = ls_options.get("decay", 0.95)
    ls_bt_maxiter = ls_options.get("maxiter", 500)
    B, K = x0.shape
    m = history_size
    grad_fun = jax.grad(lambda z: jnp.sum(fun_vec(z)))

    def evaluate(x):
        f = fun_vec(x) + alpha * jnp.sum(jnp.abs(x), axis=1)   # [B]
        g = grad_fun(x)
        return f, g, pseudo_grad(x, g, alpha)

    f0, g0, gp0 = evaluate(x0)

    def solve(s_hist, y_hist, rho, h_diag, head, count, d):
        # two-loop recursion, per-row dot products; inert slots no-op
        q = d

        def slot(i):
            return (head - 1 - i) % m

        def bwd(i, carry):
            q, alphas = carry
            idx = slot(i)
            a = rho[idx] * jnp.sum(s_hist[idx] * q, axis=1)    # [B]
            return (q - a[:, None] * y_hist[idx], alphas.at[idx].set(a))

        q, alphas = lax.fori_loop(0, m, bwd,
                                  (q, jnp.zeros((m, B), q.dtype)))
        q = q * h_diag[:, None]

        def fwd(j, q):
            idx = slot(count - 1 - j)
            b = rho[idx] * jnp.sum(y_hist[idx] * q, axis=1)    # [B]
            return q + (alphas[idx] - b)[:, None] * s_hist[idx]

        return lax.fori_loop(0, m, fwd, q)

    def body(state):
        (x, f, g, gp, s_hist, y_hist, rho, h_diag, head, count,
         x_prev, g_prev, t_init, k, done_prev) = state
        v = -gp
        d = solve(s_hist, y_hist, rho, h_diag, head, count, v)
        d = project(d, v)
        eta = jnp.where(x == 0, jnp.sign(v), jnp.sign(x))

        def f_at(t):                                           # [B] -> [B]
            x_new = project(x + t[:, None] * d, eta)
            return fun_vec(x_new) + alpha * jnp.sum(jnp.abs(x_new), axis=1)

        if line_search == "brent":
            t, _ = golden_section(f_at, jnp.zeros((B,), x.dtype),
                                  jnp.full((B,), 10.0, x.dtype),
                                  maxiter=ls_maxiter)
        elif line_search == "backtrack":
            # per-row Armijo backtracking (batch core above, rowized):
            # each row shrinks its own t until its own sufficient-decrease
            # test passes; accepted rows freeze their t
            def bt_cond(s):
                _, j, ok = s
                return jnp.logical_and(jnp.logical_not(jnp.all(ok)),
                                       j < ls_bt_maxiter)

            def bt_body(s):
                t, j, ok_prev = s
                x_new = project(x + t[:, None] * d, eta)
                ok = f_at(t) <= f - ls_tol * jnp.sum(
                    v * (x_new - x), axis=1)
                ok = jnp.logical_or(ok_prev, ok)
                return (jnp.where(ok, t, t * ls_decay), j + 1, ok)

            t, _, _ = lax.while_loop(
                bt_cond, bt_body,
                (t_init, 0, jnp.zeros((B,), bool)))
        else:   # 'none': fixed per-row init step (reference owlqn.py:139-146)
            t = t_init

        keep = done_prev[:, None]
        x_new = jnp.where(keep, x, project(x + t[:, None] * d, eta))
        delta = jnp.linalg.norm(x_new - x, axis=1)             # [B]
        f_new, g_new, gp_new = evaluate(x_new)
        done = done_prev | (delta <= xtol)

        # curvature-guarded per-row memory write; frozen rows have s = 0
        # and are rejected automatically
        s = x_new - x_prev
        y = g_new - g_prev
        rho_inv = jnp.sum(y * s, axis=1)                       # [B]
        ok = rho_inv > 1e-10
        s_hist = s_hist.at[head].set(jnp.where(ok[:, None], s, 0.0))
        y_hist = y_hist.at[head].set(jnp.where(ok[:, None], y, 0.0))
        rho = rho.at[head].set(
            jnp.where(ok, 1.0 / jnp.where(ok, rho_inv, 1.0), 0.0))
        h_diag = jnp.where(
            ok, rho_inv / (jnp.sum(y * y, axis=1) + 1e-30), h_diag)
        x_prev = jnp.where(ok[:, None], x_new, x_prev)
        g_prev = jnp.where(ok[:, None], g_new, g_prev)
        return (x_new, f_new, g_new, gp_new, s_hist, y_hist, rho, h_diag,
                (head + 1) % m, jnp.minimum(count + 1, m),
                x_prev, g_prev, jnp.full((B,), lr, x0.dtype), k + 1, done)

    def cond(state):
        k, done = state[-2], state[-1]
        return jnp.logical_and(jnp.logical_not(jnp.all(done)),
                               k < max_iter)

    # per-row first-step init (batch core's t0, rowized)
    t0_vec = jnp.clip(lr / (jnp.sum(jnp.abs(gp0), axis=1) + 1e-30),
                      None, lr).astype(x0.dtype)
    init = (x0, f0, g0, gp0,
            jnp.zeros((m, B, K), x0.dtype), jnp.zeros((m, B, K), x0.dtype),
            jnp.zeros((m, B), x0.dtype), jnp.ones((B,), x0.dtype),
            jnp.asarray(0), jnp.asarray(0),
            x0, g0, t0_vec, jnp.asarray(0), jnp.zeros((B,), bool))
    out = lax.while_loop(cond, body, init)
    x, k, done = out[0], out[-2], out[-1]
    if return_iters:
        # per-row effective iteration count is not tracked (rows freeze
        # in place); return the shared loop count like the batch mode,
        # broadcast per row for shape consistency
        return x, jnp.broadcast_to(k, (B,))
    return x


def owlqn(fun, x0, alpha=1.0, lr=1.0, max_iter=20, xtol=1e-5,
          history_size=100, line_search="brent", ls_options=None,
          ls_maxiter=30, per_sample=False, verbose=0, return_iters=False):
    """OWL-QN (reference owlqn.py:80-198).

    fun: traceable ``x -> scalar`` smooth loss (the l1 term is added here
    and excluded from gradients, as in the reference).

    ``per_sample=True`` upgrades the reference's whole-batch coupling —
    one flattened L-BFGS memory, one line-search step, and one ``||dx||``
    stop shared across the batch — to fully independent per-sample solves:
    each row gets its own [history, K] memory, line-search step, and
    stopping test; converged rows freeze. The contract changes with it:
    ``fun`` must then map [B, K] -> [B] PER-ROW losses (so each row's
    line search can see its own objective; a scalar batch-sum cannot be
    decomposed from outside). All three line searches are supported
    ('brent' golden section, 'backtrack' per-row Armijo, 'none').
    Default False for reference parity.

    ``verbose`` mirrors the reference (owlqn.py:128-129, 183-185,
    195-197): >=1 prints initial/final f and iterations, >1 adds a
    per-iteration f / ||dx|| line (batch mode only).
    """
    verbose = int(verbose)
    assert x0.ndim == 2
    if line_search not in ("brent", "backtrack", "none"):
        raise ValueError("invalid line_search")
    if per_sample:
        return _owlqn_per_sample(fun, x0, alpha, lr, max_iter, xtol,
                                 history_size, ls_maxiter, return_iters,
                                 line_search=line_search,
                                 ls_options=ls_options)
    if ls_options is None:
        ls_options = {}
    ls_tol = ls_options.get("tol", 0.1)
    ls_decay = ls_options.get("decay", 0.95)
    ls_bt_maxiter = ls_options.get("maxiter", 500)

    grad_fun = jax.grad(fun)

    def evaluate(x):
        f = fun(x) + alpha * jnp.sum(jnp.abs(x))
        g = grad_fun(x)
        return f, g, pseudo_grad(x, g, alpha)

    f0, g0, gp0 = evaluate(x0)
    lb0 = lbfgs_init(x0, g0, history_size)
    t0 = jnp.clip(lr / (jnp.sum(jnp.abs(gp0)) + 1e-30), None, lr)

    def body(state):
        x, f, g, g_pseudo, lb, t_init, k, _ = state
        v = -g_pseudo
        d = lbfgs_solve(lb, v)
        d = project(d, v)
        eta = jnp.where(x == 0, jnp.sign(v), jnp.sign(x))

        def f_at(t):
            x_new = project(x + t * d, eta)
            return fun(x_new) + alpha * jnp.sum(jnp.abs(x_new))

        if line_search == "brent":
            t, _ = golden_section(f_at, 0.0, 10.0, maxiter=ls_maxiter)
        elif line_search == "backtrack":
            def bt_cond(s):
                t, j, done = s
                return jnp.logical_and(jnp.logical_not(done),
                                       j < ls_bt_maxiter)

            def bt_body(s):
                t, j, _ = s
                x_new = project(x + t * d, eta)
                ok = f_at(t) <= f - ls_tol * jnp.sum(v * (x_new - x))
                return (jnp.where(ok, t, t * ls_decay), j + 1, ok)

            t, _, _ = lax.while_loop(bt_cond, bt_body,
                                     (t_init, 0, jnp.asarray(False)))
        else:
            t = t_init

        x_new = project(x + t * d, eta)
        delta = jnp.linalg.norm((x_new - x).ravel())
        f_new, g_new, gp_new = evaluate(x_new)
        if verbose > 1:
            # per-iteration line (owlqn.py:183-185; ls_iters omitted —
            # the golden-section search has a fixed trial count)
            jax.debug.print("iter {k} - f: {f:.4f} - dx: {d:.3e}",
                            k=k + 1, f=f_new, d=delta)
        done = delta <= xtol
        # hessian update skipped once converged (reference breaks first)
        lb_new = lbfgs_update(lb, x_new, g_new)
        t_next = jnp.asarray(lr, x.dtype)
        return (x_new, f_new, g_new, gp_new, lb_new, t_next, k + 1, done)

    def cond(state):
        _, _, _, _, _, _, k, done = state
        return jnp.logical_and(jnp.logical_not(done), k < max_iter)

    if verbose:
        jax.debug.print("initial f: {f:.4f}", f=f0)
    init = (x0, f0, g0, gp0, lb0, t0, jnp.asarray(0), jnp.asarray(False))
    x, f_fin, _, _, _, _, k, _ = lax.while_loop(cond, body, init)
    if verbose:
        jax.debug.print(
            "         Current function value: {f}\n"
            "         Iterations: {k}", f=f_fin, k=k)
    if return_iters:
        return x, k
    return x
