"""Nonlinear FISTA: sparse coding through an arbitrary differentiable decoder.

TPU-native rebuild of /root/reference/lasso/nonlinear/ista.py. The decoder
is any traceable function ``z -> x_hat`` (e.g. a flax module's apply bound
to its params); torch-specific machinery in the reference
(`_freeze_grad`/eval-mode bookkeeping, nl/ista.py:7-19,62-66) has no JAX
counterpart — functions are pure, parameters are never mutated.

* the RSS gradient (nl/ista.py:77-82) is ``jax.grad`` of the residual loss;
* the per-sample dynamic step size 0.98/L with L from Hessian power
  iteration (nl/ista.py:26-52, 86-94) uses ``jax.jvp`` of the gradient
  (HVP) — one fused forward-over-reverse pass per power iteration instead
  of the reference's double-backward round trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from lasso_tpu.ops.shrink import soft_threshold

softshrink = soft_threshold  # non-scalar-theta variant (nl/ista.py:21-23)


def _normalize(v, axes):
    n = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
    return v / (n + 1e-8)


def hessian_2norm(fun, x, niter=10, key=None, u0=None,
                  return_vector=False):
    """Per-sample Hessian 2-norm of a scalar ``fun`` by power iteration
    (reference nl/ista.py:26-52). ``x``: [B, ...]; returns [B].

    ``u0`` warm-starts the iteration (the top eigenvector drifts slowly
    along a FISTA trajectory, so a carried vector needs far fewer
    iterations than a random restart); ``return_vector=True`` also
    returns the final iterate for the next warm start.
    """
    assert x.ndim >= 2
    feature_axes = tuple(range(1, x.ndim))
    if key is None:
        key = jax.random.PRNGKey(0)

    grad_fun = jax.grad(fun)
    hvp = lambda v: jax.jvp(grad_fun, (x,), (v,))[1]

    if u0 is None:
        u0 = _normalize(jax.random.normal(key, x.shape, x.dtype),
                        feature_axes)

    def body(_, uv):
        u, _ = uv
        v = _normalize(hvp(u), feature_axes)
        u_new = _normalize(hvp(v), feature_axes)
        return (u_new, v)

    u, v = lax.fori_loop(0, niter, body, (u0, u0))
    sigma = jnp.sum(v * hvp(u), axis=feature_axes)
    if return_vector:
        return sigma, u
    return sigma


def ista_nl(x, z0, decoder, alpha=1.0, fast=True, maxiter=10, lr="auto",
            power_iters=10, tol=1e-5, key=None, lr_refresh=1,
            restart=False, axis_name=None, verbose=0, return_iters=False):
    """Nonlinear (F)ISTA (reference nl/ista.py:55-128).

    decoder: traceable ``z -> x_hat`` with output shape matching ``x``.

    ``verbose`` mirrors the reference (nl/ista.py:97-98, 109-110): >=1
    prints the initial lasso loss, >1 adds a per-iteration loss line.

    ``lr_refresh`` (auto-lr only): recompute the per-sample Hessian-norm
    power iteration every ``lr_refresh`` steps and reuse the cached step
    size in between. The reference recomputes every step
    (nl/ista.py:86-94) — that is ``lr_refresh=1``, the parity default —
    but the local curvature of a smooth decoder drifts slowly along the
    FISTA trajectory, so a modest refresh interval (4-8) buys back most
    of the fixed-lr throughput at near-identical trajectories (measured
    ~2x on the BASELINE #5 MLP decoder; docs/DIVERGENCES.md).

    ``restart=True``: per-sample adaptive momentum restart (O'Donoghue &
    Candes), the same lever as the linear solver's — each sample carries
    its own t-sequence and resets it when its gradient-mapping test
    fires. Requires ``fast=True``; off by default for reference parity.

    ``axis_name``: when the batch axis is sharded inside ``jax.shard_map``
    (the decoder must be per-sample, i.e. batched elementwise over rows),
    pass the mesh axis name so the reference's batch-global stopping sum
    (nl/ista.py:106-108) psum-reduces across shards. The RSS gradient and
    the per-sample Hessian power iteration are row-local already.
    """
    verbose = int(verbose)
    if not (lr == "auto" or isinstance(lr, (int, float))):
        raise ValueError('expected `lr` to be either float or "auto".')
    lr_refresh = max(1, int(lr_refresh))
    tol_total = z0.size * tol
    if axis_name is not None:
        tol_total = lax.psum(jnp.asarray(tol_total, x.dtype), axis_name)
    auto_lr = lr == "auto"
    if key is None:
        key = jax.random.PRNGKey(0)

    def rss_loss(zk):
        return 0.5 * jnp.sum(jnp.square(decoder(zk) - x))

    rss_grad = jax.grad(rss_loss)

    def lasso_loss(zk):
        return rss_loss(zk) + alpha * jnp.sum(jnp.abs(zk))

    feat_axes_all = tuple(range(1, z0.ndim))

    def compute_lr(zk):
        L = hessian_2norm(rss_loss, zk, niter=power_iters, key=key)
        t = 0.98 / L
        return t.reshape(t.shape + (1,) * (zk.ndim - 1))   # [B, 1, ...]

    def compute_lr_warm(zk, u0):
        # lr_refresh > 1 is already a documented divergence zone
        # (DIVERGENCES #15): warm-start the power iteration from the
        # previous refresh's eigenvector — the top Hessian direction
        # drifts slowly along the trajectory, so a carried vector
        # converges in far fewer iterations than a random restart
        L, u = hessian_2norm(rss_loss, zk, niter=power_iters, key=key,
                             u0=u0, return_vector=True)
        t = 0.98 / L
        return t.reshape(t.shape + (1,) * (zk.ndim - 1)), u

    def refresh_or_keep(k, at, lr_c, u_c):
        if lr_refresh == 1:
            return compute_lr(at), u_c         # parity cadence
        return lax.cond(
            k % lr_refresh == 0,
            lambda args: compute_lr_warm(args[0], args[1]),
            lambda args: (lr_c, args[1]),
            (at, u_c))

    def step(zk, lr_k):
        g = rss_grad(zk)
        return soft_threshold(zk - lr_k * g, alpha * lr_k)

    def cond(state):
        _, _, _, _, _, k, done = state
        return jnp.logical_and(jnp.logical_not(done), k < maxiter)

    def body(state):
        z, y, lr_c, u_c, t, k, _ = state
        at = y if fast else z
        if auto_lr:
            lr_k, u_new = refresh_or_keep(k, at, lr_c, u_c)
        else:
            lr_k, u_new = lr_c, u_c
        z_next = step(at, lr_k)
        delta = jnp.sum(jnp.abs(z - z_next))
        if axis_name is not None:
            delta = lax.psum(delta, axis_name)
        done = delta <= tol_total
        if fast:
            t_next = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
            y_next = z_next + ((t - 1) / t_next) * (z_next - z)
        else:
            t_next, y_next = t, z_next
        if verbose > 1:
            # per-iteration loss (reference nl/ista.py:117-118)
            jax.debug.print("iter {k} - loss: {l:.4f}",
                            k=k + 1, l=lasso_loss(z_next))
        return (z_next, y_next, lr_k, u_new, t_next, k + 1, done)

    if verbose:
        jax.debug.print("initial loss: {l:.4f}", l=lasso_loss(z0))
    lr0 = (jnp.ones((z0.shape[0],) + (1,) * (z0.ndim - 1), x.dtype)
           if auto_lr else jnp.asarray(lr, x.dtype))
    if auto_lr and lr_refresh > 1:
        u0_carry = _normalize(
            jax.random.normal(key, z0.shape, z0.dtype), feat_axes_all)
    else:
        u0_carry = jnp.zeros((1,), x.dtype)    # structural placeholder

    if restart:
        if not fast:
            raise ValueError("restart=True requires fast=True")
        feat_axes = tuple(range(1, z0.ndim))

        def body_r(state):
            z, z_prev, lr_c, u_c, t_vec, k, _ = state
            t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t_vec * t_vec)) * 0.5
            y = z + ((t_vec - 1.0) / t_next) * (z - z_prev)
            if auto_lr:
                lr_k, u_new = refresh_or_keep(k, y, lr_c, u_c)
            else:
                lr_k, u_new = lr_c, u_c
            z_new = step(y, lr_k)
            rdot = jnp.sum((y - z_new) * (z_new - z), axis=feat_axes,
                           keepdims=True)
            t_new = jnp.where(rdot > 0, 1.0, t_next)
            delta = jnp.sum(jnp.abs(z_new - z))
            if axis_name is not None:
                delta = lax.psum(delta, axis_name)
            done = delta <= tol_total
            if verbose > 1:
                jax.debug.print("iter {k} - loss: {l:.4f}",
                                k=k + 1, l=lasso_loss(z_new))
            return (z_new, z, lr_k, u_new, t_new, k + 1, done)

        t0 = jnp.zeros((z0.shape[0],) + (1,) * (z0.ndim - 1), x.dtype)
        init = (z0, z0, lr0, u0_carry, t0, jnp.asarray(0),
                jnp.asarray(False))
        z, _, _, _, _, k, _ = lax.while_loop(cond, body_r, init)
        if verbose:
            jax.debug.print("final loss: {l:.4f}", l=lasso_loss(z))
        if return_iters:
            return z, k
        return z

    init = (z0, z0, lr0, u0_carry, jnp.asarray(1.0, x.dtype),
            jnp.asarray(0), jnp.asarray(False))
    z, _, _, _, _, k, _ = lax.while_loop(cond, body, init)
    if verbose:
        jax.debug.print("final loss: {l:.4f}", l=lasso_loss(z))
    if return_iters:
        return z, k
    return z
