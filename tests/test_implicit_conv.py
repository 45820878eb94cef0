"""Implicit differentiation through the CONV lasso solution.

Mirrors tests/test_implicit.py for the conv path, all in x64: central
finite differences of a downstream scalar w.r.t. x, kernel, and every
alpha shape; full agreement with unrolled autodiff through an explicit
``lax.scan`` conv FISTA; support-mask guards; a stride/padding variant.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from lasso_tpu.conv2d import (conv2d, conv_transpose2d,
                              make_implicit_conv_encoder)
from lasso_tpu.ops.shrink import soft_threshold


def _problem(seed=11, n=4, cx=2, cz=6, hw=8, k=3):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((cz, cx, k, k))
    W /= np.sqrt((W ** 2).sum(axis=(1, 2, 3), keepdims=True))
    x = rng.standard_normal((n, cx, hw, hw))
    return x, W, rng


LR = 0.09        # 0.95/L, Araujo bound L~11.1 for this filter bank
SOLVE = dict(maxiter=4000, tol=0.0, lr=LR)
PAD = 1      # same-size codes with k=3


def _unrolled_conv_fista(x, W, alpha, iters=4000, lr=LR, stride=1,
                         padding=PAD):
    code = jax.eval_shape(
        lambda xx, ww: conv2d(xx, ww, stride=stride, padding=padding),
        x, W)
    z0 = jnp.zeros(code.shape, x.dtype)

    def step(carry, _):
        z, z_prev, t = carry
        t_next = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
        y = z + ((t - 1) / t_next) * (z - z_prev)
        r = conv_transpose2d(y, W, stride=stride, padding=padding) - x
        g = conv2d(r, W, stride=stride, padding=padding)
        z_new = soft_threshold(y - lr * g, alpha * lr)
        return (z_new, z, t_next), None

    (z, _, _), _ = lax.scan(step, (z0, z0, jnp.asarray(1.0, x.dtype)),
                            None, length=iters)
    return z


def _fd_directional(f, theta, v, eps=1e-5):
    return float((f(theta + eps * v) - f(theta - eps * v)) / (2 * eps))


def _enc(**kw):
    merged = dict(SOLVE)
    merged.update(kw)
    return make_implicit_conv_encoder(padding=PAD, **merged)


def test_conv_grad_x_matches_finite_differences():
    x, W, rng = _problem()
    with jax.enable_x64():
        xj, Wj = jnp.asarray(x), jnp.asarray(W)
        enc = _enc()
        c = jnp.asarray(rng.standard_normal(
            jax.eval_shape(enc, xj, Wj, jnp.asarray(0.8)).shape))
        f = lambda xx: jnp.sum(enc(xx, Wj, jnp.asarray(0.8)) * c)
        g = jax.grad(f)(xj)
        for _ in range(2):
            v = jnp.asarray(rng.standard_normal(x.shape))
            fd = _fd_directional(f, xj, v)
            an = float(jnp.sum(g * v))
            assert abs(fd - an) < 5e-6 * max(1.0, abs(fd)), (fd, an)


def test_conv_grad_kernel_matches_finite_differences():
    x, W, rng = _problem()
    with jax.enable_x64():
        xj, Wj = jnp.asarray(x), jnp.asarray(W)
        enc = _enc()
        c = jnp.asarray(rng.standard_normal(
            jax.eval_shape(enc, xj, Wj, jnp.asarray(0.8)).shape))
        f = lambda ww: jnp.sum(enc(xj, ww, jnp.asarray(0.8)) * c)
        g = jax.grad(f)(Wj)
        for _ in range(2):
            v = jnp.asarray(rng.standard_normal(W.shape))
            fd = _fd_directional(f, Wj, v)
            an = float(jnp.sum(g * v))
            assert abs(fd - an) < 1e-5 * max(1.0, abs(fd)), (fd, an)


@pytest.mark.parametrize("shape", ["scalar", "per_sample", "per_channel"])
def test_conv_grad_alpha_matches_finite_differences(shape):
    x, W, rng = _problem()
    with jax.enable_x64():
        xj, Wj = jnp.asarray(x), jnp.asarray(W)
        if shape == "scalar":
            a0 = jnp.asarray(0.8)
        elif shape == "per_sample":
            a0 = jnp.asarray(np.linspace(0.7, 0.9, x.shape[0]))
        else:
            a0 = jnp.asarray(
                np.linspace(0.7, 0.9, W.shape[0]))[None, :]
        enc = _enc()
        c = jnp.asarray(rng.standard_normal(
            jax.eval_shape(enc, xj, Wj, a0).shape))
        f = lambda aa: jnp.sum(enc(xj, Wj, aa) * c)
        g = jax.grad(f)(a0)
        assert g.shape == a0.shape
        v = (jnp.asarray(rng.standard_normal(a0.shape)) if a0.ndim
             else jnp.asarray(1.0))
        # larger stencil rides over the solver's terminal oscillation
        fd = _fd_directional(f, a0, v, eps=1e-4)
        an = float(jnp.sum(g * v))
        assert abs(fd - an) < 1e-5 * max(1.0, abs(fd)), (fd, an)


def test_conv_implicit_matches_unrolled_autodiff():
    x, W, rng = _problem()
    with jax.enable_x64():
        xj, Wj = jnp.asarray(x), jnp.asarray(W)
        a0 = jnp.asarray(0.8)
        enc = _enc(lr=LR)
        c = jnp.asarray(rng.standard_normal(
            jax.eval_shape(enc, xj, Wj, a0).shape))
        f_imp = lambda xx, ww, aa: jnp.sum(enc(xx, ww, aa) * c)
        f_unr = lambda xx, ww, aa: jnp.sum(
            _unrolled_conv_fista(xx, ww, aa) * c)

        np.testing.assert_allclose(float(f_imp(xj, Wj, a0)),
                                   float(f_unr(xj, Wj, a0)), rtol=1e-6)

        gi = jax.grad(f_imp, argnums=(0, 1, 2))(xj, Wj, a0)
        gu = jax.grad(f_unr, argnums=(0, 1, 2))(xj, Wj, a0)
        # rtol 5e-6: reverse-mode through 4000 unrolled conv iterations
        # carries its own x64 rounding accumulation
        for a, b in zip(gi, gu):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-6, atol=1e-8)


def test_conv_strided_grad_x_matches_finite_differences():
    """stride=2, padding=1: the adjoint pair and eval_shape code sizing
    must stay consistent through the backward."""
    x, W, rng = _problem(hw=9)
    with jax.enable_x64():
        xj, Wj = jnp.asarray(x), jnp.asarray(W)
        enc = make_implicit_conv_encoder(stride=2, padding=1,
                                         maxiter=4000, tol=0.0, lr=0.1)
        c = jnp.asarray(rng.standard_normal(
            jax.eval_shape(enc, xj, Wj, jnp.asarray(0.1)).shape))
        f = lambda xx: jnp.sum(enc(xx, Wj, jnp.asarray(0.5)) * c)
        g = jax.grad(f)(xj)
        v = jnp.asarray(rng.standard_normal(x.shape))
        fd = _fd_directional(f, xj, v)
        an = float(jnp.sum(g * v))
        assert abs(fd - an) < 5e-6 * max(1.0, abs(fd)), (fd, an)


def test_conv_support_guards():
    """alpha above alpha_max: empty support, zero gradients, no NaNs."""
    x, W, _ = _problem()
    with jax.enable_x64():
        xj, Wj = jnp.asarray(x), jnp.asarray(W)
        enc = _enc()
        g = jax.grad(lambda ww: jnp.sum(enc(xj, ww, jnp.asarray(1e3))))(Wj)
        assert np.all(np.asarray(g) == 0.0)
        assert np.all(np.isfinite(np.asarray(g)))
