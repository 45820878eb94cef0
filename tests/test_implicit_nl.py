"""Implicit differentiation through the NONLINEAR lasso solution.

Certified in x64 by: central finite differences w.r.t. x, every decoder
parameter leaf, and alpha (MLP decoder); exact agreement with the
LINEAR implicit encoder when the decoder is linear (cross-module
oracle); unrolled reverse-mode agreement through an explicit scan;
support guards.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from lasso_tpu.linear import make_implicit_encoder
from lasso_tpu.nonlinear import make_implicit_nl_encoder
from lasso_tpu.ops.shrink import soft_threshold


def _mlp_problem(seed=5, n=6, k=16, h=10, d=12):
    rng = np.random.default_rng(seed)
    params = {
        "W1": 0.5 * rng.standard_normal((k, h)),
        "W2": rng.standard_normal((h, d)) / np.sqrt(h),
    }
    x = rng.standard_normal((n, d))
    return x, params, rng


def _mlp_decoder(params, z):
    return jnp.matmul(jnp.tanh(jnp.matmul(z, params["W1"])), params["W2"])


# per-sample L reaches ~10 on this MLP; auto-lr keeps every row
# convergent (the unrolled oracle uses a fixed lr < 1/max L)
SOLVE = dict(maxiter=3000, tol=0.0, lr="auto", fast=True)


def _fd(f, theta, v, eps=1e-5):
    return float((f(theta + eps * v) - f(theta - eps * v)) / (2 * eps))


def test_nl_grad_x_and_alpha_match_finite_differences():
    x, params, rng = _mlp_problem()
    with jax.enable_x64():
        xj = jnp.asarray(x)
        pj = jax.tree_util.tree_map(jnp.asarray, params)
        z0 = jnp.zeros((x.shape[0], 16))
        enc = make_implicit_nl_encoder(_mlp_decoder, z0=z0, **SOLVE)
        c = jnp.asarray(rng.standard_normal((x.shape[0], 16)))

        f_x = lambda xx: jnp.sum(enc(xx, pj, jnp.asarray(0.1)) * c)
        g = jax.grad(f_x)(xj)
        v = jnp.asarray(rng.standard_normal(x.shape))
        fd = _fd(f_x, xj, v)
        an = float(jnp.sum(g * v))
        assert abs(fd - an) < 1e-5 * max(1.0, abs(fd)), (fd, an)

        f_a = lambda aa: jnp.sum(enc(xj, pj, aa) * c)
        ga = jax.grad(f_a)(jnp.asarray(0.1))
        fd = _fd(f_a, jnp.asarray(0.1), jnp.asarray(1.0), eps=1e-4)
        # 1e-4 bar: the auto-lr power iteration makes the terminal
        # iterate mildly trajectory-dependent, which FD picks up
        assert abs(fd - float(ga)) < 1e-4 * max(1.0, abs(fd)), (fd, ga)


def test_nl_grad_params_match_finite_differences():
    x, params, rng = _mlp_problem()
    with jax.enable_x64():
        xj = jnp.asarray(x)
        pj = jax.tree_util.tree_map(jnp.asarray, params)
        z0 = jnp.zeros((x.shape[0], 16))
        enc = make_implicit_nl_encoder(_mlp_decoder, z0=z0, **SOLVE)
        c = jnp.asarray(rng.standard_normal((x.shape[0], 16)))

        f = lambda pp: jnp.sum(enc(xj, pp, jnp.asarray(0.1)) * c)
        g = jax.grad(f)(pj)
        for leaf in ("W1", "W2"):
            v = jnp.asarray(rng.standard_normal(params[leaf].shape))

            def f_leaf(t, leaf=leaf, v=v):
                p2 = dict(pj)
                p2[leaf] = pj[leaf] + t * v
                return f(p2)

            fd = _fd(f_leaf, jnp.asarray(0.0), jnp.asarray(1.0))
            an = float(jnp.sum(g[leaf] * v))
            assert abs(fd - an) < 3e-5 * max(1.0, abs(fd)), (leaf, fd, an)


def test_nl_linear_decoder_matches_linear_implicit():
    """With decoder(params, z) = z P^T the nonlinear IFT must reproduce
    the linear module's gradients exactly (shared optimum, same KKT)."""
    rng = np.random.default_rng(9)
    n, d, k = 8, 12, 20
    P = rng.standard_normal((d, k))
    P /= np.linalg.norm(P, axis=0, keepdims=True)
    x = rng.standard_normal((n, d))
    with jax.enable_x64():
        xj, Pj = jnp.asarray(x), jnp.asarray(P)
        c = jnp.asarray(rng.standard_normal((n, k)))
        z0 = jnp.zeros((n, k))

        dec = lambda params, z: jnp.matmul(z, params.T)
        enc_nl = make_implicit_nl_encoder(dec, z0=z0, maxiter=4000,
                                          tol=0.0, lr=0.2)
        enc_lin = make_implicit_encoder(maxiter=4000, tol=0.0, lr=0.2,
                                        use_pallas=False)

        f_nl = lambda xx, pp, aa: jnp.sum(enc_nl(xx, pp, aa) * c)
        f_li = lambda xx, ww, aa: jnp.sum(enc_lin(xx, ww, aa) * c)
        a0 = jnp.asarray(0.25)
        np.testing.assert_allclose(float(f_nl(xj, Pj, a0)),
                                   float(f_li(xj, Pj, a0)), rtol=1e-8)
        g_nl = jax.grad(f_nl, argnums=(0, 1, 2))(xj, Pj, a0)
        g_li = jax.grad(f_li, argnums=(0, 1, 2))(xj, Pj, a0)
        for a, b in zip(g_nl, g_li):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-7, atol=1e-9)


def test_nl_implicit_matches_unrolled_autodiff():
    x, params, rng = _mlp_problem()
    with jax.enable_x64():
        xj = jnp.asarray(x)
        pj = jax.tree_util.tree_map(jnp.asarray, params)
        z0 = jnp.zeros((x.shape[0], 16))
        c = jnp.asarray(rng.standard_normal((x.shape[0], 16)))
        a0 = jnp.asarray(0.1)

        # 20000 iterations: the unrolled scan's DERIVATIVE converges
        # slower than its iterate (measured: grad still moves 2e-4
        # between 6k and 20k while the iterate moved 5e-7)
        def unrolled(xx, pp, aa, iters=20000, lr=0.08):
            def fgrad(zz):
                f = lambda z_: 0.5 * jnp.sum(
                    jnp.square(_mlp_decoder(pp, z_) - xx))
                return jax.grad(f)(zz)

            def step(carry, _):
                z, z_prev, t = carry
                t_next = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
                y = z + ((t - 1) / t_next) * (z - z_prev)
                z_new = soft_threshold(y - lr * fgrad(y), aa * lr)
                return (z_new, z, t_next), None

            (z, _, _), _ = lax.scan(step, (z0, z0, jnp.asarray(1.0)),
                                    None, length=iters)
            return z

        enc = make_implicit_nl_encoder(_mlp_decoder, z0=z0, **SOLVE)
        f_imp = lambda xx, pp, aa: jnp.sum(enc(xx, pp, aa) * c)
        f_unr = lambda xx, pp, aa: jnp.sum(unrolled(xx, pp, aa) * c)
        # the two forwards run different (auto vs fixed) lr schedules;
        # they share the optimum but not the terminal oscillation
        np.testing.assert_allclose(float(f_imp(xj, pj, a0)),
                                   float(f_unr(xj, pj, a0)), rtol=1e-6)
        gi = jax.grad(f_imp, argnums=(0, 1, 2))(xj, pj, a0)
        gu = jax.grad(f_unr, argnums=(0, 1, 2))(xj, pj, a0)
        flat_i = jax.tree_util.tree_leaves(gi)
        flat_u = jax.tree_util.tree_leaves(gu)
        for a, b in zip(flat_i, flat_u):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=2e-5)


def test_nl_support_guards_and_z0_required():
    x, params, _ = _mlp_problem()
    with pytest.raises(ValueError):
        make_implicit_nl_encoder(_mlp_decoder, maxiter=10)
    with jax.enable_x64():
        xj = jnp.asarray(x)
        pj = jax.tree_util.tree_map(jnp.asarray, params)
        z0 = jnp.zeros((x.shape[0], 16))
        enc = make_implicit_nl_encoder(_mlp_decoder, z0=z0, **SOLVE)
        g = jax.grad(lambda pp: jnp.sum(
            enc(xj, pp, jnp.asarray(1e3))))(pj)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.all(np.asarray(leaf) == 0.0)
            assert np.all(np.isfinite(np.asarray(leaf)))
