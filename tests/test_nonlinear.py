"""Nonlinear solvers. Primary oracle: with a *linear* decoder they must
reproduce the linear-lasso optimum found by FISTA; a small MLP decoder
checks the genuinely nonlinear path stays finite and decreases the loss."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasso_tpu.linear import sparse_encode
from lasso_tpu.nonlinear import (hessian_2norm, ista_nl,
                                 iterative_ridge_bfgs, owlqn,
                                 split_bregman_nl)

from _oracles import lasso_objective


@pytest.fixture
def linear_problem(rng):
    n, d, k, alpha = 12, 10, 14, 0.3
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = rng.standard_normal((n, d)).astype(np.float32)
    x, W = jnp.asarray(x), jnp.asarray(W)
    z_star = sparse_encode(x, W, alpha, algorithm="ista", maxiter=5000,
                           tol=1e-10)
    return x, W, alpha, lasso_objective(x, W, z_star, alpha)


def mlp_decoder(params, z):
    h = jnp.tanh(z @ params["w1"])
    return h @ params["w2"]


def make_mlp(rng, k=8, h=16, d=10):
    return {
        "w1": jnp.asarray(rng.standard_normal((k, h)) * 0.4, jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((h, d)) * 0.4, jnp.float32),
    }


def test_hessian_2norm_linear_decoder(rng, linear_problem):
    # for f(z) = 0.5||zW^T - x||^2 the per-sample Hessian is W^T W: its
    # 2-norm is the shared top eigenvalue
    x, W, _, _ = linear_problem
    z = jnp.asarray(rng.standard_normal((5, W.shape[1])), jnp.float32)

    def rss(zk):
        return 0.5 * jnp.sum(jnp.square(zk @ W.T - x[:5]))

    sig = hessian_2norm(rss, z, niter=100)
    lam = np.linalg.eigvalsh(np.asarray(W).T @ np.asarray(W))[-1]
    np.testing.assert_allclose(np.asarray(sig), lam, rtol=1e-2)


def test_ista_nl_linear_decoder_matches_fista(linear_problem):
    x, W, alpha, f_star = linear_problem
    decoder = lambda z: z @ W.T
    z0 = jnp.zeros((x.shape[0], W.shape[1]), jnp.float32)
    z = ista_nl(x, z0, decoder, alpha=alpha, maxiter=3000, tol=1e-9)
    f = lasso_objective(x, W, z, alpha)
    assert abs(f - f_star) < 1e-2 * max(1.0, abs(f_star))


def test_ista_nl_fixed_lr(linear_problem):
    x, W, alpha, f_star = linear_problem
    decoder = lambda z: z @ W.T
    z0 = jnp.zeros((x.shape[0], W.shape[1]), jnp.float32)
    L = float(np.linalg.eigvalsh(np.asarray(W).T @ np.asarray(W))[-1])
    z = ista_nl(x, z0, decoder, alpha=alpha, lr=0.9 / L, maxiter=3000,
                tol=1e-9)
    f = lasso_objective(x, W, z, alpha)
    assert abs(f - f_star) < 1e-2 * max(1.0, abs(f_star))


def test_owlqn_linear_decoder(linear_problem):
    x, W, alpha, f_star = linear_problem
    z0 = jnp.zeros((x.shape[0], W.shape[1]), jnp.float32)
    fun = lambda z: 0.5 * jnp.sum(jnp.square(z @ W.T - x))
    z = owlqn(fun, z0, alpha=alpha, max_iter=150, xtol=1e-8,
              history_size=20)
    f = lasso_objective(x, W, z, alpha)
    assert f < f_star * 1.1  # OWL-QN stalls like OWN; must get close


def test_iterative_ridge_bfgs_linear_decoder(linear_problem):
    x, W, alpha, f_star = linear_problem
    fun = lambda z: 0.5 * jnp.sum(jnp.square(z @ W.T - x))
    # ridge init, like the reference recommends for iterative-ridge methods
    from lasso_tpu.linear import initialize_code
    z0 = initialize_code(x, W, alpha, "ridge")
    z = iterative_ridge_bfgs(fun, z0, alpha=alpha, maxiter=100, xtol=1e-9)
    f = lasso_objective(x, W, z, alpha)
    assert f < f_star * 1.1


@pytest.mark.parametrize("solver", ["exact", "cg"])
def test_split_bregman_nl_linear_residual(rng, solver):
    # single-sample flattened problem, like the reference's 'exact' path
    d, k, alpha = 10, 8, 0.2
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = rng.standard_normal((d,)).astype(np.float32)
    W_j, x_j = jnp.asarray(W), jnp.asarray(x)

    fun = lambda z: W_j @ z - x_j
    z0 = jnp.zeros((k,), jnp.float32)
    z = split_bregman_nl(fun, z0, alpha=alpha, lambd=1.0, max_iter=50,
                         inner_iter=5, lstsq_iter=5, xtol=1e-8,
                         solver=solver)
    f = 0.5 * np.sum((W @ np.asarray(z) - x) ** 2) \
        + alpha * np.sum(np.abs(np.asarray(z)))

    z_star = sparse_encode(x_j[None], W_j, alpha, algorithm="ista",
                           maxiter=5000, tol=1e-10)
    f_star = lasso_objective(x[None], W, z_star, alpha)
    assert f < f_star * 1.15 + 1e-3


def test_ista_nl_mlp_decoder_decreases_loss(rng):
    params = make_mlp(rng)
    decoder = lambda z: mlp_decoder(params, z)
    x = jnp.asarray(rng.standard_normal((6, 10)), jnp.float32)
    z0 = jnp.asarray(rng.standard_normal((6, 8)) * 0.1, jnp.float32)
    alpha = 0.05

    def loss(z):
        return float(0.5 * jnp.sum(jnp.square(decoder(z) - x))
                     + alpha * jnp.sum(jnp.abs(z)))

    z = ista_nl(x, z0, decoder, alpha=alpha, maxiter=300, tol=1e-9,
                power_iters=10)
    assert np.isfinite(loss(z))
    assert loss(z) < loss(z0)


def test_owlqn_mlp_decoder(rng):
    params = make_mlp(rng)
    decoder = lambda z: mlp_decoder(params, z)
    x = jnp.asarray(rng.standard_normal((6, 10)), jnp.float32)
    z0 = jnp.asarray(rng.standard_normal((6, 8)) * 0.1, jnp.float32)
    alpha = 0.05
    fun = lambda z: 0.5 * jnp.sum(jnp.square(decoder(z) - x))
    z = owlqn(fun, z0, alpha=alpha, max_iter=50, history_size=10)
    f0 = float(fun(z0) + alpha * jnp.sum(jnp.abs(z0)))
    f1 = float(fun(z) + alpha * jnp.sum(jnp.abs(z)))
    assert np.isfinite(f1) and f1 < f0


def test_ista_nl_lr_refresh(rng):
    """lr_refresh=k reuses the cached per-sample step size between power-
    iteration refreshes: parity at k=1 (reference cadence), near-identical
    objective at k=4 (docs/DIVERGENCES.md #15)."""
    import jax.numpy as jnp
    from lasso_tpu.nonlinear import ista_nl

    x = jnp.asarray(rng.standard_normal((8, 12)), jnp.float32)
    W = jnp.asarray(
        (rng.standard_normal((20, 12)) / np.sqrt(20)).astype(np.float32))
    z0 = jnp.zeros((8, 20), jnp.float32)
    dec = lambda z: jnp.tanh(z) @ W

    z_every = ista_nl(x, z0, dec, alpha=0.1, maxiter=30, tol=0.0)
    z_default = ista_nl(x, z0, dec, alpha=0.1, maxiter=30, tol=0.0,
                        lr_refresh=1)
    np.testing.assert_array_equal(np.asarray(z_every),
                                  np.asarray(z_default))

    z_lazy = ista_nl(x, z0, dec, alpha=0.1, maxiter=30, tol=0.0,
                     lr_refresh=4)

    def obj(z):
        r = dec(z) - x
        return float(0.5 * jnp.sum(r * r) + 0.1 * jnp.sum(jnp.abs(z)))

    assert abs(obj(z_lazy) - obj(z_every)) <= 1e-4 * max(1.0, obj(z_every))


def test_ista_nl_restart(rng):
    """Per-sample adaptive restart reaches the same objective in fewer
    iterations on the nonlinear path too."""
    import jax.numpy as jnp
    from lasso_tpu.nonlinear import ista_nl

    x = jnp.asarray(rng.standard_normal((8, 12)), jnp.float32)
    W = jnp.asarray(
        (rng.standard_normal((20, 12)) / np.sqrt(20)).astype(np.float32))
    z0 = jnp.zeros((8, 20), jnp.float32)
    dec = lambda z: jnp.tanh(z) @ W

    def obj(z):
        r = dec(z) - x
        return float(0.5 * jnp.sum(r * r) + 0.05 * jnp.sum(jnp.abs(z)))

    z_p, k_p = ista_nl(x, z0, dec, alpha=0.05, lr=0.2, maxiter=2000,
                       tol=1e-7, return_iters=True)
    z_r, k_r = ista_nl(x, z0, dec, alpha=0.05, lr=0.2, maxiter=2000,
                       tol=1e-7, restart=True, return_iters=True)
    assert int(k_r) <= int(k_p)
    assert obj(z_r) <= obj(z_p) * (1 + 1e-5)
    with pytest.raises(ValueError):
        ista_nl(x, z0, dec, alpha=0.05, fast=False, restart=True)
