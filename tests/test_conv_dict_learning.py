"""Convolutional dictionary learning (TPU extension — the reference only
ships conv sparse CODING with caller-provided filters)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lasso_tpu.conv2d import (conv2d, conv_dict_learning, conv_lasso_loss,
                              conv_transpose2d, update_kernel,
                              update_kernel_constrained)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _filters(rng, k=6, c=1, ks=5):
    W = rng.randn(k, c, ks, ks).astype(np.float32)
    W /= np.linalg.norm(W.reshape(k, -1), axis=1)[:, None, None, None]
    return jnp.asarray(W)


def _sparse_images(rng, W, n=8, hz=12, wz=12, density=0.05):
    """Generate X = conv_t(Z_true, W) from a sparse ground-truth code."""
    k = W.shape[0]
    Z = rng.randn(n, k, hz, wz).astype(np.float32)
    Z *= (rng.rand(n, k, hz, wz) < density)
    return conv_transpose2d(jnp.asarray(Z), W), jnp.asarray(Z)


def test_update_kernel_solves_least_squares(rng):
    """With lambd=0 the CG refit must zero the filter-space gradient of
    0.5||conv_t(Z, W) - X||^2 (the normal-equations residual)."""
    W = _filters(rng)
    X, Z = _sparse_images(rng, W)
    W0 = _filters(np.random.RandomState(7))       # start far away
    W_fit = update_kernel(X, Z, W0, cg_iters=200, cg_tol=1e-12)
    # gradient at the fit: adj(conv_t(Z, W_fit) - X)
    R = conv_transpose2d(Z, W_fit) - X
    dec = lambda V: conv_transpose2d(Z, V)
    _, vjp = jax.vjp(dec, jnp.zeros_like(W))
    g = vjp(R)[0]
    assert float(jnp.max(jnp.abs(g))) < 1e-4
    # and it must (near-)recover the generating filters' reconstruction
    rss = float(jnp.sum(jnp.square(R)))
    assert rss < 1e-6 * float(jnp.sum(jnp.square(X))) + 1e-8


def test_update_kernel_warm_start_is_exact_fixed_point(rng):
    """Starting AT the least-squares solution, the correction is ~0."""
    W = _filters(rng)
    X, Z = _sparse_images(rng, W)
    W_fit = update_kernel(X, Z, W, cg_iters=100, cg_tol=1e-12)
    W_fit2 = update_kernel(X, Z, W_fit, cg_iters=100, cg_tol=1e-12)
    np.testing.assert_allclose(np.asarray(W_fit), np.asarray(W_fit2),
                               atol=1e-5)


def test_update_kernel_constrained_unit_norm_and_degenerate(rng):
    W = _filters(rng)
    X, Z = _sparse_images(rng, W)
    # kill one code channel so its filter fit is exactly zero
    Z = Z.at[:, 2].set(0.0)
    key = jax.random.PRNGKey(3)
    W_new, Z_new = update_kernel_constrained(X, Z, W, key, cg_iters=100)
    norms = np.linalg.norm(np.asarray(W_new).reshape(W.shape[0], -1),
                           axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # degenerate channel: codes zeroed, filter re-randomized (unit norm)
    assert np.all(np.asarray(Z_new)[:, 2] == 0.0)


def test_conv_dict_learning_loss_decreases(rng):
    W_true = _filters(rng, k=4, ks=3)
    X, _ = _sparse_images(rng, W_true, n=12, hz=10, wz=10, density=0.08)
    W, losses = conv_dict_learning(X, n_filters=4, kernel_size=3,
                                   alpha=0.05, steps=10, maxiter=60,
                                   key=jax.random.PRNGKey(1))
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    # EM descent: every step decreases the loss, with real total progress
    assert np.all(np.diff(losses) < 1e-6)
    assert losses[-1] < 0.95 * losses[0]
    assert W.shape == (4, 1, 3, 3)
    norms = np.linalg.norm(np.asarray(W).reshape(4, -1), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_conv_dict_learning_unconstrained_and_persist(rng):
    W_true = _filters(rng, k=4, ks=3)
    X, _ = _sparse_images(rng, W_true, n=8, hz=8, wz=8, density=0.1)
    W, losses = conv_dict_learning(X, n_filters=4, kernel_size=3,
                                   alpha=0.05, steps=6, maxiter=40,
                                   constrained=False, persist=True,
                                   key=jax.random.PRNGKey(2))
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_conv_dict_learning_improves_codability_of_true_filters(rng):
    """After training, encoding with the LEARNED filters must beat
    encoding with random filters at equal sparsity budget (sanity that
    the dictionary adapted to the data, not just that FISTA converged)."""
    W_true = _filters(rng, k=6, ks=5)
    X, _ = _sparse_images(rng, W_true, n=10, density=0.06)
    W_learn, _ = conv_dict_learning(X, n_filters=6, kernel_size=5,
                                    alpha=0.05, steps=12, maxiter=60,
                                    key=jax.random.PRNGKey(4))
    W_rand = _filters(np.random.RandomState(99), k=6, ks=5)

    from lasso_tpu.conv2d import ista_conv2d
    def eval_loss(W):
        z0 = jnp.zeros_like(conv2d(X, W))
        Z = ista_conv2d(X, z0, W, alpha=0.05, maxiter=150)
        return float(conv_lasso_loss(X, Z, W, 0.05))

    assert eval_loss(W_learn) < eval_loss(W_rand)


def test_conv_train_step_sharded_matches_single_device(rng):
    """Mesh-sharded conv EM step == single-device step (filters and
    loss), on the 8-device CPU mesh."""
    from lasso_tpu.parallel import make_conv_train_step, make_mesh

    W = _filters(rng, k=4, ks=3)
    X, _ = _sparse_images(rng, W, n=16, hz=8, wz=8, density=0.1)
    key = jax.random.PRNGKey(5)

    mesh = make_mesh()
    step, (x_sh, _) = make_conv_train_step(mesh, alpha=0.05, kernel_size=3,
                                           maxiter=40, cg_iters=60)
    W_sh, loss_sh = step(jax.device_put(X, x_sh), W, key)

    # single-device equivalent
    from lasso_tpu.conv2d import ista_conv2d
    z0 = jnp.zeros_like(conv2d(X, W))
    Z = ista_conv2d(X, z0, W, 0.05, maxiter=40)
    loss_1 = conv_lasso_loss(X, Z, W, 0.05)
    W_1, _ = update_kernel_constrained(X, Z, W, key, cg_iters=60)

    np.testing.assert_allclose(float(loss_sh), float(loss_1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(W_sh), np.asarray(W_1),
                               atol=5e-4)
