"""Iterative ridge: objective agreement with FISTA, CG path, golden parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from lasso_tpu.linear import sparse_encode

from _oracles import lasso_objective, load_reference


def make_problem(rng, n=10, d=12, k=8, alpha=0.2):
    # iterative ridge shines on well-determined problems (K <= D)
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(W), alpha


def test_iter_ridge_matches_fista(rng):
    x, W, alpha = make_problem(rng)
    z_ir = sparse_encode(x, W, alpha, algorithm="iter-ridge", maxiter=50,
                         tol=1e-8)
    z_ista = sparse_encode(x, W, alpha, algorithm="ista", maxiter=5000,
                           tol=1e-10)
    f_ir = lasso_objective(x, W, z_ir, alpha)
    f_i = lasso_objective(x, W, z_ista, alpha)
    assert abs(f_ir - f_i) < 1e-2 * max(1.0, abs(f_i))


def test_iter_ridge_cg_path(rng):
    x, W, alpha = make_problem(rng)
    z_chol = sparse_encode(x, W, alpha, algorithm="iter-ridge", maxiter=30)
    z_cg = sparse_encode(x, W, alpha, algorithm="iter-ridge", maxiter=30,
                         cg=True, cg_options={"maxiter": 100, "rtol": 1e-6})
    f_chol = lasso_objective(x, W, z_chol, alpha)
    f_cg = lasso_objective(x, W, z_cg, alpha)
    assert abs(f_chol - f_cg) < 2e-2 * max(1.0, abs(f_chol))


def test_iter_ridge_no_line_search(rng):
    x, W, alpha = make_problem(rng)
    z = sparse_encode(x, W, alpha, algorithm="iter-ridge", maxiter=30,
                      line_search=False)
    assert np.isfinite(lasso_objective(x, W, z, alpha))


def test_iter_ridge_golden_parity(rng):
    lasso_ref = load_reference()
    if lasso_ref is None:
        pytest.skip("reference library unavailable")
    import torch

    x_np = rng.standard_normal((6, 10)).astype(np.float32)
    W_np = rng.standard_normal((10, 8)).astype(np.float32)
    W_np /= np.linalg.norm(W_np, axis=0, keepdims=True)
    alpha = 0.2

    z_ref = lasso_ref.linear.sparse_encode(
        torch.from_numpy(x_np), torch.from_numpy(W_np), alpha=alpha,
        algorithm="iter-ridge", maxiter=50, tol=1e-8)
    z_tpu = sparse_encode(jnp.asarray(x_np), jnp.asarray(W_np), alpha,
                          algorithm="iter-ridge", maxiter=50, tol=1e-8)
    f_ref = lasso_objective(x_np, W_np, z_ref.numpy(), alpha)
    f_tpu = lasso_objective(x_np, W_np, z_tpu, alpha)
    assert abs(f_tpu - f_ref) <= 1e-3 * max(1.0, abs(f_ref))


def test_woodbury_path_matches_dense_cholesky(rng):
    """For D < K the Woodbury subproblem solve must match the dense [K,K]
    masked-Gram Cholesky solve (same linear system, different identity)."""
    from lasso_tpu.linear.solvers import iterative_ridge
    from lasso_tpu.linear import sparse_encode
    n, d, k = 12, 8, 24
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    W = jnp.asarray(W)
    z0 = sparse_encode(x, W, 0.3, algorithm="ista", maxiter=0, init="ridge")
    # one subproblem solve: identical linear system, f32-rounding agreement
    z_w = iterative_ridge(z0, x, W, alpha=0.3, maxiter=1, tol=1e-9,
                          woodbury=True)
    z_c = iterative_ridge(z0, x, W, alpha=0.3, maxiter=1, tol=1e-9,
                          woodbury=False)
    np.testing.assert_allclose(np.asarray(z_w), np.asarray(z_c), atol=5e-4)
    # full runs: trajectories drift through permanent coordinate freezing,
    # so compare objectives
    from _oracles import lasso_objective
    z_w = iterative_ridge(z0, x, W, alpha=0.3, maxiter=30, tol=1e-9,
                          woodbury=True)
    z_c = iterative_ridge(z0, x, W, alpha=0.3, maxiter=30, tol=1e-9,
                          woodbury=False)
    f_w = lasso_objective(np.asarray(x), np.asarray(W), np.asarray(z_w), 0.3)
    f_c = lasso_objective(np.asarray(x), np.asarray(W), np.asarray(z_c), 0.3)
    np.testing.assert_allclose(f_w, f_c, rtol=1e-4)


def test_cg_and_forced_woodbury_conflict(rng):
    from lasso_tpu.linear.solvers import iterative_ridge
    x = jnp.asarray(rng.standard_normal((4, 6)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((6, 10)), jnp.float32)
    z0 = jnp.zeros((4, 10), jnp.float32)
    with pytest.raises(ValueError):
        iterative_ridge(z0, x, W, alpha=0.1, cg=True, woodbury=True)
