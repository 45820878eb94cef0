"""GPSR solver: KKT certificate, continuation, debias, golden parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from lasso_tpu.linear import sparse_encode
from lasso_tpu.linear.solvers import gpsr_basic

from _oracles import kkt_violation, lasso_objective, load_reference


def make_problem(rng, n=12, d=10, k=16, alpha=0.3):
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(W), alpha


def test_gpsr_matches_fista_objective(rng):
    x, W, alpha = make_problem(rng)
    z_gpsr = sparse_encode(x, W, alpha, algorithm="gpsr", maxiter=2000,
                           tol=1e-6)
    z_ista = sparse_encode(x, W, alpha, algorithm="ista", maxiter=5000,
                           tol=1e-10)
    f_g = lasso_objective(x, W, z_gpsr, alpha)
    f_i = lasso_objective(x, W, z_ista, alpha)
    assert abs(f_g - f_i) < 5e-3 * max(1.0, abs(f_i))


def test_gpsr_trivial_solution_when_tau_large(rng):
    x, W, _ = make_problem(rng)
    z = sparse_encode(x, W, 1e6, algorithm="gpsr", maxiter=100)
    assert bool(jnp.all(z == 0))


def test_gpsr_continuation_and_debias_run(rng):
    x, W, alpha = make_problem(rng)
    z = sparse_encode(x, W, alpha, algorithm="gpsr", maxiter=500,
                      continuation=True, cont_steps=3, debias=True)
    f = lasso_objective(x, W, z, alpha)
    assert np.isfinite(f)
    # debiasing refits on the support; result must stay finite
    resid = np.asarray(z) @ np.asarray(W).T - np.asarray(x)
    assert np.isfinite(resid).all()


def test_gpsr_golden_parity(rng):
    lasso_ref = load_reference()
    if lasso_ref is None:
        pytest.skip("reference library unavailable")
    import torch

    x_np = rng.standard_normal((6, 8)).astype(np.float32)
    W_np = rng.standard_normal((8, 12)).astype(np.float32)
    W_np /= np.linalg.norm(W_np, axis=0, keepdims=True)
    alpha = 0.3

    z_ref = lasso_ref.linear.sparse_encode(
        torch.from_numpy(x_np), torch.from_numpy(W_np), alpha=alpha,
        algorithm="gpsr", maxiter=1000, tol=1e-5)
    z_tpu = sparse_encode(jnp.asarray(x_np), jnp.asarray(W_np), alpha,
                          algorithm="gpsr", maxiter=1000, tol=1e-5)
    f_ref = lasso_objective(x_np, W_np, z_ref.numpy(), alpha)
    f_tpu = lasso_objective(x_np, W_np, z_tpu, alpha)
    assert abs(f_tpu - f_ref) <= 1e-3 * max(1.0, abs(f_ref))
