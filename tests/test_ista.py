"""ISTA/FISTA solver tests: KKT certificates, jit, backtracking, golden
parity vs the pytorch reference (BASELINE config #1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasso_tpu.linear import sparse_encode
from lasso_tpu.linear.solvers import ista

from _oracles import kkt_violation, lasso_objective, load_reference


def make_problem(rng, n=32, d=16, k=24, alpha=0.2):
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(W), alpha


def test_fista_satisfies_kkt(rng):
    x, W, alpha = make_problem(rng)
    z = sparse_encode(x, W, alpha, algorithm="ista", maxiter=3000, tol=1e-9)
    assert kkt_violation(x, W, z, alpha) < 2e-3
    # solution must actually be sparse
    assert np.mean(np.abs(np.asarray(z)) < 1e-6) > 0.2


def test_ista_slow_path_matches_fista_objective(rng):
    x, W, alpha = make_problem(rng)
    z_fast = sparse_encode(x, W, alpha, algorithm="ista", maxiter=3000,
                           tol=1e-9, fast=True)
    z_slow = sparse_encode(x, W, alpha, algorithm="ista", maxiter=6000,
                           tol=1e-9, fast=False)
    f_fast = lasso_objective(x, W, z_fast, alpha)
    f_slow = lasso_objective(x, W, z_slow, alpha)
    assert abs(f_fast - f_slow) < 1e-3 * max(1.0, abs(f_fast))


def test_backtracking_matches_constant_lr(rng):
    x, W, alpha = make_problem(rng)
    z_const = sparse_encode(x, W, alpha, algorithm="ista", maxiter=2000,
                            tol=1e-9)
    # start from an over-large lr; backtracking must recover convergence
    z_bt = sparse_encode(x, W, alpha, algorithm="ista", maxiter=2000,
                         tol=1e-9, backtrack=True, lr=10.0)
    f_const = lasso_objective(x, W, z_const, alpha)
    f_bt = lasso_objective(x, W, z_bt, alpha)
    assert abs(f_const - f_bt) < 1e-3 * max(1.0, abs(f_const))


def test_ista_jit_compiles_and_matches_eager(rng):
    x, W, alpha = make_problem(rng, n=8, d=8, k=12)
    z0 = jnp.zeros((8, 12), jnp.float32)
    eager = ista(x, z0, W, alpha, maxiter=50)
    jitted = jax.jit(
        lambda x, z0, W: ista(x, z0, W, alpha, maxiter=50))(x, z0, W)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                               atol=1e-6)


def test_init_modes(rng):
    x, W, alpha = make_problem(rng, n=8, d=8, k=12)
    from lasso_tpu.linear import initialize_code
    for mode in ["zero", "unif", "lstsq", "ridge", "transpose"]:
        z0 = initialize_code(x, W, alpha, mode)
        assert z0.shape == (8, 12)
        assert bool(jnp.all(jnp.isfinite(z0)))
    with pytest.raises(ValueError):
        initialize_code(x, W, alpha, "bogus")


def test_golden_parity_vs_reference_quickstart(rng):
    """BASELINE config #1: 100x10 data, 50 atoms, alpha=0.2; objective gap
    vs the pytorch reference's ISTA must be tiny."""
    lasso_ref = load_reference()
    if lasso_ref is None:
        pytest.skip("reference library unavailable")
    import torch

    x_np = rng.standard_normal((100, 10)).astype(np.float32)
    W_np = rng.standard_normal((10, 50)).astype(np.float32)
    W_np /= np.linalg.norm(W_np, axis=0, keepdims=True)
    alpha = 0.2

    z_ref = lasso_ref.linear.sparse_encode(
        torch.from_numpy(x_np), torch.from_numpy(W_np), alpha=alpha,
        algorithm="ista", maxiter=2000, tol=1e-9)
    z_tpu = sparse_encode(jnp.asarray(x_np), jnp.asarray(W_np), alpha,
                          algorithm="ista", maxiter=2000, tol=1e-9)

    f_ref = lasso_objective(x_np, W_np, z_ref.numpy(), alpha)
    f_tpu = lasso_objective(x_np, W_np, z_tpu, alpha)
    # solutions are non-unique for overcomplete W; compare objectives
    assert abs(f_tpu - f_ref) <= 1e-4 * max(1.0, abs(f_ref))


def test_per_sample_tol_matches_independent_solves(rng):
    """A row's solution under per-sample stopping must equal solving that
    row alone (SURVEY §7 design principle 2: global stop is parity-only)."""
    n, d, k = 6, 10, 24
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    x = x * jnp.asarray([0.1, 1.0, 10.0, 0.5, 5.0, 2.0])[:, None]
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    W = jnp.asarray(W)
    z0 = jnp.zeros((n, k), jnp.float32)

    def per_sample_obj(x_s, z_s):
        r = np.asarray(z_s) @ np.asarray(W).T - np.asarray(x_s)
        return 0.5 * np.sum(r ** 2, axis=1) \
            + 0.2 * np.sum(np.abs(np.asarray(z_s)), axis=1)

    z_batch = ista(x, z0, W, 0.2, lr=0.1, maxiter=2000, tol=1e-7,
                   per_sample_tol=True)
    f_batch = per_sample_obj(x, z_batch)
    for i in range(n):
        z_i = ista(x[i:i + 1], z0[i:i + 1], W, 0.2, lr=0.1, maxiter=2000,
                   tol=1e-7, per_sample_tol=True)
        # batch-of-6 vs batch-of-1 matmuls round differently and the
        # divergence compounds over 2000 momentum steps: objectives are
        # the stable invariant
        np.testing.assert_allclose(f_batch[i], per_sample_obj(
            x[i:i + 1], z_i)[0], rtol=1e-5)


def test_per_sample_tol_frozen_rows_stable(rng):
    """Once frozen, a row must not change even while others iterate."""
    n, d, k = 4, 8, 16
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    # row 0 trivially converged (zero data -> zero codes instantly)
    x = x.at[0].set(0.0)
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    W = jnp.asarray(W)
    z0 = jnp.zeros((n, k), jnp.float32)
    z = ista(x, z0, W, 0.3, lr=0.1, maxiter=500, tol=1e-6,
             per_sample_tol=True)
    np.testing.assert_array_equal(np.asarray(z[0]), np.zeros(k, np.float32))
