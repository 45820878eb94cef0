"""Unit tests for the L1 numerics layer (SURVEY.md §4 item 1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasso_tpu import linalg
from lasso_tpu.ops import soft_threshold


def test_soft_threshold_matches_closed_form(rng):
    x = jnp.asarray(rng.standard_normal((7, 11)), jnp.float32)
    out = soft_threshold(x, 0.3)
    expected = np.sign(x) * np.maximum(np.abs(x) - 0.3, 0)
    np.testing.assert_allclose(out, expected, atol=1e-7)
    # non-scalar threshold broadcast (per-sample)
    theta = jnp.asarray(rng.uniform(0.1, 0.5, size=(7, 1)), jnp.float32)
    out2 = soft_threshold(x, theta)
    expected2 = np.sign(x) * np.maximum(np.abs(x) - np.asarray(theta), 0)
    np.testing.assert_allclose(out2, expected2, atol=1e-7)


@pytest.mark.parametrize("m,n", [(10, 6), (6, 10)])
def test_lstsq_both_branches(rng, m, n):
    A = jnp.asarray(rng.standard_normal((m, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((m, 3)), jnp.float32)
    x = linalg.lstsq(b, A)
    x_np, *_ = np.linalg.lstsq(np.asarray(A), np.asarray(b), rcond=None)
    np.testing.assert_allclose(np.asarray(x), x_np, atol=1e-4)


def test_ridge_matches_normal_equations(rng):
    A = jnp.asarray(rng.standard_normal((12, 8)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((12, 2)), jnp.float32)
    alpha = 0.05
    x = linalg.ridge(b, A, alpha=alpha)
    M = np.asarray(A).T @ np.asarray(A) + alpha * np.eye(8)
    expected = np.linalg.solve(M, np.asarray(A).T @ np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-4)


def test_batch_cholesky_solve_spd(rng):
    B, D = 5, 6
    Q = rng.standard_normal((B, D, D))
    A = jnp.asarray(Q @ Q.transpose(0, 2, 1) + 3 * np.eye(D), jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    x = linalg.batch_cholesky_solve(b, A)
    expected = np.linalg.solve(np.asarray(A), np.asarray(b)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-3)


def test_batch_cholesky_solve_fallback_on_non_spd(rng):
    # one indefinite matrix in the batch -> the LU fallback path must engage
    B, D = 3, 4
    Q = rng.standard_normal((B, D, D))
    A = Q @ Q.transpose(0, 2, 1) + 3 * np.eye(D)
    A[1] = np.diag([1.0, -1.0, 1.0, 1.0])  # indefinite but invertible
    A = jnp.asarray(A, jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    x = linalg.batch_cholesky_solve(b, A)
    expected = np.linalg.solve(np.asarray(A), np.asarray(b)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-3)


def test_cholesky_inverse(rng):
    D = 7
    Q = rng.standard_normal((D, D))
    M = jnp.asarray(Q @ Q.T + 2 * np.eye(D), jnp.float32)
    Minv = linalg.cholesky_inverse(M)
    np.testing.assert_allclose(
        np.asarray(Minv), np.linalg.inv(np.asarray(M)), atol=1e-3)


def test_power_iteration_matches_eigh(rng):
    D = 32
    Q = rng.standard_normal((D, D)).astype(np.float32)
    S = Q @ Q.T
    lam, v = linalg.power_iteration(
        lambda u: jnp.asarray(S) @ u,
        jnp.asarray(rng.standard_normal(D), jnp.float32))
    lam_true = np.linalg.eigvalsh(S)[-1]
    np.testing.assert_allclose(float(lam), lam_true, rtol=1e-4)


def test_lipschitz_constant_upper_bounds_true_L(rng):
    W = jnp.asarray(rng.standard_normal((24, 48)), jnp.float32)
    L = float(linalg.lipschitz_constant(W))
    L_true = float(np.linalg.eigvalsh(np.asarray(W).T @ np.asarray(W))[-1])
    assert L >= L_true * (1 - 1e-5)  # safe side for FISTA
    assert L <= L_true * 1.01


def test_cg_solves_spd_system(rng):
    D = 20
    Q = rng.standard_normal((D, D))
    A = jnp.asarray(Q @ Q.T + 5 * np.eye(D), jnp.float32)
    b = jnp.asarray(rng.standard_normal(D), jnp.float32)
    x = linalg.cg(A, b, maxiter=200, tol=1e-10, rtol=1e-12)
    expected = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-3)


def test_batch_cg_matches_per_sample_solves(rng):
    D, B = 16, 4
    Q = rng.standard_normal((D, D))
    A = jnp.asarray(Q @ Q.T + 5 * np.eye(D), jnp.float32)
    b = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    x = linalg.batch_cg(A, b, maxiter=300, tol=1e-10, rtol=1e-12)
    expected = np.linalg.solve(np.asarray(A), np.asarray(b).T).T
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-3)


def test_cg_is_jittable(rng):
    D = 12
    Q = rng.standard_normal((D, D))
    A = jnp.asarray(Q @ Q.T + 5 * np.eye(D), jnp.float32)
    b = jnp.asarray(rng.standard_normal(D), jnp.float32)
    x = jax.jit(lambda A, b: linalg.cg(A, b, maxiter=100, rtol=1e-12))(A, b)
    expected = np.linalg.solve(np.asarray(A), np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), expected, atol=1e-3)


def test_golden_section_finds_quadratic_min():
    t, f = linalg.golden_section(lambda t: (t - 2.5) ** 2 + 1.0, 0.0, 10.0,
                                 maxiter=40)
    # accuracy is bounded by f32 resolution of the objective near the
    # minimum (the quadratic is flat to ~3e-4 around t*), not by the search
    assert abs(float(t) - 2.5) < 1e-3
    assert abs(float(f) - 1.0) < 1e-6


def test_golden_section_jittable():
    f = jax.jit(lambda: linalg.golden_section(
        lambda t: jnp.cos(t), 0.0, 2 * jnp.pi, maxiter=50))
    t, _ = f()
    assert abs(float(t) - np.pi) < 1e-3


def test_lanes_cholesky_kernel_matches_solve(rng):
    """Lane-parallel Pallas Cholesky solve (interpret mode) vs dense
    solve, including the NaN-on-non-PD contract."""
    from lasso_tpu.ops.batched_cholesky import batch_cholesky_solve_lanes
    B, D = 16, 12
    A = rng.standard_normal((B, D, D)).astype(np.float32)
    A = A @ A.transpose(0, 2, 1) + 2 * np.eye(D, dtype=np.float32)
    b = rng.standard_normal((B, D)).astype(np.float32)
    x = batch_cholesky_solve_lanes(jnp.asarray(b), jnp.asarray(A),
                                   interpret=True)
    x_ref = np.stack([np.linalg.solve(A[i], b[i]) for i in range(B)])
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-5)

    # non-PD input -> NaNs (the caller's fallback trigger)
    A_bad = np.array(A)
    A_bad[3] = -np.eye(D, dtype=np.float32)
    x_bad = batch_cholesky_solve_lanes(jnp.asarray(b), jnp.asarray(A_bad),
                                       interpret=True)
    assert not np.all(np.isfinite(np.asarray(x_bad)))


def test_batch_cholesky_solve_pallas_route(rng):
    """batch_cholesky_solve(use_pallas=True) must agree with the XLA route
    and keep the LU fallback for non-PD batches."""
    from lasso_tpu.linalg.basic import batch_cholesky_solve
    B, D = 16, 8
    A = rng.standard_normal((B, D, D)).astype(np.float32)
    A = A @ A.transpose(0, 2, 1) + 2 * np.eye(D, dtype=np.float32)
    b = rng.standard_normal((B, D)).astype(np.float32)
    x_p = batch_cholesky_solve(jnp.asarray(b), jnp.asarray(A),
                               use_pallas=True)
    x_x = batch_cholesky_solve(jnp.asarray(b), jnp.asarray(A),
                               use_pallas=False)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_x), atol=1e-5)

    # indefinite matrix in the batch -> whole batch takes the LU fallback
    A_bad = np.array(A)
    A_bad[0] = A_bad[0] - 10 * np.eye(D, dtype=np.float32)
    x_p = batch_cholesky_solve(jnp.asarray(b), jnp.asarray(A_bad),
                               use_pallas=True)
    x_ref = np.stack([np.linalg.solve(A_bad[i], b[i]) for i in range(B)])
    np.testing.assert_allclose(np.asarray(x_p), x_ref, atol=1e-4)


def test_lanes_cholesky_odd_batch_sizes(rng):
    """Batches that don't divide into 128-lane tiles are padded with
    identity systems (regression: Mosaic rejects lane blocks < 128 unless
    they equal the full dim)."""
    from lasso_tpu.linalg.basic import batch_cholesky_solve
    for B, D in ((9, 8), (130, 16)):
        A = rng.standard_normal((B, D, D)).astype(np.float32)
        A = A @ A.transpose(0, 2, 1) + 2 * np.eye(D, dtype=np.float32)
        b = rng.standard_normal((B, D)).astype(np.float32)
        x = batch_cholesky_solve(jnp.asarray(b), jnp.asarray(A),
                                 use_pallas=True)
        x_ref = np.stack([np.linalg.solve(A[i], b[i]) for i in range(B)])
        np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-4)
