"""Pad-and-mask dispatch onto the fused kernels' lane grid.

Real-world problems are rarely lane-aligned (D = 784 image patches,
K = 1000 dictionaries, ragged batches); `ops.common.pad_lasso_operands`
lets ista / coord_descent / group_ista / omp zero-pad onto the
(N % 8, D % 128, K % 128) grid the Pallas kernels want and slice back —
EXACTLY (zero feature rows leave W^T W / W^T x / L unchanged; zero atoms
are invariant coordinates; zero batch rows solve the zero problem).

The decisive check in each case is BIT-exactness against a manually
pre-padded fused run (same kernel, same data, same tol scaling) — that
isolates the dispatch-level padding from kernel rounding, which the
existing fused-kernel tests already calibrate.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lasso_tpu.linear.solvers.coordinate_descent import coord_descent
from lasso_tpu.linear.solvers.group_lasso import (group_ista,
                                                  group_lasso_objective)
from lasso_tpu.linear.solvers.ista import ista
from lasso_tpu.linear.solvers.omp import orthogonal_matching_pursuit

N, D, K = 52, 100, 250


def _problem(rng, n=N, d=D, k=K):
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    return x, jnp.asarray(W)


def _lasso_obj(x, W, z, a, l2=0.0):
    r = z @ W.T - x
    return float(0.5 * jnp.sum(r * r) + jnp.sum(a * jnp.abs(z))
                 + 0.5 * l2 * jnp.sum(z * z))


@pytest.mark.parametrize("kw", [
    {}, {"restart": True}, {"nonneg": True}, {"l2": 0.3},
    {"kernel_precision": "mixed", "tol": 0.0},
])
def test_ista_padded_fused_matches_unfused(rng, kw):
    x, W = _problem(rng)
    z0 = jnp.zeros((N, K), jnp.float32)
    z_f = ista(x, z0, W, 0.1, maxiter=100, use_pallas=True, **kw)
    z_u = ista(x, z0, W, 0.1, maxiter=100, use_pallas=False, **kw)
    l2 = kw.get("l2", 0.0)
    o_f, o_u = _lasso_obj(x, W, z_f, 0.1, l2), _lasso_obj(x, W, z_u, 0.1, l2)
    assert abs(o_f - o_u) <= 1e-4 * abs(o_u)
    if kw.get("kernel_precision") != "mixed":
        # pointwise bound is split-float-emulation rounding class
        np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_u),
                                   atol=5e-3)


def test_ista_per_feature_alpha_row_padded(rng):
    x, W = _problem(rng)
    z0 = jnp.zeros((N, K), jnp.float32)
    a = jnp.asarray(
        np.linspace(0.05, 0.3, K, dtype=np.float32).reshape(1, K))
    z_f = ista(x, z0, W, a, maxiter=100, use_pallas=True)
    z_u = ista(x, z0, W, a, maxiter=100, use_pallas=False)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_u), atol=5e-3)


def test_ista_per_sample_alpha_vector_padded(rng):
    # [N]-alpha composes by recursion: the homogeneity reduction fires
    # first (row-rescaled alpha=1 problem), THEN the rescaled problem
    # hits the pad-and-mask dispatch on its unaligned (N, D, K)
    x, W = _problem(rng)
    z0 = jnp.zeros((N, K), jnp.float32)
    a = jnp.asarray(np.linspace(0.05, 0.3, N, dtype=np.float32))
    z_f = ista(x, z0, W, a, maxiter=100, use_pallas=True)
    z_u = ista(x, z0, W, a, maxiter=100, use_pallas=False)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_u), atol=5e-3)
    a_np = np.asarray(a).reshape(N, 1)
    assert _lasso_obj(x, W, z_f, a_np) <= _lasso_obj(x, W, z_u, a_np) * (
        1 + 1e-4)


def test_ista_padding_bitexact_and_invariant(rng):
    x, W = _problem(rng)
    z0 = jnp.zeros((N, K), jnp.float32)
    xp = jnp.pad(x, ((0, 4), (0, 28)))
    Wp = jnp.pad(W, ((0, 28), (0, 6)))
    z0p = jnp.pad(z0, ((0, 4), (0, 6)))
    z_man = ista(xp, z0p, Wp, 0.1, maxiter=100,
                 tol=1e-5 * (N * K) / z0p.size,
                 use_pallas=True)[:N, :K]
    z_pad = ista(x, z0, W, 0.1, maxiter=100, tol=1e-5, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(z_man), np.asarray(z_pad))
    # padded coordinates are exact fixed points at 0
    z_full = ista(xp, z0p, Wp, 0.1, maxiter=100, use_pallas=True)
    assert float(jnp.max(jnp.abs(z_full[N:]))) == 0.0
    assert float(jnp.max(jnp.abs(z_full[:, K:]))) == 0.0


def test_ista_padded_tol_never_stops_earlier(rng):
    x, W = _problem(rng)
    z0 = jnp.zeros((N, K), jnp.float32)
    _, k_f = ista(x, z0, W, 0.1, maxiter=400, tol=1e-6, use_pallas=True,
                  return_iters=True)
    _, k_u = ista(x, z0, W, 0.1, maxiter=400, tol=1e-6, use_pallas=False,
                  return_iters=True)
    assert int(k_f) >= int(k_u)


@pytest.mark.parametrize("kw", [{}, {"nonneg": True}, {"l2": 0.2}])
def test_cd_padded_fused_matches_unfused(rng, kw):
    x, W = _problem(rng, n=24)
    z_f = coord_descent(x, W, None, 0.3, maxiter=2000, tol=1e-9,
                        use_pallas=True, **kw)
    z_u = coord_descent(x, W, None, 0.3, maxiter=2000, tol=1e-9,
                        use_pallas=False, **kw)
    l2 = kw.get("l2", 0.0)
    o_f, o_u = _lasso_obj(x, W, z_f, 0.3, l2), _lasso_obj(x, W, z_u, 0.3, l2)
    # greedy selection order is rounding-sensitive pre-convergence, so
    # the contract is the converged objective (as in the fused-CD tests)
    assert abs(o_f - o_u) <= 1e-4 * abs(o_u)


def test_cd_padding_bitexact(rng):
    x, W = _problem(rng, n=24)
    xp = jnp.pad(x, ((0, 0), (0, 28)))
    Wp = jnp.pad(W, ((0, 28), (0, 6)))
    z_man = coord_descent(xp, Wp, None, 0.3, maxiter=2000,
                          tol=1e-9 * K / 256, use_pallas=True)[:, :K]
    z_pad = coord_descent(x, W, None, 0.3, maxiter=2000, tol=1e-9,
                          use_pallas=True)
    np.testing.assert_array_equal(np.asarray(z_man), np.asarray(z_pad))


def test_omp_padded_fused_matches_exact_chol(rng):
    x, W = _problem(rng, n=40)
    z_f = orthogonal_matching_pursuit(x, W, n_nonzero_coefs=8,
                                      use_pallas=True)
    z_c = orthogonal_matching_pursuit(x, W, n_nonzero_coefs=8,
                                      solver="chol-full", use_pallas=False)
    assert z_f.shape == (40, K)
    sup_f = np.asarray(z_f != 0)
    sup_c = np.asarray(z_c != 0)
    np.testing.assert_array_equal(sup_f, sup_c)
    r_f = jnp.sum((z_f @ W.T - x) ** 2, axis=1)
    r_c = jnp.sum((z_c @ W.T - x) ** 2, axis=1)
    np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_c), rtol=1e-3)


def test_omp_padding_bitexact(rng):
    x, W = _problem(rng, n=40)
    xp = jnp.pad(x, ((0, 0), (0, 28)))
    Wp = jnp.pad(W, ((0, 28), (0, 6)))
    z_man = orthogonal_matching_pursuit(xp, Wp, n_nonzero_coefs=8,
                                        use_pallas=True)[:, :K]
    z_pad = orthogonal_matching_pursuit(x, W, n_nonzero_coefs=8,
                                        use_pallas=True)
    np.testing.assert_array_equal(np.asarray(z_man), np.asarray(z_pad))


@pytest.mark.parametrize("kw", [
    {"groups": 8}, {"groups": 8, "l1_alpha": 0.05},
])
def test_group_padded_fused_matches_unfused(rng, kw):
    x, W = _problem(rng, n=28, k=240)
    z0 = jnp.zeros((28, 240), jnp.float32)
    z_f = group_ista(x, z0, W, 0.15, maxiter=200, use_pallas=True, **kw)
    z_u = group_ista(x, z0, W, 0.15, maxiter=200, use_pallas=False, **kw)
    o_f = group_lasso_objective(x, W, z_f, 0.15, kw["groups"],
                                l1_alpha=kw.get("l1_alpha", 0.0))
    o_u = group_lasso_objective(x, W, z_u, 0.15, kw["groups"],
                                l1_alpha=kw.get("l1_alpha", 0.0))
    assert abs(float(o_f) - float(o_u)) <= 1e-4 * abs(float(o_u))
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_u), atol=5e-3)


def test_group_padding_bitexact(rng):
    n, k = 28, 240
    x, W = _problem(rng, n=n, k=k)
    z0 = jnp.zeros((n, k), jnp.float32)
    xp = jnp.pad(x, ((0, 4), (0, 28)))
    Wp = jnp.pad(W, ((0, 28), (0, 16)))
    z0p = jnp.pad(z0, ((0, 4), (0, 16)))
    ids = np.repeat(np.arange(k // 8, dtype=np.int32), 8)
    ids_p = np.concatenate([ids, np.zeros(16, np.int32)])
    z_man = group_ista(xp, z0p, Wp, 0.15, groups=ids_p, maxiter=200,
                       tol=1e-5 * (n * k) / z0p.size,
                       use_pallas=True)[:n, :k]
    z_pad = group_ista(x, z0, W, 0.15, groups=8, maxiter=200, tol=1e-5,
                       use_pallas=True)
    np.testing.assert_array_equal(np.asarray(z_man), np.asarray(z_pad))
