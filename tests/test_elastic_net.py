"""Elastic net (l2 > 0) for ista / coord_descent / coord_descent_mod
(TPU extension; the reference is lasso-only — its cd-mod even ports
sklearn's enet_coordinate_descent with the beta term dropped).

Objective: ``0.5||z W^T - x||^2 + alpha||z||_1 + 0.5*l2*||z||^2``.
Design: the l2 quadratic lives in the NONSMOOTH part, so the prox gains
a multiplicative contraction 1/(1 + l2*lr) after the shrink and the
smooth Lipschitz constant / lr='auto' are untouched."""

import numpy as np
import jax.numpy as jnp
import pytest

from lasso_tpu.linear.solvers import (coord_descent, coord_descent_mod,
                                      ista)


@pytest.fixture
def problem(rng):
    n, d, k = 12, 64, 128
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    W = jnp.asarray(
        (rng.standard_normal((d, k)) / np.sqrt(d)).astype(np.float32))
    z0 = jnp.zeros((n, k), jnp.float32)
    return x, W, z0


ALPHA, L2 = 0.15, 0.3


def enet_objective(x, W, z, alpha=ALPHA, l2=L2):
    x, W, z = map(np.asarray, (x, W, z))
    r = z.astype(np.float64) @ W.astype(np.float64).T - x
    return (0.5 * np.sum(r * r) + alpha * np.sum(np.abs(z))
            + 0.5 * l2 * np.sum(z.astype(np.float64) ** 2))


def enet_kkt_violation(x, W, z, alpha=ALPHA, l2=L2, support_tol=1e-6):
    """At an optimum the subgradient condition holds for the smooth part
    W^T(Wz - x) + l2*z."""
    x, W, z = map(np.asarray, (x, W, z))
    g = (z @ W.T - x) @ W + l2 * z
    on = np.abs(z) > support_tol
    v_s = np.abs(g + alpha * np.sign(z)) * on
    v_z = np.maximum(np.abs(g) - alpha, 0.0) * (~on)
    return max(v_s.max(initial=0.0), v_z.max(initial=0.0))


def test_ista_enet_kkt(problem):
    x, W, z0 = problem
    z = ista(x, z0, W, ALPHA, l2=L2, maxiter=1500, tol=0.0,
             use_pallas=False)
    assert enet_kkt_violation(x, W, z, support_tol=1e-5) < 2e-4


def test_l2_zero_is_lasso(problem):
    x, W, z0 = problem
    kw = dict(maxiter=100, tol=0.0, lr=0.08, use_pallas=False)
    z_a = np.asarray(ista(x, z0, W, ALPHA, **kw))
    z_b = np.asarray(ista(x, z0, W, ALPHA, l2=0.0, **kw))
    np.testing.assert_array_equal(z_a, z_b)


def test_ista_enet_fused_matches_xla(problem):
    x, W, z0 = problem
    kw = dict(maxiter=100, tol=0.0, lr=0.08, l2=L2)
    z_x = np.asarray(ista(x, z0, W, ALPHA, use_pallas=False, **kw))
    # single-step fused
    z_f1 = np.asarray(ista(x, z0, W, ALPHA, use_pallas=True,
                           fuse_steps=1, **kw))
    np.testing.assert_allclose(z_f1, z_x, atol=2e-5)
    # multi-step fused
    z_fm = np.asarray(ista(x, z0, W, ALPHA, use_pallas=True,
                           fuse_steps=25, **kw))
    np.testing.assert_allclose(z_fm, z_x, atol=2e-5)


def test_ista_enet_backtrack(problem):
    """Backtracking settles in an f32 limit cycle ~2e-4 from the optimum
    in z (the accepted lr differs from 1/L, so prox-grad progress stalls
    at f32 resolution), which reads as ~1e-3 KKT violation even though
    the objective matches the fixed-lr solve to <1e-8 relative — assert
    the objective, plus a loose KKT sanity bound."""
    x, W, z0 = problem
    z = ista(x, z0, W, ALPHA, l2=L2, maxiter=1200, tol=0.0,
             backtrack=True, lr=1.0, use_pallas=False)
    assert enet_kkt_violation(x, W, z, support_tol=1e-5) < 3e-3
    f_bt = enet_objective(x, W, z)
    f_ref = enet_objective(x, W, ista(x, z0, W, ALPHA, l2=L2,
                                      maxiter=2000, tol=0.0,
                                      use_pallas=False))
    assert f_bt <= f_ref + 1e-6 * abs(f_ref)


def test_ista_enet_restart_mixed(problem):
    """restart + precision continuation compose with l2."""
    x, W, z0 = problem
    kw = dict(maxiter=100, tol=0.0, l2=L2)
    z_r = ista(x, z0, W, ALPHA, use_pallas=True, fuse_steps=25,
               kernel_precision="mixed", restart=True, **kw)
    f_r = enet_objective(x, W, z_r)
    f_x = enet_objective(x, W, ista(x, z0, W, ALPHA, use_pallas=False,
                                    **kw))
    assert f_r <= f_x + 1e-3 * abs(f_x)


def test_cd_enet_matches_ista(problem):
    x, W, z0 = problem
    for pallas in (False, True):
        z_cd = coord_descent(x, W, None, ALPHA, l2=L2, maxiter=4000,
                             tol=1e-8, use_pallas=pallas)
        f_cd = enet_objective(x, W, z_cd)
        z_is = ista(x, z0, W, ALPHA, l2=L2, maxiter=2000, tol=0.0,
                    use_pallas=False)
        f_is = enet_objective(x, W, z_is)
        assert abs(f_cd - f_is) <= 1e-4 * abs(f_is), (pallas, f_cd, f_is)


def test_cd_mod_enet_gap_certificate(problem):
    """cd-mod's enet duality gap certifies its own solution, and the
    objective agrees with ista's."""
    x, W, z0 = problem
    for pallas in (False, True):
        z, gap = coord_descent_mod(x, W, None, ALPHA, l2=L2,
                                   max_iter=2000, tol=1e-8,
                                   use_pallas=pallas)
        assert float(jnp.max(gap)) < 1e-4
        f_cm = enet_objective(x, W, z)
        f_is = enet_objective(x, W, ista(x, z0, W, ALPHA, l2=L2,
                                         maxiter=2000, tol=0.0,
                                         use_pallas=False))
        assert abs(f_cm - f_is) <= 1e-4 * abs(f_is), (pallas, f_cm, f_is)


def test_enet_nonneg(problem):
    x, W, z0 = problem
    z = np.asarray(ista(x, z0, W, ALPHA, l2=L2, nonneg=True,
                        maxiter=1000, tol=0.0, use_pallas=False))
    assert z.min() >= 0.0
    g = (z @ np.asarray(W).T - np.asarray(x)) @ np.asarray(W) + L2 * z
    assert (g + ALPHA).min() > -2e-4            # z_k = 0: g_k >= -alpha
    on = z > 1e-5
    assert np.abs((g + ALPHA) * on).max() < 2e-4  # support: g_k = -alpha


def test_enet_per_feature_and_per_sample_alpha(problem):
    """l2 composes with both vector-alpha forms (the l2 term is
    2-homogeneous, so per-sample row rescaling keeps l2 unchanged)."""
    x, W, z0 = problem
    n, k = x.shape[0], W.shape[1]
    a_row = jnp.full((1, k), ALPHA)
    a_vec = jnp.full((n,), ALPHA)
    kw = dict(maxiter=150, tol=0.0, lr=0.08, l2=L2, use_pallas=False)
    z_s = np.asarray(ista(x, z0, W, ALPHA, **kw))
    z_r = np.asarray(ista(x, z0, W, a_row, **kw))
    z_v = np.asarray(ista(x, z0, W, a_vec, **kw))
    np.testing.assert_allclose(z_r, z_s, atol=3e-5)
    np.testing.assert_allclose(z_v, z_s, atol=3e-4)


def test_enet_shrinks_coefficients(problem):
    """The ridge term shrinks magnitudes: ||z(l2)||_2 decreases in l2."""
    x, W, z0 = problem
    kw = dict(maxiter=600, tol=0.0, use_pallas=False)
    norms = [float(jnp.sum(jnp.square(
        ista(x, z0, W, ALPHA, l2=l2v, **kw)))) for l2v in (0.0, 0.3, 1.0)]
    assert norms[0] > norms[1] > norms[2]
