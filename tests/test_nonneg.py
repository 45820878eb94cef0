"""Non-negative lasso (nonneg=True; TPU extension — the reference has no
constrained variant). The prox becomes max(. - alpha*lr, 0); the tests
certify feasibility, the nonneg-lasso KKT conditions against the smooth
gradient, cross-solver agreement (ista vs greedy CD), path parity
(fused kernel == plain XLA), and composition with the performance stack
(mixed precision, restart, per-sample alpha)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lasso_tpu.linear.solvers import coord_descent, ista
from lasso_tpu.conv2d import ista_conv2d, conv_transpose2d


def _problem(rng, n=16, d=64, k=128):
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    return x, jnp.asarray(W), jnp.zeros((n, k), jnp.float32)


def _kkt_violation_nonneg(x, W, z, alpha):
    """max violation of the nonneg-lasso KKT system:
    z_j > 0  ->  g_j + alpha == 0 ;  z_j == 0  ->  g_j + alpha >= 0."""
    x64 = np.asarray(x, np.float64)
    W64 = np.asarray(W, np.float64)
    z64 = np.asarray(z, np.float64)
    g = (z64 @ W64.T - x64) @ W64
    on = z64 > 0
    v_on = np.abs(g + alpha) * on
    v_off = np.maximum(-(g + alpha), 0.0) * (~on)
    return float(np.maximum(v_on, v_off).max())


def test_ista_nonneg_feasible_and_kkt(rng):
    x, W, z0 = _problem(rng)
    alpha = 0.1
    z = ista(x, z0, W, alpha, lr=0.08, maxiter=4000, tol=1e-10,
             nonneg=True, use_pallas=False)
    z_np = np.asarray(z)
    assert z_np.min() >= 0.0
    assert z_np.max() > 0.0, "degenerate all-zero solution"
    assert _kkt_violation_nonneg(x, W, z, alpha) < 5e-4
    # the unconstrained solution has negatives on this problem — the
    # constraint is active, not vacuous
    z_free = np.asarray(ista(x, z0, W, alpha, lr=0.08, maxiter=2000,
                             tol=1e-10, use_pallas=False))
    assert z_free.min() < 0.0


def test_ista_nonneg_fused_matches_xla(rng):
    x, W, z0 = _problem(rng)
    kw = dict(lr=0.08, maxiter=200, tol=0.0, nonneg=True)
    z_xla = np.asarray(ista(x, z0, W, 0.1, use_pallas=False, **kw))
    z_fused = np.asarray(ista(x, z0, W, 0.1, use_pallas=True,
                              fuse_steps=25, **kw))
    np.testing.assert_allclose(z_fused, z_xla, atol=1e-4)
    assert z_fused.min() >= 0.0


def test_ista_nonneg_composes_with_stack(rng):
    """mixed precision + restart + per-sample alpha, all with the
    nonneg prox: output feasible, objective tracks the plain run."""
    x, W, z0 = _problem(rng)
    alphas = jnp.asarray(rng.uniform(0.05, 0.3, size=(x.shape[0],))
                         .astype(np.float32))
    kw = dict(lr=0.08, maxiter=200, tol=0.0, nonneg=True)
    z_plain = np.asarray(ista(x, z0, W, alphas, use_pallas=False, **kw))
    z_full = np.asarray(ista(x, z0, W, alphas, use_pallas=True,
                             fuse_steps=25, kernel_precision="mixed",
                             restart=True, **kw))
    assert z_full.min() >= 0.0
    W64 = np.asarray(W, np.float64)
    x64 = np.asarray(x, np.float64)
    a64 = np.asarray(alphas, np.float64)[:, None]

    def obj(z):
        r = z.astype(np.float64) @ W64.T - x64
        return 0.5 * np.sum(r * r) + np.sum(a64 * z)

    assert obj(z_full) <= obj(z_plain) * (1 + 1e-3) + 1e-6


def test_cd_nonneg_matches_ista(rng):
    x, W, z0 = _problem(rng)
    alpha = 0.1
    z_i = ista(x, z0, W, alpha, lr=0.08, maxiter=4000, tol=1e-10,
               nonneg=True, use_pallas=False)
    z_c = coord_descent(x, W, alpha=alpha, maxiter=8000, tol=1e-8,
                        nonneg=True, use_pallas=True)
    assert float(jnp.min(z_c)) >= 0.0
    W64 = np.asarray(W, np.float64)
    x64 = np.asarray(x, np.float64)

    def obj(z):
        z = np.asarray(z, np.float64)
        r = z @ W64.T - x64
        return 0.5 * np.sum(r * r) + alpha * np.sum(z)

    f_i, f_c = obj(z_i), obj(z_c)
    assert abs(f_c - f_i) <= 1e-4 * abs(f_i), (f_c, f_i)


def test_conv_nonneg(rng):
    N, Cz, Cx, H = 2, 6, 2, 10
    k = jnp.asarray((rng.standard_normal((Cz, Cx, 3, 3)) * 0.2)
                    .astype(np.float32))
    x = jnp.asarray(rng.standard_normal((N, Cx, H, H)).astype(np.float32))
    z0 = jnp.zeros((N, Cz, H, H), jnp.float32)
    z = ista_conv2d(x, z0, k, alpha=0.02, padding=1, maxiter=400,
                    tol=1e-9, nonneg=True)
    z_np = np.asarray(z)
    assert z_np.min() >= 0.0 and z_np.max() > 0.0
    x_hat = conv_transpose2d(z, k, padding=1)
    # the nonneg code still reconstructs (objective work was done)
    assert float(jnp.linalg.norm(x_hat - x) / jnp.linalg.norm(x)) < 0.9
