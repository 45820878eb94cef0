"""Conv sparse coding: Lipschitz estimators cross-check (the reference's
own implicit test), conv FISTA convergence + golden parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasso_tpu.conv2d import (LipBoundConv2d, conv2d, conv_transpose2d,
                              ista_conv2d, lip_bound_conv2d, lip_constant)

from _oracles import load_reference


def conv_lasso_objective(x, z, k, alpha, padding=0):
    x_hat = conv_transpose2d(jnp.asarray(z), jnp.asarray(k), padding=padding)
    rss = 0.5 * float(jnp.sum(jnp.square(x_hat - jnp.asarray(x))))
    return rss + alpha * float(jnp.sum(jnp.abs(z)))


def test_lip_estimators_cross_check(rng):
    # exact power-iteration eigenvalue must lower-bound the Araujo bound
    # (mirrors the reference's two estimators cross-checking each other)
    k = jnp.asarray(rng.standard_normal((4, 3, 3, 3)), jnp.float32)
    imsize = (10, 10)
    exact = float(lip_constant(k, imsize, transpose=True, padding=1))
    bound = float(lip_bound_conv2d(k, padding=1))
    assert exact <= bound * 1.01
    assert bound <= exact * 3.0  # the bound is close, not loose


def test_lip_bound_module_matches_functional(rng):
    k = jnp.asarray(rng.standard_normal((4, 3, 3, 3)), jnp.float32)
    mod = LipBoundConv2d(k.shape, padding=1)
    np.testing.assert_allclose(float(mod(k)),
                               float(lip_bound_conv2d(k, padding=1)),
                               rtol=1e-5)


def test_lip_bound_validation():
    with pytest.raises(ValueError):
        lip_bound_conv2d(jnp.zeros((2, 2, 3, 4)), padding=1)
    with pytest.raises(ValueError):
        lip_bound_conv2d(jnp.zeros((2, 2, 4, 4)), padding=1)
    with pytest.raises(NotImplementedError):
        lip_bound_conv2d(jnp.zeros((2, 2, 3, 3)), padding=1, stride=2)


def test_ista_conv2d_decreases_objective(rng):
    N, Cz, Cx, H = 2, 6, 3, 12
    k = jnp.asarray(rng.standard_normal((Cz, Cx, 3, 3)) * 0.2, jnp.float32)
    x = jnp.asarray(rng.standard_normal((N, Cx, H, H)), jnp.float32)
    z0 = jnp.zeros((N, Cz, H, H), jnp.float32)
    alpha = 0.05
    z = ista_conv2d(x, z0, k, alpha=alpha, padding=1, maxiter=300, tol=1e-8)
    f = conv_lasso_objective(x, z, k, alpha, padding=1)
    f0 = conv_lasso_objective(x, z0, k, alpha, padding=1)
    assert f < f0
    assert float(jnp.mean(jnp.abs(z) < 1e-6)) > 0.1  # sparse


def test_ista_conv2d_golden_parity(rng):
    lasso_ref = load_reference()
    if lasso_ref is None:
        pytest.skip("reference library unavailable")
    import torch
    from lasso.conv2d.ista import ista_conv2d as ref_ista

    N, Cz, Cx, H = 2, 4, 3, 8
    k_np = (rng.standard_normal((Cz, Cx, 3, 3)) * 0.2).astype(np.float32)
    x_np = rng.standard_normal((N, Cx, H, H)).astype(np.float32)
    z0_np = np.zeros((N, Cz, H, H), np.float32)
    alpha = 0.05

    z_ref = ref_ista(torch.from_numpy(x_np), torch.from_numpy(z0_np),
                     torch.from_numpy(k_np), alpha=alpha, padding=1,
                     maxiter=200, tol=1e-9)
    z_tpu = ista_conv2d(jnp.asarray(x_np), jnp.asarray(z0_np),
                        jnp.asarray(k_np), alpha=alpha, padding=1,
                        maxiter=200, tol=1e-9)
    f_ref = conv_lasso_objective(x_np, z_ref.numpy(), k_np, alpha, padding=1)
    f_tpu = conv_lasso_objective(x_np, np.asarray(z_tpu), k_np, alpha,
                                 padding=1)
    assert abs(f_tpu - f_ref) <= 1e-3 * max(1.0, abs(f_ref))


def test_lip_bound_golden_parity(rng):
    lasso_ref = load_reference()
    if lasso_ref is None:
        pytest.skip("reference library unavailable")
    import torch
    from lasso.conv2d.lip_const import lip_bound_conv2d as ref_bound

    k_np = rng.standard_normal((4, 3, 5, 5)).astype(np.float32)
    ours = float(lip_bound_conv2d(jnp.asarray(k_np), padding=2))
    ref = float(ref_bound(torch.from_numpy(k_np), padding=2))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_batch_cg_conv2d_solves_normal_equations(rng):
    from lasso_tpu.conjgrad import batch_cg_conv2d
    k = jnp.asarray(rng.standard_normal((3, 2, 3, 3)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 3, 6, 6)), jnp.float32)
    tik = 0.5
    v = batch_cg_conv2d(k, b, tik=tik, maxiter=400, tol=1e-10, rtol=1e-10)
    # verify A v ~ b with A = conv2d(conv_transpose2d(. , k), k) + tik I
    Av = conv2d(conv_transpose2d(v, k), k) + tik * v
    np.testing.assert_allclose(np.asarray(Av), np.asarray(b), atol=1e-3)


def test_conv_ista_auto_lr_stride2(rng):
    """stride > 1 auto-lr: the reference raises NotImplementedError; we
    fall back to the exact power-iteration Lipschitz constant."""
    from lasso_tpu.conv2d import ista_conv2d, conv_transpose2d
    N, Cz, Hz = 4, 6, 8
    ks, stride = 4, 2
    Wk = jnp.asarray(rng.standard_normal((Cz, 1, ks, ks)).astype(np.float32)
                     * 0.2)
    z_true = jnp.asarray(
        (rng.standard_normal((N, Cz, Hz, Hz)) *
         (rng.uniform(size=(N, Cz, Hz, Hz)) > 0.9)).astype(np.float32))
    x = conv_transpose2d(z_true, Wk, stride=stride)
    z0 = jnp.zeros_like(z_true)
    z = ista_conv2d(x, z0, Wk, alpha=0.01, stride=stride, maxiter=300,
                    tol=1e-8, lr="auto")
    x_hat = conv_transpose2d(z, Wk, stride=stride)
    rel = float(jnp.linalg.norm(x_hat - x) / jnp.linalg.norm(x))
    assert rel < 0.2, rel


def test_ista_conv2d_restart_reduces_iterations(rng):
    """Per-sample adaptive restart must reach the same objective in fewer
    iterations (same lever as linear ista(restart=True))."""
    N, Cz, Cx, H = 4, 6, 2, 10
    k = jnp.asarray((rng.standard_normal((Cz, Cx, 3, 3)) * 0.2)
                    .astype(np.float32))
    x = jnp.asarray(rng.standard_normal((N, Cx, H, H)).astype(np.float32))
    z0 = jnp.zeros((N, Cz, H, H), jnp.float32)
    alpha = 0.05

    def obj(z):
        xh = conv_transpose2d(z, k, padding=1)
        return float(0.5 * jnp.sum(jnp.square(xh - x))
                     + alpha * jnp.sum(jnp.abs(z)))

    z_p, k_p = ista_conv2d(x, z0, k, alpha=alpha, padding=1, maxiter=2000,
                           tol=1e-8, return_iters=True)
    z_r, k_r = ista_conv2d(x, z0, k, alpha=alpha, padding=1, maxiter=2000,
                           tol=1e-8, restart=True, return_iters=True)
    assert int(k_r) < int(k_p)
    assert obj(z_r) <= obj(z_p) * (1 + 1e-5)


def _conv_f_star_x64(x, W, alpha, padding, maxiter=4000):
    """f64 anchor for the conv gap tests (long unfused x64 FISTA)."""
    with jax.enable_x64():
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        W64 = jnp.asarray(np.asarray(W), jnp.float64)
        z0 = jnp.zeros((x.shape[0], W.shape[0]) + x.shape[2:], jnp.float64)
        z = ista_conv2d(x64, z0, W64, alpha=alpha, padding=padding,
                        maxiter=maxiter, tol=1e-14)
        xh = conv_transpose2d(z, W64, padding=padding)
        return float(0.5 * jnp.sum(jnp.square(xh - x64))
                     + alpha * jnp.sum(jnp.abs(z)))


@pytest.mark.parametrize("restart", [False, True])
def test_ista_conv2d_mixed_precision(rng, restart):
    """Conv precision continuation (kernel_precision='mixed'): same
    contract as the linear solver's — at a fixed budget the mixed run's
    gap-to-optimum stays within the measured envelope of the f32 run's
    and at/below the bf16-only run's. The explicit reduce_precision
    operand rounding makes this a real bf16 test on CPU too."""
    N, Cz, Cx, H = 4, 6, 2, 10
    k = jnp.asarray((rng.standard_normal((Cz, Cx, 3, 3)) * 0.2)
                    .astype(np.float32))
    x = jnp.asarray(rng.standard_normal((N, Cx, H, H)).astype(np.float32))
    z0 = jnp.zeros((N, Cz, H, H), jnp.float32)
    alpha = 0.05
    f_star = _conv_f_star_x64(x, k, alpha, padding=1)

    def obj64(z):
        z64 = np.asarray(z, np.float64)
        with jax.enable_x64():
            xh = conv_transpose2d(jnp.asarray(z64), 
                                  jnp.asarray(np.asarray(k, np.float64)),
                                  padding=1)
            return float(0.5 * jnp.sum(jnp.square(
                xh - jnp.asarray(np.asarray(x, np.float64))))
                + alpha * np.sum(np.abs(z64)))

    kw = dict(alpha=alpha, padding=1, maxiter=200, tol=0.0, restart=restart)
    gaps = {}
    for kp in ("f32", "mixed", "bf16"):
        z = ista_conv2d(x, z0, k, kernel_precision=kp, **kw)
        gaps[kp] = (obj64(z) - f_star) / abs(f_star)
    assert gaps["mixed"] >= -1e-7
    assert gaps["mixed"] <= 1.5 * gaps["f32"] + 2e-6, gaps
    assert gaps["mixed"] <= gaps["bf16"] + 1e-7, gaps


def test_ista_conv2d_mixed_never_stops_before_tail(rng):
    """tol>0 under 'mixed': the bf16 bulk's convergence statistic is
    discarded, so (at a tol tight enough that the f32 check cannot pass
    inside the bulk's span) the executed iteration count reaches the
    f32 tail (>= maxiter - tail)."""
    N, Cz, Cx, H = 2, 6, 2, 10
    k = jnp.asarray((rng.standard_normal((Cz, Cx, 3, 3)) * 0.2)
                    .astype(np.float32))
    x = jnp.asarray(rng.standard_normal((N, Cx, H, H)).astype(np.float32))
    z0 = jnp.zeros((N, Cz, H, H), jnp.float32)
    maxiter = 160
    z_m, k_m = ista_conv2d(x, z0, k, alpha=0.05, padding=1,
                           maxiter=maxiter, tol=1e-7,
                           kernel_precision="mixed", return_iters=True)
    assert int(k_m) >= maxiter - max(1, maxiter // 8)
    with pytest.raises(ValueError):
        ista_conv2d(x, z0, k, alpha=0.05, kernel_precision="tf32")
    with pytest.raises(ValueError):
        ista_conv2d(x, z0, k, alpha=0.05, kernel_precision="mixed",
                    mixed_tail=0)
