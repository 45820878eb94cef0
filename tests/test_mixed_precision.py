"""Validation matrix for kernel_precision='mixed' (VERDICT r2 item 1).

'mixed' runs the bulk of the FISTA budget in native-bf16 kernel passes and
the tail (~25% of the fused blocks) in f32 split-float. The claim promoted
to the headline benchmark is: **at a fixed iteration budget, the mixed run
reaches the same final objective as the all-f32 run** (within f32
rounding), because FISTA forgets its history geometrically — the f32 tail
contracts the bf16-grade iterate back onto the f32 trajectory.

This file certifies that claim across problem sizes, penalties, stopping
modes (tol=0 fixed-budget and tol>0 convergence mode), and composition
with per-row adaptive restart — with the optimum anchored by an x64
reference solve so "gap-to-optimum" is measured against a trustworthy
f64 ground truth rather than against another f32 run.

All fused runs use interpret-mode Pallas on the forced-CPU backend
(tests/conftest.py), i.e. the exact kernel arithmetic, minus Mosaic.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasso_tpu.linear.solvers import ista


def _problem(seed, n, d, k, alpha):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    W = jnp.asarray(
        (rng.standard_normal((d, k)) / np.sqrt(d)).astype(np.float32))
    z0 = jnp.zeros((n, k), jnp.float32)
    return x, W, z0


def _obj(x, W, alpha, z):
    z = np.asarray(z, np.float64)
    x64 = np.asarray(x, np.float64)
    W64 = np.asarray(W, np.float64)
    r = z @ W64.T - x64
    return float(0.5 * np.sum(r * r) + alpha * np.sum(np.abs(z)))


def _f_star_x64(x, W, alpha, lr, maxiter=6000):
    """f64 anchor: long unfused FISTA run under x64 (the ground-truth
    optimum the relative gaps are measured against)."""
    with jax.enable_x64():
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        W64 = jnp.asarray(np.asarray(W), jnp.float64)
        z0 = jnp.zeros((x.shape[0], W.shape[1]), jnp.float64)
        z_star = ista(x64, z0, W64, alpha, lr=lr, maxiter=maxiter,
                      tol=1e-14, use_pallas=False)
    return _obj(x, W, alpha, z_star), np.asarray(z_star)


# (n, d, k, alpha, restart): sizes span small/rectangular, alphas span
# dense->sparse supports, restart exercises the t-vector carry across the
# bf16 -> f32 phase switch
MATRIX = [
    (16, 128, 256, 0.05, False),
    (16, 128, 256, 0.3, False),
    (32, 256, 512, 0.1, False),
    (16, 128, 256, 0.1, True),
    (32, 256, 512, 0.05, True),
]


@pytest.mark.parametrize("n,d,k,alpha,restart", MATRIX)
def test_mixed_matches_f32_final_objective(n, d, k, alpha, restart):
    """Fixed budget (the headline-bench regime, tol=0): the mixed run's
    gap-to-(x64)-optimum must match the all-f32 fused run's within 10%
    slack + f32 rounding floor."""
    x, W, z0 = _problem(n + k, n, d, k, alpha)
    lr = 0.08
    maxiter = 200  # auto fuse picks S=25, 8 blocks, 2-block f32 tail
    f_star, _ = _f_star_x64(x, W, alpha, lr)

    kw = dict(lr=lr, maxiter=maxiter, tol=0.0, use_pallas=True,
              fuse_steps=25, restart=restart)
    z_f = ista(x, z0, W, alpha, **kw)
    z_m = ista(x, z0, W, alpha, kernel_precision="mixed", **kw)

    gap_f = (_obj(x, W, alpha, z_f) - f_star) / abs(f_star)
    gap_m = (_obj(x, W, alpha, z_m) - f_star) / abs(f_star)
    assert gap_m >= -1e-7, "gap below the x64 optimum: anchor is wrong"
    # f32 rounding floor ~1e-7 relative; 'same final objective' claim
    assert gap_m <= gap_f * 1.10 + 2e-7, (gap_m, gap_f)


@pytest.mark.parametrize("alpha", [0.05, 0.3])
def test_mixed_convergence_mode_tol_positive(alpha):
    """tol>0 (convergence mode): the mixed bf16 phase's convergence
    statistic is discarded, so the run must never stop before the f32
    tail has run, and the final objective must match the all-f32
    convergence run's gap within the same envelope."""
    n, d, k = 16, 128, 256
    x, W, z0 = _problem(77, n, d, k, alpha)
    lr, tol = 0.08, 1e-6
    f_star, _ = _f_star_x64(x, W, alpha, lr)

    kw = dict(lr=lr, maxiter=400, tol=tol, use_pallas=True, fuse_steps=25,
              return_iters=True)
    z_f, k_f = ista(x, z0, W, alpha, **kw)
    z_m, k_m = ista(x, z0, W, alpha, kernel_precision="mixed", **kw)

    gap_f = (_obj(x, W, alpha, z_f) - f_star) / abs(f_star)
    gap_m = (_obj(x, W, alpha, z_m) - f_star) / abs(f_star)
    assert gap_m <= gap_f * 1.10 + 2e-7, (gap_m, gap_f)
    # stopping never earlier than a block boundary at/after the bf16 bulk
    assert int(k_m) % 25 == 0 or int(k_m) == 400


def test_mixed_support_recovery_matches_f32():
    """The serving-relevant property: the support (nonzero pattern) of the
    mixed solution must agree with the f32 run's at a sparse alpha."""
    n, d, k = 16, 128, 256
    x, W, z0 = _problem(5, n, d, k, 0.3)
    kw = dict(lr=0.08, maxiter=200, tol=0.0, use_pallas=True,
              fuse_steps=25)
    z_f = np.asarray(ista(x, z0, W, 0.3, **kw))
    z_m = np.asarray(ista(x, z0, W, 0.3, kernel_precision="mixed", **kw))
    # supports agree except possibly coordinates at the shrink boundary
    disagree = np.mean((z_f != 0) != (z_m != 0))
    assert disagree < 0.01, disagree
    np.testing.assert_allclose(z_m, z_f, atol=5e-5)


def test_mixed_tail_blocks_schedule():
    """The ~12.5%-of-blocks f32 tail (minimum 1, always >= 1 bf16 block
    unless there is only one block). One S-iteration f32 block contracts
    a bf16-grade iterate onto the f32 trajectory even at converged
    budgets (see _mixed_tail_blocks docstring)."""
    from lasso_tpu.linear.solvers.ista import _mixed_tail_blocks
    assert _mixed_tail_blocks(1) == 1
    assert _mixed_tail_blocks(2) == 1
    assert _mixed_tail_blocks(4) == 1
    assert _mixed_tail_blocks(8) == 1
    assert _mixed_tail_blocks(16) == 2
    assert _mixed_tail_blocks(64) == 8
    for n in range(1, 64):
        t = _mixed_tail_blocks(n)
        assert 1 <= t <= n
        assert n == 1 or t < n


def test_mixed_converged_budget_reaches_f32_floor():
    """At a budget long enough to hit the f32 rounding floor, the mixed
    run's gap-to-x64-optimum must equal the all-f32 run's — the direct
    certification that one f32 tail block fully contracts the bf16
    phase's rounding."""
    n, d, k, alpha, lr = 16, 128, 256, 0.3, 0.08
    x, W, z0 = _problem(99, n, d, k, alpha)
    f_star, _ = _f_star_x64(x, W, alpha, lr, maxiter=20000)

    kw = dict(lr=lr, maxiter=800, tol=0.0, use_pallas=True, fuse_steps=25)
    gap_f = (_obj(x, W, alpha, ista(x, z0, W, alpha, **kw))
             - f_star) / abs(f_star)
    gap_m = (_obj(x, W, alpha, ista(x, z0, W, alpha,
                                    kernel_precision="mixed", **kw))
             - f_star) / abs(f_star)
    assert gap_f < 1e-7, "budget must reach the f32 floor"
    assert gap_m <= gap_f * 1.10 + 1e-10, (gap_m, gap_f)
