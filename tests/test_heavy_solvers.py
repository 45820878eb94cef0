"""Interior point, split Bregman, orthant-wise Newton, constrained
inference: cross-solver consistency (BASELINE config #3) + golden parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from lasso_tpu.linear import sparse_encode
from lasso_tpu.linear.solvers import (constrained_inference, interior_point,
                                      orthant_wise_newton, split_bregman)

from _oracles import lasso_objective, load_reference


def make_problem(rng, n=10, d=12, k=16, alpha=0.3):
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(W), alpha


@pytest.fixture
def fista_solution(rng):
    x, W, alpha = make_problem(rng)
    z = sparse_encode(x, W, alpha, algorithm="ista", maxiter=5000, tol=1e-10)
    return x, W, alpha, lasso_objective(x, W, z, alpha)


def test_interior_point_matches_fista(fista_solution):
    x, W, alpha, f_star = fista_solution
    # tol=1e-2 is the reference default; tighter tols need >50 Newton iters
    # in f32 (the reference behaves identically)
    z, success = interior_point(x, W, alpha=alpha, maxiter=50, tol=1e-2)
    f_ip = lasso_objective(x, W, z, alpha)
    assert bool(success)
    assert abs(f_ip - f_star) < 1e-2 * max(1.0, abs(f_star))


def test_split_bregman_matches_fista(fista_solution):
    x, W, alpha, f_star = fista_solution
    z, itn = split_bregman(W, x, alpha=alpha, maxiter=200, niter_inner=5,
                           lambd=1.0, tol=1e-8)
    f_sb = lasso_objective(x, W, z, alpha)
    assert abs(f_sb - f_star) < 1e-2 * max(1.0, abs(f_star))


def test_own_matches_fista(fista_solution):
    # OWN (reference and ours alike) stalls a few percent above the true
    # optimum on overcomplete dictionaries — the orthant projection zeroes
    # progress near sign changes. Assert it gets close, not optimal.
    x, W, alpha, f_star = fista_solution
    z = sparse_encode(x, W, alpha, algorithm="own", maxiter=100, xtol=1e-7)
    f_own = lasso_objective(x, W, z, alpha)
    assert f_own < f_star * 1.1
    f0 = lasso_objective(x, W, np.zeros_like(np.asarray(z)), alpha)
    assert f_own < f0


def test_interior_point_golden_parity(rng):
    lasso_ref = load_reference()
    if lasso_ref is None:
        pytest.skip("reference library unavailable")
    import torch

    x_np = rng.standard_normal((6, 8)).astype(np.float32)
    W_np = rng.standard_normal((8, 12)).astype(np.float32)
    W_np /= np.linalg.norm(W_np, axis=0, keepdims=True)
    alpha = 0.3

    z_ref, ok_ref = lasso_ref.linear.solvers.interior_point(
        torch.from_numpy(x_np), torch.from_numpy(W_np), alpha=alpha,
        maxiter=40, tol=1e-3)
    z_tpu, ok_tpu = interior_point(
        jnp.asarray(x_np), jnp.asarray(W_np), alpha=alpha,
        maxiter=40, tol=1e-3)
    f_ref = lasso_objective(x_np, W_np, z_ref.numpy(), alpha)
    f_tpu = lasso_objective(x_np, W_np, z_tpu, alpha)
    assert abs(f_tpu - f_ref) <= 2e-3 * max(1.0, abs(f_ref))


def test_split_bregman_golden_parity(rng):
    lasso_ref = load_reference()
    if lasso_ref is None:
        pytest.skip("reference library unavailable")
    import torch

    x_np = rng.standard_normal((6, 8)).astype(np.float32)
    W_np = rng.standard_normal((8, 12)).astype(np.float32)
    W_np /= np.linalg.norm(W_np, axis=0, keepdims=True)
    alpha = 0.3

    z_ref, _ = lasso_ref.linear.solvers.split_bregman(
        torch.from_numpy(W_np), torch.from_numpy(x_np), alpha=alpha,
        maxiter=100)
    z_tpu, _ = split_bregman(jnp.asarray(W_np), jnp.asarray(x_np),
                             alpha=alpha, maxiter=100)
    np.testing.assert_allclose(np.asarray(z_tpu), z_ref.numpy(), atol=2e-3)


def test_own_golden_parity(rng):
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
        algorithm="own", maxiter=60, xtol=1e-6)
    z_tpu = sparse_encode(jnp.asarray(x_np), jnp.asarray(W_np), alpha,
                          algorithm="own", maxiter=60, xtol=1e-6)
    f_ref = lasso_objective(x_np, W_np, z_ref.numpy(), alpha)
    f_tpu = lasso_objective(x_np, W_np, z_tpu, alpha)
    # match-or-beat: our in-jit line search finds slightly better steps
    # than the reference's scipy Brent on stalls
    assert f_tpu <= f_ref * (1 + 1e-3)


def test_constrained_inference_hits_rss_limit(rng):
    x, W, _ = make_problem(rng, n=8)
    rss_lim = 0.3 * float(0.5 * jnp.sum(jnp.square(x[0])))
    z = constrained_inference(x, W, constr=True, rss_lim=rss_lim,
                              fista_iters=300, bisect_iters=30)
    resid = np.asarray(z) @ np.asarray(W).T - np.asarray(x)
    rss = 0.5 * (resid ** 2).sum(axis=1)
    # every sample must satisfy the constraint, tightly for binding ones
    assert np.all(rss <= rss_lim * 1.05)
    assert np.any(rss >= rss_lim * 0.8)  # constraint binds for some sample


def test_constrained_inference_penalized_form_is_lasso(rng):
    x, W, alpha = make_problem(rng, n=8)
    z_pen = constrained_inference(x, W, constr=False, bound=True,
                                  alpha=alpha, fista_iters=2000)
    z_ista = sparse_encode(x, W, alpha, algorithm="ista", maxiter=5000,
                           tol=1e-10)
    f_pen = lasso_objective(x, W, z_pen, alpha)
    f_i = lasso_objective(x, W, z_ista, alpha)
    assert abs(f_pen - f_i) < 1e-3 * max(1.0, abs(f_i))


def test_constrained_inference_single_sample(rng):
    x, W, _ = make_problem(rng, n=4)
    z1 = constrained_inference(x[0], W, rss_lim=0.5)
    assert z1.shape == (W.shape[1],)


def test_interior_point_per_sample_stopping(rng):
    """Per-sample mode: each sample's success flag reflects its own
    feasibility/gap; solutions match independent single-sample solves
    at the objective level."""
    from lasso_tpu.linear.solvers import interior_point
    from _oracles import lasso_objective
    n, d, k = 6, 8, 16
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    x = x * jnp.asarray([0.2, 1.0, 5.0, 0.5, 2.0, 1.5])[:, None]
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    W = jnp.asarray(W)

    z_b, ok_b = interior_point(x, W, alpha=0.3, maxiter=40, tol=1e-4,
                               per_sample=True)
    assert ok_b.shape == (n,)
    for i in range(n):
        z_i, ok_i = interior_point(x[i:i + 1], W, alpha=0.3, maxiter=40,
                                   tol=1e-4, per_sample=True)
        f_b = lasso_objective(np.asarray(x[i:i + 1]), np.asarray(W),
                              np.asarray(z_b[i:i + 1]), 0.3)
        f_i = lasso_objective(np.asarray(x[i:i + 1]), np.asarray(W),
                              np.asarray(z_i), 0.3)
        np.testing.assert_allclose(f_b, f_i, rtol=1e-3)


def test_interior_point_adaptive_schedule_beats_reference(rng):
    """barrier_schedule='adaptive' (VERDICT r2 item 6): at EQUAL Newton
    iteration budgets the complementarity-proportional schedule must
    reach a materially smaller relative objective gap than the
    reference's step-coupled decay, and get under 1e-5 where the
    reference stalls ~1e-3. Run in x64 so the comparison measures the
    schedules, not f32 rounding."""
    import jax
    from lasso_tpu.linalg import lipschitz_constant
    from lasso_tpu.linear.solvers import ista

    x_np = rng.standard_normal((64, 32))
    W_np = rng.standard_normal((32, 128))
    W_np /= np.linalg.norm(W_np, axis=0, keepdims=True)
    alpha = 0.2
    with jax.enable_x64():
        x, W = jnp.asarray(x_np), jnp.asarray(W_np)
        L = lipschitz_constant(W)
        z_star = ista(x, jnp.zeros((64, 128)), W, alpha, lr=float(1 / L),
                      maxiter=30000, tol=1e-15, use_pallas=False)
        f_star = lasso_objective(x, W, z_star, alpha)

        z_ref, _, k_ref = interior_point(x, W, alpha=alpha, maxiter=30,
                                         tol=1e-12, return_iters=True)
        z_ad, _, k_ad = interior_point(x, W, alpha=alpha, maxiter=30,
                                       tol=1e-12, return_iters=True,
                                       barrier_schedule="adaptive")
    gap_ref = (lasso_objective(x, W, z_ref, alpha) - f_star) / abs(f_star)
    gap_ad = (lasso_objective(x, W, z_ad, alpha) - f_star) / abs(f_star)
    assert int(k_ad) <= int(k_ref)          # equal budget (both hit cap)
    assert gap_ad < 1e-5, gap_ad
    assert gap_ad < gap_ref / 10, (gap_ad, gap_ref)

    with pytest.raises(ValueError):
        interior_point(x_np.astype(np.float32),
                       W_np.astype(np.float32), alpha=alpha,
                       barrier_schedule="bogus")


def test_interior_point_mehrotra_predictor_corrector(rng):
    """barrier_schedule='mehrotra' (VERDICT r3 item 6): the
    predictor-corrector must reach a 1e-6-class gap in ~half the Newton
    iterations 'adaptive' needs, on BOTH KKT solvers (the CG path with
    inner accuracy matched to the target gap — see docstring), x64."""
    import jax
    from lasso_tpu.linalg import lipschitz_constant
    from lasso_tpu.linear.solvers import ista

    x_np = rng.standard_normal((64, 32))
    W_np = rng.standard_normal((32, 128))
    W_np /= np.linalg.norm(W_np, axis=0, keepdims=True)
    alpha = 0.2
    with jax.enable_x64():
        x, W = jnp.asarray(x_np), jnp.asarray(W_np)
        L = lipschitz_constant(W)
        z_star = ista(x, jnp.zeros((64, 128)), W, alpha, lr=float(1 / L),
                      maxiter=30000, tol=1e-15, use_pallas=False)
        f_star = lasso_objective(x, W, z_star, alpha)

        def gap_at(budget, sched, **kw):
            z, _, k = interior_point(x, W, alpha=alpha, maxiter=budget,
                                     tol=1e-12, return_iters=True,
                                     barrier_schedule=sched, **kw)
            return (lasso_objective(x, W, z, alpha) - f_star) \
                / abs(f_star), int(k)

        # equal small budget: mehrotra far ahead of adaptive
        g_me8, _ = gap_at(8, "mehrotra")
        g_ad8, _ = gap_at(8, "adaptive")
        assert g_me8 < 1e-6, g_me8
        assert g_me8 < g_ad8 / 50, (g_me8, g_ad8)
        # iteration-count advantage: adaptive has not reached at 1.5x
        # the budget what mehrotra reached at 8 (measured: 3.3e-6 vs
        # 2.5e-7; adaptive needs ~14 iterations for mehrotra's 8)
        g_ad12, _ = gap_at(12, "adaptive")
        assert g_ad12 > g_me8, (g_ad12, g_me8)
        # CG path with inner accuracy matched to the gap == Cholesky
        g_cg, _ = gap_at(12, "mehrotra", kkt_solver="cg",
                         cg_maxiter=2000, cg_rtol=1e-13)
        g_ch, _ = gap_at(12, "mehrotra", kkt_solver="cholesky")
        assert g_cg < 1e-6, g_cg
        assert abs(g_cg - g_ch) < 1e-7 + 0.5 * abs(g_ch), (g_cg, g_ch)


def test_interior_point_mehrotra_nonfinite_guard(rng):
    """An under-resourced CG inner solve at extreme terminal
    conditioning must degrade gracefully (rows keep their last finite
    iterate), never emit NaNs."""
    import jax
    x_np = rng.standard_normal((32, 16))
    W_np = rng.standard_normal((16, 64))
    W_np /= np.linalg.norm(W_np, axis=0, keepdims=True)
    with jax.enable_x64():
        x, W = jnp.asarray(x_np), jnp.asarray(W_np)
        z, _ = interior_point(x, W, alpha=0.2, maxiter=30, tol=1e-14,
                              barrier_schedule="mehrotra",
                              kkt_solver="cg")
    assert np.isfinite(np.asarray(z)).all()


def test_interior_point_cg_forcing_sequence(rng):
    """cg_rtol='forcing' (inexact Newton, round 5): the gap-coupled
    inner tolerance must reach the same terminal gap class as a tight
    fixed rtol — loose early solves cannot cost terminal accuracy
    because the final iterations run at the tightened floor."""
    import jax
    from lasso_tpu.linalg import lipschitz_constant
    from lasso_tpu.linear.solvers import ista

    x_np = rng.standard_normal((64, 32))
    W_np = rng.standard_normal((32, 128))
    W_np /= np.linalg.norm(W_np, axis=0, keepdims=True)
    alpha = 0.2
    with jax.enable_x64():
        x, W = jnp.asarray(x_np), jnp.asarray(W_np)
        L = lipschitz_constant(W)
        z_star = ista(x, jnp.zeros((64, 128)), W, alpha, lr=float(1 / L),
                      maxiter=30000, tol=1e-15, use_pallas=False)
        f_star = lasso_objective(x, W, z_star, alpha)

        def gap_at(sched, **kw):
            z, _, k = interior_point(x, W, alpha=alpha, maxiter=12,
                                     tol=1e-12, return_iters=True,
                                     barrier_schedule=sched,
                                     kkt_solver="cg", **kw)
            return (lasso_objective(x, W, z, alpha) - f_star) \
                / abs(f_star)

        for sched in ("mehrotra", "adaptive"):
            g_forcing = gap_at(sched, cg_rtol="forcing", cg_maxiter=2000)
            g_fixed = gap_at(sched, cg_rtol=1e-10, cg_maxiter=2000)
            assert g_forcing < 1e-5, (sched, g_forcing)
            assert g_forcing < 10 * max(g_fixed, 1e-9), (sched, g_forcing,
                                                         g_fixed)
    with pytest.raises(ValueError, match="cg_rtol"):
        interior_point(x_np.astype(np.float32), W_np.astype(np.float32),
                       alpha=alpha, kkt_solver="cg", cg_rtol="bogus")


def test_interior_point_cg_matches_cholesky(fista_solution):
    """The matrix-free normal-equations CG path (kkt_solver='cg') must
    reach the same solution quality as the reference-style [B,D,D]
    Cholesky path — it is what makes IP runnable at headline batch sizes
    where the Cholesky build is an OOM."""
    x, W, alpha, f_star = fista_solution
    z_ch, ok_ch = interior_point(x, W, alpha=alpha, maxiter=50, tol=1e-2,
                                 kkt_solver="cholesky")
    z_cg, ok_cg = interior_point(x, W, alpha=alpha, maxiter=50, tol=1e-2,
                                 kkt_solver="cg")
    assert bool(ok_cg)
    f_ch = lasso_objective(x, W, z_ch, alpha)
    f_cg = lasso_objective(x, W, z_cg, alpha)
    assert abs(f_cg - f_ch) < 1e-3 * max(1.0, abs(f_ch))
    assert abs(f_cg - f_star) < 1e-2 * max(1.0, abs(f_star))


def test_interior_point_cg_kkt_certificate(rng):
    """Solver-independent optimality certificate for the CG path: at a
    lasso solution, |W^T(Wz - x)| <= alpha off-support and = alpha (with
    opposing sign) on the support (SURVEY.md §4.2). This primal-dual IP
    stalls at ~1e-2 terminal KKT accuracy regardless of the inner solver
    (identical in x64 — it's the barrier schedule, reference parity), so
    the bar is: CG's certificate must match the Cholesky path's, and
    both must be bounded."""
    x, W, alpha = make_problem(rng, n=24, d=16, k=24)

    def kkt_violation(z):
        z = np.asarray(z)
        g = np.asarray((jnp.matmul(z, W.T) - x) @ W)
        on = np.abs(z) > 1e-2
        off_viol = float(np.max(np.maximum(np.abs(g[~on]) - alpha, 0.0)))
        assert on.any()
        on_viol = float(np.max(np.abs(g[on] + alpha * np.sign(z[on]))))
        return off_viol, on_viol

    z_ch, _ = interior_point(x, W, alpha=alpha, maxiter=200, tol=1e-4,
                             kkt_solver="cholesky")
    # generous inner budget: at trajectory-grade CG accuracy the two
    # paths must produce the same certificate
    z_cg, _ = interior_point(x, W, alpha=alpha, maxiter=200, tol=1e-4,
                             kkt_solver="cg", cg_maxiter=256,
                             cg_rtol=1e-8)
    off_ch, on_ch = kkt_violation(z_ch)
    off_cg, on_cg = kkt_violation(z_cg)
    assert off_cg <= off_ch + 1e-3
    assert on_cg <= 1.5 * on_ch + 1e-3
    assert on_cg <= 0.5 * alpha  # bounded in absolute terms too


def test_interior_point_kkt_solver_auto_and_validation(rng):
    x, W, alpha = make_problem(rng)
    # auto on a tiny problem resolves to cholesky; result identical
    z_auto, _ = interior_point(x, W, alpha=alpha, maxiter=20)
    z_ch, _ = interior_point(x, W, alpha=alpha, maxiter=20,
                             kkt_solver="cholesky")
    np.testing.assert_array_equal(np.asarray(z_auto), np.asarray(z_ch))
    with pytest.raises(ValueError):
        interior_point(x, W, alpha=alpha, kkt_solver="lu")
