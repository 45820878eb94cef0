"""Fused Pallas FISTA step: interpreter-mode equivalence with the jnp twin
and with the unfused solver path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasso_tpu.linear.solvers import ista
from lasso_tpu.ops.fused_ista import (fista_step_reference,
                                      fused_fista_multistep,
                                      fused_fista_step,
                                      supports_fused_step)


def make_problem(rng, n=32, d=128, k=256):
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    W = jnp.asarray(
        (rng.standard_normal((d, k)) / np.sqrt(d)).astype(np.float32))
    z = jnp.asarray(rng.standard_normal((n, k)) * 0.1, jnp.float32)
    zp = jnp.asarray(rng.standard_normal((n, k)) * 0.1, jnp.float32)
    return x, z, zp, W


def test_supports_fused_step(rng):
    x, z, zp, W = make_problem(rng)
    assert supports_fused_step(x, z, W)
    assert not supports_fused_step(x[:, :100], z, W[:100])  # D not aligned


@pytest.mark.parametrize("kp", ["f32", "bf16"])
def test_fused_step_matches_reference(rng, kp):
    # interpret mode emulates Mosaic dot semantics (bf16-rounded
    # operands): f32 split-float is ~1e-5-grade per step, native bf16
    # carries ~4e-3-relative operand rounding
    x, z, zp, W = make_problem(rng)
    lr, alpha, mom = 0.3, 0.05, 0.6
    z1, d1 = fused_fista_step(x, z, zp, W, lr, alpha, mom, block_n=8,
                              interpret=True, kernel_precision=kp)
    z2, d2 = fista_step_reference(x, z, zp, W, lr, alpha, mom)
    atol = 1e-5 if kp == "f32" else 5e-3
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=atol)
    np.testing.assert_allclose(float(d1), float(d2),
                               rtol=1e-5 if kp == "f32" else 5e-2)


def test_fused_step_uneven_block(rng):
    # N=24 with block_n=256 -> shrinks to a divisor automatically
    x, z, zp, W = make_problem(rng, n=24)
    z1, d1 = fused_fista_step(x, z, zp, W, 0.2, 0.1, 0.5, interpret=True)
    z2, d2 = fista_step_reference(x, z, zp, W, 0.2, 0.1, 0.5)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)


def test_ista_pallas_path_matches_xla_path(rng):
    x, _, _, W = make_problem(rng, n=16)
    z0 = jnp.zeros((16, W.shape[1]), jnp.float32)
    alpha = 0.1
    # lr must be < 1/L ~ 0.17 for this problem: a divergent iteration
    # amplifies kernel-vs-XLA rounding differences exponentially
    z_fused = ista(x, z0, W, alpha, lr=0.1, maxiter=100, tol=1e-9,
                   use_pallas=True)   # interpreted on CPU
    z_plain = ista(x, z0, W, alpha, lr=0.1, maxiter=100, tol=1e-9,
                   use_pallas=False)
    np.testing.assert_allclose(np.asarray(z_fused), np.asarray(z_plain),
                               atol=1e-4)


def test_ista_pallas_slow_path(rng):
    x, _, _, W = make_problem(rng, n=16)
    z0 = jnp.zeros((16, W.shape[1]), jnp.float32)
    z_fused = ista(x, z0, W, 0.1, lr=0.1, maxiter=100, tol=1e-9, fast=False,
                   use_pallas=True)
    z_plain = ista(x, z0, W, 0.1, lr=0.1, maxiter=100, tol=1e-9, fast=False,
                   use_pallas=False)
    np.testing.assert_allclose(np.asarray(z_fused), np.asarray(z_plain),
                               atol=1e-4)


@pytest.mark.parametrize("kp", ["f32", "bf16"])
def test_multistep_kernel_matches_repeated_single_steps(rng, kp):
    """S fused sub-steps must perform the same arithmetic as S single-step
    kernel calls (only the HBM round trips between them are removed)."""
    x, z, zp, W = make_problem(rng)
    lr, alpha = 0.25, 0.05
    moms = jnp.asarray([0.0, 0.4, 0.55], jnp.float32)

    z_m, zp_m, d_m = fused_fista_multistep(
        x, z, zp, W, lr, alpha * lr, moms, steps=3, block_n=8,
        interpret=True, kernel_precision=kp)

    z_s, zp_s = z, zp
    for s in range(3):
        z_next, d_s = fused_fista_step(
            x, z_s, zp_s, W, lr, alpha, moms[s], block_n=8,
            interpret=True, kernel_precision=kp)
        zp_s, z_s = z_s, z_next

    np.testing.assert_allclose(np.asarray(z_m), np.asarray(z_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(zp_m), np.asarray(zp_s), atol=1e-6)
    np.testing.assert_allclose(float(d_m), float(d_s), rtol=1e-5)


def test_ista_fuse_steps_matches_single_step_path(rng):
    """fuse_steps=4 with a remainder (maxiter=25 -> 6 blocks + 1 single
    step) must reproduce the unfused trajectory."""
    x, _, _, W = make_problem(rng, n=16)
    z0 = jnp.zeros((16, W.shape[1]), jnp.float32)
    z_multi = ista(x, z0, W, 0.1, lr=0.1, maxiter=25, tol=0.0,
                   use_pallas=True, fuse_steps=4)  # interpreted on CPU
    z_plain = ista(x, z0, W, 0.1, lr=0.1, maxiter=25, tol=0.0,
                   use_pallas=False)
    np.testing.assert_allclose(np.asarray(z_multi), np.asarray(z_plain),
                               atol=1e-4)


def test_ista_fuse_steps_iteration_count(rng):
    """The multi-step path must still execute exactly maxiter iterations."""
    x, _, _, W = make_problem(rng, n=16)
    z0 = jnp.zeros((16, W.shape[1]), jnp.float32)
    _, k = ista(x, z0, W, 0.1, lr=0.1, maxiter=25, tol=0.0,
                use_pallas=True, fuse_steps=8, return_iters=True)
    assert int(k) == 25


def test_momentum_restructure_matches_reference_trajectory(rng):
    """The (z, z_prev, lagged-mom) carry must reproduce the reference's
    (z, y, t) FISTA trajectory exactly."""
    x, _, _, W = make_problem(rng, n=16)
    z0 = jnp.zeros((16, W.shape[1]), jnp.float32)
    lr, alpha = 0.1, 0.05

    # classic formulation, literal transcription of reference ista.py:79-102
    z, y, t = z0, z0, 1.0
    for _ in range(25):
        resid = y @ W.T - x
        g = resid @ W
        u = y - lr * g
        z_next = jnp.sign(u) * jnp.maximum(jnp.abs(u) - alpha * lr, 0.0)
        t_next = (1 + float(np.sqrt(1 + 4 * t * t))) / 2
        y = z_next + ((t - 1) / t_next) * (z_next - z)
        t = t_next
        z = z_next

    z_solver = ista(x, z0, W, alpha, lr=lr, maxiter=25, tol=0.0,
                    use_pallas=False)
    np.testing.assert_allclose(np.asarray(z_solver), np.asarray(z),
                               atol=2e-5)


def test_pick_block_n_always_divides():
    """VMEM-pressure halving must re-derive an exact divisor of N: an odd
    divisor halved naively (120 -> 60 -> 30 -> 15 -> 7) would under-cover
    the batch and leave tail rows unwritten (ADVICE r1)."""
    from lasso_tpu.ops.fused_ista import _pick_block_n, _tile_bytes
    for N in (120, 8 * 17, 8 * 15 * 7, 256, 8, 1048576):
        for D, K in ((512, 2048), (128, 128), (4096, 8192)):
            for req in (8, 120, 256, 512, 4096):
                bn = _pick_block_n(N, D, K, 4 * D * K, req)
                assert N % bn == 0, (N, D, K, req, bn)
                assert bn % 8 == 0


def test_largest_aligned_divisor():
    from lasso_tpu.ops.common import largest_aligned_divisor
    assert largest_aligned_divisor(120, 60) == 40
    assert largest_aligned_divisor(120, 120) == 120
    assert largest_aligned_divisor(136, 64) == 8
    assert largest_aligned_divisor(256, 4096) == 256
    assert largest_aligned_divisor(256, 100) == 64
    assert largest_aligned_divisor(1024, 512, align=128) == 512
    # limit below align still returns the minimum aligned divisor
    assert largest_aligned_divisor(120, 4) == 8


def test_fused_auto_tol_never_stops_early(rng):
    """fuse_steps='auto' now engages S>1 for tol>0: convergence is only
    tested at block boundaries, so the fused run must stop at >= the
    reference's (every-iteration) stopping iteration, at the same or
    better objective (VERDICT r1 item 4)."""
    x, _, _, W = make_problem(rng, n=16)
    K = W.shape[1]
    z0 = jnp.zeros((16, K), jnp.float32)
    alpha, lr, tol = 0.1, 0.1, 1e-4

    # reference semantics: unfused, checks every iteration
    z_ref, k_ref = ista(x, z0, W, alpha, lr=lr, maxiter=416, tol=tol,
                        use_pallas=False, return_iters=True)
    # fused multistep path in interpret mode with auto block size
    z_fus, k_fus = ista(x, z0, W, alpha, lr=lr, maxiter=416, tol=tol,
                        use_pallas=True, fuse_steps="auto",
                        return_iters=True)
    assert int(k_ref) < 416, "problem must actually converge early"
    assert int(k_fus) >= int(k_ref)
    # block boundary: stops at a multiple of S (here 32 | 96) or maxiter
    assert int(k_fus) % 32 == 0

    def obj(z):
        r = z @ W.T - x
        return float(0.5 * jnp.sum(r * r) + alpha * jnp.sum(jnp.abs(z)))

    # extra iterations can only improve the (monotone in objective) FISTA
    # tail here; allow tiny float slack
    assert obj(z_fus) <= obj(z_ref) * (1 + 1e-5)


def test_adaptive_restart_reduces_iterations(rng):
    """restart=True (per-row O'Donoghue-Candes momentum restart) must
    reach the same objective in materially fewer iterations (VERDICT r1
    item 8: the algorithmic lever for time-to-gap)."""
    x, _, _, W = make_problem(rng, n=16)
    z0 = jnp.zeros((16, W.shape[1]), jnp.float32)
    alpha, lr = 0.1, 0.1

    def obj(z):
        r = z @ W.T - x
        return float(0.5 * jnp.sum(r * r) + alpha * jnp.sum(jnp.abs(z)))

    z_p, k_p = ista(x, z0, W, alpha, lr=lr, maxiter=2000, tol=1e-6,
                    use_pallas=False, return_iters=True)
    z_r, k_r = ista(x, z0, W, alpha, lr=lr, maxiter=2000, tol=1e-6,
                    use_pallas=False, restart=True, return_iters=True)
    assert int(k_r) < 0.6 * int(k_p)
    assert obj(z_r) <= obj(z_p) * (1 + 1e-6)


def test_adaptive_restart_fused_matches_xla(rng):
    x, _, _, W = make_problem(rng, n=16)
    z0 = jnp.zeros((16, W.shape[1]), jnp.float32)
    z_x = ista(x, z0, W, 0.1, lr=0.1, maxiter=96, tol=0.0,
               use_pallas=False, restart=True)
    z_f = ista(x, z0, W, 0.1, lr=0.1, maxiter=96, tol=0.0,
               use_pallas=True, restart=True, fuse_steps=8)
    # split-float kernel rounding shifts restart trigger points slightly
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_x), atol=2e-3)

    def obj(z):
        r = z @ W.T - x
        return float(0.5 * jnp.sum(r * r) + 0.1 * jnp.sum(jnp.abs(z)))

    np.testing.assert_allclose(obj(z_f), obj(z_x), rtol=1e-5)


def test_adaptive_restart_validation(rng):
    x, _, _, W = make_problem(rng, n=16)
    z0 = jnp.zeros((16, W.shape[1]), jnp.float32)
    with pytest.raises(ValueError):
        ista(x, z0, W, 0.1, lr=0.1, fast=False, restart=True)
    with pytest.raises(ValueError):
        ista(x, z0, W, 0.1, lr=0.1, restart=True, backtrack=True)


def test_mixed_precision_continuation(rng):
    """kernel_precision='mixed' (bf16 bulk + f32 tail) must match the
    all-f32 path's gap-to-optimum at fixed budgets, and validate its
    exclusions."""
    x, _, _, W = make_problem(rng, n=16)
    z0 = jnp.zeros((16, W.shape[1]), jnp.float32)
    alpha, lr = 0.1, 0.1

    def obj(z):
        r = z @ W.T - x
        return float(0.5 * jnp.sum(r * r) + alpha * jnp.sum(jnp.abs(z)))

    z_star = ista(x, z0, W, alpha, lr=lr, maxiter=4000, tol=0.0,
                  use_pallas=False)
    f_star = obj(z_star)
    z_f = ista(x, z0, W, alpha, lr=lr, maxiter=200, tol=0.0,
               use_pallas=True, fuse_steps=25)
    z_m = ista(x, z0, W, alpha, lr=lr, maxiter=200, tol=0.0,
               use_pallas=True, fuse_steps=25, kernel_precision="mixed")
    gap_f = (obj(z_f) - f_star) / f_star
    gap_m = (obj(z_m) - f_star) / f_star
    # honest envelope under emulated bf16 (see test_mixed_precision.py's
    # module docstring for the measured error model)
    assert gap_m <= 1.5 * gap_f + 2e-6, (gap_m, gap_f)

    with pytest.raises(ValueError):
        ista(x, z0, W, alpha, lr=lr, kernel_precision="tf32")

    # mixed composes with restart (t-vector carried across the phase
    # switch); gap-to-optimum must track the all-f32 restart run
    z_rf = ista(x, z0, W, alpha, lr=lr, maxiter=200, tol=0.0,
                use_pallas=True, fuse_steps=25, restart=True)
    z_rm = ista(x, z0, W, alpha, lr=lr, maxiter=200, tol=0.0,
                use_pallas=True, fuse_steps=25, restart=True,
                kernel_precision="mixed")
    gap_rf = (obj(z_rf) - f_star) / f_star
    gap_rm = (obj(z_rm) - f_star) / f_star
    assert gap_rm <= 1.5 * gap_rf + 2e-6, (gap_rm, gap_rf)
