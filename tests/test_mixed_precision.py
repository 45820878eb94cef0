"""Validation matrix for kernel_precision='mixed' (VERDICT r2 item 1).

'mixed' runs the bulk of the FISTA budget in native-bf16 kernel passes
and the final ``mixed_tail`` fused blocks (default ~12.5%, min 1) in f32
split-float. The honest error model (TPU-measured at the headline config
2026-08-17, reproduced by the interpret-mode emulation below):

* bf16-only floors at ~2.3e-5 relative objective above the optimum.
* The f32 tail contracts that floor at FISTA's linear rate (~0.96/iter
  on these problems), so TAIL LENGTH sets the mixed floor: the default
  1/8-of-budget tail floors at ~1e-6-class relative objective above the
  all-f32 run (it does NOT reach the f32 rounding floor at converged
  budgets — no tail short of mostly-f32 does).
* At fixed budgets where the all-f32 run's own convergence gap dominates
  (the headline-bench regime: gap ~5e-5 at 200 iters), the mixed run's
  gap-to-optimum is within ~50% of f32's (typically ~5%), and always
  at or below the bf16-only run's.

The claims certified here: the gap envelope above, support recovery,
stopping semantics under tol>0, composition with per-row restart, the
``mixed_tail`` dial's monotonicity, and the tail-vs-bf16 ordering.

IMPORTANT (what these tests actually exercise): Mosaic's DEFAULT dot
precision truncates f32 dot operands to one bf16 pass on real hardware,
but in interpret mode the same dots run through XLA CPU at full f32 —
and plain bf16 cast round-trips are elided under XLA's default
excess-precision rules. The kernels therefore carry an interpret-only
``emulate`` path using ``lax.reduce_precision`` (which the compiler must
honor), making CPU runs reproduce TPU bf16 numerics up to dot ordering.
Before that fix (round 3) this file validated schedule plumbing only.
TPU cross-check at 16384x(512->2048): mixed-f32 relative objective
+2.5e-6 at 200 iters / +1.0e-6 at 800; bf16-f32 +2.5e-5 / +2.3e-5
(benchmarks/mixed_tpu_validation.py).
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
def test_mixed_gap_envelope_fixed_budget(n, d, k, alpha, restart):
    """Fixed budget (the headline-bench regime, tol=0): the mixed run's
    gap-to-(x64)-optimum stays within the measured envelope of the
    all-f32 fused run's (1.5x + the ~1e-6-class mixed floor), and at or
    below the bf16-only run's (the tail must buy accuracy).

    Measured (emulated bf16, this matrix): gap ratios mixed/f32 of
    1.03/1.38/1.06/1.07/0.93 — the 1.38 is the alpha=0.3 case whose
    gaps sit near the mixed floor."""
    x, W, z0 = _problem(n + k, n, d, k, alpha)
    lr = 0.08
    maxiter = 200  # auto fuse picks S=25, 8 blocks, 1-block f32 tail
    f_star, _ = _f_star_x64(x, W, alpha, lr)

    kw = dict(lr=lr, maxiter=maxiter, tol=0.0, use_pallas=True,
              fuse_steps=25, restart=restart)
    z_f = ista(x, z0, W, alpha, **kw)
    z_m = ista(x, z0, W, alpha, kernel_precision="mixed", **kw)
    z_b = ista(x, z0, W, alpha, kernel_precision="bf16", **kw)

    gap_f = (_obj(x, W, alpha, z_f) - f_star) / abs(f_star)
    gap_m = (_obj(x, W, alpha, z_m) - f_star) / abs(f_star)
    gap_b = (_obj(x, W, alpha, z_b) - f_star) / abs(f_star)
    assert gap_m >= -1e-7, "gap below the x64 optimum: anchor is wrong"
    assert gap_m <= 1.5 * gap_f + 2e-6, (gap_m, gap_f)
    assert gap_m <= gap_b + 1e-7, (gap_m, gap_b)


@pytest.mark.parametrize("alpha", [0.05, 0.3])
def test_mixed_convergence_mode_tol_positive(alpha):
    """tol>0 (convergence mode): the mixed bf16 phase's convergence
    statistic is discarded, so the run must never stop before the f32
    tail has run, and the final gap must stay within the fixed-budget
    envelope (measured: 1.12x at alpha=0.05 where convergence
    dominates; 6.2e-7 vs 1.1e-7 at alpha=0.3 where the mixed floor
    dominates)."""
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
    assert gap_m <= 1.5 * gap_f + 1e-6, (gap_m, gap_f)
    # stopping never earlier than a block boundary at/after the bf16 bulk
    assert int(k_m) % 25 == 0 or int(k_m) == 400


def test_mixed_support_recovery_matches_f32():
    """The serving-relevant property: the support (nonzero pattern) of
    the mixed solution agrees with the f32 run's at a sparse alpha
    except boundary coordinates (measured 0.15% disagreement under
    emulated bf16), and the codes agree to ~1e-2 absolute (the bf16
    phase's iterate-level rounding, partially contracted by the tail —
    NOT f32-trajectory equality, which mixed never promises)."""
    n, d, k = 16, 128, 256
    x, W, z0 = _problem(5, n, d, k, 0.3)
    kw = dict(lr=0.08, maxiter=200, tol=0.0, use_pallas=True,
              fuse_steps=25)
    z_f = np.asarray(ista(x, z0, W, 0.3, **kw))
    z_m = np.asarray(ista(x, z0, W, 0.3, kernel_precision="mixed", **kw))
    disagree = np.mean((z_f != 0) != (z_m != 0))
    assert disagree < 0.01, disagree
    np.testing.assert_allclose(z_m, z_f, atol=3e-2)


def test_mixed_tail_blocks_schedule():
    """The default ~12.5%-of-blocks f32 tail (minimum 1, always >= 1
    bf16 block unless there is only one block). The tail length is an
    accuracy/throughput dial — see the module docstring's error model —
    and is overridable via ista(mixed_tail=...)."""
    from lasso_tpu.linear.solvers.ista import (_mixed_tail_blocks,
                                               _resolve_mixed_tail)
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
    assert _resolve_mixed_tail("auto", 8) == 1
    assert _resolve_mixed_tail(3, 8) == 3
    assert _resolve_mixed_tail(99, 8) == 8  # clamped to the budget
    with pytest.raises(ValueError):
        _resolve_mixed_tail(0, 8)


def test_mixed_error_floor_and_tail_dial():
    """Converged-budget behavior: at 800 iters the all-f32 run reaches
    its rounding floor (<1e-7 gap); the default-tail mixed run floors at
    ~1e-6-class (measured 4.2e-7) — well above f32's floor but >=5x
    below the bf16-only floor. Lengthening the tail via mixed_tail must
    not degrade the floor (the dial is monotone up to noise)."""
    n, d, k, alpha, lr = 16, 128, 256, 0.3, 0.08
    x, W, z0 = _problem(99, n, d, k, alpha)
    f_star, _ = _f_star_x64(x, W, alpha, lr, maxiter=20000)

    kw = dict(lr=lr, maxiter=800, tol=0.0, use_pallas=True, fuse_steps=25)

    def gap(**extra):
        return (_obj(x, W, alpha, ista(x, z0, W, alpha, **kw, **extra))
                - f_star) / abs(f_star)

    gap_f = gap()
    gap_b = gap(kernel_precision="bf16")
    gap_m = gap(kernel_precision="mixed")           # auto: 4/32 blocks
    gap_m_long = gap(kernel_precision="mixed", mixed_tail=16)

    assert gap_f < 1e-7, "budget must reach the f32 floor"
    assert gap_m <= 2e-6, gap_m
    assert gap_m <= gap_b / 5, (gap_m, gap_b)
    assert gap_m_long <= gap_m * 1.05 + 1e-9, (gap_m_long, gap_m)


def test_resolve_tail_iters():
    """mixed_tail_iters resolution: defaults reproduce the block-granular
    schedule (+ the single-step remainder that always ran f32); explicit
    iteration counts are exact, clamped to the budget, and >= 1."""
    from lasso_tpu.linear.solvers.ista import _resolve_tail_iters
    # default == auto block tail * S + remainder
    assert _resolve_tail_iters("auto", None, 200, 25) == 25
    assert _resolve_tail_iters("auto", None, 800, 25) == 100
    assert _resolve_tail_iters("auto", None, 210, 30) == 30
    assert _resolve_tail_iters("auto", None, 37, 16) == 21   # 16 + 37%16
    assert _resolve_tail_iters(2, None, 200, 25) == 50
    # explicit iters win and are exact
    assert _resolve_tail_iters("auto", 12, 200, 25) == 12
    assert _resolve_tail_iters(2, 4, 200, 25) == 4
    assert _resolve_tail_iters("auto", 999, 200, 25) == 200  # clamped
    with pytest.raises(ValueError):
        _resolve_tail_iters("auto", 0, 200, 25)


def test_mixed_tail_iters_full_budget_equals_f32():
    """mixed_tail_iters=maxiter makes every block f32: identical
    arithmetic to kernel_precision='f32' (same S-blocks), so the codes
    must agree exactly."""
    n, d, k, alpha, lr = 16, 128, 256, 0.1, 0.08
    x, W, z0 = _problem(3, n, d, k, alpha)
    kw = dict(lr=lr, maxiter=200, tol=0.0, use_pallas=True, fuse_steps=25)
    z_f = np.asarray(ista(x, z0, W, alpha, **kw))
    z_m = np.asarray(ista(x, z0, W, alpha, kernel_precision="mixed",
                          mixed_tail_iters=200, **kw))
    np.testing.assert_array_equal(z_f, z_m)


def test_mixed_tail_iters_sub_block_pareto():
    """The sub-block tail opens the Pareto between bf16-only and the
    1-block (25-iter) tail: a 4-iter tail already beats bf16-only, a
    12-iter tail beats the 4-iter one, and the full-block tail is at
    least as good as 12 (monotone up to the measured ~0.96/iter
    contraction noise)."""
    n, d, k, alpha, lr = 16, 128, 256, 0.3, 0.08
    x, W, z0 = _problem(21, n, d, k, alpha)
    f_star, _ = _f_star_x64(x, W, alpha, lr)
    kw = dict(lr=lr, maxiter=200, tol=0.0, use_pallas=True, fuse_steps=25)

    def gap(**extra):
        return (_obj(x, W, alpha, ista(x, z0, W, alpha, **kw, **extra))
                - f_star) / abs(f_star)

    gap_b = gap(kernel_precision="bf16")
    gap_4 = gap(kernel_precision="mixed", mixed_tail_iters=4)
    gap_12 = gap(kernel_precision="mixed", mixed_tail_iters=12)
    gap_25 = gap(kernel_precision="mixed", mixed_tail_iters=25)
    assert gap_4 <= gap_b + 1e-9, (gap_4, gap_b)
    assert gap_12 <= gap_4 * 1.05 + 1e-9, (gap_12, gap_4)
    assert gap_25 <= gap_12 * 1.05 + 1e-9, (gap_25, gap_12)


def test_mixed_tail_iters_exact_iteration_count():
    """The 4-loop phase structure (full blocks + remainder block per
    phase) must cover the budget exactly at tol=0, for tails that are
    not block-multiples and budgets that are not divisible."""
    n, d, k, alpha, lr = 16, 128, 256, 0.1, 0.08
    x, W, z0 = _problem(9, n, d, k, alpha)
    for maxiter, S, tail in [(200, 25, 12), (200, 25, 40), (210, 25, 47),
                             (64, 16, 64), (50, 25, 1)]:
        z, it = ista(x, z0, W, alpha, lr=lr, maxiter=maxiter, tol=0.0,
                     use_pallas=True, fuse_steps=S,
                     kernel_precision="mixed", mixed_tail_iters=tail,
                     return_iters=True)
        assert int(it) == maxiter, (maxiter, S, tail, int(it))
        assert np.isfinite(np.asarray(z)).all()


def test_mixed_tail_iters_composes_with_restart():
    """Sub-block tails under per-row restart: the t-vector carries
    across the S-block -> remainder-block -> f32-tail switches."""
    n, d, k, alpha, lr = 16, 128, 256, 0.1, 0.08
    x, W, z0 = _problem(13, n, d, k, alpha)
    f_star, _ = _f_star_x64(x, W, alpha, lr)
    kw = dict(lr=lr, maxiter=200, tol=0.0, use_pallas=True, fuse_steps=25,
              restart=True)
    gap_f = (_obj(x, W, alpha, ista(x, z0, W, alpha, **kw))
             - f_star) / abs(f_star)
    gap_m = (_obj(x, W, alpha,
                  ista(x, z0, W, alpha, kernel_precision="mixed",
                       mixed_tail_iters=12, **kw)) - f_star) / abs(f_star)
    assert gap_m <= 5 * gap_f + 5e-6, (gap_m, gap_f)


def test_mixed_tail_iters_requires_mixed():
    x, W, z0 = _problem(1, 16, 128, 256, 0.1)
    with pytest.raises(ValueError, match="mixed_tail_iters"):
        ista(x, z0, W, 0.1, lr=0.08, maxiter=50, mixed_tail_iters=10)


# ---------------------------------------------------------------------------
# split_bregman kernel_precision (round 4): the dominant AtA_inv @ rhs
# inner solve on bf16-grid operands, with an f32 outer-iteration tail.
# Honest error model (CPU emulation via lax.reduce_precision, matching
# TPU one-pass numerics up to dot ordering): bf16-only floors at
# ~1e-2-class relative objective on small problems; the f32 tail
# contracts that floor at the outer Bregman recursion's own linear rate,
# so TAIL LENGTH sets the mixed floor — slower than FISTA's, which is
# why split_bregman's default stays 'f32' and 'mixed' is a loose-
# tolerance lever (docs/PERFORMANCE.md).
# ---------------------------------------------------------------------------

def _sb_problem(seed=0, n=32, d=64, k=128):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(
        (rng.standard_normal((d, k)) / np.sqrt(d)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    return A, y


def _sb_obj(A, y, alpha, x):
    x = np.asarray(x, np.float64)
    A64 = np.asarray(A, np.float64)
    y64 = np.asarray(y, np.float64)
    return float(0.5 * np.sum((x @ A64.T - y64) ** 2)
                 + alpha * np.sum(np.abs(x)))


def test_split_bregman_mixed_gap_ordering():
    """f32 <= mixed <= bf16 gaps at a fixed outer budget, and a longer
    tail is monotonically (<=5% slack) more accurate."""
    from lasso_tpu.linear.solvers.split_bregman import split_bregman
    A, y = _sb_problem()
    alpha = 0.1
    with jax.enable_x64():
        A64 = jnp.asarray(np.asarray(A), jnp.float64)
        y64 = jnp.asarray(np.asarray(y), jnp.float64)
        xs, _ = split_bregman(A64, y64, alpha=alpha, maxiter=3000, tol=0.0)
    f_star = _sb_obj(A, y, alpha, xs)

    def gap(**kw):
        x, _ = split_bregman(A, y, alpha=alpha, maxiter=200, tol=0.0, **kw)
        return (_sb_obj(A, y, alpha, x) - f_star) / abs(f_star)

    g_f = gap()
    g_b = gap(kernel_precision="bf16")
    g_auto = gap(kernel_precision="mixed")          # tail = 25
    g_50 = gap(kernel_precision="mixed", mixed_tail=50)
    g_100 = gap(kernel_precision="mixed", mixed_tail=100)
    assert g_f >= -1e-9 and g_f < 1e-4, g_f
    assert g_auto <= g_b * 1.05 + 1e-9, (g_auto, g_b)
    assert g_50 <= g_auto * 1.05 + 1e-9, (g_50, g_auto)
    assert g_100 <= g_50 * 1.05 + 1e-9, (g_100, g_50)
    # the bf16 phase must actually differ from f32 (emulation is live)
    assert g_b > 10 * max(g_f, 1e-9), (g_b, g_f)


def test_split_bregman_mixed_full_tail_equals_f32():
    """mixed with tail == maxiter runs every outer iteration in f32 and
    must match the f32 run bit-for-bit (phase plumbing is exact)."""
    from lasso_tpu.linear.solvers.split_bregman import split_bregman
    A, y = _sb_problem(3)
    x_f, it_f = split_bregman(A, y, alpha=0.1, maxiter=30, tol=0.0)
    x_m, it_m = split_bregman(A, y, alpha=0.1, maxiter=30, tol=0.0,
                              kernel_precision="mixed", mixed_tail=30)
    assert int(it_f) == int(it_m) == 30
    np.testing.assert_array_equal(np.asarray(x_f), np.asarray(x_m))


def test_split_bregman_kernel_precision_validation():
    from lasso_tpu.linear.solvers.split_bregman import split_bregman
    A, y = _sb_problem(5)
    with pytest.raises(ValueError, match="kernel_precision"):
        split_bregman(A, y, kernel_precision="fp8")
    with pytest.raises(ValueError, match="mixed_tail"):
        split_bregman(A, y, kernel_precision="mixed", mixed_tail=0)
    # a tail without 'mixed' would be silently ignored -> error (same
    # contract as ista(mixed_tail_iters=...))
    with pytest.raises(ValueError, match="mixed_tail"):
        split_bregman(A, y, mixed_tail=5)
    with pytest.raises(ValueError, match="mixed_tail"):
        split_bregman(A, y, kernel_precision="bf16", mixed_tail=5)
