"""Whole-solve fused OMP kernel (ops/fused_omp.py): parity with the
exact-Cholesky while_loop paths, tol-freeze semantics, degenerate
dictionaries, lane padding, and the solver routing (VERDICT r3 item 2).

Interpret mode on CPU; the split-float correlation runs through the
lax.reduce_precision emulation of Mosaic's bf16 dot truncation, so the
f32-grade claim is exercised for real (same machinery as
tests/test_mixed_precision.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lasso_tpu.linear.solvers.omp import orthogonal_matching_pursuit
from lasso_tpu.ops.fused_omp import fused_omp_solve, supports_fused_omp


def _problem(seed, n, d, k):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    return x, jnp.asarray(W)


def _rss(x, z, W):
    return np.sum(np.square(np.asarray(x)
                            - np.asarray(z) @ np.asarray(W).T), axis=1)


def _assert_equivalent(x, W, za, zb, atol=2e-4):
    """Support equality when supports match; otherwise the two greedy
    fits must be residual-equivalent (an f32 argmax near-tie can
    legitimately flip an atom choice between differently-rounded
    correlation paths — ADVICE r3 item 4's flakiness policy)."""
    sa, sb = np.asarray(za) != 0, np.asarray(zb) != 0
    same = (sa == sb).all(axis=1)
    np.testing.assert_allclose(np.asarray(zb)[same], np.asarray(za)[same],
                               atol=atol)
    if not same.all():
        ra, rb = _rss(x, za, W), _rss(x, zb, W)
        np.testing.assert_allclose(rb[~same], ra[~same], rtol=1e-3,
                                   atol=1e-5)


@pytest.mark.parametrize("n,d,k,t", [
    (32, 128, 256, 8),
    (130, 128, 256, 12),    # lane padding: N % 128 != 0, N > 128
    (16, 256, 128, 5),      # T not 8-aligned, K < D
])
def test_fused_matches_chol_full(n, d, k, t):
    x, W = _problem(n + t, n, d, k)
    assert supports_fused_omp(n, d, k, t, x.dtype)
    za = orthogonal_matching_pursuit(x, W, t, solver="chol-full",
                                     use_pallas=False)
    zb = orthogonal_matching_pursuit(x, W, t, solver="fused",
                                     use_pallas=True)
    assert (np.count_nonzero(np.asarray(zb), axis=1) <= t).all()
    _assert_equivalent(x, W, za, zb)


def test_fused_tol_freeze_matches():
    """Per-sample tol stop: iteration counts and frozen codes match the
    while_loop path (same rss>tol gate evaluated at the same point)."""
    x, W = _problem(7, 48, 128, 256)
    # plant a few exactly-sparse rows that converge early
    z_true = np.zeros((48, 256), np.float32)
    z_true[:8, :3] = np.random.default_rng(0).standard_normal((8, 3))
    x = x.at[:8].set(jnp.asarray(z_true[:8] @ np.asarray(W).T))
    tol = 1e-6
    za, ka = orthogonal_matching_pursuit(
        x, W, 16, tol=tol, solver="chol-full", use_pallas=False,
        return_iters=True)
    zb, kb = orthogonal_matching_pursuit(
        x, W, 16, tol=tol, solver="fused", use_pallas=True,
        return_iters=True)
    assert int(kb) == int(ka)
    nnz_a = np.count_nonzero(np.asarray(za)[:8], axis=1)
    nnz_b = np.count_nonzero(np.asarray(zb)[:8], axis=1)
    np.testing.assert_array_equal(nnz_b, nnz_a)   # frozen at 3 atoms
    _assert_equivalent(x, W, za, zb)


def test_fused_degenerate_dictionary_finite():
    """Exactly duplicated atoms: the in-kernel relative pivot floor
    keeps the solve finite with the fitted residual preserved."""
    rng = np.random.default_rng(3)
    W = rng.standard_normal((128, 128)).astype(np.float32)
    W[:, 64:] = W[:, :64]                       # every atom duplicated
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    z = orthogonal_matching_pursuit(x, jnp.asarray(W), 12,
                                    solver="fused", use_pallas=True)
    assert np.isfinite(np.asarray(z)).all()
    # the duplicated-support fit still reduces the residual (loose
    # sanity: better than the zero code)
    assert _rss(x, z, W).mean() < np.mean(np.sum(np.square(
        np.asarray(x)), axis=1))


def test_fused_zero_rows_and_kernel_outputs():
    """Zero samples freeze immediately under tol (valid all-False,
    z = 0) and stay harmless without tol."""
    x, W = _problem(11, 16, 128, 128)
    x = x.at[:4].set(0.0)
    idx, valid, z_s = fused_omp_solve(x, W, 6, tol=1e-9, interpret=True)
    assert not np.asarray(valid)[:4].any()
    assert (np.asarray(z_s)[:4] == 0).all()
    assert np.asarray(valid)[4:].all()
    z = orthogonal_matching_pursuit(x, W, 6, solver="fused",
                                    use_pallas=True)
    assert (np.asarray(z)[:4] == 0).all()


def test_fused_fallback_warns():
    # unaligned D/K no longer warns: the round-4 pad-and-mask dispatch
    # zero-pads onto the 128-lane grid and runs the fused kernel exactly
    x, W = _problem(2, 8, 64, 96)               # D, K not 128-aligned
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        z = orthogonal_matching_pursuit(x, W, 4, solver="fused",
                                        use_pallas=True)
    za = orthogonal_matching_pursuit(x, W, 4, solver="chol-full",
                                     use_pallas=False)
    np.testing.assert_allclose(np.asarray(z), np.asarray(za), atol=1e-4)
    # a genuinely kernel-incompatible request (explicit gram_jitter
    # bypasses the kernel's pivot-floor policy) still warns + falls back
    with pytest.warns(UserWarning, match="fused"):
        zj = orthogonal_matching_pursuit(x, W, 4, solver="fused",
                                         use_pallas=True,
                                         gram_jitter=1e-8)
    np.testing.assert_allclose(np.asarray(zj), np.asarray(za), atol=1e-4)


def test_fused_bf16_selection_still_solves():
    """kernel_precision='bf16' coarsens only the selection correlation;
    the fit on whatever support it picks is still the f32 VPU LS fit."""
    x, W = _problem(17, 24, 128, 256)
    zb = orthogonal_matching_pursuit(x, W, 8, solver="fused",
                                     use_pallas=True,
                                     kernel_precision="bf16")
    za = orthogonal_matching_pursuit(x, W, 8, solver="chol-full",
                                     use_pallas=False)
    # near-equal residuals even where bf16 scores flip a selection
    np.testing.assert_allclose(_rss(x, zb, W), _rss(x, za, W),
                               rtol=5e-2, atol=1e-4)


def test_cgs2_matches_mgs():
    """gs='cgs2' (round-5 default: bulk two-pass classical GS) selects
    the same supports and reaches the same LS fit as the round-4
    sequential MGS chain — CGS2's reorthogonalization pass restores
    MGS-grade orthogonality (Giraud et al. 2005)."""
    from lasso_tpu.ops.fused_omp import fused_omp_solve
    x, W = _problem(99, 64, 128, 256)
    ia, va, za = fused_omp_solve(x, W, 12, interpret=True, gs="mgs")
    ib, vb, zb = fused_omp_solve(x, W, 12, interpret=True, gs="cgs2")
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    same = (np.asarray(ia) == np.asarray(ib)).all(axis=1)
    # f32 greedy ties may flip an occasional row; fits must still agree
    assert same.mean() > 0.9
    ra = _rss(x, _scatter(ia, za, 256), W)
    rb = _rss(x, _scatter(ib, zb, 256), W)
    np.testing.assert_allclose(rb, ra, rtol=1e-4, atol=1e-5)


def _scatter(idx, z_s, K):
    import jax.numpy as jnp
    n = idx.shape[0]
    return jnp.zeros((n, K), z_s.dtype).at[
        jnp.arange(n)[:, None], idx].add(z_s)
