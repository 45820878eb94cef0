"""Gap-safe screening: certification correctness and end-to-end parity."""

import numpy as np
import jax.numpy as jnp

from lasso_tpu.linear import screen_atoms, screened_encode, sparse_encode


def make_problem(rng, n=12, d=24, k=96, alpha=None):
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(W)


def test_screening_certificate_is_safe(rng):
    """Every atom the sphere test eliminates must be zero in the true
    per-sample optimum — regardless of the warm iterate's quality."""
    x, W = make_problem(rng)
    alpha = 2.0  # high alpha: sparse optima, real elimination
    z_star = sparse_encode(x, W, alpha, algorithm="ista", maxiter=5000,
                           tol=1e-10)
    for warm in (0, 3, 25):
        z_w = (None if warm == 0 else
               sparse_encode(x, W, alpha, algorithm="ista", maxiter=warm,
                             tol=0.0))
        keep, gap = screen_atoms(x, W, alpha, z_w)
        keep = np.asarray(keep)
        assert np.all(gap >= 0)
        # eliminated => zero at the optimum (safety); allow f32 dust
        assert np.all(np.abs(np.asarray(z_star))[~keep] <= 1e-5)
    # a warmer iterate must never eliminate less than... (monotonicity is
    # not guaranteed pointwise, but the union should shrink markedly)
    keep0, _ = screen_atoms(x, W, alpha, None)
    keep25, _ = screen_atoms(
        x, W, alpha,
        sparse_encode(x, W, alpha, algorithm="ista", maxiter=25, tol=0.0))
    assert int(np.asarray(keep25).sum()) <= int(np.asarray(keep0).sum())


def test_screened_encode_matches_full_solve(rng):
    x, W = make_problem(rng)
    alpha = 2.0
    z_full = sparse_encode(x, W, alpha, algorithm="ista", maxiter=3000,
                           tol=1e-9)
    z_scr, info = screened_encode(x, W, alpha, warm_iters=25, bucket=16,
                                  maxiter=3000, tol=1e-9)
    assert info["screened"], info
    assert info["kept"] < info["K"]
    np.testing.assert_allclose(np.asarray(z_scr), np.asarray(z_full),
                               atol=1e-4)


def test_screened_encode_fallback_at_low_alpha(rng):
    """Low alpha -> dense supports -> the union keeps ~everything and the
    utility must fall back to the full-K solve (warm-started, so compare
    at convergence)."""
    x, W = make_problem(rng)
    z_scr, info = screened_encode(x, W, 0.01, warm_iters=10,
                                  maxiter=8000, tol=1e-10)
    assert not info["screened"]
    z_full = sparse_encode(x, W, 0.01, algorithm="ista", maxiter=8000,
                           tol=1e-10)

    # near-zero alpha on an overcomplete dictionary: the minimizer is a
    # SET, and warm/cold trajectories pick different members — compare
    # objectives, not codes
    def obj(z):
        r = z @ W.T - x
        return float(0.5 * jnp.sum(r * r) + 0.01 * jnp.sum(jnp.abs(z)))

    np.testing.assert_allclose(obj(z_scr), obj(z_full), rtol=1e-5)


def test_chunked_encode_with_screening(rng):
    """chunked_encode(screen=True) routes chunks through screened_encode
    and must match the unscreened result."""
    from lasso_tpu.utils import chunked_encode
    x, W = make_problem(rng, n=40)
    alpha = 2.0
    z_plain = chunked_encode(np.asarray(x), np.asarray(W), alpha=alpha,
                             chunk_size=16, maxiter=2000, tol=1e-9)
    z_scr = chunked_encode(np.asarray(x), np.asarray(W), alpha=alpha,
                           chunk_size=16, maxiter=2000, tol=1e-9,
                           screen=True,
                           screen_kwargs=dict(warm_iters=25, bucket=16))
    np.testing.assert_allclose(z_scr, z_plain, atol=1e-4)
