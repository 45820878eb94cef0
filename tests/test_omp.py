"""Batched Orthogonal Matching Pursuit (TPU extension; no reference
counterpart — certified against a plain numpy OMP oracle and by the
greedy/LS invariants)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lasso_tpu.linear import sparse_encode
from lasso_tpu.linear.solvers import orthogonal_matching_pursuit as omp


def numpy_omp(x, W, T):
    """Straightforward per-sample OMP oracle (float64)."""
    W = np.asarray(W, np.float64)
    norms = np.linalg.norm(W, axis=0)
    Z = np.zeros((x.shape[0], W.shape[1]))
    for i, xi in enumerate(np.asarray(x, np.float64)):
        support = []
        for _ in range(T):
            r = xi - W @ Z[i]
            c = np.abs(W.T @ r) / norms
            c[support] = -1
            support.append(int(np.argmax(c)))
            Ws = W[:, support]
            zs, *_ = np.linalg.lstsq(Ws, xi, rcond=None)
            Z[i, :] = 0
            Z[i, support] = zs
    return Z


@pytest.fixture
def problem(rng):
    n, d, k = 10, 32, 64
    W = rng.standard_normal((d, k))
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = rng.standard_normal((n, d))
    return (jnp.asarray(x, jnp.float32), jnp.asarray(W, jnp.float32))


def test_matches_numpy_oracle(problem):
    x, W = problem
    T = 6
    z = np.asarray(omp(x, W, n_nonzero_coefs=T))
    z_ref = numpy_omp(x, W, T)
    np.testing.assert_allclose(z, z_ref, atol=1e-4)


def test_exact_recovery(rng):
    """OMP recovers a T-sparse code exactly from noiseless data."""
    n, d, k, T = 8, 64, 128, 5
    W = rng.standard_normal((d, k))
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    z_true = np.zeros((n, k))
    for i in range(n):
        s = rng.choice(k, T, replace=False)
        z_true[i, s] = rng.standard_normal(T) + np.sign(
            rng.standard_normal(T)) * 0.5
    x = z_true @ W.T
    z = np.asarray(omp(jnp.asarray(x, jnp.float32),
                       jnp.asarray(W, jnp.float32), n_nonzero_coefs=T))
    np.testing.assert_allclose(z, z_true, atol=1e-3)


def test_support_size_and_ls_orthogonality(problem):
    """|support| <= T, and the residual is orthogonal to every selected
    atom (the defining property of the exact LS refit)."""
    x, W = problem
    T = 7
    z = np.asarray(omp(x, W, n_nonzero_coefs=T))
    nnz = (np.abs(z) > 1e-7).sum(axis=1)
    assert (nnz <= T).all()
    r = np.asarray(x) - z @ np.asarray(W).T
    corr = r @ np.asarray(W)
    on = np.abs(z) > 1e-7
    assert np.abs(corr[on]).max() < 1e-4


def test_tol_stopping_per_sample(rng):
    """tol freezes samples individually: an exactly-representable sample
    stops early with a tiny support while a noisy one keeps growing."""
    d, k = 32, 64
    W = rng.standard_normal((d, k))
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    z_true = np.zeros((2, k))
    z_true[0, [3, 17]] = [1.0, -2.0]          # 2-sparse, exact
    x = z_true @ W.T
    x[1] = rng.standard_normal(d)             # dense noise sample
    z, k_it = omp(jnp.asarray(x, jnp.float32), jnp.asarray(W, jnp.float32),
                  n_nonzero_coefs=10, tol=1e-8, return_iters=True)
    z = np.asarray(z)
    assert (np.abs(z[0]) > 1e-6).sum() <= 3
    assert (np.abs(z[1]) > 1e-6).sum() > 5
    r0 = x[0] - z[0] @ np.asarray(W, np.float64).T
    assert np.sum(r0 ** 2) < 1e-6


def test_all_samples_converged_stops_loop(rng):
    d, k = 16, 32
    W = rng.standard_normal((d, k))
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    z_true = np.zeros((4, k))
    z_true[:, 5] = 1.0
    x = z_true @ W.T
    z, it = omp(jnp.asarray(x, jnp.float32), jnp.asarray(W, jnp.float32),
                n_nonzero_coefs=8, tol=1e-9, return_iters=True)
    assert int(it) <= 3


def test_sparse_encode_dispatch(problem):
    x, W = problem
    z = sparse_encode(x, W, algorithm="omp", n_nonzero_coefs=4)
    assert (np.abs(np.asarray(z)) > 1e-7).sum(axis=1).max() <= 4
    z2, n_it = sparse_encode(x, W, algorithm="omp", n_nonzero_coefs=4,
                             return_iters=True)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z2))
    assert int(n_it) == 4


def test_validation(problem):
    x, W = problem
    with pytest.raises(ValueError):
        omp(x, W, n_nonzero_coefs=0)
    with pytest.raises(ValueError):
        omp(x, W, n_nonzero_coefs=33)   # > D


def test_cg_solver_matches_cholesky(problem):
    """The warm-started CG support solve must reproduce the Cholesky
    path's codes (same supports, cg_tol-tight coefficients)."""
    x, W = problem
    z_ch = np.asarray(omp(x, W, n_nonzero_coefs=6, solver="chol"))
    z_cg = np.asarray(omp(x, W, n_nonzero_coefs=6, solver="cg"))
    assert (np.asarray(z_ch != 0) == np.asarray(z_cg != 0)).all()
    np.testing.assert_allclose(z_cg, z_ch, atol=1e-5)


def test_ksvd_style_dict_learning_converges(rng):
    """OMP E-steps compose with the constrained unit-norm M-step —
    K-SVD-style dictionary learning (fixed sparsity instead of an l1
    penalty): reconstruction loss must decrease monotonically."""
    from lasso_tpu.linear import dict_learning

    k_true = 32
    Dt = rng.standard_normal((16, k_true))
    Dt /= np.linalg.norm(Dt, axis=0, keepdims=True)
    Z = np.zeros((256, k_true))
    for i in range(256):
        s = rng.choice(k_true, 3, replace=False)
        Z[i, s] = rng.standard_normal(3)
    X = jnp.asarray(Z @ Dt.T + 0.01 * rng.standard_normal((256, 16)),
                    jnp.float32)
    W, losses = dict_learning(X, n_components=32, alpha=0.0,
                              constrained=True, steps=10,
                              algorithm="omp", n_nonzero_coefs=3)
    losses = np.asarray(losses)
    assert np.all(np.diff(losses) <= 1e-5), losses
    assert losses[-1] < 0.5 * losses[0], losses


def test_append_kernel_matches_dense_solves(rng):
    """The inverse-carry append kernel (interpret mode) reproduces dense
    solves of every leading block as rows are appended one at a time."""
    from lasso_tpu.ops.batched_cholesky import cholesky_append_solve_lanes

    T, B = 16, 8
    A = rng.standard_normal((B, T, T)).astype(np.float32)
    M = A @ np.swapaxes(A, 1, 2) + T * np.eye(T, dtype=np.float32)[None]
    V = jnp.broadcast_to(jnp.eye(T, dtype=jnp.float32)[:, :, None],
                         (T, T, B))
    rhs = rng.standard_normal((B, T)).astype(np.float32)
    for k in range(T):
        g = np.zeros((T, B), np.float32)
        g[:k + 1] = M[:, k, :k + 1].T
        b = np.zeros((T, B), np.float32)
        b[:k + 1] = rhs[:, :k + 1].T
        V, z = cholesky_append_solve_lanes(V, jnp.asarray(g),
                                           jnp.asarray(b), k,
                                           interpret=True)
        z = np.asarray(z)
        for s in range(B):
            ref = np.linalg.solve(M[s, :k + 1, :k + 1], rhs[s, :k + 1])
            np.testing.assert_allclose(z[:k + 1, s], ref, rtol=2e-4,
                                       atol=1e-5)
        if k + 1 < T:  # untouched slots stay exactly zero
            assert np.abs(z[k + 1:]).max() == 0.0


@pytest.mark.parametrize("shape,tol", [
    ((48, 32, 64, 12), None),   # T not a multiple of 8 (panel padding)
    ((130, 24, 40, 10), None),  # N > 128, not a lane multiple (padding)
    ((48, 32, 64, 12), 8.0),    # per-sample freezing mid-run
])
def test_incremental_matches_refactorizing(rng, shape, tol):
    """solver='chol' (incremental append kernel, interpreted off-TPU)
    gives the same supports and coefficients as the refactorizing
    'chol-full' path, including under tol-freezing and padding."""
    N, D, K, T = shape
    x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    W = rng.standard_normal((D, K)).astype(np.float32)
    W = jnp.asarray(W / np.linalg.norm(W, axis=0, keepdims=True))
    z_full = omp(x, W, n_nonzero_coefs=T, tol=tol, solver="chol-full")
    z_inc = omp(x, W, n_nonzero_coefs=T, tol=tol, solver="chol",
                use_pallas=True)
    _assert_same_fit(x, W, z_inc, z_full)


def _assert_same_fit(x, W, z_a, z_b):
    """Coefficient equality when the supports agree; otherwise (an f32
    argmax near-tie or a borderline tol-freeze can flip an atom choice
    between the paths' differently-rounded contractions) fall back to
    per-sample residual-norm equivalence (ADVICE r3 item 4)."""
    sup_a, sup_b = np.asarray(z_a != 0), np.asarray(z_b != 0)
    if (sup_a == sup_b).all():
        np.testing.assert_allclose(np.asarray(z_a), np.asarray(z_b),
                                   rtol=1e-4, atol=1e-5)
    else:
        r_a = np.asarray(x - z_a @ W.T)
        r_b = np.asarray(x - z_b @ W.T)
        np.testing.assert_allclose(np.sum(r_a ** 2, axis=1),
                                   np.sum(r_b ** 2, axis=1),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("tol", [None, 8.0])
def test_legacy_inc_body_matches_chol_full(rng, tol):
    """The inc-but-not-ws_fast combination (append kernel driving the
    legacy gather body — what the 6 GB W_S gate selects at headline D)
    must match the refactorizing path (ADVICE r3 item 3)."""
    N, D, K, T = 48, 32, 64, 12
    x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    W = rng.standard_normal((D, K)).astype(np.float32)
    W = jnp.asarray(W / np.linalg.norm(W, axis=0, keepdims=True))
    z_leg = omp(x, W, n_nonzero_coefs=T, tol=tol, solver="chol",
                use_pallas=True, ws_fast=False)
    z_full = omp(x, W, n_nonzero_coefs=T, tol=tol, solver="chol-full")
    _assert_same_fit(x, W, z_leg, z_full)


def test_explicit_chol_unavailable_warns_and_stays_exact(rng):
    """An explicit solver='chol' without the append kernel must warn and
    fall back to the EXACT 'chol-full' path, never to the
    cg_tol-inexact CG (ADVICE r3 item 1)."""
    N, D, K, T = 24, 16, 32, 8
    x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    W = rng.standard_normal((D, K)).astype(np.float32)
    W = jnp.asarray(W / np.linalg.norm(W, axis=0, keepdims=True))
    with pytest.warns(UserWarning, match="chol-full"):
        z = omp(x, W, n_nonzero_coefs=T, solver="chol", use_pallas=False)
    z_full = omp(x, W, n_nonzero_coefs=T, solver="chol-full",
                 use_pallas=False)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_full), atol=0)


def test_duplicate_atom_degenerate_support_stays_finite(rng):
    """Two identical atoms force a linearly-dependent append: the kernel's
    relative pivot floor (implicit jitter) must keep the solution finite
    with the fitted residual of the single-atom LS fit (the duplicate
    adds no expressive power) — ADVICE r3 item 2 (was NaN)."""
    D = 16
    w = rng.standard_normal((D, 1)).astype(np.float32)
    w /= np.linalg.norm(w)
    W = jnp.asarray(np.concatenate([w, w], axis=1))
    x = jnp.asarray(rng.standard_normal((8, D)).astype(np.float32))
    z2 = omp(x, W, n_nonzero_coefs=2, solver="chol", use_pallas=True)
    assert np.isfinite(np.asarray(z2)).all()
    z1 = omp(x, W, n_nonzero_coefs=1, solver="chol", use_pallas=True)
    r2 = np.asarray(x - z2 @ W.T)
    r1 = np.asarray(x - z1 @ W.T)
    np.testing.assert_allclose(np.sum(r2 ** 2, axis=1),
                               np.sum(r1 ** 2, axis=1), rtol=1e-4,
                               atol=1e-5)
