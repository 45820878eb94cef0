"""Per-feature (per-atom) alpha rows — the weighted / adaptive lasso
(TPU extension; reference supports scalars only). Exactness rests on an
exact column rescaling: the [1, K]-row solve is the alpha=1 solve on a
column-rescaled dictionary (ops.common.per_feature_alpha_row), so the
property tested here is vector-solve == the weighted-lasso KKT system,
plus agreement across solvers and with the scalar fast path."""

import numpy as np
import jax.numpy as jnp
import pytest

from lasso_tpu.linear import sparse_encode
from lasso_tpu.linear.solvers import coord_descent, ista
from lasso_tpu.ops.common import per_feature_alpha_row


@pytest.fixture
def problem(rng):
    n, d, k = 12, 64, 128
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    W = jnp.asarray(
        (rng.standard_normal((d, k)) / np.sqrt(d)).astype(np.float32))
    z0 = jnp.zeros((n, k), jnp.float32)
    a_row = jnp.asarray(
        rng.uniform(0.05, 0.5, size=(1, k)).astype(np.float32))
    return x, W, z0, a_row


def weighted_kkt_violation(x, W, z, a_row, support_tol=1e-6):
    """Max violation of the weighted-lasso KKT conditions: at an optimum
    |W^T(Wz - x)|_k <= a_k where z_k = 0 and = -a_k sign(z_k) on the
    support."""
    x, W, z, a = map(np.asarray, (x, W, z, a_row))
    g = (z @ W.T - x) @ W  # [N, K]
    on_support = np.abs(z) > support_tol
    viol_support = np.abs(g + a * np.sign(z)) * on_support
    viol_zero = np.maximum(np.abs(g) - a, 0.0) * (~on_support)
    return max(viol_support.max(initial=0.0), viol_zero.max(initial=0.0))


def weighted_objective(x, W, z, a_row):
    x, W, z, a = map(np.asarray, (x, W, z, a_row))
    r = z.astype(np.float64) @ W.astype(np.float64).T - x
    return 0.5 * np.sum(r * r) + np.sum(a * np.abs(z))


def test_resolver_shapes(problem):
    x, W, _, a_row = problem
    n, k = x.shape[0], W.shape[1]
    assert per_feature_alpha_row(0.3, k, n) is None
    # (N,) is per-sample, not per-feature
    assert per_feature_alpha_row(jnp.ones((n,)), k, n) is None
    # bare (K,) is per-feature when K != N
    r = per_feature_alpha_row(jnp.ones((k,)), k, n)
    assert r.shape == (1, k)
    # (1, K) always
    assert per_feature_alpha_row(a_row, k, n).shape == (1, k)
    # ambiguous K == N: bare vector resolves per-sample (returns None)
    assert per_feature_alpha_row(jnp.ones((n,)), n, n) is None
    with pytest.raises(ValueError):
        per_feature_alpha_row(-a_row, k, n)


def test_ista_per_feature_kkt(problem):
    x, W, z0, a_row = problem
    z = ista(x, z0, W, a_row, maxiter=1500, tol=0.0, use_pallas=False)
    assert weighted_kkt_violation(x, W, z, a_row, 1e-5) < 2e-4


def test_ista_constant_row_matches_scalar(problem):
    x, W, z0, _ = problem
    kw = dict(lr=0.08, maxiter=150, tol=0.0, use_pallas=False)
    a_row = jnp.full((1, W.shape[1]), 0.2)
    z_row = np.asarray(ista(x, z0, W, a_row, **kw))
    z_scal = np.asarray(ista(x, z0, W, 0.2, **kw))
    np.testing.assert_allclose(z_row, z_scal, atol=3e-5)


def test_ista_per_feature_fused_mixed_restart(problem):
    """The whole performance stack composes with per-feature alpha (it
    is just alpha=1 on a rescaled dictionary)."""
    x, W, z0, a_row = problem
    kw = dict(maxiter=100, tol=0.0, use_pallas=True, fuse_steps=25,
              kernel_precision="mixed", restart=True)
    z_fused = np.asarray(ista(x, z0, W, a_row, **kw))
    z_plain = np.asarray(ista(x, z0, W, a_row, maxiter=100, tol=0.0,
                              use_pallas=False))
    f_f = weighted_objective(x, W, z_fused, a_row)
    f_p = weighted_objective(x, W, z_plain, a_row)
    # restart converges at least as well; mixed floors at bf16-grade
    assert f_f <= f_p + 1e-3 * abs(f_p)


def test_cd_per_feature_matches_ista(problem):
    x, W, _, a_row = problem
    z_cd = coord_descent(x, W, None, a_row, maxiter=4000, tol=1e-8,
                         use_pallas=False)
    z_is = ista(x, jnp.zeros_like(z_cd), W, a_row, maxiter=2000, tol=0.0,
                use_pallas=False)
    f_cd = weighted_objective(x, W, z_cd, a_row)
    f_is = weighted_objective(x, W, z_is, a_row)
    assert abs(f_cd - f_is) <= 1e-4 * abs(f_is), (f_cd, f_is)


def test_cd_per_feature_fused_matches_xla(problem):
    """The CD kernel's VMEM threshold row reproduces the XLA path."""
    x, W, _, a_row = problem
    kw = dict(maxiter=500, tol=1e-7)
    z_f = np.asarray(coord_descent(x, W, None, a_row, use_pallas=True,
                                   **kw))
    z_x = np.asarray(coord_descent(x, W, None, a_row, use_pallas=False,
                                   **kw))
    f_f = weighted_objective(x, W, z_f, a_row)
    f_x = weighted_objective(x, W, z_x, a_row)
    assert abs(f_f - f_x) <= 1e-5 * abs(f_x), (f_f, f_x)


def test_nonneg_composes(problem):
    x, W, z0, a_row = problem
    z = ista(x, z0, W, a_row, maxiter=800, tol=0.0, use_pallas=False,
             nonneg=True)
    z = np.asarray(z)
    assert z.min() >= 0.0
    # one-sided KKT: g_k >= -a_k everywhere, g_k = -a_k on the support
    g = (z @ np.asarray(W).T - np.asarray(x)) @ np.asarray(W)
    a = np.asarray(a_row)
    assert (g + a).min() > -2e-4
    on = z > 1e-5
    assert np.abs((g + a) * on).max() < 2e-4


@pytest.mark.parametrize("algorithm,rel", [
    ("cd-mod", 1e-4), ("iter-ridge", 1e-3), ("split-bregman", 1e-3),
    ("own", 1e-3),
])
def test_sparse_encode_per_feature_all_algorithms(rng, algorithm, rel):
    """Non-native algorithms route through sparse_encode's
    column-rescaling wrapper; objectives match ista's weighted solve
    within each solver's own terminal accuracy."""
    n, d, k = 6, 24, 48
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    W = jnp.asarray(
        (rng.standard_normal((d, k)) / np.sqrt(d)).astype(np.float32))
    a_row = jnp.asarray(rng.uniform(0.1, 0.4, size=(1, k))
                        .astype(np.float32))
    kw = {"max_iter" if algorithm == "cd-mod" else "maxiter": 400}
    z = sparse_encode(x, W, alpha=a_row, algorithm=algorithm, **kw)
    z_ref = sparse_encode(x, W, alpha=a_row, algorithm="ista",
                          maxiter=2000, tol=0.0)
    f = weighted_objective(x, W, z, a_row)
    f_ref = weighted_objective(x, W, z_ref, a_row)
    assert f <= f_ref + rel * abs(f_ref) + 1e-9, (f, f_ref)


def test_conv_per_channel_alpha(rng):
    """Per-channel alpha for conv FISTA: KKT of the weighted conv lasso
    (channel k's subgradient bound is a_k), plus constant-row == scalar."""
    from lasso_tpu.conv2d import ista_conv2d
    from lasso_tpu.conv2d.ops import conv2d, conv_transpose2d
    import jax.numpy as jnp
    N, Cz, Cx, H = 3, 6, 2, 8
    k = jnp.asarray((rng.standard_normal((Cz, Cx, 3, 3)) * 0.2)
                    .astype(np.float32))
    x = jnp.asarray(rng.standard_normal((N, Cx, H, H)).astype(np.float32))
    z0 = jnp.zeros((N, Cz, H, H), jnp.float32)
    a_ch = jnp.asarray(rng.uniform(0.02, 0.2, size=(1, Cz))
                       .astype(np.float32))
    kw = dict(padding=1, maxiter=3000, tol=0.0)
    z = ista_conv2d(x, z0, k, a_ch, **kw)
    g = np.asarray(conv2d(
        conv_transpose2d(z, k, padding=1) - x, k, padding=1))
    a4 = np.asarray(a_ch).reshape(1, Cz, 1, 1)
    zn = np.asarray(z)
    on = np.abs(zn) > 1e-5
    assert (np.abs(g + a4 * np.sign(zn)) * on).max() < 2e-4
    assert (np.maximum(np.abs(g) - a4, 0.0) * (~on)).max() < 2e-4
    # constant channel row == scalar
    z_c = ista_conv2d(x, z0, k, jnp.full((1, Cz), 0.1), padding=1,
                      maxiter=150, tol=0.0)
    z_s = ista_conv2d(x, z0, k, 0.1, padding=1, maxiter=150, tol=0.0)
    np.testing.assert_allclose(np.asarray(z_c), np.asarray(z_s),
                               atol=1e-6)


def test_dict_learning_positive(rng):
    """positive=True + solver nonneg=True gives a fully nonnegative
    factorization (sparse NMF-style)."""
    from lasso_tpu.linear import dict_learning
    X = jnp.asarray(np.abs(rng.standard_normal((80, 16))), jnp.float32)
    for du in ("sequential", "block"):
        W, losses = dict_learning(X, 12, alpha=0.05, constrained=True,
                                  positive=True, dict_update=du, steps=5,
                                  maxiter=60, tol=0.0, nonneg=True)
        assert float(jnp.min(W)) >= 0.0, du
        assert np.isfinite(np.asarray(losses)).all()
    with pytest.raises(ValueError):
        dict_learning(X, 12, alpha=0.05, constrained=False, positive=True)


def test_data_parallel_encode_per_feature(rng):
    """A per-feature row is batch-invariant: it closes over the
    shard_map body like a scalar and the sharded result matches the
    single-device solve."""
    from lasso_tpu.parallel import data_parallel_encode, make_mesh
    n, d, k = 32, 32, 64
    x = rng.standard_normal((n, d)).astype(np.float32)
    W = (rng.standard_normal((d, k)) / np.sqrt(d)).astype(np.float32)
    a_row = rng.uniform(0.1, 0.4, size=(1, k)).astype(np.float32)
    mesh = make_mesh(n_devices=8, model_parallel=1)
    kw = dict(maxiter=100, tol=0.0, lr=0.08)
    z_sh = np.asarray(data_parallel_encode(
        mesh, x, W, alpha=jnp.asarray(a_row), algorithm="ista", **kw))
    z_ref = np.asarray(sparse_encode(
        jnp.asarray(x), jnp.asarray(W), alpha=jnp.asarray(a_row),
        algorithm="ista", **kw))
    np.testing.assert_allclose(z_sh, z_ref, atol=2e-5)


def test_chunked_encode_per_feature(rng):
    from lasso_tpu.utils import chunked_encode
    n, d, k = 50, 32, 64
    x = rng.standard_normal((n, d)).astype(np.float32)
    W = (rng.standard_normal((d, k)) / np.sqrt(d)).astype(np.float32)
    a_row = rng.uniform(0.1, 0.4, size=(1, k)).astype(np.float32)
    kw = dict(maxiter=100, tol=0.0, lr=0.08)
    z_c = chunked_encode(x, W, alpha=a_row, chunk_size=16, **kw)
    z_ref = np.asarray(sparse_encode(
        jnp.asarray(x), jnp.asarray(W), alpha=jnp.asarray(a_row),
        algorithm="ista", **kw))
    np.testing.assert_allclose(z_c, z_ref, atol=2e-5)
