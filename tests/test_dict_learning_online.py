"""Online (minibatch, Mairal 2009) dictionary learning — TPU extension;
no reference counterpart. Certified by recovery/progress properties and
sharded == single-device equality of the mesh train step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasso_tpu.linear import (dict_evaluate, dict_learning_online,
                              sparse_encode, update_dict_online)


def make_data(rng, n=600, d=24, k_true=32, sparsity=3, noise=0.01):
    W = rng.standard_normal((d, k_true))
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    Z = np.zeros((n, k_true))
    for i in range(n):
        s = rng.choice(k_true, sparsity, replace=False)
        Z[i, s] = rng.standard_normal(sparsity) * 2.0
    X = Z @ W.T + noise * rng.standard_normal((n, d))
    return jnp.asarray(X, jnp.float32), W


def test_online_learns_dictionary(rng):
    X, _ = make_data(rng)
    key = jax.random.PRNGKey(1)
    W, losses = dict_learning_online(
        X, n_components=32, alpha=0.1, batch_size=64, steps=60, key=key,
        maxiter=100, tol=0.0, lr="auto")
    losses = np.asarray(losses)
    # minibatch losses are noisy (±10%) and the objective has an
    # alpha-penalty floor, so the trajectory check is only
    # no-divergence; the full-data eval below is the real signal
    assert np.isfinite(losses).all()
    assert losses[-10:].mean() <= 1.02 * losses[:10].mean()
    # atoms live in the unit ball (Mairal's constraint set)
    norms = np.linalg.norm(np.asarray(W), axis=0)
    assert (norms <= 1.0 + 1e-5).all()
    # the learned dictionary clearly beats the orthogonal init on the
    # full-data objective
    key_i = jax.random.split(key, 3)[1]
    W_init = jax.nn.initializers.orthogonal()(key_i, W.shape, jnp.float32)
    W_init = W_init / jnp.linalg.norm(W_init, axis=0, keepdims=True)
    f_final = float(dict_evaluate(X, W, 0.1, maxiter=200, tol=0.0))
    f_init = float(dict_evaluate(X, W_init, 0.1, maxiter=200, tol=0.0))
    assert f_final < 0.95 * f_init, (f_final, f_init)


def test_online_matches_batch_quality(rng):
    """At a comparable compute budget, online lands within a modest
    factor of full-batch EM on the training objective."""
    from lasso_tpu.linear import dict_learning
    X, _ = make_data(rng, n=400)
    kw = dict(maxiter=100, tol=0.0)
    W_b, _ = dict_learning(X, 32, alpha=0.1, constrained=True, steps=10,
                           **kw)
    W_o, _ = dict_learning_online(X, 32, alpha=0.1, batch_size=100,
                                  steps=40, **kw)
    f_b = float(dict_evaluate(X, W_b, 0.1, maxiter=300, tol=0.0))
    f_o = float(dict_evaluate(X, W_o, 0.1, maxiter=300, tol=0.0))
    assert f_o <= 1.5 * f_b, (f_o, f_b)


def test_update_dict_online_fixed_point(rng):
    """If W already minimizes the surrogate (stats built from exact LS
    codes on W's span with A diagonal-dominant), the sweep is ~ a no-op;
    and any update never leaves the unit ball."""
    d, k = 16, 8
    W = rng.standard_normal((d, k))
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    W = jnp.asarray(W, jnp.float32)
    Z = jnp.asarray(rng.standard_normal((200, k)), jnp.float32)
    X = Z @ W.T
    A = Z.T @ Z / 200.0
    B = X.T @ Z / 200.0
    W_new = update_dict_online(W, A, B, sweeps=2)
    # B = W A exactly, so u_k = w_k and the projection keeps unit norm
    np.testing.assert_allclose(np.asarray(W_new), np.asarray(W),
                               atol=1e-5)


def test_forget_and_validation(rng):
    X, _ = make_data(rng, n=200)
    W, losses = dict_learning_online(X, 16, alpha=0.1, batch_size=32,
                                     steps=20, forget=0.9, maxiter=50,
                                     tol=0.0)
    assert np.isfinite(np.asarray(losses)).all()
    with pytest.raises(ValueError):
        dict_learning_online(X, 16, alpha=0.1, forget=1.5, steps=2)
    with pytest.raises(ValueError):
        dict_learning_online(X, 16, alpha=0.1, batch_size=0, steps=2)


def test_mesh_online_step_matches_single_device(rng):
    """The psum'd statistics reproduce the single-device online step
    bit-for-tolerance on an 8-device mesh."""
    from lasso_tpu.linear.dict_learning import lasso_loss
    from lasso_tpu.parallel import make_mesh, make_online_train_step
    d, k, nb = 16, 32, 64
    W = rng.standard_normal((d, k))
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    W = jnp.asarray(W, jnp.float32)
    x_t = jnp.asarray(rng.standard_normal((nb, d)), jnp.float32)
    A0 = jnp.asarray(0.01 * np.eye(k), jnp.float32)
    B0 = 0.01 * W

    mesh = make_mesh(n_devices=8, model_parallel=1)
    step, (x_sh, rep) = make_online_train_step(
        mesh, alpha=0.1, maxiter=50, tol=0.0, lr=0.1)
    W_m, A_m, B_m, loss_m = step(jax.device_put(x_t, x_sh), W, A0, B0)

    # single-device twin
    Z = sparse_encode(x_t, W, 0.1, algorithm="ista", maxiter=50, tol=0.0,
                      lr=0.1)
    A_s = A0 + Z.T @ Z / nb
    B_s = B0 + x_t.T @ Z / nb
    W_s = update_dict_online(W, A_s, B_s)
    np.testing.assert_allclose(np.asarray(A_m), np.asarray(A_s),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(B_m), np.asarray(B_s),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(W_m), np.asarray(W_s),
                               atol=1e-5)
    np.testing.assert_allclose(float(loss_m),
                               float(lasso_loss(x_t, Z, W, 0.1)),
                               rtol=1e-5)


def test_data_parallel_encode_omp(rng):
    """OMP routes through the shard_map layer (per-sample independent,
    no collective)."""
    from lasso_tpu.parallel import data_parallel_encode, make_mesh
    n, d, k = 32, 16, 32
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = rng.standard_normal((n, d)).astype(np.float32)
    mesh = make_mesh(n_devices=8, model_parallel=1)
    z_sh = np.asarray(data_parallel_encode(
        mesh, x, W, algorithm="omp", n_nonzero_coefs=4))
    z_ref = np.asarray(sparse_encode(jnp.asarray(x), jnp.asarray(W),
                                     algorithm="omp", n_nonzero_coefs=4))
    np.testing.assert_allclose(z_sh, z_ref, atol=1e-5)
