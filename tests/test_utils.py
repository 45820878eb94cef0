"""Aux subsystems: checkpoint/resume, typed configs, profiling harness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasso_tpu.utils import (config_for, dict_learning_resumable,
                             latest_step, restore_checkpoint,
                             save_checkpoint, time_solver)


def test_checkpoint_roundtrip(tmp_path):
    state = {"weight": jnp.arange(6.0).reshape(2, 3),
             "losses": jnp.zeros((4,)),
             "key": jax.random.PRNGKey(1)}
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, jax.device_get(state), step=3)
    assert latest_step(path) == 3
    restored, step = restore_checkpoint(path, template=jax.device_get(state))
    assert step == 3
    np.testing.assert_allclose(restored["weight"],
                               np.arange(6.0).reshape(2, 3))


def test_dict_learning_resumable_matches_plain(rng, tmp_path):
    from lasso_tpu.linear import dict_learning
    X = jnp.asarray(rng.standard_normal((32, 8)), jnp.float32)
    kw = dict(n_components=12, alpha=0.1, constrained=False, steps=8,
              maxiter=100, key=jax.random.PRNGKey(7))
    W_plain, losses_plain = dict_learning(X, **kw)
    W_res, losses_res = dict_learning_resumable(
        X, ckpt_dir=str(tmp_path / "dl"), save_every=3, **kw)
    np.testing.assert_allclose(np.asarray(losses_res),
                               np.asarray(losses_plain), atol=1e-5)
    np.testing.assert_allclose(np.asarray(W_res), np.asarray(W_plain),
                               atol=1e-4)


def test_dict_learning_resume_from_partial(rng, tmp_path):
    X = jnp.asarray(rng.standard_normal((32, 8)), jnp.float32)
    path = str(tmp_path / "dl2")
    kw = dict(n_components=12, alpha=0.1, constrained=False,
              maxiter=100, key=jax.random.PRNGKey(7))
    # run 4 steps, checkpointing every 2
    W4, _ = dict_learning_resumable(X, steps=4, ckpt_dir=path, save_every=2,
                                    **kw)
    assert latest_step(path) == 4
    # resume to 8 total steps: must match an uninterrupted 8-step run
    W8_resumed, losses8 = dict_learning_resumable(
        X, steps=8, ckpt_dir=path, save_every=2, **kw)
    W8_direct, losses8_direct = dict_learning_resumable(
        X, steps=8, ckpt_dir=None, save_every=2, **kw)
    np.testing.assert_allclose(np.asarray(W8_resumed),
                               np.asarray(W8_direct), atol=1e-4)
    np.testing.assert_allclose(np.asarray(losses8)[4:],
                               np.asarray(losses8_direct)[4:], atol=1e-5)


def test_config_dispatch(rng):
    x = jnp.asarray(rng.standard_normal((8, 10)), jnp.float32)
    W = rng.standard_normal((10, 16)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    W = jnp.asarray(W)

    cfg = config_for("ista", maxiter=500, tol=1e-8)
    z1 = cfg.encode(x, W, alpha=0.2)
    from lasso_tpu.linear import sparse_encode
    z2 = sparse_encode(x, W, 0.2, algorithm="ista", maxiter=500, tol=1e-8)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-6)

    with pytest.raises(ValueError):
        config_for("bogus")


def test_time_solver(rng):
    x = jnp.asarray(rng.standard_normal((8, 10)), jnp.float32)
    f = jax.jit(lambda x: jnp.tanh(x) @ x.T)
    secs, out = time_solver(f, x)
    assert secs > 0 and out.shape == (8, 8)


def test_export_encoder_roundtrip(rng):
    from lasso_tpu.utils.export import export_encoder, load_encoder
    from lasso_tpu.linear import sparse_encode

    W = rng.standard_normal((10, 16)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    Wj = jnp.asarray(W)
    x = jnp.asarray(rng.standard_normal((8, 10)), np.float32)

    blob = export_encoder(Wj, alpha=0.2, algorithm="ista", batch_size=8,
                          maxiter=200, tol=1e-8, lr=0.1)
    assert isinstance(blob, (bytes, bytearray))
    call = load_encoder(bytes(blob))
    z_exported = call(x, Wj)
    z_direct = sparse_encode(x, Wj, 0.2, algorithm="ista", maxiter=200,
                             tol=1e-8, lr=0.1)
    np.testing.assert_allclose(np.asarray(z_exported),
                               np.asarray(z_direct), atol=1e-5)


def test_distributed_helpers_single_process():
    from lasso_tpu.parallel.distributed import (initialize,
                                                make_global_mesh,
                                                process_local_batch)
    assert initialize(num_processes=1) is False
    mesh = make_global_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] == len(jax.devices())
    lo, hi = process_local_batch(100)
    assert (lo, hi) == (0, 100)


def test_chunked_encode_matches_direct(rng):
    from lasso_tpu.linear import sparse_encode
    from lasso_tpu.utils import chunked_encode
    n, d, k = 50, 12, 20  # deliberately not a multiple of the chunk size
    x = rng.standard_normal((n, d)).astype(np.float32)
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    z_direct = np.asarray(sparse_encode(
        jnp.asarray(x), jnp.asarray(W), 0.2, algorithm="ista",
        maxiter=300, tol=0.0))
    z_chunked = chunked_encode(x, W, alpha=0.2, chunk_size=16,
                               algorithm="ista", maxiter=300, tol=0.0)
    np.testing.assert_allclose(z_chunked, z_direct, atol=1e-5)


def test_chunked_encode_empty_batch(rng):
    from lasso_tpu.utils import chunked_encode
    W = rng.standard_normal((8, 12)).astype(np.float32)
    x = np.zeros((0, 8), np.float32)
    z = chunked_encode(x, W, alpha=0.2)
    assert z.shape == (0, 12)


def test_chunked_encode_conv2d_matches_direct(rng):
    """Chunked conv sparse coding (VERDICT r2 item 4): 4-D batch streaming
    with tail padding must equal the direct conv solve."""
    from lasso_tpu.conv2d import ista_conv2d
    from lasso_tpu.utils import chunked_encode
    N, Cz, Cx, H = 22, 4, 3, 8  # N not a multiple of the chunk size
    k = rng.standard_normal((Cz, Cx, 3, 3)).astype(np.float32) * 0.2
    x = rng.standard_normal((N, Cx, H, H)).astype(np.float32)
    z0 = jnp.zeros((N, Cz, H, H), jnp.float32)
    z_direct = np.asarray(ista_conv2d(
        jnp.asarray(x), z0, jnp.asarray(k), alpha=0.05, lr=0.05,
        padding=1, maxiter=200, tol=0.0))
    z_chunked = chunked_encode(x, k, alpha=0.05, chunk_size=8,
                               algorithm="ista_conv2d", lr=0.05,
                               padding=1, maxiter=200, tol=0.0)
    assert z_chunked.shape == z_direct.shape
    np.testing.assert_allclose(z_chunked, z_direct, atol=1e-5)
    with pytest.raises(ValueError):
        chunked_encode(x, k, alpha=0.05, algorithm="ista_conv2d",
                       output="csr")


def test_chunked_encode_csr_output(rng):
    from lasso_tpu.linear import sparse_encode
    from lasso_tpu.native import unpack_codes_csr
    from lasso_tpu.utils import chunked_encode
    n, d, k = 50, 12, 20
    x = rng.standard_normal((n, d)).astype(np.float32)
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    z_dense = np.asarray(sparse_encode(
        jnp.asarray(x), jnp.asarray(W), 0.3, algorithm="ista",
        maxiter=300, tol=0.0))
    v, c, rp = chunked_encode(x, W, alpha=0.3, chunk_size=16,
                              algorithm="ista", maxiter=300, tol=0.0,
                              output="csr")
    z_back = unpack_codes_csr(v, c, rp, k)
    np.testing.assert_allclose(z_back, z_dense, atol=1e-5)
    assert rp[-1] == (np.abs(z_dense) > 0).sum()


def test_cli_encode_and_train(tmp_path, rng):
    """python -m lasso_tpu train/encode round-trip on .npy files."""
    from lasso_tpu.__main__ import main as cli
    x_path = str(tmp_path / "X.npy")
    w_path = str(tmp_path / "W.npy")
    z_path = str(tmp_path / "Z.npy")
    np.save(x_path, rng.standard_normal((48, 12)).astype(np.float32))
    cli(["train", x_path, "--atoms", "16", "--alpha", "0.2", "--steps", "3",
         "--dict-update", "block", "-o", w_path,
         "--solver-args", '{"maxiter": 50, "tol": 0.0, "lr": 0.1}'])
    W = np.load(w_path)
    assert W.shape == (12, 16)
    cli(["encode", x_path, w_path, "--alpha", "0.2", "-o", z_path,
         "--solver-args", '{"maxiter": 100, "tol": 0.0, "lr": 0.1}'])
    Z = np.load(z_path)
    assert Z.shape == (48, 16) and np.all(np.isfinite(Z))


def test_chunked_encode_group_and_omp(rng):
    """The chunked serving path composes with the round-3 solver
    families (group-ista structure kwargs, OMP's alpha-free contract)."""
    import jax.numpy as jnp
    from lasso_tpu.linear import sparse_encode
    from lasso_tpu.utils import chunked_encode

    W = rng.standard_normal((16, 32)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = rng.standard_normal((64, 16)).astype(np.float32)
    cases = (("group-ista", dict(groups=4, maxiter=500, tol=0.0,
                                 lr=0.15)),
             ("omp", dict(n_nonzero_coefs=4)))
    for algo, kw in cases:
        zc = chunked_encode(x, jnp.asarray(W), alpha=0.2, chunk_size=16,
                            algorithm=algo, **kw)
        z1 = sparse_encode(jnp.asarray(x), jnp.asarray(W), 0.2,
                           algorithm=algo, **kw)
        np.testing.assert_allclose(np.asarray(zc), np.asarray(z1),
                                   atol=5e-5)
