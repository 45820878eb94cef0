"""Scale-out tests on the virtual 8-device CPU mesh (SURVEY.md §4 item 5):
sharded execution must match single-device results, and the psum-reduced
Gram statistics of the dictionary update must be exact."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasso_tpu.linear import sparse_encode, update_dict_ridge
from lasso_tpu.parallel import (data_parallel_encode, make_mesh,
                                make_train_step)


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(n_devices=8)


@pytest.fixture(scope="module")
def mesh_tp():
    return make_mesh(n_devices=8, model_parallel=2)


def make_problem(rng, n=64, d=16, k=32):
    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = rng.standard_normal((n, d)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(W)


def test_data_parallel_encode_matches_single_device(rng, mesh8):
    x, W = make_problem(rng)
    z_single = sparse_encode(x, W, 0.2, algorithm="ista", maxiter=500,
                             tol=1e-8)
    z_shard = data_parallel_encode(mesh8, x, W, alpha=0.2, algorithm="ista",
                                   maxiter=500, tol=1e-8)
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_single),
                               atol=1e-5)


def test_data_parallel_encode_with_atom_sharding(rng, mesh_tp):
    x, W = make_problem(rng)
    z_single = sparse_encode(x, W, 0.2, algorithm="ista", maxiter=500,
                             tol=1e-8)
    z_shard = data_parallel_encode(mesh_tp, x, W, alpha=0.2,
                                   shard_atoms=True, algorithm="ista",
                                   maxiter=500, tol=1e-8)
    # collective reduction order differs from the local matmul: allow
    # float-sum noise
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_single),
                               atol=1e-4)


def test_sharded_gram_reduction_exact(rng, mesh8):
    # Z^T Z and Z^T X under a data-sharded mesh must equal the unsharded
    # values (XLA inserts the psum over the data axis)
    from jax.sharding import NamedSharding, PartitionSpec as P
    N, D, K = 64, 12, 20
    X = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    Z = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)

    V_single = update_dict_ridge(X, Z, lambd=1e-3)

    sh = NamedSharding(mesh8, P("data"))
    fn = jax.jit(lambda X, Z: update_dict_ridge(X, Z, lambd=1e-3),
                 in_shardings=(sh, sh),
                 out_shardings=NamedSharding(mesh8, P()))
    V_shard = fn(jax.device_put(X, sh), jax.device_put(Z, sh))
    np.testing.assert_allclose(np.asarray(V_shard), np.asarray(V_single),
                               atol=1e-4)


def test_train_step_sharded_matches_local(rng, mesh8):
    x, W = make_problem(rng)
    step, (x_sh, w_sh) = make_train_step(mesh8, alpha=0.2, lambd=1e-2,
                                         maxiter=300, tol=1e-8)
    W_new_sh, loss_sh = step(jax.device_put(x, x_sh),
                             jax.device_put(W, w_sh))

    from lasso_tpu.linear import lasso_loss
    Z = sparse_encode(x, W, 0.2, algorithm="ista", maxiter=300, tol=1e-8)
    loss_local = lasso_loss(x, Z, W, 0.2)
    W_new_local = update_dict_ridge(x, Z, lambd=1e-2)
    np.testing.assert_allclose(float(loss_sh), float(loss_local), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(W_new_sh),
                               np.asarray(W_new_local), atol=1e-4)


def test_data_parallel_encode_gspmd_route(rng, mesh8):
    """Algorithms without a shard_map route (here GPSR, whose stopping is
    batch-global through dot products the solver owns) take the GSPMD
    route (jit + shardings); XLA inserts the collectives."""
    from lasso_tpu.linear import lasso_loss
    x, W = make_problem(rng)
    z_single = sparse_encode(x, W, 0.2, algorithm="gpsr", maxiter=200)
    z_shard = data_parallel_encode(mesh8, x, W, alpha=0.2,
                                   algorithm="gpsr", maxiter=200)
    f_single = float(lasso_loss(x, z_single, W, 0.2))
    f_shard = float(lasso_loss(x, jnp.asarray(np.asarray(z_shard)), W, 0.2))
    np.testing.assert_allclose(f_shard, f_single, rtol=1e-4)


def test_data_parallel_encode_cd_shard_map(rng, mesh8):
    """Greedy CD routes through shard_map (per-sample active sets need no
    collective; shards exit their loops independently). With the kernel
    force-enabled (interpret mode on CPU) it sees LOCAL shapes — the
    combination that is impossible under GSPMD (VERDICT r1 item 3)."""
    x, W = make_problem(rng, k=128)  # K=128: fused-CD-supported shape
    z_single = sparse_encode(x, W, 0.2, algorithm="cd", maxiter=300,
                             tol=1e-8, use_pallas=True)
    z_shard = data_parallel_encode(mesh8, x, W, alpha=0.2, algorithm="cd",
                                   maxiter=300, tol=1e-8, use_pallas=True)
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_single),
                               atol=1e-5)


def test_data_parallel_encode_omp_fused_shard_map(rng, mesh8):
    """OMP's whole-solve fused kernel under shard_map: each shard runs
    the kernel on its LOCAL batch (interpret on CPU) — the route real
    TPU meshes take now that solver='auto' prefers 'fused'."""
    x, W = make_problem(rng, n=64, d=128, k=256)  # fused-supported shape
    z_single = sparse_encode(x, W, algorithm="omp", n_nonzero_coefs=6,
                             solver="fused", use_pallas=True)
    z_shard = data_parallel_encode(mesh8, x, W, algorithm="omp",
                                   n_nonzero_coefs=6, solver="fused",
                                   use_pallas=True)
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_single),
                               atol=1e-5)


def test_data_parallel_encode_cd_mod_shard_map(rng, mesh8):
    x, W = make_problem(rng)
    z_single = sparse_encode(x, W, 0.2, algorithm="cd-mod", max_iter=200)
    z_shard = data_parallel_encode(mesh8, x, W, alpha=0.2,
                                   algorithm="cd-mod", max_iter=200)
    # last-ulp reduction-order noise in the per-sample duality-gap check
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_single),
                               atol=1e-4)


def test_data_parallel_encode_interior_point_shard_map(rng, mesh8):
    """IP routes through shard_map with axis_name='data': its mean-over-
    batch stopping test psums to the GLOBAL batch mean, so the sharded
    run reproduces the single-device barrier schedule exactly."""
    x, W = make_problem(rng)
    z_single = sparse_encode(x, W, 0.2, algorithm="interior-point",
                             maxiter=30)
    z_shard = data_parallel_encode(mesh8, x, W, alpha=0.2,
                                   algorithm="interior-point", maxiter=30)
    # the psum'd batch means match the global means to float-sum noise;
    # threshold crossings in the barrier schedule amplify it slightly
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_single),
                               atol=1e-3)


def test_data_parallel_encode_pallas_gated_under_gspmd(rng, mesh_tp):
    """With atom sharding the GSPMD route is the only option; solvers with
    kernels must default to use_pallas=False there (a pallas_call cannot
    be partitioned by GSPMD)."""
    from lasso_tpu.linear import lasso_loss
    x, W = make_problem(rng, k=128)
    z_single = sparse_encode(x, W, 0.2, algorithm="cd", maxiter=300,
                             tol=1e-8, use_pallas=False)
    z_shard = data_parallel_encode(mesh_tp, x, W, alpha=0.2,
                                   shard_atoms=True, algorithm="cd",
                                   maxiter=300, tol=1e-8)
    f_single = float(lasso_loss(x, z_single, W, 0.2))
    f_shard = float(lasso_loss(x, jnp.asarray(np.asarray(z_shard)), W, 0.2))
    np.testing.assert_allclose(f_shard, f_single, rtol=1e-4)


def test_train_step_cd_shard_map(rng, mesh8):
    """EM training with a CD encoder over the mesh (shard_map route +
    psum Gram reductions)."""
    x, W = make_problem(rng)
    step, (x_sh, w_sh) = make_train_step(mesh8, alpha=0.2, lambd=1e-2,
                                         algorithm="cd", maxiter=300,
                                         tol=1e-8)
    W_new_sh, loss_sh = step(jax.device_put(x, x_sh),
                             jax.device_put(W, w_sh))

    from lasso_tpu.linear import lasso_loss
    Z = sparse_encode(x, W, 0.2, algorithm="cd", maxiter=300, tol=1e-8)
    loss_local = lasso_loss(x, Z, W, 0.2)
    W_new_local = update_dict_ridge(x, Z, lambd=1e-2)
    np.testing.assert_allclose(float(loss_sh), float(loss_local), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(W_new_sh),
                               np.asarray(W_new_local), atol=5e-4)


def test_train_step_with_tp(rng, mesh_tp):
    x, W = make_problem(rng)
    step, (x_sh, w_sh) = make_train_step(mesh_tp, alpha=0.2,
                                         shard_atoms=True, maxiter=100)
    W_new, loss = step(jax.device_put(x, x_sh), jax.device_put(W, w_sh))
    assert np.isfinite(float(loss))
    assert W_new.shape == W.shape


def test_data_parallel_encode_with_z0_warm_start(rng, mesh8):
    """z0 must flow into shard_map as a 'data'-sharded operand, not a
    closed-over global (regression: AssertionError on local shapes)."""
    x, W = make_problem(rng)
    z0 = jnp.asarray(
        rng.standard_normal((x.shape[0], W.shape[1])).astype(np.float32)
        * 0.01)
    z_single = sparse_encode(x, W, 0.2, algorithm="ista", z0=z0,
                             maxiter=500, tol=1e-8)
    z_shard = data_parallel_encode(mesh8, x, W, alpha=0.2, z0=z0,
                                   algorithm="ista", maxiter=500, tol=1e-8)
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_single),
                               atol=1e-5)


@pytest.mark.parametrize("dict_update", ["sequential", "block"])
def test_train_step_constrained_sharded_matches_local(rng, mesh8,
                                                      dict_update):
    """Constrained dictionary learning under the mesh (VERDICT r2 item 3):
    both M-step variants — the faithful sequential per-atom scan (per-atom
    psum of Z[:,k]^T R) and the block-parallel joint ridge — must
    reproduce the single-device update exactly (up to float-sum noise in
    the psum reduction order)."""
    from lasso_tpu.linear import lasso_loss
    from lasso_tpu.linear.dict_learning import (update_dict,
                                                update_dict_block)
    x, W = make_problem(rng)
    key = jax.random.PRNGKey(42)
    step, (x_sh, w_sh) = make_train_step(
        mesh8, alpha=0.2, constrained=True, dict_update=dict_update,
        maxiter=300, tol=1e-8)
    W_new_sh, loss_sh = step(jax.device_put(x, x_sh),
                             jax.device_put(W, w_sh), key)

    Z = sparse_encode(x, W, 0.2, algorithm="ista", maxiter=300, tol=1e-8)
    loss_local = lasso_loss(x, Z, W, 0.2)
    if dict_update == "sequential":
        W_new_local, _ = update_dict(W, x, Z, key=key)
    else:
        W_new_local, _ = update_dict_block(W, x, Z, key=key)
    np.testing.assert_allclose(float(loss_sh), float(loss_local),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(W_new_sh),
                               np.asarray(W_new_local), atol=2e-4)
    # unit-norm constraint holds on the sharded result
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(W_new_sh), axis=0), 1.0, atol=1e-5)


def test_update_dict_axis_name_exact(rng, mesh8):
    """update_dict's per-atom psum of Z[:,k]^T R under shard_map equals
    the unsharded sequential update."""
    from jax.sharding import PartitionSpec as P
    from lasso_tpu.linear.dict_learning import update_dict
    N, D, K = 64, 12, 20
    X = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    Z = jnp.asarray(rng.standard_normal((N, K)) * 0.3, jnp.float32)
    W = rng.standard_normal((D, K)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    W = jnp.asarray(W)
    key = jax.random.PRNGKey(3)

    W_single, Z_single = update_dict(W, X, Z, key=key)
    fn = jax.jit(jax.shard_map(
        lambda X, Z, W: update_dict(W, X, Z, key=key, axis_name="data"),
        mesh=mesh8, in_specs=(P("data"), P("data"), P()),
        out_specs=(P(), P("data")), check_vma=False))
    W_shard, Z_shard = fn(X, Z, W)
    np.testing.assert_allclose(np.asarray(W_shard), np.asarray(W_single),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(Z_shard), np.asarray(Z_single),
                               atol=2e-5)


def test_data_parallel_encode_return_iters(rng, mesh8):
    """return_iters flows through both routes for solvers with a single
    global iteration count (ADVICE r2): shard_map psums the stopping
    statistic, so the count is replicated across shards."""
    x, W = make_problem(rng)
    z_s, k_s = sparse_encode(x, W, 0.2, algorithm="ista", maxiter=500,
                             tol=1e-6, return_iters=True)
    z_m, k_m = data_parallel_encode(mesh8, x, W, alpha=0.2,
                                    algorithm="ista", maxiter=500,
                                    tol=1e-6, return_iters=True)
    assert int(k_m) == int(k_s)
    np.testing.assert_allclose(np.asarray(z_m), np.asarray(z_s), atol=1e-5)

    # GSPMD route (gpsr): single global count too
    z_g, k_g = data_parallel_encode(mesh8, x, W, alpha=0.2,
                                    algorithm="gpsr", maxiter=200,
                                    return_iters=True)
    assert 1 <= int(k_g) <= 1000

    # per-sample-stopping solvers still reject
    with pytest.raises(ValueError):
        data_parallel_encode(mesh8, x, W, alpha=0.2, algorithm="cd",
                             return_iters=True)
    with pytest.raises(ValueError):
        data_parallel_encode(mesh8, x, W, alpha=0.2, algorithm="ista",
                             per_sample_tol=True, return_iters=True)


def test_data_parallel_encode_conv2d_matches_single(rng, mesh8):
    """Conv FISTA over the mesh (VERDICT r2 item 4): sharded encode must
    equal the single-device solve — the batch-global stopping sum psums,
    so the iteration schedule is identical."""
    from lasso_tpu.conv2d import ista_conv2d
    from lasso_tpu.parallel import data_parallel_encode_conv2d

    N, Cz, Cx, H = 16, 4, 3, 8
    k = jnp.asarray(rng.standard_normal((Cz, Cx, 3, 3)) * 0.2, jnp.float32)
    x = jnp.asarray(rng.standard_normal((N, Cx, H, H)), jnp.float32)
    z0 = jnp.zeros((N, Cz, H, H), jnp.float32)

    z_single = ista_conv2d(x, z0, k, alpha=0.05, lr=0.05, padding=1,
                           maxiter=300, tol=1e-8)
    z_shard = data_parallel_encode_conv2d(mesh8, x, k, alpha=0.05,
                                          lr=0.05, padding=1, maxiter=300,
                                          tol=1e-8)
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_single),
                               atol=1e-5)


def test_data_parallel_encode_nl_matches_single(rng, mesh8):
    """Nonlinear FISTA over the mesh: per-sample decoder, psum'd global
    stopping sum."""
    from lasso_tpu.nonlinear import ista_nl
    from lasso_tpu.parallel import data_parallel_encode_nl

    N, K, D = 16, 10, 12
    Wd = jnp.asarray(rng.standard_normal((K, D)) * 0.4, jnp.float32)
    decoder = lambda z: jnp.tanh(z) @ Wd
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    z0 = jnp.asarray(rng.standard_normal((N, K)) * 0.1, jnp.float32)

    z_single = ista_nl(x, z0, decoder, alpha=0.05, lr=0.05, maxiter=300,
                       tol=1e-8)
    z_shard = data_parallel_encode_nl(mesh8, x, z0, decoder, alpha=0.05,
                                      lr=0.05, maxiter=300, tol=1e-8)
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_single),
                               atol=1e-5)


def test_data_parallel_encode_ista_restart(rng, mesh8):
    """restart=True flows through the shard_map route: the per-row
    t-vector is shard-local and the convergence delta still psums."""
    x, W = make_problem(rng)
    z_single = sparse_encode(x, W, 0.2, algorithm="ista", maxiter=400,
                             tol=1e-8, restart=True)
    z_shard = data_parallel_encode(mesh8, x, W, alpha=0.2,
                                   algorithm="ista", maxiter=400,
                                   tol=1e-8, restart=True)
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_single),
                               atol=1e-5)


def test_task_driven_step_matches_single_device(rng, mesh8):
    """Sharded implicit-gradient (task-driven) training step == the same
    step computed without the mesh: forward FISTA, IFT backward CG, and
    the dictionary-cotangent reduction all partition over 'data'."""
    from lasso_tpu.linear import make_implicit_encoder
    from lasso_tpu.parallel import make_task_driven_step

    x, W = make_problem(rng, n=64, d=16, k=32)
    sol = dict(maxiter=400, tol=0.0, lr=0.15)

    def downstream(xx, z, w):
        return 0.5 * jnp.sum(jnp.square(jnp.matmul(z, w.T) - xx))

    step, (x_sh, w_sh) = make_task_driven_step(
        mesh8, downstream, alpha=0.2, opt_lr=0.01, **sol)
    W_sh, loss_sh = step(jax.device_put(x, x_sh), jax.device_put(W, w_sh))

    enc = make_implicit_encoder(use_pallas=False, **sol)

    def loss_fn(w):
        z = enc(x, w, jnp.asarray(0.2))
        return downstream(x, z, w)

    loss_1, g = jax.value_and_grad(loss_fn)(W)
    W_1 = W - 0.01 * g
    W_1 = W_1 / jnp.maximum(jnp.linalg.norm(W_1, axis=0, keepdims=True),
                            1.0)
    np.testing.assert_allclose(float(loss_sh), float(loss_1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(W_sh), np.asarray(W_1),
                               atol=5e-5)

    # and the loss must actually go down over a few sharded steps
    losses = [float(loss_sh)]
    W_c = W_sh
    for _ in range(3):
        W_c, l = step(jax.device_put(x, x_sh), W_c)
        losses.append(float(l))
    assert losses[-1] < losses[0], losses


def test_task_driven_persist_step(rng, mesh8):
    """persist=True: a persist step from zero codes equals the plain
    step exactly, and carrying codes across steps keeps descending."""
    from lasso_tpu.parallel import make_task_driven_step

    x, W = make_problem(rng, n=64, d=16, k=32)
    sol = dict(maxiter=400, tol=0.0, lr=0.15)

    def downstream(xx, z, w):
        return 0.5 * jnp.sum(jnp.square(jnp.matmul(z, w.T) - xx))

    step_p, (x_sh, w_sh) = make_task_driven_step(
        mesh8, downstream, alpha=0.2, opt_lr=0.01, persist=True, **sol)
    step, _ = make_task_driven_step(
        mesh8, downstream, alpha=0.2, opt_lr=0.01, **sol)

    xd = jax.device_put(x, x_sh)
    wd = jax.device_put(W, w_sh)
    z0 = jax.device_put(jnp.zeros((64, 32), jnp.float32), x_sh)
    W_p, loss_p, z = step_p(xd, wd, z0)
    W_0, loss_0 = step(xd, wd)
    np.testing.assert_allclose(float(loss_p), float(loss_0), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(W_p), np.asarray(W_0),
                               atol=1e-7)

    losses = [float(loss_p)]
    W_c = W_p
    for _ in range(3):
        W_c, l, z = step_p(xd, W_c, z)
        losses.append(float(l))
    assert losses[-1] < losses[0], losses


# ---------------------------------------------------------------------------
# Ragged batches (N % data-axis != 0): pad-and-mask at the mesh API
# (VERDICT r3 item 5). A zero row solves a zero problem; the tol rescale
# keeps the sum-stopping solvers' global threshold that of the unpadded
# batch, so sharded == single-device holds exactly.
# ---------------------------------------------------------------------------

def test_ragged_data_parallel_encode_ista(rng, mesh8):
    x, W = make_problem(rng, n=61)
    z_single = sparse_encode(x, W, 0.2, algorithm="ista", maxiter=500,
                             tol=1e-6)
    z_shard, k = data_parallel_encode(mesh8, x, W, alpha=0.2,
                                      algorithm="ista", maxiter=500,
                                      tol=1e-6, return_iters=True)
    assert z_shard.shape == (61, W.shape[1])
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_single),
                               atol=1e-5)
    # the tol rescale preserves the unpadded stopping point exactly
    _, k_single = sparse_encode(x, W, 0.2, algorithm="ista", maxiter=500,
                                tol=1e-6, return_iters=True)
    assert int(k) == int(k_single)


def test_ragged_data_parallel_encode_cd(rng, mesh8):
    x, W = make_problem(rng, n=45, k=128)
    z_single = sparse_encode(x, W, 0.2, algorithm="cd", maxiter=300,
                             tol=1e-8, use_pallas=True)
    z_shard = data_parallel_encode(mesh8, x, W, alpha=0.2, algorithm="cd",
                                   maxiter=300, tol=1e-8, use_pallas=True)
    assert z_shard.shape == z_single.shape
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_single),
                               atol=1e-5)


def test_ragged_data_parallel_encode_warmstart_and_vec_alpha(rng, mesh8):
    """z0 warm starts and per-sample alpha thread through the padding
    (alpha pads with ONES so the homogeneity rescale stays defined)."""
    x, W = make_problem(rng, n=43)
    a = jnp.asarray(0.1 + 0.2 * rng.random(43).astype(np.float32))
    z0 = jnp.asarray(rng.standard_normal((43, W.shape[1])) * 0.01,
                     jnp.float32)
    z_single = sparse_encode(x, W, a, algorithm="ista", z0=z0,
                             maxiter=400, tol=1e-7)
    z_shard = data_parallel_encode(mesh8, x, W, alpha=a, z0=z0,
                                   algorithm="ista", maxiter=400,
                                   tol=1e-7)
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_single),
                               atol=1e-5)


def test_ragged_data_parallel_encode_conv2d(rng, mesh8):
    from lasso_tpu.conv2d import ista_conv2d
    from lasso_tpu.parallel import data_parallel_encode_conv2d

    N, Cz, Cx, H = 13, 4, 3, 8
    k = jnp.asarray(rng.standard_normal((Cz, Cx, 3, 3)) * 0.2, jnp.float32)
    x = jnp.asarray(rng.standard_normal((N, Cx, H, H)), jnp.float32)
    z0 = jnp.zeros((N, Cz, H, H), jnp.float32)

    z_single = ista_conv2d(x, z0, k, alpha=0.05, lr=0.05, padding=1,
                           maxiter=300, tol=1e-7)
    z_shard = data_parallel_encode_conv2d(mesh8, x, k, alpha=0.05,
                                          lr=0.05, padding=1, maxiter=300,
                                          tol=1e-7)
    assert z_shard.shape == z_single.shape
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_single),
                               atol=1e-5)


def test_ragged_data_parallel_encode_nl(rng, mesh8):
    from lasso_tpu.nonlinear import ista_nl
    from lasso_tpu.parallel import data_parallel_encode_nl

    N, K, D = 11, 10, 12
    Wd = jnp.asarray(rng.standard_normal((K, D)) * 0.4, jnp.float32)
    decoder = lambda z: jnp.tanh(z) @ Wd   # decoder(0) == 0: exact parity
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    z0 = jnp.asarray(rng.standard_normal((N, K)) * 0.1, jnp.float32)

    z_single = ista_nl(x, z0, decoder, alpha=0.05, lr=0.05, maxiter=300,
                       tol=1e-7)
    z_shard = data_parallel_encode_nl(mesh8, x, z0, decoder, alpha=0.05,
                                      lr=0.05, maxiter=300, tol=1e-7)
    assert z_shard.shape == z_single.shape
    np.testing.assert_allclose(np.asarray(z_shard), np.asarray(z_single),
                               atol=1e-5)
