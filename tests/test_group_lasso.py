"""Group lasso / sparse-group lasso (TPU extension — no reference
counterpart; correctness certified by closed-form prox checks, KKT /
prox-fixed-point certificates, and reduction to plain lasso)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lasso_tpu.linear import sparse_encode
from lasso_tpu.linear.solvers import (group_ista, group_lasso_objective,
                                      group_soft_threshold, ista)
from lasso_tpu.linear.solvers.group_lasso import resolve_groups


def _np_group_prox(v, theta, ids, weights=None):
    """Direct numpy blockwise shrink (oracle)."""
    out = np.array(v, dtype=np.float64)
    for g in np.unique(ids):
        cols = ids == g
        w = 1.0 if weights is None else weights[g]
        for i in range(v.shape[0]):
            nrm = np.linalg.norm(out[i, cols])
            scale = max(1.0 - theta * w / nrm, 0.0) if nrm > 0 else 0.0
            out[i, cols] *= scale
    return out


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _problem(rng, n=24, d=16, k=32):
    W = rng.randn(d, k).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = rng.randn(n, d).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(W)


def test_resolve_groups_validation():
    assert resolve_groups(4, 32) == ("block", 4, 8)
    with pytest.raises(ValueError):
        resolve_groups(5, 32)           # does not divide
    with pytest.raises(ValueError):
        resolve_groups(None, 32)
    with pytest.raises(ValueError):
        resolve_groups(np.array([0, 2]), 2)   # id 1 unused
    kind, ids, g = resolve_groups(np.array([1, 0, 1, 0]), 4)
    assert kind == "ids" and g == 2 and ids.dtype == np.int32


def test_group_prox_block_matches_numpy(rng):
    v = rng.randn(6, 12).astype(np.float32)
    ids = np.repeat(np.arange(4), 3)
    got = group_soft_threshold(jnp.asarray(v), 0.37, 3)
    want = _np_group_prox(v, 0.37, ids)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_group_prox_ids_matches_numpy_with_weights(rng):
    v = rng.randn(5, 11).astype(np.float32)
    ids = rng.randint(0, 3, size=11)
    ids[:3] = [0, 1, 2]   # ensure every id used
    w = np.array([0.5, 1.0, 2.0], np.float32)
    got = group_soft_threshold(jnp.asarray(v), 0.2, ids, weights=w)
    want = _np_group_prox(v, 0.2, ids, weights=w)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_group_prox_zero_group_is_fixed_point():
    v = jnp.zeros((3, 8))
    out = group_soft_threshold(v, 1.0, 4)
    assert np.all(np.asarray(out) == 0.0)
    assert np.all(np.isfinite(np.asarray(out)))


def test_size1_groups_reduce_to_plain_lasso(rng):
    x, W = _problem(rng)
    z0 = jnp.zeros((x.shape[0], W.shape[1]))
    zg = group_ista(x, z0, W, alpha=0.15, groups=1, maxiter=400, tol=0.0)
    zl = ista(x, z0, W, alpha=0.15, maxiter=400, tol=0.0, use_pallas=False)
    np.testing.assert_allclose(np.asarray(zg), np.asarray(zl), atol=2e-5)


def _group_kkt_violation(x, W, z, alpha, gs, weights=None, support_tol=1e-6):
    """max over groups of the group-lasso KKT residual."""
    x, W, z = map(np.asarray, (x, W, z))
    g = (z @ W.T - x) @ W                       # [N, K]
    n, k = z.shape
    G = k // gs
    viol = 0.0
    for i in range(n):
        for a in range(G):
            sl = slice(a * gs, (a + 1) * gs)
            w = 1.0 if weights is None else weights[a]
            nrm = np.linalg.norm(z[i, sl])
            if nrm > support_tol:
                viol = max(viol, np.linalg.norm(
                    g[i, sl] + alpha * w * z[i, sl] / nrm))
            else:
                viol = max(viol, max(np.linalg.norm(g[i, sl])
                                     - alpha * w, 0.0))
    return viol


def test_group_ista_satisfies_group_kkt(rng):
    x, W = _problem(rng)
    z0 = jnp.zeros((x.shape[0], W.shape[1]))
    alpha = 0.3
    z = group_ista(x, z0, W, alpha=alpha, groups=4, maxiter=2000, tol=0.0)
    assert _group_kkt_violation(x, W, z, alpha, 4) < 2e-3
    # solutions should have whole zero GROUPS, not just zero coords
    zb = np.asarray(z).reshape(x.shape[0], -1, 4)
    gnorm = np.linalg.norm(zb, axis=-1)
    assert (gnorm < 1e-7).mean() > 0.05


def test_group_ista_prox_fixed_point_sparse_group(rng):
    """Optimality certificate valid for ANY composite problem: the
    solution is a fixed point of the prox-gradient map."""
    x, W = _problem(rng)
    z0 = jnp.zeros((x.shape[0], W.shape[1]))
    alpha, l1a = 0.2, 0.1
    z = group_ista(x, z0, W, alpha=alpha, groups=4, l1_alpha=l1a,
                   maxiter=3000, tol=0.0)
    lr = 0.3
    from lasso_tpu.ops.shrink import soft_threshold
    g = (z @ W.T - x) @ W
    v = soft_threshold(z - lr * g, l1a * lr)
    z_next = group_soft_threshold(v, alpha * lr, 4)
    assert float(jnp.max(jnp.abs(z_next - z))) < 5e-5
    # the l1 term must also produce within-group sparsity
    nz = np.asarray(z) != 0.0
    zb = nz.reshape(x.shape[0], -1, 4)
    partial = (zb.any(-1) & ~zb.all(-1)).mean()
    assert partial > 0.01


def test_ids_path_matches_block_path(rng):
    x, W = _problem(rng)
    z0 = jnp.zeros((x.shape[0], W.shape[1]))
    ids = np.repeat(np.arange(8), 4)
    z_blk = group_ista(x, z0, W, alpha=0.25, groups=4, maxiter=300, tol=0.0)
    z_ids = group_ista(x, z0, W, alpha=0.25, groups=ids, maxiter=300,
                       tol=0.0)
    np.testing.assert_allclose(np.asarray(z_blk), np.asarray(z_ids),
                               atol=1e-5)


def test_ragged_groups_with_yuan_lin_weights(rng):
    x, W = _problem(rng, k=30)
    z0 = jnp.zeros((x.shape[0], 30))
    ids = np.concatenate([np.zeros(2), np.ones(8), np.full(20, 2)]) \
        .astype(np.int32)
    sizes = np.array([2, 8, 20], np.float32)
    w = np.sqrt(sizes)
    alpha = 0.15
    z = group_ista(x, z0, W, alpha=alpha, groups=ids, group_weights=w,
                   maxiter=2000, tol=0.0)
    # prox-fixed-point certificate with the same weights
    lr = 0.3
    g = (z @ W.T - x) @ W
    z_next = group_soft_threshold(z - lr * g, alpha * lr, ids, weights=w)
    assert float(jnp.max(jnp.abs(z_next - z))) < 5e-5


def test_batch_equals_independent_solves(rng):
    x, W = _problem(rng, n=6)
    z0 = jnp.zeros((6, W.shape[1]))
    z_all = group_ista(x, z0, W, alpha=0.2, groups=4, maxiter=200, tol=0.0)
    for i in range(6):
        z_i = group_ista(x[i:i + 1], z0[i:i + 1], W, alpha=0.2, groups=4,
                         maxiter=200, tol=0.0)
        np.testing.assert_allclose(np.asarray(z_all[i]),
                                   np.asarray(z_i[0]), atol=1e-5)


def test_restart_reaches_equal_or_lower_objective(rng):
    x, W = _problem(rng)
    z0 = jnp.zeros((x.shape[0], W.shape[1]))
    kw = dict(alpha=0.2, groups=4, maxiter=150, tol=0.0)
    z_plain = group_ista(x, z0, W, **kw)
    z_rst = group_ista(x, z0, W, restart=True, **kw)
    f_plain = float(group_lasso_objective(x, W, z_plain, 0.2, 4))
    f_rst = float(group_lasso_objective(x, W, z_rst, 0.2, 4))
    assert f_rst <= f_plain * (1 + 1e-5)


def test_per_sample_alpha_matches_scalar_solves(rng):
    x, W = _problem(rng, n=4)
    z0 = jnp.zeros((4, W.shape[1]))
    alphas = np.array([0.05, 0.15, 0.4, 0.8], np.float32)
    z_vec = group_ista(x, z0, W, alpha=jnp.asarray(alphas), groups=4,
                       l1_alpha=0.05, maxiter=300, tol=0.0)
    for i, a in enumerate(alphas):
        z_i = group_ista(x[i:i + 1], z0[i:i + 1], W, alpha=float(a),
                         groups=4, l1_alpha=0.05, maxiter=300, tol=0.0)
        np.testing.assert_allclose(np.asarray(z_vec[i]),
                                   np.asarray(z_i[0]), atol=3e-5)


def test_sparse_encode_dispatch_and_errors(rng):
    x, W = _problem(rng)
    z = sparse_encode(x, W, alpha=0.2, algorithm="group-ista", groups=4,
                      maxiter=50)
    assert z.shape == (x.shape[0], W.shape[1])
    z2, n_it = sparse_encode(x, W, alpha=0.2, algorithm="group-ista",
                             groups=4, maxiter=50, tol=0.0,
                             return_iters=True)
    assert int(n_it) == 50
    with pytest.raises(ValueError, match="group_weights"):
        sparse_encode(x, W, alpha=jnp.ones((1, W.shape[1])),
                      algorithm="group-ista", groups=4)
    with pytest.raises(ValueError, match="groups"):
        group_ista(x, jnp.zeros((x.shape[0], W.shape[1])), W, alpha=0.2)


def test_group_ista_sharded_matches_single_device(rng):
    from lasso_tpu.parallel import data_parallel_encode, make_mesh

    x, W = _problem(rng, n=32)
    mesh = make_mesh()
    z_sh = data_parallel_encode(mesh, x, W, alpha=0.2,
                                algorithm="group-ista", groups=4,
                                maxiter=100, tol=1e-6)
    z_1 = group_ista(x, jnp.zeros((32, W.shape[1])), W, alpha=0.2,
                     groups=4, maxiter=100, tol=1e-6)
    np.testing.assert_allclose(np.asarray(z_sh), np.asarray(z_1),
                               atol=1e-5)


def test_group_dict_learning_smoke(rng):
    """dict_learning(algorithm='group-ista') trains end-to-end with a
    decreasing loss (group sparse coding)."""
    from lasso_tpu.linear import dict_learning

    X = jnp.asarray(rng.randn(64, 16).astype(np.float32))
    W, losses = dict_learning(X, 24, alpha=0.1, steps=8,
                              algorithm="group-ista", groups=4,
                              maxiter=100)
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


# ---------------- fused Pallas kernel (ops/fused_group) ----------------

def _aligned_problem(rng, n=16, d=128, k=256):
    W = rng.randn(d, k).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = rng.randn(n, d).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(W)


@pytest.mark.parametrize("cfg", [
    dict(groups=8),                                     # contiguous blocks
    dict(groups="ids"),                                 # arbitrary ids
    dict(groups=8, group_weights="yuanlin"),            # weighted
    dict(groups=8, l1_alpha=0.05),                      # sparse-group
    dict(groups=8, restart=True),                       # per-row restart
    dict(groups=8, fast=False),                         # plain ISTA
])
def test_fused_group_matches_xla(rng, cfg):
    """The fused S-step kernel (interpret mode, split-float f32) must
    reproduce the unfused XLA path for every prox/momentum variant."""
    x, W = _aligned_problem(rng)
    cfg = dict(cfg)
    k = W.shape[1]
    if cfg["groups"] == "ids":
        ids = np.asarray(rng.permutation(np.repeat(np.arange(16), k // 16)),
                         dtype=np.int32)
        cfg["groups"] = ids
    if cfg.get("group_weights") == "yuanlin":
        cfg["group_weights"] = np.full((k // 8,), np.sqrt(8.0),
                                       np.float32)
    z0 = jnp.zeros((x.shape[0], k), jnp.float32)
    kw = dict(alpha=0.3, maxiter=32, tol=0.0, lr=0.15, **cfg)
    z_xla = group_ista(x, z0, W, use_pallas=False, **kw)
    z_fused = group_ista(x, z0, W, use_pallas=True, **kw)
    # atol-only, matching test_fused_ista's multistep convention: the
    # split-float scheme is f32-grade in absolute terms (~2e-5 over 32
    # fused iterations); near-zero coordinates have no stable rel error
    np.testing.assert_allclose(np.asarray(z_fused), np.asarray(z_xla),
                               atol=1e-4)


def test_fused_group_tol_never_stops_early(rng):
    """Block-boundary convergence checks: the fused path may run MORE
    iterations than the unfused (checks every S), never fewer, and must
    land at an equal-or-lower objective."""
    x, W = _aligned_problem(rng)
    z0 = jnp.zeros((x.shape[0], W.shape[1]), jnp.float32)
    kw = dict(alpha=0.3, groups=8, maxiter=64, tol=1e-6, lr=0.15)
    z_xla, k_xla = group_ista(x, z0, W, use_pallas=False,
                              return_iters=True, **kw)
    z_f, k_f = group_ista(x, z0, W, use_pallas=True, return_iters=True,
                          **kw)
    assert int(k_f) >= int(k_xla)
    obj = lambda z: float(group_lasso_objective(x, W, z, 0.3, 8))
    assert obj(z_f) <= obj(z_xla) * (1 + 1e-6)


def test_fused_group_mixed_precision_close(rng):
    """'mixed' continuation: bf16 bulk + f32 tail must land within a few
    f32 ulps-of-objective of the all-f32 kernel run."""
    x, W = _aligned_problem(rng)
    z0 = jnp.zeros((x.shape[0], W.shape[1]), jnp.float32)
    kw = dict(alpha=0.3, groups=8, maxiter=32, tol=0.0, lr=0.15,
              use_pallas=True)
    z_f32 = group_ista(x, z0, W, kernel_precision="f32", **kw)
    z_mix = group_ista(x, z0, W, kernel_precision="mixed", **kw)
    obj = lambda z: float(group_lasso_objective(x, W, z, 0.3, 8))
    rel = abs(obj(z_mix) - obj(z_f32)) / abs(obj(z_f32))
    assert rel < 5e-5, rel


def test_group_mixed_tail_iters():
    """Sub-block f32 tails thread through the fused group kernel: full
    budget == f32 exactly; a 12-iter tail covers the budget at tol=0 and
    lands between bf16-only and f32 in objective."""
    import numpy as np
    rng = np.random.default_rng(4)
    n, d, k = 16, 128, 256
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    W = jnp.asarray(
        (rng.standard_normal((d, k)) / np.sqrt(d)).astype(np.float32))
    z0 = jnp.zeros((n, k), jnp.float32)
    kw = dict(groups=16, lr=0.08, maxiter=200, tol=0.0, use_pallas=True,
              fuse_steps=25)

    def obj(z):
        z = np.asarray(z, np.float64)
        r = z @ np.asarray(W, np.float64).T - np.asarray(x, np.float64)
        g = z.reshape(n, k // 16, 16)
        return (0.5 * np.sum(r * r)
                + 0.1 * np.sum(np.sqrt(np.sum(g * g, axis=2))))

    z_f = group_ista(x, z0, W, 0.1, **kw)
    z_full = group_ista(x, z0, W, 0.1, kernel_precision="mixed",
                        mixed_tail_iters=200, **kw)
    np.testing.assert_array_equal(np.asarray(z_f), np.asarray(z_full))

    z_12, it = group_ista(x, z0, W, 0.1, kernel_precision="mixed",
                          mixed_tail_iters=12, return_iters=True, **kw)
    z_b = group_ista(x, z0, W, 0.1, kernel_precision="bf16", **kw)
    assert int(it) == 200
    f_f, f_12, f_b = obj(z_f), obj(z_12), obj(z_b)
    assert f_12 <= f_b + 1e-9, (f_12, f_b)
    assert f_12 >= f_f - 1e-7 * abs(f_f)

    with pytest.raises(ValueError, match="mixed_tail_iters"):
        group_ista(x, z0, W, 0.1, mixed_tail_iters=10, **kw)
