"""Implicit differentiation through the GROUP lasso solution.

x64 certification: central finite differences w.r.t. x, W, and alpha
(scalar + per-sample); agreement with unrolled reverse-mode through an
explicit group-FISTA scan; the sparse-group (l1_alpha > 0) composition;
support guards. The group-norm curvature block B_g = (I - n n^T)/||z_g||
is the novel Hessian term being certified here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from lasso_tpu.linear import make_implicit_group_encoder
from lasso_tpu.linear.solvers import group_soft_threshold
from lasso_tpu.ops.shrink import soft_threshold


def _problem(seed=13, n=6, d=12, k=24):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((d, k))
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = rng.standard_normal((n, d))
    c = rng.standard_normal((n, k))
    return x, W, c, rng


GS = 4
LR = 0.15
SOLVE = dict(maxiter=4000, tol=0.0, lr=LR, groups=GS)


def _unrolled(x, W, alpha, l1_alpha=0.0, iters=20000, lr=LR):
    z0 = jnp.zeros((x.shape[0], W.shape[1]), x.dtype)

    def step(carry, _):
        z, z_prev, t = carry
        t_next = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
        y = z + ((t - 1) / t_next) * (z - z_prev)
        g = jnp.matmul(jnp.matmul(y, W.T) - x, W)
        v = y - lr * g
        if l1_alpha:
            v = soft_threshold(v, l1_alpha * lr)
        z_new = group_soft_threshold(v, alpha * lr, GS)
        return (z_new, z, t_next), None

    (z, _, _), _ = lax.scan(step, (z0, z0, jnp.asarray(1.0, x.dtype)),
                            None, length=iters)
    return z


def _fd(f, theta, v, eps=1e-5):
    return float((f(theta + eps * v) - f(theta - eps * v)) / (2 * eps))


def test_group_grad_x_W_matches_finite_differences():
    x, W, c, rng = _problem()
    with jax.enable_x64():
        xj, Wj, cj = map(jnp.asarray, (x, W, c))
        enc = make_implicit_group_encoder(**SOLVE)
        a0 = jnp.asarray(0.3)
        # sanity: some groups active, some zeroed (strict complementarity)
        z = enc(xj, Wj, a0)
        gn = np.asarray(jnp.sqrt(jnp.sum(
            jnp.square(z.reshape(z.shape[0], -1, GS)), axis=-1)))
        assert (gn > 1e-7).any() and (gn < 1e-7).any()

        f_x = lambda xx: jnp.sum(enc(xx, Wj, a0) * cj)
        g = jax.grad(f_x)(xj)
        v = jnp.asarray(rng.standard_normal(x.shape))
        fd = _fd(f_x, xj, v)
        an = float(jnp.sum(g * v))
        assert abs(fd - an) < 1e-5 * max(1.0, abs(fd)), (fd, an)

        f_w = lambda ww: jnp.sum(enc(xj, ww, a0) * cj)
        gw = jax.grad(f_w)(Wj)
        v = jnp.asarray(rng.standard_normal(W.shape))
        fd = _fd(f_w, Wj, v)
        an = float(jnp.sum(gw * v))
        assert abs(fd - an) < 1e-5 * max(1.0, abs(fd)), (fd, an)


@pytest.mark.parametrize("shape", ["scalar", "per_sample"])
def test_group_grad_alpha_matches_finite_differences(shape):
    x, W, c, rng = _problem()
    with jax.enable_x64():
        xj, Wj, cj = map(jnp.asarray, (x, W, c))
        a0 = (jnp.asarray(0.3) if shape == "scalar"
              else jnp.asarray(np.linspace(0.25, 0.35, x.shape[0])))
        enc = make_implicit_group_encoder(**SOLVE)
        f = lambda aa: jnp.sum(enc(xj, Wj, aa) * cj)
        g = jax.grad(f)(a0)
        assert g.shape == a0.shape
        v = (jnp.asarray(rng.standard_normal(a0.shape)) if a0.ndim
             else jnp.asarray(1.0))
        fd = _fd(f, a0, v, eps=1e-4)
        an = float(jnp.sum(g * v))
        assert abs(fd - an) < 1e-5 * max(1.0, abs(fd)), (fd, an)


def test_group_implicit_matches_unrolled_autodiff():
    x, W, c, rng = _problem()
    with jax.enable_x64():
        xj, Wj, cj = map(jnp.asarray, (x, W, c))
        a0 = jnp.asarray(0.3)
        enc = make_implicit_group_encoder(**SOLVE)
        f_imp = lambda xx, ww, aa: jnp.sum(enc(xx, ww, aa) * cj)
        f_unr = lambda xx, ww, aa: jnp.sum(_unrolled(xx, ww, aa) * cj)
        np.testing.assert_allclose(float(f_imp(xj, Wj, a0)),
                                   float(f_unr(xj, Wj, a0)), rtol=1e-6)
        gi = jax.grad(f_imp, argnums=(0, 1, 2))(xj, Wj, a0)
        gu = jax.grad(f_unr, argnums=(0, 1, 2))(xj, Wj, a0)
        for a, b in zip(gi, gu):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_sparse_group_grad_matches_unrolled():
    """l1_alpha > 0: within-group zeros appear; the |z|>eps mask plus the
    smooth group term must still give the exact one-sided gradient."""
    x, W, c, rng = _problem(seed=17)
    with jax.enable_x64():
        xj, Wj, cj = map(jnp.asarray, (x, W, c))
        a0 = jnp.asarray(0.2)
        l1 = 0.15
        enc = make_implicit_group_encoder(l1_alpha=l1, **SOLVE)
        z = enc(xj, Wj, a0)
        # the regime matters: some active groups must carry interior zeros
        zb = np.asarray(z).reshape(z.shape[0], -1, GS)
        gn = np.sqrt((zb ** 2).sum(-1))
        has_partial = ((gn > 1e-7)[:, :, None]
                       & (np.abs(zb) < 1e-9)).any()
        assert has_partial, "test regime lost its within-group zeros"
        f_imp = lambda xx, ww, aa: jnp.sum(enc(xx, ww, aa) * cj)
        f_unr = lambda xx, ww, aa: jnp.sum(
            _unrolled(xx, ww, aa, l1_alpha=l1) * cj)
        np.testing.assert_allclose(float(f_imp(xj, Wj, a0)),
                                   float(f_unr(xj, Wj, a0)), rtol=1e-6)
        gi = jax.grad(f_imp, argnums=(0, 1, 2))(xj, Wj, a0)
        gu = jax.grad(f_unr, argnums=(0, 1, 2))(xj, Wj, a0)
        for a, b in zip(gi, gu):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_group_support_guards():
    x, W, _, _ = _problem()
    with jax.enable_x64():
        xj, Wj = jnp.asarray(x), jnp.asarray(W)
        enc = make_implicit_group_encoder(**SOLVE)
        g = jax.grad(lambda ww: jnp.sum(enc(xj, ww, jnp.asarray(1e3))))(Wj)
        assert np.all(np.asarray(g) == 0.0)
        assert np.all(np.isfinite(np.asarray(g)))
