"""Implicit differentiation through the lasso solution (IFT backward).

Certified three independent ways, all in x64 so solver convergence (not
arithmetic) is the only error source:

* central finite differences of a downstream scalar loss w.r.t. x, W,
  and every alpha shape;
* full agreement with UNROLLED autodiff through an explicit
  ``lax.scan`` FISTA (reverse-mode through 4000 iterations) — the
  implicit backward must reproduce it without touching the loop;
* a task-driven training smoke test (gradient steps on W reduce a
  downstream loss through the encoder).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from lasso_tpu.linear import make_implicit_encoder
from lasso_tpu.ops.shrink import soft_threshold


def _problem(seed=3, n=8, d=12, k=20):
    rng = np.random.default_rng(seed)
    W = rng.standard_normal((d, k))
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = rng.standard_normal((n, d))
    c = rng.standard_normal((n, k))     # downstream loss direction
    return x, W, c


LR = 0.2          # valid step for unit-norm columns at these sizes
SOLVE = dict(maxiter=4000, tol=0.0, lr=LR, use_pallas=False)


def _unrolled_fista(x, W, alpha, iters=4000, lr=LR):
    """Explicit scan FISTA — reverse-differentiable oracle."""
    z0 = jnp.zeros((x.shape[0], W.shape[1]), x.dtype)

    def step(carry, _):
        z, z_prev, t = carry
        t_next = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
        y = z + ((t - 1) / t_next) * (z - z_prev)
        g = jnp.matmul(jnp.matmul(y, W.T) - x, W)
        z_new = soft_threshold(y - lr * g, alpha * lr)
        return (z_new, z, t_next), None

    (z, _, _), _ = lax.scan(step, (z0, z0, jnp.asarray(1.0, x.dtype)),
                            None, length=iters)
    return z


def _fd_directional(f, theta, v, eps=1e-5):
    return float((f(theta + eps * v) - f(theta - eps * v)) / (2 * eps))


def test_grad_x_matches_finite_differences():
    x, W, c = _problem(seed=3)
    with jax.enable_x64():
        xj, Wj, cj = map(jnp.asarray, (x, W, c))
        enc = make_implicit_encoder(**SOLVE)
        f = lambda xx: jnp.sum(enc(xx, Wj, jnp.asarray(0.25)) * cj)
        g = jax.grad(f)(xj)
        rng = np.random.default_rng(1)
        for _ in range(3):
            v = jnp.asarray(rng.standard_normal(x.shape))
            fd = _fd_directional(f, xj, v)
            an = float(jnp.sum(g * v))
            assert abs(fd - an) < 5e-6 * max(1.0, abs(fd)), (fd, an)


def test_grad_W_matches_finite_differences():
    x, W, c = _problem(seed=3)
    with jax.enable_x64():
        xj, Wj, cj = map(jnp.asarray, (x, W, c))
        enc = make_implicit_encoder(**SOLVE)
        f = lambda ww: jnp.sum(enc(xj, ww, jnp.asarray(0.25)) * cj)
        g = jax.grad(f)(Wj)
        rng = np.random.default_rng(3)
        for _ in range(3):
            v = jnp.asarray(rng.standard_normal(W.shape))
            fd = _fd_directional(f, Wj, v)
            an = float(jnp.sum(g * v))
            assert abs(fd - an) < 1e-5 * max(1.0, abs(fd)), (fd, an)


@pytest.mark.parametrize("shape", ["scalar", "per_sample", "per_feature"])
def test_grad_alpha_matches_finite_differences(shape):
    x, W, c = _problem(seed=3)
    with jax.enable_x64():
        xj, Wj, cj = map(jnp.asarray, (x, W, c))
        if shape == "scalar":
            a0 = jnp.asarray(0.25)
        elif shape == "per_sample":
            a0 = jnp.asarray(np.linspace(0.2, 0.3, x.shape[0]))
        else:
            a0 = jnp.asarray(
                np.linspace(0.2, 0.3, W.shape[1]))[None, :]
        enc = make_implicit_encoder(**SOLVE)
        f = lambda aa: jnp.sum(enc(xj, Wj, aa) * cj)
        g = jax.grad(f)(a0)
        assert g.shape == a0.shape
        rng = np.random.default_rng(5)
        v = jnp.asarray(rng.standard_normal(a0.shape)) \
            if a0.ndim else jnp.asarray(1.0)
        # eps=1e-4: the solver's terminal FISTA oscillation puts an
        # ~1e-7 noise floor on f regardless of budget; the larger
        # stencil averages it below the tolerance (measured)
        fd = _fd_directional(f, a0, v, eps=1e-4)
        an = float(jnp.sum(g * v))
        assert abs(fd - an) < 5e-6 * max(1.0, abs(fd)), (fd, an)


def test_implicit_matches_unrolled_autodiff():
    """The IFT backward must agree with reverse-mode through an explicit
    4000-iteration FISTA scan — for x, W, AND alpha simultaneously."""
    x, W, c = _problem(seed=3)
    with jax.enable_x64():
        xj, Wj, cj = map(jnp.asarray, (x, W, c))
        a0 = jnp.asarray(0.25)

        enc = make_implicit_encoder(**SOLVE)
        f_imp = lambda xx, ww, aa: jnp.sum(enc(xx, ww, aa) * cj)
        f_unr = lambda xx, ww, aa: jnp.sum(
            _unrolled_fista(xx, ww, aa) * cj)

        # the two forwards must agree first (same optimum)
        np.testing.assert_allclose(float(f_imp(xj, Wj, a0)),
                                   float(f_unr(xj, Wj, a0)), rtol=1e-6)

        gi = jax.grad(f_imp, argnums=(0, 1, 2))(xj, Wj, a0)
        gu = jax.grad(f_unr, argnums=(0, 1, 2))(xj, Wj, a0)
        for a, b in zip(gi, gu):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-8)


def test_implicit_elastic_net_matches_unrolled_autodiff():
    """l2 > 0 folds into the support Hessian as a ridge: the IFT
    backward must still agree with reverse-mode through an explicit
    elastic-net FISTA scan (prox contraction 1/(1+l2*lr)) for x, W,
    and alpha simultaneously."""
    x, W, c = _problem(seed=4)
    l2 = 0.3
    with jax.enable_x64():
        xj, Wj, cj = map(jnp.asarray, (x, W, c))
        a0 = jnp.asarray(0.2)

        def unrolled(xx, ww, aa, iters=4000, lr=LR):
            z0 = jnp.zeros((xx.shape[0], ww.shape[1]), xx.dtype)

            def step(carry, _):
                z, z_prev, t = carry
                t_next = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
                y = z + ((t - 1) / t_next) * (z - z_prev)
                g = jnp.matmul(jnp.matmul(y, ww.T) - xx, ww)
                z_new = soft_threshold(y - lr * g, aa * lr) / (1 + l2 * lr)
                return (z_new, z, t_next), None

            (z, _, _), _ = lax.scan(
                step, (z0, z0, jnp.asarray(1.0, xx.dtype)), None,
                length=iters)
            return z

        enc = make_implicit_encoder(l2=l2, **SOLVE)
        f_imp = lambda xx, ww, aa: jnp.sum(enc(xx, ww, aa) * cj)
        f_unr = lambda xx, ww, aa: jnp.sum(unrolled(xx, ww, aa) * cj)

        np.testing.assert_allclose(float(f_imp(xj, Wj, a0)),
                                   float(f_unr(xj, Wj, a0)), rtol=1e-6)

        gi = jax.grad(f_imp, argnums=(0, 1, 2))(xj, Wj, a0)
        gu = jax.grad(f_unr, argnums=(0, 1, 2))(xj, Wj, a0)
        for a, b in zip(gi, gu):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-8)


def test_task_driven_training_reduces_loss():
    """Gradient steps on W through the encoder must reduce a downstream
    objective (reconstruction through the sparse bottleneck)."""
    x, W, _ = _problem(seed=7, n=16)
    with jax.enable_x64():
        xj = jnp.asarray(x)
        Wj = jnp.asarray(W)
        enc = make_implicit_encoder(maxiter=1500, tol=0.0, lr=LR,
                                    use_pallas=False)

        def task_loss(ww):
            z = enc(xj, ww, jnp.asarray(0.15))
            return 0.5 * jnp.sum(jnp.square(jnp.matmul(z, ww.T) - xj))

        g_fn = jax.jit(jax.value_and_grad(task_loss))
        losses = []
        for _ in range(8):
            v, g = g_fn(Wj)
            losses.append(float(v))
            Wj = Wj - 0.05 * g
            # keep atoms bounded (plain projected GD)
            Wj = Wj / jnp.maximum(
                jnp.linalg.norm(Wj, axis=0, keepdims=True), 1.0)
        assert losses[-1] < 0.9 * losses[0], losses


def test_f32_overcomplete_grad_is_finite_and_close():
    """f32 robustness: a strongly overcomplete dictionary (K = 5D) drives
    support sizes up to D, making H_SS near-singular — f32-rounded
    negative curvature in the backward CG must freeze the offending rows
    (best-iterate return), not NaN-poison the batch. With an l2 ridge the
    f32 gradient must also be *accurate* against x64 truth."""
    rng = np.random.default_rng(42)
    x_np = rng.standard_normal((100, 10))
    W_np = rng.standard_normal((10, 50))
    W_np /= np.linalg.norm(W_np, axis=0, keepdims=True)
    x32 = jnp.asarray(x_np, jnp.float32)
    W32 = jnp.asarray(W_np, jnp.float32)

    for l2 in (0.0, 0.1):
        enc = make_implicit_encoder(maxiter=1000, tol=0.0, lr="auto",
                                    l2=l2, use_pallas=False)
        g = jax.grad(lambda ww: jnp.sum(
            jnp.square(enc(x32, ww, jnp.asarray(0.2)))))(W32)
        assert bool(jnp.all(jnp.isfinite(g))), f"NaN grad at l2={l2}"
        with jax.enable_x64():
            x64, W64 = jnp.asarray(x_np), jnp.asarray(W_np)
            enc64 = make_implicit_encoder(maxiter=4000, tol=0.0,
                                          lr="auto", l2=l2,
                                          use_pallas=False)
            g64 = jax.grad(lambda ww: jnp.sum(
                jnp.square(enc64(x64, ww, jnp.asarray(0.2)))))(W64)
            rel = float(jnp.linalg.norm(jnp.asarray(np.asarray(g)) - g64)
                        / jnp.linalg.norm(g64))
        # l2=0 at support==D is genuinely near-singular: finiteness is
        # the contract; the ridge case must be f32-accurate
        bound = 2e-2 if l2 == 0.0 else 1e-4
        assert rel < bound, (l2, rel)


def test_support_mask_and_cg_guards():
    """Zero cotangent -> zero gradients; fully-zero codes (huge alpha)
    -> zero gradients (empty support), no NaNs."""
    x, W, _ = _problem(seed=8)
    with jax.enable_x64():
        xj, Wj = jnp.asarray(x), jnp.asarray(W)
        enc = make_implicit_encoder(**SOLVE)
        # alpha above alpha_max: z == 0 everywhere
        a_big = jnp.asarray(1e3)
        g = jax.grad(lambda ww: jnp.sum(enc(xj, ww, a_big)))(Wj)
        assert np.all(np.asarray(g) == 0.0)
        assert np.all(np.isfinite(np.asarray(g)))


def test_warm_start_z0_same_gradients_fewer_iterations():
    """encode(..., z0=prev) must reach the same optimum and gradients
    (z0 is a solver input with zero cotangent), and with tol > 0 the
    warm forward must execute far fewer iterations."""
    x, W, c = _problem(seed=3)
    with jax.enable_x64():
        xj, Wj, cj = map(jnp.asarray, (x, W, c))
        a0 = jnp.asarray(0.25)
        enc = make_implicit_encoder(**SOLVE)
        z_cold = enc(xj, Wj, a0)

        f_cold = lambda ww: jnp.sum(enc(xj, ww, a0) * cj)
        f_warm = lambda ww: jnp.sum(enc(xj, ww, a0, z_cold) * cj)
        g_cold = jax.grad(f_cold)(Wj)
        g_warm = jax.grad(f_warm)(Wj)
        np.testing.assert_allclose(np.asarray(g_warm), np.asarray(g_cold),
                                   rtol=1e-8, atol=1e-10)

        # iteration economics via the raw solver (the encoder's forward)
        from lasso_tpu.linear import sparse_encode
        _, k_cold = sparse_encode(xj, Wj, a0, maxiter=4000, tol=1e-10,
                                  lr=LR, use_pallas=False,
                                  return_iters=True)
        _, k_warm = sparse_encode(xj, Wj, a0, z0=z_cold, maxiter=4000,
                                  tol=1e-10, lr=LR, use_pallas=False,
                                  return_iters=True)
        assert int(k_warm) < int(k_cold) // 4, (int(k_warm), int(k_cold))
