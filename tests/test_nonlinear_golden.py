"""Cross-framework golden parity of the nonlinear solvers: identical MLP
decoder weights in torch (reference) and jax (ours)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lasso_tpu.nonlinear import ista_nl, owlqn

from _oracles import load_reference


@pytest.fixture
def shared_problem(rng):
    k, h, d, n = 6, 12, 10, 5
    w1 = (rng.standard_normal((k, h)) * 0.4).astype(np.float32)
    w2 = (rng.standard_normal((h, d)) * 0.4).astype(np.float32)
    x = rng.standard_normal((n, d)).astype(np.float32)
    z0 = (rng.standard_normal((n, k)) * 0.1).astype(np.float32)
    return w1, w2, x, z0


def jax_decoder(w1, w2):
    w1j, w2j = jnp.asarray(w1), jnp.asarray(w2)
    return lambda z: jnp.tanh(z @ w1j) @ w2j


def torch_decoder(w1, w2):
    import torch
    import torch.nn as nn

    class Dec(nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = nn.Linear(w1.shape[0], w1.shape[1], bias=False)
            self.l2 = nn.Linear(w2.shape[0], w2.shape[1], bias=False)
            with torch.no_grad():
                self.l1.weight.copy_(torch.from_numpy(w1.T))
                self.l2.weight.copy_(torch.from_numpy(w2.T))

        def forward(self, z):
            return self.l2(torch.tanh(self.l1(z)))

    return Dec()


def lasso_obj(dec, x, z, alpha):
    return float(0.5 * np.sum((np.asarray(dec(jnp.asarray(z))) - x) ** 2)
                 + alpha * np.sum(np.abs(z)))


def test_ista_nl_golden_parity(shared_problem):
    lasso_ref = load_reference()
    if lasso_ref is None:
        pytest.skip("reference library unavailable")
    import torch

    w1, w2, x, z0 = shared_problem
    alpha = 0.05

    dec_j = jax_decoder(w1, w2)
    z_ours = ista_nl(jnp.asarray(x), jnp.asarray(z0), dec_j, alpha=alpha,
                     lr=0.05, maxiter=500, tol=1e-9)

    dec_t = torch_decoder(w1, w2)
    z_ref = lasso_ref.nonlinear.ista_nl(
        torch.from_numpy(x), torch.from_numpy(z0), dec_t, alpha=alpha,
        lr=0.05, maxiter=500, tol=1e-9)

    f_ours = lasso_obj(dec_j, x, np.asarray(z_ours), alpha)
    f_ref = lasso_obj(dec_j, x, z_ref.numpy(), alpha)
    assert abs(f_ours - f_ref) <= 1e-3 * max(1.0, abs(f_ref))


def test_ista_nl_auto_lr_golden_parity(shared_problem):
    lasso_ref = load_reference()
    if lasso_ref is None:
        pytest.skip("reference library unavailable")
    import torch

    w1, w2, x, z0 = shared_problem
    alpha = 0.05

    dec_j = jax_decoder(w1, w2)
    z_ours = ista_nl(jnp.asarray(x), jnp.asarray(z0), dec_j, alpha=alpha,
                     lr="auto", power_iters=20, maxiter=300, tol=1e-9)
    dec_t = torch_decoder(w1, w2)
    z_ref = lasso_ref.nonlinear.ista_nl(
        torch.from_numpy(x), torch.from_numpy(z0), dec_t, alpha=alpha,
        lr="auto", power_iters=20, maxiter=300, tol=1e-9)
    f_ours = lasso_obj(dec_j, x, np.asarray(z_ours), alpha)
    f_ref = lasso_obj(dec_j, x, z_ref.numpy(), alpha)
    assert abs(f_ours - f_ref) <= 2e-3 * max(1.0, abs(f_ref))


def test_owlqn_golden_parity(shared_problem):
    lasso_ref = load_reference()
    if lasso_ref is None:
        pytest.skip("reference library unavailable")
    import torch

    w1, w2, x, z0 = shared_problem
    alpha = 0.05

    dec_j = jax_decoder(w1, w2)
    xj = jnp.asarray(x)
    fun_j = lambda z: 0.5 * jnp.sum(jnp.square(dec_j(z) - xj))
    z_ours = owlqn(fun_j, jnp.asarray(z0), alpha=alpha, max_iter=60,
                   xtol=1e-7, history_size=20)

    dec_t = torch_decoder(w1, w2)
    xt = torch.from_numpy(x)
    fun_t = lambda z: 0.5 * (dec_t(z) - xt).pow(2).sum()
    z_ref = lasso_ref.nonlinear.owlqn(
        fun_t, torch.from_numpy(z0), alpha=alpha, max_iter=60, xtol=1e-7,
        history_size=20)

    f_ours = lasso_obj(dec_j, x, np.asarray(z_ours), alpha)
    f_ref = lasso_obj(dec_j, x, z_ref.numpy(), alpha)
    # match-or-beat: in-jit golden-section line search vs scipy Brent
    assert f_ours <= f_ref * (1 + 5e-3)


def test_iterative_ridge_bfgs_golden_parity(shared_problem):
    lasso_ref = load_reference()
    if lasso_ref is None:
        pytest.skip("reference library unavailable")
    import torch
    from lasso_tpu.nonlinear import iterative_ridge_bfgs

    w1, w2, x, z0 = shared_problem
    alpha = 0.05
    # nonzero init: iterative-ridge freezes exact zeros permanently
    z0 = z0 + 0.05

    dec_j = jax_decoder(w1, w2)
    xj = jnp.asarray(x)
    fun_j = lambda z: 0.5 * jnp.sum(jnp.square(dec_j(z) - xj))
    z_ours = iterative_ridge_bfgs(fun_j, jnp.asarray(z0), alpha=alpha,
                                  maxiter=40, xtol=1e-7)

    dec_t = torch_decoder(w1, w2)
    xt = torch.from_numpy(x)
    fun_t = lambda z: 0.5 * (dec_t(z) - xt).pow(2).sum()
    z_ref = lasso_ref.nonlinear.iterative_ridge_bfgs(
        fun_t, torch.from_numpy(z0), alpha=alpha, maxiter=40, xtol=1e-7)

    f_ours = lasso_obj(dec_j, x, np.asarray(z_ours), alpha)
    f_ref = lasso_obj(dec_j, x, z_ref.numpy(), alpha)
    assert f_ours <= f_ref * (1 + 5e-3)


def test_split_bregman_nl_golden_parity(shared_problem):
    lasso_ref = load_reference()
    if lasso_ref is None:
        pytest.skip("reference library unavailable")
    import torch
    from lasso_tpu.nonlinear import split_bregman_nl

    w1, w2, x, z0 = shared_problem
    alpha = 0.05
    # the reference 'exact' path is single-sample (flattened x)
    x1, z1 = x[0], z0[0]

    dec_j = jax_decoder(w1, w2)
    x1j = jnp.asarray(x1)
    fun_j = lambda z: dec_j(z[None])[0] - x1j
    z_ours = split_bregman_nl(fun_j, jnp.asarray(z1), alpha=alpha,
                              lambd=1.0, max_iter=30, solver="exact",
                              xtol=1e-7)

    dec_t = torch_decoder(w1, w2)
    x1t = torch.from_numpy(x1)
    fun_t = lambda z: dec_t(z.unsqueeze(0)).squeeze(0) - x1t
    z_ref = lasso_ref.nonlinear.split_bregman_nl(
        fun_t, torch.from_numpy(z1), alpha=alpha, lambd=1.0, max_iter=30,
        solver="exact", xtol=1e-7)

    def obj(z):
        return float(0.5 * np.sum(
            (np.asarray(dec_j(jnp.asarray(z)[None])[0]) - x1) ** 2)
            + alpha * np.sum(np.abs(z)))

    f_ours = obj(np.asarray(z_ours))
    f_ref = obj(z_ref.numpy())
    assert f_ours <= f_ref * (1 + 1e-2)
