"""Uniform verbose / return_iters surface across all solvers (VERDICT r1
item 6): every solver accepts ``verbose`` (printing the reference's
per-iteration quantities via jax.debug.print) and ``return_iters`` so the
benchmark harnesses can read iteration counts from solver aux instead of
inferring them from wall clock."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasso_tpu.linalg.conjgrad import batch_cg
from lasso_tpu.linear import sparse_encode
from lasso_tpu.linear.solvers import (coord_descent, coord_descent_mod,
                                      gpsr_basic, interior_point,
                                      iterative_ridge, ista,
                                      orthant_wise_newton, split_bregman)
from lasso_tpu.nonlinear import (ista_nl, iterative_ridge_bfgs, owlqn,
                                 split_bregman_nl)


@pytest.fixture
def problem(rng):
    W = rng.standard_normal((12, 20)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    x = rng.standard_normal((6, 12)).astype(np.float32)
    z0 = jnp.zeros((6, 20), jnp.float32)
    return jnp.asarray(x), jnp.asarray(W), z0


def _flush(out):
    jax.block_until_ready(out)
    jax.effects_barrier()
    return out


def test_ista_verbose_and_iters(problem, capfd):
    x, W, z0 = problem
    z, k = _flush(ista(x, z0, W, 0.2, lr=0.1, maxiter=5, tol=0.0,
                       verbose=True, return_iters=True))
    assert int(k) == 5
    assert "loss:" in capfd.readouterr().out


def test_cd_verbose_and_iters(problem, capfd):
    x, W, _ = problem
    z, k = _flush(coord_descent(x, W, alpha=0.2, maxiter=8, tol=1e-12,
                                verbose=True, return_iters=True))
    assert int(k) == 8
    assert "loss:" in capfd.readouterr().out


def test_cd_mod_return_iters(problem):
    x, W, _ = problem
    z, gap, k = _flush(coord_descent_mod(x, W, alpha=0.2, max_iter=15,
                                         tol=1e-10, return_iters=True))
    assert 1 <= int(k) <= 15
    assert gap.shape == (x.shape[0],)


def test_gpsr_verbose_and_iters(problem, capfd):
    x, W, _ = problem
    z, k = _flush(gpsr_basic(x, lambda v: v @ W.T, 0.2,
                             AT=lambda v: v @ W, maxiter=10,
                             verbose=True, return_iters=True))
    assert int(k) >= 1
    out = capfd.readouterr().out
    assert "obj =" in out and "nz =" in out
    # initial-objective line (reference gpsr.py:23-24)
    assert "Initial obj =" in out
    # criterion-name/value/target line (reference gpsr.py:119-121);
    # default stop_criterion=3 is the LCP criterion
    assert "LCP =" in out and "(target =" in out
    # final summary after the ladder (reference gpsr.py:325-333)
    assert "Final obj =" in out


def test_gpsr_verbose2_line_search(problem, capfd):
    """verbose > 1 adds the inner line-search lambda-reduction report
    (reference gpsr.py:62-63) whenever a trial step is rejected. A huge
    mu makes the sufficient-decrease test fail on the first guesses, so
    the report is guaranteed to fire."""
    x, W, _ = problem
    z = _flush(gpsr_basic(x, lambda v: v @ W.T, 0.2, AT=lambda v: v @ W,
                          maxiter=3, mu=0.999, verbose=2))
    out = capfd.readouterr().out
    assert "line-search reducing lambda to" in out


@pytest.mark.parametrize("criterion,name", [
    (0, "d_nz"), (1, "d_f"), (2, "||d_x|| / ||x||"), (4, "f")])
def test_gpsr_verbose_criterion_names(problem, capfd, criterion, name):
    x, W, _ = problem
    tol = {0: 0.0, 1: 1e-12, 2: 1e-12, 4: 0.0}[criterion]
    z = _flush(gpsr_basic(x, lambda v: v @ W.T, 0.2, AT=lambda v: v @ W,
                          maxiter=3, stop_criterion=criterion, tol=tol,
                          verbose=True))
    assert f"{name} =" in capfd.readouterr().out


def test_gpsr_verbose_debias_summary(problem, capfd):
    x, W, _ = problem
    z = _flush(gpsr_basic(x, lambda v: v @ W.T, 0.2, AT=lambda v: v @ W,
                          maxiter=10, debias=True, verbose=True))
    out = capfd.readouterr().out
    # the debias phase re-prints the summary (reference gpsr.py:354-362)
    assert "debiased: Final obj =" in out


def test_iterative_ridge_verbose_and_iters(problem, capfd):
    x, W, _ = problem
    from lasso_tpu.linalg.basic import ridge
    z0 = ridge(x.T, W, alpha=0.2).T
    z, k = _flush(iterative_ridge(z0, x, W, alpha=0.2, maxiter=5,
                                  verbose=True, return_iters=True))
    assert 1 <= int(k) <= 5
    assert "fval:" in capfd.readouterr().out


def test_own_verbose_and_iters(problem, capfd):
    x, W, z0 = problem
    z, k = _flush(orthant_wise_newton(W, x, z0, alpha=0.2, maxiter=5,
                                      verbose=2, return_iters=True))
    assert 1 <= int(k) <= 5
    out = capfd.readouterr().out
    assert "initial f:" in out
    assert "Iterations:" in out
    assert "dz:" in out


def test_interior_point_verbose_and_iters(problem, capfd):
    x, W, _ = problem
    (z, ok), k = (lambda r: ((r[0], r[1]), r[2]))(
        _flush(interior_point(x, W, alpha=0.2, maxiter=5, verbose=True,
                              return_iters=True)))
    assert 1 <= int(k) <= 5
    assert "prim" in capfd.readouterr().out


def test_split_bregman_verbose(problem, capfd):
    x, W, _ = problem
    z, itn = _flush(split_bregman(W, x, alpha=0.2, maxiter=5, tol=0.0,
                                  verbose=True))
    assert int(itn) == 5
    assert "cost:" in capfd.readouterr().out


def test_conjgrad_verbose(problem, capfd):
    x, W, _ = problem
    A = np.asarray(W.T @ W + 0.1 * jnp.eye(W.shape[1]))
    b = np.asarray(x @ W)
    sol = _flush(batch_cg(jnp.asarray(A), jnp.asarray(b), maxiter=50,
                          verbose=2))
    out = capfd.readouterr().out
    assert "rs:" in out
    assert "CG:" in out  # terminal status message


def test_nonlinear_verbose_and_iters(problem, capfd):
    x, W, z0 = problem
    decoder = lambda z: jnp.tanh(z) @ W.T
    z, k = _flush(ista_nl(x, z0, decoder, alpha=0.2, maxiter=4, lr=0.1,
                          tol=0.0, verbose=2, return_iters=True))
    assert int(k) == 4
    out = capfd.readouterr().out
    assert "initial loss:" in out and "final loss:" in out

    fun = lambda z: 0.5 * jnp.sum(jnp.square(decoder(z) - x))
    z, k = _flush(owlqn(fun, z0, alpha=0.2, max_iter=4, verbose=2,
                        return_iters=True))
    assert 1 <= int(k) <= 4
    assert "initial f:" in capfd.readouterr().out

    z, k = _flush(iterative_ridge_bfgs(fun, z0 + 0.1, alpha=0.2,
                                       maxiter=4, verbose=2,
                                       return_iters=True))
    assert 1 <= int(k) <= 4
    assert "initial loss:" in capfd.readouterr().out

    resid = lambda z: (jnp.tanh(z) @ W.T - x)
    z, k = _flush(split_bregman_nl(resid, z0, alpha=0.2, max_iter=3,
                                   solver="cg", disp=2,
                                   return_iters=True))
    assert 1 <= int(k) <= 3
    out = capfd.readouterr().out
    # reference nl/sb.py:164-168: per-outer-iteration + final cost lines
    assert "iter" in out and "cost:" in out
    assert "final cost:" in out


def test_ista_restart_verbose(problem, capfd):
    """restart=True must keep the per-iteration loss prints (ADVICE r2)."""
    x, W, z0 = problem
    z, k = _flush(ista(x, z0, W, 0.2, lr=0.1, maxiter=5, tol=0.0,
                       restart=True, verbose=True, return_iters=True))
    assert int(k) == 5
    assert "loss:" in capfd.readouterr().out


def test_sparse_encode_return_iters_all_algorithms(problem):
    """sparse_encode(return_iters=True) returns (z, n_iter) uniformly."""
    x, W, _ = problem
    for algo in ("ista", "cd", "cd-mod", "gpsr", "iter-ridge",
                 "interior-point", "split-bregman", "own"):
        kw = {"max_iter": 20} if algo == "cd-mod" else {"maxiter": 20}
        z, k = sparse_encode(x, W, 0.2, algorithm=algo,
                             return_iters=True, **kw)
        assert z.shape == (x.shape[0], W.shape[1]), algo
        assert 1 <= int(k) <= 20, (algo, int(k))
