"""Public encode API: code initialization + string-dispatch over solvers.

Mirrors /root/reference/lasso/linear/sparse_encode.py:8-73 with the same
algorithm names, init modes, and per-algorithm init defaults. Everything
dispatched here is a pure jittable function; wrap ``sparse_encode`` in
``jax.jit`` (algorithm/init/maxiter etc. are static) or use
:func:`lasso_tpu.parallel.data_parallel_encode` for sharded execution.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp

from lasso_tpu.config import get_precision
from lasso_tpu.linalg.basic import lstsq, ridge

_init_defaults = {
    "ista": "zero",
    "cd": "zero",
    "cd-mod": "zero",
    "gpsr": "zero",
    "iter-ridge": "ridge",
    "interior-point": "ridge",
    "split-bregman": "zero",
    "own": "zero",
    "omp": "zero",   # unused: OMP takes no z0 (support built greedily)
    "group-ista": "zero",
}


def initialize_code(x, weight, alpha, mode, key=None):
    """Initialize codes z0: modes zero / unif / lstsq / ridge / transpose
    (reference sparse_encode.py:19-35)."""
    n_samples = x.shape[0]
    n_components = weight.shape[1]
    if mode == "zero":
        z0 = jnp.zeros((n_samples, n_components), dtype=x.dtype)
    elif mode == "unif":
        if key is None:
            key = jax.random.PRNGKey(0)
        z0 = jax.random.uniform(
            key, (n_samples, n_components), dtype=x.dtype,
            minval=-0.1, maxval=0.1)
    elif mode == "lstsq":
        z0 = lstsq(x.T, weight).T
    elif mode == "ridge":
        a = jnp.asarray(alpha)
        if a.ndim >= 1:
            # per-sample alpha: any z0 is a valid start and the shared
            # ridge factorization takes one penalty — use the mean
            a = jnp.mean(a)
        z0 = ridge(x.T, weight, alpha=a).T
    elif mode == "transpose":
        z0 = jnp.matmul(x, weight, precision=get_precision())
    else:
        raise ValueError(f"invalid init parameter {mode!r}.")
    return z0


def sparse_encode(x, weight, alpha=1.0, z0=None, algorithm="ista", init=None,
                  key=None, return_iters=False, **kwargs):
    """Batched sparse coding: ``min_z 0.5||z W^T - x||^2 + alpha ||z||_1``.

    Dispatch table mirrors reference sparse_encode.py:54-71, plus the
    ``cd-mod`` entry for the duality-gap coordinate-descent variant that the
    reference ships but does not dispatch, and ``omp`` (batched
    orthogonal matching pursuit — TPU extension; ``alpha``/``z0`` are
    ignored, pass ``n_nonzero_coefs``/``tol``).

    ``return_iters=True`` returns ``(z, n_iter)`` for every algorithm
    (the executed iteration count from the solver's aux — the uniform
    observability surface the per-solver functions expose).

    ``alpha`` may be an [N]-vector of per-sample penalties for EVERY
    algorithm (TPU extension; the reference takes scalars): the lasso is
    homogeneous in alpha, so the vector solve is the alpha=1 solve on
    row-rescaled inputs (ops.common.per_sample_alpha_column). ista and
    cd implement this natively; the remaining algorithms are wrapped
    here. ``alpha`` may also be a [1, K] row of per-feature (per-atom)
    penalties — the weighted / adaptive lasso — solved exactly on a
    column-rescaled dictionary (ops.common.per_feature_alpha_row).
    Convergence tolerances then act in penalty-normalized units.
    """
    from lasso_tpu.linear import solvers
    from lasso_tpu.ops.common import (per_feature_alpha_row,
                                      per_sample_alpha_column)

    n_samples = x.shape[0]
    n_components = weight.shape[1]

    if algorithm == "omp":
        # OMP is the L0 greedy solver: alpha and z0 play no role (its
        # budget is n_nonzero_coefs / tol), so the vector-alpha wrappers
        # and code initialization are skipped entirely
        out = solvers.orthogonal_matching_pursuit(
            x, weight, return_iters=return_iters, **kwargs)
        return out

    a_row = per_feature_alpha_row(alpha, n_components, n_samples)
    if a_row is not None and algorithm == "group-ista":
        # a per-coordinate rescale changes the group norms non-uniformly;
        # the weighted-group analogue is group_weights, not alpha
        raise ValueError("per-feature [1, K] alpha is not supported for "
                         "group-ista; pass group_weights for per-group "
                         "penalties")
    if a_row is not None and algorithm not in ("ista", "cd"):
        # generic column-rescaling wrapper for solvers without native
        # per-feature-alpha support (ista/cd rescale internally)
        a_row = a_row.astype(x.dtype)
        out = sparse_encode(
            x, weight / a_row, 1.0,
            z0=None if z0 is None else z0 * a_row, algorithm=algorithm,
            init=init, key=key, return_iters=return_iters, **kwargs)
        if return_iters:
            z_u, n_iter = out
            return z_u / a_row, n_iter
        return out / a_row

    # ista/cd handle the per-feature row natively; don't let the
    # per-sample resolver reject its [1, K] shape
    a_col = (None if a_row is not None
             else per_sample_alpha_column(alpha, n_samples))
    if a_col is not None and algorithm not in ("ista", "cd", "group-ista"):
        # generic homogeneity wrapper for solvers without native
        # vector-alpha support (ista/cd rescale internally)
        a_col = a_col.astype(x.dtype)
        out = sparse_encode(
            x / a_col, weight, 1.0,
            z0=None if z0 is None else z0 / a_col, algorithm=algorithm,
            init=init, key=key, return_iters=return_iters, **kwargs)
        if return_iters:
            z_u, n_iter = out
            return z_u * a_col, n_iter
        return out * a_col
    ri = {"return_iters": True} if return_iters else {}
    n_iter = None

    if z0 is not None:
        assert z0.shape == (n_samples, n_components)
    else:
        if init is None:
            init = _init_defaults.get(algorithm, "zero")
        elif init == "zero" and algorithm == "iter-ridge":
            warnings.warn("zero init is a poor choice for iter-ridge: "
                          "coordinates at exactly zero freeze "
                          "permanently (use the ridge default)")
        z0 = initialize_code(x, weight, alpha, mode=init, key=key)

    if algorithm == "cd":
        out = solvers.coord_descent(x, weight, z0, alpha, **ri, **kwargs)
        z, n_iter = out if return_iters else (out, None)
    elif algorithm == "cd-mod":
        out = solvers.coord_descent_mod(x, weight, z0, alpha, **ri,
                                        **kwargs)
        if return_iters:
            z, _, n_iter = out
        else:
            z, _ = out
    elif algorithm == "gpsr":
        prec = get_precision(kwargs.pop("precision", None))
        A = lambda v: jnp.matmul(v, weight.T, precision=prec)
        AT = lambda v: jnp.matmul(v, weight, precision=prec)
        out = solvers.gpsr_basic(x, A, tau=alpha, AT=AT, x0=z0, **ri,
                                 **kwargs)
        z, n_iter = out if return_iters else (out, None)
    elif algorithm == "iter-ridge":
        out = solvers.iterative_ridge(z0, x, weight, alpha, **ri, **kwargs)
        z, n_iter = out if return_iters else (out, None)
    elif algorithm == "ista":
        out = solvers.ista(x, z0, weight, alpha, **ri, **kwargs)
        z, n_iter = out if return_iters else (out, None)
    elif algorithm == "group-ista":
        # group lasso / sparse-group lasso (TPU extension): requires a
        # ``groups`` kwarg (int block size or [K] id array)
        out = solvers.group_ista(x, z0, weight, alpha, **ri, **kwargs)
        z, n_iter = out if return_iters else (out, None)
    elif algorithm == "interior-point":
        out = solvers.interior_point(x, weight, z0, alpha, **ri, **kwargs)
        if return_iters:
            z, _, n_iter = out
        else:
            z, _ = out
    elif algorithm == "split-bregman":
        z, n_iter = solvers.split_bregman(weight, x, z0, alpha, **kwargs)
    elif algorithm == "own":
        out = solvers.orthant_wise_newton(weight, x, z0, alpha, **ri,
                                          **kwargs)
        z, n_iter = out if return_iters else (out, None)
    else:
        raise ValueError(
            f"unknown algorithm {algorithm!r}; expected one of "
            f"{sorted(_init_defaults)}")

    if return_iters:
        return z, n_iter
    return z
