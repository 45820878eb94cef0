"""Regularization paths: the full alpha sweep as one batched solve.

The reference has no path API (its README sweeps alpha in a Python loop,
one solve per penalty). On TPU the idiomatic strategy is the opposite of
a loop: per-sample alpha support (lasso homogeneity, see
ops.common.per_sample_alpha_column) makes the whole path ONE batched
problem — tile the batch across the alpha axis and let the MXU chew
A*N embarrassingly-parallel rows in a single dispatch.
"""

from __future__ import annotations

import jax.numpy as jnp


def lasso_path(x, weight, alphas, algorithm="ista", mode="batched",
               **kwargs):
    """Solve ``min_z 0.5||z W^T - x||^2 + a||z||_1`` for every ``a`` in
    ``alphas``. Returns codes of shape ``[A, N, K]``.

    ``mode='batched'`` (default): one solve of an ``[A*N, D]`` problem
    with a per-sample alpha vector — maximal parallelism, memory
    ``A*N*K`` codes. ``mode='sequential'``: classic homotopy — iterate
    from the largest to the smallest alpha, warm-starting each solve
    from the previous solution (constant memory, A dispatches; pays off
    when A*N*K does not fit, or with solvers whose warm starts shortcut
    convergence — e.g. ``algorithm='cd'`` keeps the greedy-CD b-invariant).

    ``alphas`` must be positive. Extra kwargs flow to
    :func:`lasso_tpu.linear.sparse_encode` (``algorithm``, ``maxiter``,
    ``kernel_precision``, ...). Any dispatched algorithm with
    per-sample-alpha support works — including ``'group-ista'`` (the
    group norm is 1-homogeneous, so the same row-rescaling reduction
    applies; pass ``groups=...``).
    """
    from lasso_tpu.linear.sparse_encode import sparse_encode

    import numpy as np

    alphas_arr = jnp.asarray(alphas, x.dtype).reshape(-1)
    A = alphas_arr.shape[0]
    N = x.shape[0]
    K = weight.shape[1]

    if mode == "batched":
        x_tiled = jnp.tile(x, (A, 1))                      # [A*N, D]
        a_vec = jnp.repeat(alphas_arr, N)                  # [A*N]
        z = sparse_encode(x_tiled, weight, alpha=a_vec,
                          algorithm=algorithm, **kwargs)
        return z.reshape(A, N, K)

    if mode == "sequential":
        # largest alpha first: its solution is the sparsest (cheapest),
        # and each subsequent solve warm-starts from the previous one
        order = np.argsort(-np.asarray(alphas_arr))
        z_prev = None
        out = [None] * A
        for idx in order:
            z_prev = sparse_encode(x, weight,
                                   alpha=float(alphas_arr[idx]),
                                   z0=z_prev, algorithm=algorithm,
                                   **kwargs)
            out[int(idx)] = z_prev
        return jnp.stack(out, axis=0)

    raise ValueError(f"mode must be 'batched' or 'sequential', got "
                     f"{mode!r}")
