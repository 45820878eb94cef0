#!/usr/bin/env python
"""Structured sparsity tour: group lasso, sparse-group lasso, and
fixed-sparsity (OMP / K-SVD-style) coding — the TPU-extension solver
families on one planted problem.

Data: signals built from a few GROUPS of atoms (each group = one
"concept" of 8 correlated atoms). Plain lasso scatters energy across
groups; the group lasso recovers whole concepts; the sparse-group
variant additionally thins coordinates WITHIN each active concept; OMP
caps the support size exactly.

Run: python examples/structured_sparsity.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from lasso_tpu.linear import sparse_encode
    from lasso_tpu.linear.solvers import group_lasso_objective

    rng = np.random.default_rng(0)
    n, d, k, gs = 256, 64, 256, 8
    n_groups = k // gs

    W = rng.standard_normal((d, k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    # planted codes: 2 active groups per sample, dense within the group
    Z = np.zeros((n, k), np.float32)
    for i in range(n):
        for g in rng.choice(n_groups, 2, replace=False):
            Z[i, g * gs:(g + 1) * gs] = rng.standard_normal(gs) * 0.8
    X = jnp.asarray(Z @ W.T + 0.05 * rng.standard_normal((n, d)),
                    jnp.float32)
    Wj = jnp.asarray(W)

    def group_stats(z, name):
        z = np.asarray(z)
        gn = np.sqrt((z.reshape(n, n_groups, gs) ** 2).sum(-1))
        act_groups = (gn > 1e-5).sum(1).mean()
        nnz = (np.abs(z) > 1e-5).sum(1).mean()
        rss = float(np.mean(np.sum((z @ W.T - np.asarray(X)) ** 2, 1)))
        print(f"{name:28s} active groups/sample {act_groups:5.1f}  "
              f"nonzeros {nnz:6.1f}  rss {rss:7.3f}")

    kw = dict(maxiter=2000, tol=1e-7)
    z_l1 = sparse_encode(X, Wj, 0.25, algorithm="ista", **kw)
    group_stats(z_l1, "plain lasso (alpha=0.25)")

    z_gr = sparse_encode(X, Wj, 0.9, algorithm="group-ista", groups=gs,
                         **kw)
    group_stats(z_gr, "group lasso (alpha=0.9)")
    print(f"{'':28s} group objective/sample "
          f"{float(group_lasso_objective(X, Wj, z_gr, 0.9, gs)) / n:.3f}")

    z_sg = sparse_encode(X, Wj, 0.6, algorithm="group-ista", groups=gs,
                         l1_alpha=0.15, **kw)
    group_stats(z_sg, "sparse-group (0.6 + l1 0.15)")

    z_omp = sparse_encode(X, Wj, 0.0, algorithm="omp",
                          n_nonzero_coefs=16)
    group_stats(z_omp, "omp (T=16)")


if __name__ == "__main__":
    main()
