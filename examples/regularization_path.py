#!/usr/bin/env python
"""Regularization path in ONE batched solve (per-sample alpha).

The reference sweeps alpha in a Python loop (one solve per penalty).
Here the sweep IS the batch: ``lasso_path(mode='batched')`` tiles the
samples across the alpha axis and solves an [A*N, D] problem with a
per-sample penalty vector — A times the rows, one dispatch, full MXU
utilization. ``mode='sequential'`` is the classic warm-started homotopy
(largest alpha first) for when A*N*K codes don't fit.

Prints, per alpha: mean nonzeros/sample, mean objective, and the
wall-clock of the whole sweep both ways.

Run: python examples/regularization_path.py [--n 2048] [--d 128] [--k 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--alphas", type=int, default=8,
                    help="number of path points (geomspace 0.02..1.0)")
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lasso_tpu.linear import lasso_path

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((args.n, args.d)), jnp.float32)
    W = jnp.asarray((rng.standard_normal((args.d, args.k))
                     / np.sqrt(args.d)).astype(np.float32))
    alphas = np.geomspace(0.02, 1.0, args.alphas).astype(np.float32)

    for mode in ("batched", "sequential"):
        t0 = time.perf_counter()
        path = lasso_path(x, W, alphas, mode=mode, maxiter=args.iters,
                          tol=0.0)
        jax.block_until_ready(path)
        dt_cold = time.perf_counter() - t0
        # second pass reuses the compiled programs — the steady-state
        # number (first-run time is dominated by remote compilation)
        t0 = time.perf_counter()
        path = lasso_path(x, W, alphas, mode=mode, maxiter=args.iters,
                          tol=0.0)
        jax.block_until_ready(path)
        dt = time.perf_counter() - t0
        print(f"[{mode}] {args.alphas}-point path on "
              f"{args.n}x({args.d}->{args.k}): {dt:.2f} s "
              f"({dt_cold:.2f} s incl. compile)")

    path = np.asarray(path)
    W64 = np.asarray(W, np.float64)
    x64 = np.asarray(x, np.float64)
    for a, z in zip(alphas, path):
        z64 = z.astype(np.float64)
        r = z64 @ W64.T - x64
        obj = (0.5 * np.sum(r * r) + a * np.sum(np.abs(z64))) / args.n
        nnz = float(np.mean(np.sum(np.abs(z) > 1e-6, axis=1)))
        print(f"alpha {a:6.3f}: {nnz:7.1f} nonzeros/sample   "
              f"objective/sample {obj:9.4f}")


if __name__ == "__main__":
    main()
