#!/usr/bin/env python
"""Tour of every linear solver on one shared problem.

The reference README's qualitative solver comparison ("ISTA is a great
default", "CD is often considered the fastest", "Iterative Ridge
consistently produces the best results" — /root/reference/README.md:55-66)
made quantitative: each algorithm solves the same batched lasso and
reports wall-clock, final objective, sparsity, and KKT violation.

Run: python examples/solver_tour.py [--n 512] [--d 64] [--k 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def kkt_violation(x, W, z, alpha):
    g = (z @ W.T - x) @ W
    on = np.abs(z) > 1e-6
    v_on = np.abs(g + alpha * np.sign(z)) * on
    v_off = np.maximum(np.abs(g) - alpha, 0.0) * (~on)
    return float(np.maximum(v_on, v_off).max())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--k", type=int, default=256)
    ap.add_argument("--alpha", type=float, default=0.2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial
    from lasso_tpu import sparse_encode, lasso_loss

    rng = np.random.default_rng(0)
    # two draws: warm up / compile on one, time on the other (identical
    # repeated inputs can be served from backend execution caches)
    x_warm = jnp.asarray(rng.standard_normal((args.n, args.d)), jnp.float32)
    x_np = rng.standard_normal((args.n, args.d)).astype(np.float32)
    W_np = rng.standard_normal((args.d, args.k)).astype(np.float32)
    W_np /= np.linalg.norm(W_np, axis=0, keepdims=True)
    x, W = jnp.asarray(x_np), jnp.asarray(W_np)

    configs = {
        "ista": dict(maxiter=2000, tol=1e-8),
        "cd": dict(maxiter=2000, tol=1e-9),
        "cd-mod": dict(max_iter=100, tol=1e-6),
        "gpsr": dict(maxiter=500, tol=1e-4),
        "iter-ridge": dict(maxiter=100, tol=1e-8),
        "interior-point": dict(maxiter=40, tol=1e-6),
        "split-bregman": dict(maxiter=200, tol=1e-8),
        "own": dict(maxiter=200, xtol=1e-7),
    }

    print(f"batched lasso {args.n}x({args.d}->{args.k}), alpha={args.alpha}"
          f" on {jax.default_backend()}")
    print(f"{'algorithm':<16}{'seconds':>9}{'objective':>13}"
          f"{'sparsity':>10}{'kkt viol':>11}")
    for algo, kw in configs.items():
        run = jax.jit(partial(sparse_encode, alpha=args.alpha,
                              algorithm=algo, **kw))
        out = run(x_warm, W)
        z = out[0] if isinstance(out, tuple) else out
        jax.block_until_ready(z)          # compile outside the timing
        t0 = time.perf_counter()
        out = run(x, W)
        z = out[0] if isinstance(out, tuple) else out
        float(z[0, 0])  # force a real device->host readback
        dt = time.perf_counter() - t0
        z_np = np.asarray(z)
        obj = float(lasso_loss(x, z, W, args.alpha))
        sparsity = float((np.abs(z_np) < 1e-6).mean())
        print(f"{algo:<16}{dt:>9.3f}{obj:>13.6f}"
              f"{sparsity:>10.3f}{kkt_violation(x_np, W_np, z_np, args.alpha):>11.5f}")


if __name__ == "__main__":
    main()
