#!/usr/bin/env python
"""Group-lasso FISTA throughput + implicit-diff backward cost on TPU.

Distinct inputs per repeat + forced readback (CLAUDE.md benchmarking
rules: identical inputs can be served from a backend cache and
single-dispatch timings include ~25 ms tunnel latency).

Run: python benchmarks/group_bench.py [--n 16384] [--iters 200]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--gs", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lasso_tpu.linear import make_implicit_encoder
    from lasso_tpu.linear.solvers import group_ista, ista

    rng = np.random.default_rng(0)
    W = rng.standard_normal((args.d, args.k)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    Wj = jnp.asarray(W)
    xs = [jnp.asarray(rng.standard_normal((args.n, args.d)), jnp.float32)
          for _ in range(args.repeats + 1)]
    z0 = jnp.zeros((args.n, args.k), jnp.float32)
    lr = 0.05

    def timed(name, f, inputs):
        out = f(inputs[0])
        jax.block_until_ready(out)          # compile + warm
        t0 = time.perf_counter()
        for x in inputs[1:]:
            out = f(x)
            _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        dt = (time.perf_counter() - t0) / (len(inputs) - 1)
        print(f"{name:34s} {args.iters / dt:8.1f} it/s   "
              f"({dt:.3f}s per solve)")
        return dt

    timed("group-ista XLA (block gs=%d)" % args.gs,
          jax.jit(lambda x: group_ista(x, z0, Wj, alpha=0.1, groups=args.gs,
                                       maxiter=args.iters, tol=0.0, lr=lr,
                                       use_pallas=False)),
          xs)
    ids = np.repeat(np.arange(args.k // args.gs), args.gs)
    timed("group-ista XLA (id array)",
          jax.jit(lambda x: group_ista(x, z0, Wj, alpha=0.1, groups=ids,
                                       maxiter=args.iters, tol=0.0, lr=lr,
                                       use_pallas=False)),
          xs)
    for kp in ("f32", "bf16", "mixed"):
        timed(f"group-ista FUSED {kp}",
              jax.jit(lambda x, kp=kp: group_ista(
                  x, z0, Wj, alpha=0.1, groups=args.gs,
                  maxiter=args.iters, tol=0.0, lr=lr,
                  kernel_precision=kp)),
              xs)
    timed("group-ista FUSED f32 + restart",
          jax.jit(lambda x: group_ista(x, z0, Wj, alpha=0.1, groups=args.gs,
                                       maxiter=args.iters, tol=0.0, lr=lr,
                                       restart=True)),
          xs)
    timed("ista XLA unfused (baseline)",
          jax.jit(lambda x: ista(x, z0, Wj, alpha=0.1, maxiter=args.iters,
                                 tol=0.0, lr=lr, use_pallas=False)),
          xs)
    timed("ista fused f32 (reference point)",
          jax.jit(lambda x: ista(x, z0, Wj, alpha=0.1, maxiter=args.iters,
                                 tol=0.0, lr=lr, use_pallas="auto")),
          xs)

    # implicit-diff backward cost: grad of a scalar through the encoder
    enc = make_implicit_encoder(maxiter=args.iters, tol=0.0, lr=lr,
                                cg_iters=64)
    gfn = jax.jit(jax.grad(lambda x: jnp.sum(
        jnp.square(enc(x, Wj, jnp.asarray(0.1))))))
    out = gfn(xs[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for x in xs[1:]:
        out = gfn(x)
        _ = float(out[0, 0])
    dt = (time.perf_counter() - t0) / (len(xs) - 1)
    print(f"{'implicit grad (fwd + 64-iter CG bwd)':34s} "
          f"{dt:8.3f} s per grad")


if __name__ == "__main__":
    main()
