#!/usr/bin/env python
"""Headline-config variant matrix: kernel precision x restart.

Measures batched FISTA iterations/s at the BENCH config (or --n/--d/--k)
for the f32 split-float, mixed precision-continuation, and bf16 kernel
modes, plus the per-row adaptive-restart path, with distinct inputs per
repeat and forced readbacks. One JSON line per variant.

Round-2 reference numbers (1x v5e, 16384x(512->2048), 200 iters):
f32 724 it/s / mixed 1165 / bf16 1454; restart trades none of the
per-iteration rate and cuts iterations-to-gap (see convergence.py).
"""

import argparse
import json
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
    ap.add_argument("--alpha", type=float, default=0.1)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lasso_tpu.linalg import lipschitz_constant
    from lasso_tpu.linear.solvers import ista

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((args.n, args.d)), jnp.float32)
          for _ in range(args.repeats + 1)]
    W = jnp.asarray((rng.standard_normal((args.d, args.k))
                     / np.sqrt(args.d)).astype(np.float32))
    z0 = jnp.zeros((args.n, args.k), jnp.float32)
    lr = float(1.0 / lipschitz_constant(W))

    variants = [
        ("f32", dict(kernel_precision="f32")),
        ("mixed", dict(kernel_precision="mixed")),
        ("bf16", dict(kernel_precision="bf16")),
        ("f32+restart", dict(kernel_precision="f32", restart=True)),
    ]
    for name, kw in variants:
        run = jax.jit(lambda x, _kw=kw: ista(
            x, z0, W, args.alpha, lr=lr, maxiter=args.iters, tol=0.0,
            **_kw))
        z = run(xs[0])
        jax.block_until_ready(z)
        times = []
        for x in xs[1:]:
            t0 = time.perf_counter()
            z = run(x)
            jax.block_until_ready(z)
            float(z[0, 0])
            times.append(time.perf_counter() - t0)
        r = z @ W.T - xs[-1]
        obj = float(0.5 * jnp.sum(r * r)
                    + args.alpha * jnp.sum(jnp.abs(z)))
        print(json.dumps({
            "variant": name,
            "config": f"{args.n}x({args.d}->{args.k})",
            "iters_per_s": round(args.iters / min(times), 1),
            "objective": round(obj, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
