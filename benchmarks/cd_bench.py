#!/usr/bin/env python
"""Greedy-CD headline throughput: iterations/s at the BENCH scale class.

Measures coord_descent at N=16384, D=512, K=2048 (or --n/--d/--k) for the
f32 / bf16 / mixed kernel modes of the one-hot-MXU gather kernel
(ops/fused_cd.py), plus the unfused XLA path, with distinct inputs per
repeat and forced readbacks. Fixed 200 iterations (tol=0 keeps every row
active) so the number is steady-state solver throughput, comparable to
the FISTA headline.

Round-1 reference numbers (1x v5e): 545 f32 / 896 bf16 / 191.6 XLA.
Prints one JSON line per variant.
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
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lasso_tpu.linear.solvers import coord_descent

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((args.n, args.d)), jnp.float32)
          for _ in range(args.repeats + 1)]
    W = jnp.asarray((rng.standard_normal((args.d, args.k))
                     / np.sqrt(args.d)).astype(np.float32))

    variants = [
        ("f32", dict(use_pallas=True, kernel_precision="f32")),
        ("bf16", dict(use_pallas=True, kernel_precision="bf16")),
        ("mixed", dict(use_pallas=True, kernel_precision="mixed")),
    ]
    if not args.skip_xla:
        variants.append(("xla", dict(use_pallas=False)))

    for name, kw in variants:
        run = jax.jit(lambda x, W, _kw=tuple(sorted(kw.items())):
                      coord_descent(x, W, alpha=args.alpha,
                                    maxiter=args.iters, tol=0.0,
                                    **dict(_kw)))
        run(xs[0], W).block_until_ready()  # compile
        times = []
        for i in range(1, args.repeats + 1):
            t0 = time.perf_counter()
            out = run(xs[i], W)
            out.block_until_ready()
            float(out[0, 0])
            times.append(time.perf_counter() - t0)
        print(json.dumps({
            "variant": name,
            "iters_per_s": round(args.iters / min(times), 1),
            "config": f"{args.n}x({args.d}->{args.k})",
        }))


if __name__ == "__main__":
    main()
