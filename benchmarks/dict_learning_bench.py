#!/usr/bin/env python
"""Dictionary-learning training throughput: EM steps/s on the TPU.

One EM step = sparse_encode E-step (fixed FISTA iterations, fused Pallas
multi-step kernel) + M-step (ridge: psum-able Gram solve; constrained:
sequential per-atom scan). Distinct inputs per repeat, forced readback.

Prints one JSON line per M-step variant.
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
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--alpha", type=float, default=0.1)
    ap.add_argument("--em-steps", type=int, default=10)
    ap.add_argument("--solver-iters", type=int, default=50)
    ap.add_argument("--patches", action="store_true",
                    help="BASELINE.md row 4: unit-norm dict learning on "
                         "Omniglot-like 8x8 image patches (native patch "
                         "pipeline) instead of gaussian data")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lasso_tpu.linear import dict_learning

    rng = np.random.default_rng(0)
    if args.patches:
        # the examples/dict_learning_patches.py pipeline at bench scale:
        # stroke images -> native random 8x8 patch extraction -> center
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "examples"))
        from dict_learning_patches import make_stroke_images
        from lasso_tpu.native import (center_patches,
                                      extract_patches_random)
        imgs = make_stroke_images(n_images=400, size=28, seed=0)
        args.d, args.k = 64, 256
        Xs = []
        for rep in range(3):
            pats = extract_patches_random(imgs, patch=8,
                                          per_image=args.n // 400 + 1,
                                          seed=rep)
            pats = center_patches(pats)[:args.n]
            Xs.append(jnp.asarray(pats, jnp.float32))
        args.n = int(Xs[0].shape[0])
    else:
        Xs = [jnp.asarray(rng.standard_normal((args.n, args.d)),
                          jnp.float32) for _ in range(3)]

    variants = [("ridge", dict(constrained=False)),
                ("constrained-sequential",
                 dict(constrained=True, dict_update="sequential")),
                ("constrained-block",
                 dict(constrained=True, dict_update="block")),
                # E-step levers: precision continuation / restart flow
                # through solver kwargs into the FISTA encoder
                ("ridge+mixed",
                 dict(constrained=False, kernel_precision="mixed")),
                ("ridge+restart",
                 dict(constrained=False, restart=True))]
    for name, kw in variants:
        run = jax.jit(lambda X, kw=kw: dict_learning(
            X, n_components=args.k, alpha=args.alpha,
            steps=args.em_steps, maxiter=args.solver_iters, tol=0.0,
            lr=0.05, key=jax.random.PRNGKey(0), **kw))
        W, losses = run(Xs[0])
        jax.block_until_ready((W, losses))
        ts = []
        for X in Xs:
            t0 = time.perf_counter()
            W, losses = run(X)
            float(losses[-1])  # force readback
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(json.dumps({
            "metric": "dict_learning EM steps/s",
            "m_step": name,
            "config": f"{args.n}x({args.d}->{args.k}), "
                      f"{args.solver_iters} FISTA iters/E-step",
            "em_steps_per_s": round(args.em_steps / best, 3),
            "loss_first_last": [round(float(losses[0]), 4),
                                round(float(losses[-1]), 4)],
        }), flush=True)


if __name__ == "__main__":
    main()
