#!/usr/bin/env python
"""Whole-suite solver benchmark: every linear solver timed on one problem.

For each algorithm: wall-clock of a converged solve (its own stopping
rule), the final lasso objective, and the KKT violation — so speed claims
are tied to solution quality. Distinct inputs per repeat, forced readback.

``--reference`` also times the pytorch-lasso equivalents on CPU.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

CONFIGS = {
    "ista": dict(maxiter=2000, tol=1e-7),
    "cd": dict(maxiter=2000, tol=1e-9),
    "cd-mod": dict(max_iter=100, tol=1e-6),
    "gpsr": dict(maxiter=500, tol=1e-4),
    "iter-ridge": dict(maxiter=200, tol=1e-7),
    "interior-point": dict(maxiter=40, tol=1e-6),
    "split-bregman": dict(maxiter=200, tol=1e-7),
    "own": dict(maxiter=200, xtol=1e-6),
    # TPU extensions (no reference counterpart); omp reports RSS (its
    # objective is L0-constrained LS), group-ista the group objective
    "omp": dict(n_nonzero_coefs=32),
    "group-ista": dict(maxiter=2000, tol=1e-7, groups=8),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--alpha", type=float, default=0.2)
    ap.add_argument("--reference", action="store_true")
    ap.add_argument("--sb-precision", action="store_true",
                    help="also time split-bregman kernel_precision="
                         "'bf16'/'mixed' (the round-4 extension)")
    ap.add_argument("--only", default=None,
                    help="comma-separated algorithm subset")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial
    from lasso_tpu.linear import sparse_encode
    from _oracles import kkt_violation, lasso_objective

    rng = np.random.default_rng(0)
    xs_np = [rng.standard_normal((args.n, args.d)).astype(np.float32)
             for _ in range(3)]
    W_np = rng.standard_normal((args.d, args.k)).astype(np.float32)
    W_np /= np.linalg.norm(W_np, axis=0, keepdims=True)
    W = jnp.asarray(W_np)
    xs = [jnp.asarray(x) for x in xs_np]

    def executed_iters(algo, x, kw):
        """Iteration count from solver aux (return_iters), not wall-clock
        inference — every solver exposes it uniformly."""
        from lasso_tpu.linalg.basic import ridge
        from lasso_tpu.linear import solvers

        alpha = args.alpha
        zeros = jnp.zeros((x.shape[0], W.shape[1]), x.dtype)
        if algo == "ista":
            _, k = solvers.ista(x, zeros, W, alpha, return_iters=True, **kw)
        elif algo == "cd":
            _, k = solvers.coord_descent(x, W, None, alpha,
                                         return_iters=True, **kw)
        elif algo == "cd-mod":
            _, _, k = solvers.coord_descent_mod(x, W, None, alpha,
                                                return_iters=True, **kw)
        elif algo == "gpsr":
            A = lambda v: jnp.matmul(v, W.T)
            AT = lambda v: jnp.matmul(v, W)
            _, k = solvers.gpsr_basic(x, A, tau=alpha, AT=AT,
                                      return_iters=True, **kw)
        elif algo == "iter-ridge":
            z0 = ridge(x.T, W, alpha=alpha).T
            _, k = solvers.iterative_ridge(z0, x, W, alpha,
                                           return_iters=True, **kw)
        elif algo == "interior-point":
            _, _, k = solvers.interior_point(x, W, alpha=alpha,
                                             return_iters=True, **kw)
        elif algo == "split-bregman":
            _, k = solvers.split_bregman(W, x, alpha=alpha, **kw)
        elif algo == "own":
            _, k = solvers.orthant_wise_newton(W, x, zeros, alpha,
                                               return_iters=True, **kw)
        elif algo == "omp":
            _, k = solvers.orthogonal_matching_pursuit(
                x, W, return_iters=True, **kw)
        elif algo == "group-ista":
            _, k = solvers.group_ista(x, zeros, W, alpha,
                                      return_iters=True, **kw)
        else:
            return None
        return int(k)

    items = list(CONFIGS.items())
    if args.sb_precision:
        items += [("split-bregman[bf16]",
                   dict(CONFIGS["split-bregman"], kernel_precision="bf16")),
                  ("split-bregman[mixed]",
                   dict(CONFIGS["split-bregman"], kernel_precision="mixed"))]
    if args.only:
        keep = set(args.only.split(","))
        items = [(a, kw) for a, kw in items
                 if a in keep or a.split("[")[0] in keep]

    for algo, kw in items:
        base_algo = algo.split("[")[0]
        try:
            run = jax.jit(partial(sparse_encode, alpha=args.alpha,
                                  algorithm=base_algo, **kw))
            out = run(xs[0], W)
            z = out[0] if isinstance(out, tuple) else out
            jax.block_until_ready(z)
            ts = []
            for x in xs:
                t0 = time.perf_counter()
                out = run(x, W)
                z = out[0] if isinstance(out, tuple) else out
                float(z[0, 0])
                ts.append(time.perf_counter() - t0)
            z_np = np.asarray(z)
            n_it = executed_iters(base_algo, xs[-1], dict(kw))
            rec = {
                "system": f"lasso_tpu[{jax.default_backend()}]",
                "algorithm": algo,
                "config": f"{args.n}x({args.d}->{args.k})",
                "seconds": round(min(ts), 4),
            }
            if base_algo == "omp":
                rec["rss_per_sample"] = round(float(np.mean(np.sum(
                    (z_np @ W_np.T - xs_np[-1]) ** 2, axis=1))), 4)
            elif base_algo == "group-ista":
                from lasso_tpu.linear.solvers import group_lasso_objective
                rec["group_objective"] = round(float(group_lasso_objective(
                    jnp.asarray(xs_np[-1]), W, jnp.asarray(z_np),
                    args.alpha, 8)) / args.n, 3)
            else:
                rec["objective"] = round(float(
                    lasso_objective(xs_np[-1], W_np, z_np, args.alpha)), 3)
                rec["kkt_violation"] = round(float(
                    kkt_violation(xs_np[-1], W_np, z_np, args.alpha)), 5)
            if n_it is not None:
                rec["iterations"] = n_it
                if min(ts) > 0:
                    rec["iters_per_s"] = round(n_it / min(ts), 1)
            print(json.dumps(rec), flush=True)
        except Exception as e:
            print(json.dumps({"algorithm": algo, "error":
                              str(e).splitlines()[0][:120]}), flush=True)

    if args.reference:
        from _oracles import load_reference
        lasso = load_reference()
        import torch
        ref_map = {
            "ista": ("ista", dict(maxiter=2000, tol=1e-7)),
            "cd": ("coord_descent", dict(maxiter=2000, tol=1e-9)),
            "iter-ridge": ("iterative_ridge", dict(maxiter=200, tol=1e-7)),
            "interior-point": ("interior_point", dict(maxiter=40, tol=1e-6)),
            "split-bregman": ("split_bregman", dict(maxiter=200, tol=1e-7)),
            "own": ("orthant_wise_newton", dict(maxiter=200, xtol=1e-6)),
        }
        xt = torch.from_numpy(xs_np[-1])
        Wt = torch.from_numpy(W_np)
        for algo, (name, kw) in ref_map.items():
            try:
                t0 = time.perf_counter()
                z = lasso.linear.sparse_encode(
                    xt, Wt, alpha=args.alpha, algorithm=algo, **kw)
                dt = time.perf_counter() - t0
                z_np = z.numpy()
                print(json.dumps({
                    "system": "pytorch-lasso[cpu]",
                    "algorithm": algo,
                    "config": f"{args.n}x({args.d}->{args.k})",
                    "seconds": round(dt, 4),
                    "objective": round(float(
                        lasso_objective(xs_np[-1], W_np, z_np,
                                        args.alpha)), 3),
                }), flush=True)
            except Exception as e:
                print(json.dumps({
                    "system": "pytorch-lasso[cpu]", "algorithm": algo,
                    "error": str(e).splitlines()[0][:120]}), flush=True)

        # OMP has no reference counterpart; sklearn's orthogonal_mp is
        # the standard CPU baseline (precompute=True = Gram mode)
        try:
            from sklearn.linear_model import orthogonal_mp
            t0 = time.perf_counter()
            z_sk = orthogonal_mp(W_np, xs_np[-1].T, n_nonzero_coefs=32,
                                 precompute=True).T
            dt = time.perf_counter() - t0
            print(json.dumps({
                "system": "sklearn[cpu]", "algorithm": "omp",
                "config": f"{args.n}x({args.d}->{args.k})",
                "seconds": round(dt, 4),
                "rss_per_sample": round(float(np.mean(np.sum(
                    (z_sk @ W_np.T - xs_np[-1]) ** 2, axis=1))), 4),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"system": "sklearn[cpu]",
                              "algorithm": "omp",
                              "error": str(e).splitlines()[0][:120]}),
                  flush=True)


if __name__ == "__main__":
    main()
