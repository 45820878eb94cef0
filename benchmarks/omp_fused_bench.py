"""Whole-solve fused OMP kernel vs the while_loop paths (VERDICT r3
item 2) at the OMP headline: 16384 x (512 -> 2048), T = 64.

Honest-timing rules (CLAUDE.md): distinct inputs per rep, rep 0
discarded, forced readback, the whole solve on device.

Usage: python benchmarks/omp_fused_bench.py [--t 64] [--reps 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=64)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--k", type=int, default=2048)
    args = ap.parse_args()
    N, D, K, T = args.n, args.d, args.k, args.t

    import jax
    import jax.numpy as jnp
    from lasso_tpu.linear.solvers.omp import orthogonal_matching_pursuit

    rng = np.random.default_rng(0)
    W = rng.standard_normal((D, K)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    W = jnp.asarray(W)
    xs = [jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
          for _ in range(args.reps + 1)]

    def rss(x, z):
        return float(jnp.mean(jnp.sum(jnp.square(x - z @ W.T), axis=1)))

    results = {}
    for label, kws in [
        ("chol (r3 default)", dict(solver="chol")),
        ("fused-f32", dict(solver="fused")),
        ("fused-bf16", dict(solver="fused", kernel_precision="bf16")),
    ]:
        run = jax.jit(lambda x, kws=kws: orthogonal_matching_pursuit(
            x, W, T, **kws))
        t0 = time.perf_counter()
        out = run(xs[0])
        out.block_until_ready()
        print(f"{label}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        times = []
        for i in range(1, args.reps + 1):
            t0 = time.perf_counter()
            out = run(xs[i])
            out.block_until_ready()
            float(out[0, 0])
            times.append(time.perf_counter() - t0)
        best = min(times[1:]) if len(times) > 1 else times[0]
        results[label] = best
        print(f"{label}: {best:.3f} s/solve  ({best/T*1e3:.1f} ms/iter)  "
              f"times {['%.3f' % t for t in times]}  "
              f"rss {rss(xs[args.reps], out):.5f}  "
              f"nnz {float(jnp.mean(jnp.sum(out != 0, axis=1))):.1f}",
              flush=True)

    base = results.get("chol (r3 default)")
    for k, v in results.items():
        print(f"{k:20s} {v:7.3f} s  {base / v:.2f}x vs chol")


if __name__ == "__main__":
    main()
