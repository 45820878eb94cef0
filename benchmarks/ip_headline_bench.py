"""Interior point at HEADLINE scale: mehrotra vs adaptive, CG forcing
(VERDICT r4 item 3).

Config: 16384 x (512 -> 2048), alpha=0.1, kkt_solver='cg' (the 'auto'
choice here — the Cholesky [B, D, D] build is ~17 GB). Measures
wall-clock, Newton iterations, and the relative objective gap to a
deep-converged FISTA optimum for:

  adaptive  + fixed cg_rtol (the round-2 baseline: ~36 s / 20 iters)
  adaptive  + cg_rtol='forcing'
  mehrotra  + fixed cg_rtol
  mehrotra  + cg_rtol='forcing'

Distinct inputs per repeat (the axon backend can serve identical
re-executions from a cache — CLAUDE.md); the relative-gap comparison
uses a per-input deep-converged FISTA optimum for the LAST repeat's
input. Rep 0 is discarded (first-distinct-input spike gotcha).

Usage: python benchmarks/ip_headline_bench.py [--budget 20] [--reps 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=20,
                    help="Newton iteration cap")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset of variant labels "
                         "(resumable runs on a flaky tunnel)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lasso_tpu.linear.solvers import ista
    from lasso_tpu.linear.solvers.interior_point import interior_point
    from lasso_tpu.linalg import lipschitz_constant

    N, D, K = args.n, args.d, args.k
    ALPHA = 0.1
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
          for _ in range(args.reps + 1)]
    W_np = rng.standard_normal((D, K)).astype(np.float32)
    W_np /= np.linalg.norm(W_np, axis=0, keepdims=True)
    W = jnp.asarray(W_np)

    # deep-converged FISTA reference objective for the LAST repeat's
    # input (the one every variant's gap is evaluated on), f64 on host
    L = float(lipschitz_constant(W))
    t0 = time.perf_counter()
    z_star = ista(xs[-1], jnp.zeros((N, K), jnp.float32), W, ALPHA,
                  lr=1.0 / L, maxiter=2000, tol=0.0,
                  kernel_precision="mixed")
    z_star.block_until_ready()
    print(f"FISTA reference solve: {time.perf_counter() - t0:.1f}s",
          flush=True)
    x64 = np.asarray(xs[-1], np.float64)
    W64 = np.asarray(W_np, np.float64)

    def obj64(z):
        z = np.asarray(z, np.float64)
        r = z @ W64.T - x64
        return 0.5 * np.sum(r * r) + ALPHA * np.sum(np.abs(z))

    f_star = obj64(z_star)
    print(f"f_star = {f_star:.10e}", flush=True)

    variants = [
        ("adaptive+fixed", dict(barrier_schedule="adaptive")),
        ("adaptive+forcing", dict(barrier_schedule="adaptive",
                                  cg_rtol="forcing")),
        ("mehrotra+fixed", dict(barrier_schedule="mehrotra")),
        ("mehrotra+forcing", dict(barrier_schedule="mehrotra",
                                  cg_rtol="forcing")),
    ]
    rows = []
    keep = set(args.variants.split(",")) if args.variants else None
    for label, kw in variants:
        if keep is not None and label not in keep:
            continue
        run = jax.jit(lambda x, W, kw=kw: interior_point(
            x, W, alpha=ALPHA, maxiter=args.budget, tol=1e-6,
            kkt_solver="cg", return_iters=True, **kw))
        t0 = time.perf_counter()
        z, ok, k = run(xs[0], W)
        jax.block_until_ready((z, ok, k))
        print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        times = []
        for i in range(1, args.reps + 1):
            t0 = time.perf_counter()
            z, ok, k = run(xs[i], W)
            jax.block_until_ready((z, ok, k))
            float(z[0, 0])
            times.append(time.perf_counter() - t0)
        best = min(times[1:]) if len(times) > 1 else times[0]
        gap = (obj64(z) - f_star) / abs(f_star)
        rows.append((label, best, int(k), gap))
        print(f"{label}: {best:.2f}s  newton {int(k)}  "
              f"gap {gap:.3e}  (times {['%.2f' % t for t in times]})",
              flush=True)

    print("\n| variant | wall-clock | Newton iters | rel gap |")
    print("|---|---|---|---|")
    for label, t, k, gap in rows:
        print(f"| {label} | {t:.2f} s | {k} | {gap:.2e} |")


if __name__ == "__main__":
    main()
