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

Distinct inputs per variant are NOT used (one shared problem): the gap
comparison needs a shared f_star, and a ~30 s while_loop solve with
data-dependent iteration counts cannot be served from the backend's
identical-input cache in any meaningful way (verified: Newton counts
differ across variants). Timing discards nothing — the first timed call
per variant follows a separate compile call on the SAME input, so the
rep-0 spike (fresh-compile gotcha) is paid by the untimed warmup.

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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lasso_tpu.linear.solvers import ista
    from lasso_tpu.linear.solvers.interior_point import interior_point
    from lasso_tpu.linalg import lipschitz_constant

    N, D, K = args.n, args.d, args.k
    ALPHA = 0.1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    W_np = rng.standard_normal((D, K)).astype(np.float32)
    W_np /= np.linalg.norm(W_np, axis=0, keepdims=True)
    W = jnp.asarray(W_np)

    # deep-converged FISTA reference objective (f64 on host)
    L = float(lipschitz_constant(W))
    t0 = time.perf_counter()
    z_star = ista(x, jnp.zeros((N, K), jnp.float32), W, ALPHA, lr=1.0 / L,
                  maxiter=2000, tol=0.0, kernel_precision="mixed")
    z_star.block_until_ready()
    print(f"FISTA reference solve: {time.perf_counter() - t0:.1f}s",
          flush=True)
    x64 = np.asarray(x, np.float64)
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
    for label, kw in variants:
        run = jax.jit(lambda x, W, kw=kw: interior_point(
            x, W, alpha=ALPHA, maxiter=args.budget, tol=1e-6,
            kkt_solver="cg", return_iters=True, **kw))
        t0 = time.perf_counter()
        z, ok, k = run(x, W)
        jax.block_until_ready((z, ok, k))
        print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            z, ok, k = run(x, W)
            jax.block_until_ready((z, ok, k))
            times.append(time.perf_counter() - t0)
        gap = (obj64(z) - f_star) / abs(f_star)
        rows.append((label, min(times), int(k), gap))
        print(f"{label}: {min(times):.2f}s  newton {int(k)}  "
              f"gap {gap:.3e}  (times {['%.2f' % t for t in times]})",
              flush=True)

    print("\n| variant | wall-clock | Newton iters | rel gap |")
    print("|---|---|---|---|")
    for label, t, k, gap in rows:
        print(f"| {label} | {t:.2f} s | {k} | {gap:.2e} |")


if __name__ == "__main__":
    main()
