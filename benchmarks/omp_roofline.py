"""Fused-OMP per-iteration roofline accounting (VERDICT r4 item 4).

Times the whole-solve kernel at the headline config (16384 x (512 ->
2048), T=64) in four builds:

  select_only — the masked-argmax selection dot alone
  no_gs       — + one-hot gather, residual update, R/d bookkeeping
  mgs         — + the round-4 sequential MGS chain
  cgs2        — + the round-5 bulk two-pass classical GS (the default)

The deltas give the per-stage time split (the 'profile' builds compute
wrong results by construction — timing only). Also reports the
analytic MXU floor: the selection dot is 3 split-float [K, D] x [D, bn]
passes + 2 gather passes per iteration; at the chip's measured
~83 TF/s for FISTA-class aspect ratios that is the compute-bound
minimum for the selection stage.

Distinct inputs per repeat + forced readback, rep-0 discarded.

Usage: python benchmarks/omp_roofline.py [--t 64] [--reps 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--k", type=int, default=2048)
    ap.add_argument("--t", type=int, default=64)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lasso_tpu.ops.fused_omp import fused_omp_solve

    N, D, K, T = args.n, args.d, args.k, args.t
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
          for _ in range(args.reps + 1)]
    W_np = rng.standard_normal((D, K)).astype(np.float32)
    W_np /= np.linalg.norm(W_np, axis=0, keepdims=True)
    W = jnp.asarray(W_np)

    results = {}
    variants = [
        ("select_only", dict(profile="select_only")),
        ("no_gs", dict(profile="no_gs")),
        ("mgs", dict(gs="mgs")),
        ("mgs-bf16", dict(gs="mgs", kernel_precision="bf16")),
        ("cgs2", dict(gs="cgs2")),
    ]
    for label, kws in variants:
        run = jax.jit(lambda x, W, kws=kws: fused_omp_solve(
            x, W, T, **kws))
        t0 = time.perf_counter()
        out = run(xs[0], W)
        jax.block_until_ready(out)
        print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        times = []
        for i in range(1, args.reps + 1):
            t0 = time.perf_counter()
            idx, valid, z_s = run(xs[i], W)
            jax.block_until_ready((idx, valid, z_s))
            float(z_s[0, 0])
            times.append(time.perf_counter() - t0)
        best = min(times[1:]) if len(times) > 1 else times[0]
        results[label] = best
        rss = None
        if kws.get("profile") is None:
            z = np.zeros((N, K), np.float32)
            np.add.at(z, (np.arange(N)[:, None], np.asarray(idx)),
                      np.asarray(z_s))
            rss = float(np.mean(np.sum((z @ W_np.T - np.asarray(xs[-1],
                        np.float32)) ** 2, axis=1)))
        print(f"{label}: {best:.3f} s/solve  {best / T * 1e3:.2f} ms/iter"
              + (f"  rss/sample {rss:.4f}" if rss is not None else "")
              + f"  (times {['%.3f' % t for t in times]})", flush=True)

    # analytic MXU floors (83 TF/s = the chip's measured rate at
    # FISTA-class aspect ratios, benchmarks/matmul_roofline.py)
    sel_floor = 3 * 2 * K * D * N / 83e12          # 3 split-float passes
    gather_floor = 2 * 2 * D * K * N / 83e12       # 2-pass one-hot
    sel = results.get("select_only")
    nog = results.get("no_gs")
    if sel is not None:
        print(f"selection stage: {sel / T * 1e3:.2f} ms/iter measured vs "
              f"{sel_floor * 1e3:.2f} ms/iter MXU floor", flush=True)
    if sel is not None and nog is not None:
        print(f"gather+residual stage: {(nog - sel) / T * 1e3:.2f} ms/iter "
              f"measured vs {gather_floor * 1e3:.2f} ms/iter gather MXU "
              f"floor", flush=True)
    for name in ("mgs", "cgs2"):
        if name in results and nog is not None:
            print(f"{name} GS stage: {(results[name] - nog) / T * 1e3:.2f}"
                  f" ms/iter ({100 * (results[name] - nog) / results[name]:.0f}%"
                  f" of {name} total)", flush=True)


if __name__ == "__main__":
    main()
