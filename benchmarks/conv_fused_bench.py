"""Conv FISTA: fused multi-step Pallas kernel vs the XLA path (VERDICT
r3 item 1) at the conv headline config (BASELINE.md #5: 256x1x32x32
images, 64 atoms 7x7, stride 1, padding 0).

Distinct inputs per repeat + forced readback (execution-cache honest),
rep-0 discarded (fresh-compile spike gotcha, CLAUDE.md).

Usage: python benchmarks/conv_fused_bench.py [--iters 200]
       python benchmarks/conv_fused_bench.py --config rich
       (``rich`` = the channel-rich 64x16x32x32 / 256-atom 5x5 config of
       benchmarks/conv_precision_bench.py — exercises Cx>1 multi-channel
       folds and a small per-invocation batch tile.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--config", choices=["headline", "rich", "rich7"],
                    default="headline")
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset of variant labels")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lasso_tpu.conv2d.ista import ista_conv2d

    if args.config == "rich":
        N, Cz, Cx, kh, kw = 64, 256, 16, 5, 5
    elif args.config == "rich7":
        # rows = 32*7*8 = 1792 > the old 1024 gate: the config the
        # round-5 gate lift unlocks (auto fuse_steps capped at 4)
        N, Cz, Cx, kh, kw = 64, 128, 32, 7, 7
    else:
        N, Cz, Cx, kh, kw = 256, 64, 1, 7, 7
    H = W = 32
    Hz, Wz = H - kh + 1, W - kw + 1
    ALPHA = 0.1
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((N, Cx, H, W)), jnp.float32)
          for _ in range(args.reps + 1)]
    Wk = jnp.asarray(
        rng.standard_normal((Cz, Cx, kh, kw)).astype(np.float32) / kh)
    z0 = jnp.zeros((N, Cz, Hz, Wz), jnp.float32)

    from lasso_tpu.conv2d.lip_const import lip_bound_conv2d
    lr = float(1.0 / lip_bound_conv2d(Wk, 0))

    x64 = np.asarray(xs[1], np.float64)

    def obj64(z):
        from lasso_tpu.conv2d.ops import conv_transpose2d
        xh = np.asarray(conv_transpose2d(z, Wk), np.float64)
        zn = np.asarray(z, np.float64)
        return 0.5 * np.sum((xh - x64) ** 2) + ALPHA * np.sum(np.abs(zn))

    results = {}
    keep = set(args.variants.split(",")) if args.variants else None
    for label, kws in [
        ("xla-f32", dict(use_pallas=False)),
        ("xla-mixed", dict(use_pallas=False, kernel_precision="mixed")),
        ("fused-f32", dict(use_pallas=True)),
        ("fused-bf16", dict(use_pallas=True, kernel_precision="bf16")),
        ("fused-mixed", dict(use_pallas=True, kernel_precision="mixed")),
        ("fused-restart", dict(use_pallas=True, restart=True)),
    ]:
        if keep is not None and label not in keep:
            continue
        run = jax.jit(lambda x, z0, W, kws=kws: ista_conv2d(
            x, z0, W, ALPHA, lr=lr, maxiter=args.iters, tol=0.0, **kws))
        t0 = time.perf_counter()
        out = run(xs[0], z0, Wk)
        out.block_until_ready()
        print(f"{label}: compile+first {time.perf_counter()-t0:.1f}s",
              flush=True)
        times = []
        for i in range(1, args.reps + 1):
            t0 = time.perf_counter()
            out = run(xs[i], z0, Wk)
            out.block_until_ready()
            float(out[0, 0, 0, 0])
            times.append(time.perf_counter() - t0)
        best = min(times[1:]) if len(times) > 1 else times[0]
        rate = args.iters / best
        results[label] = rate
        print(f"{label}: {rate:.1f} it/s  (times {['%.3f' % t for t in times]})"
              f"  obj64 {obj64(out):.8e}", flush=True)

    base = results.get("xla-f32")
    for k, v in results.items():
        print(f"{k:12s} {v:8.1f} it/s  {v / base:.2f}x vs xla-f32")


if __name__ == "__main__":
    main()
