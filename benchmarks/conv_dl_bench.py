"""Conv dictionary-learning EM throughput: fused E-step vs XLA E-step
(VERDICT r4 item 1 — the regime the fused-conv gate lift unlocks).

Configs:
  headline: 256 x 1 x 32 x 32 images, 64 filters 7x7   (rows = 56)
  rich:     64 x 16 x 32 x 32 images, 256 filters 5x5  (rows = 640)
  rich7:    64 x 32 x 32 x 32 images, 128 filters 7x7  (rows = 1792 —
            OVER the old rows <= 1024 gate; fused only since round 5)

Each EM step = conv FISTA E-step (maxiter iters) + constrained filter
update (CG normal-equations refit). Distinct inputs per repeat + forced
readback; rep-0 discarded (fresh-compile spike gotcha, CLAUDE.md).

Usage: python benchmarks/conv_dl_bench.py [--config rich] [--steps 5]
       [--maxiter 30] [--reps 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=["headline", "rich", "rich7"],
                    default="rich")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--maxiter", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset (xla,fused-f32,"
                         "fused-mixed); fused split-float compiles at "
                         "channel-rich configs are ~15-30 min over the "
                         "tunnel (cached after)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lasso_tpu.conv2d.dict_learning import conv_dict_learning

    if args.config == "rich":
        N, Cx, H, W, F, k = 64, 16, 32, 32, 256, 5
    elif args.config == "rich7":
        N, Cx, H, W, F, k = 64, 32, 32, 32, 128, 7
    else:
        N, Cx, H, W, F, k = 256, 1, 32, 32, 64, 7

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((N, Cx, H, W)), jnp.float32)
          for _ in range(args.reps + 1)]

    keep = set(args.variants.split(",")) if args.variants else None
    for label, kws in [
        ("xla", dict(use_pallas=False)),
        ("fused-f32", dict(use_pallas=True)),
        ("fused-mixed", dict(use_pallas=True, kernel_precision="mixed")),
    ]:
        if keep is not None and label not in keep:
            continue
        run = jax.jit(lambda X, kws=kws: conv_dict_learning(
            X, F, k, alpha=0.1, steps=args.steps, constrained=True,
            maxiter=args.maxiter, tol=0.0, **kws))
        t0 = time.perf_counter()
        w, losses = run(xs[0])
        jax.block_until_ready((w, losses))
        print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        times, last_losses = [], None
        for i in range(1, args.reps + 1):
            t0 = time.perf_counter()
            w, losses = run(xs[i])
            jax.block_until_ready((w, losses))
            float(w[0, 0, 0, 0])
            times.append(time.perf_counter() - t0)
            last_losses = np.asarray(losses)
        best = min(times[1:]) if len(times) > 1 else times[0]
        mono = bool(np.all(np.diff(last_losses) <= 1e-6 * last_losses[:-1]))
        print(f"{label}: {args.steps / best:.3f} EM steps/s "
              f"({best:.2f}s / {args.steps} steps)  "
              f"loss[0]={last_losses[0]:.4e} loss[-1]={last_losses[-1]:.4e} "
              f"monotone={mono}  (times {['%.2f' % t for t in times]})",
              flush=True)


if __name__ == "__main__":
    main()
