"""North-star-scale FISTA throughput: 98304 x (512 -> 2048), the 100k
config (VERDICT r4 item 2a — re-measure with the round-4 kit: the
37-iter sub-block f32 tail replacing the r3 1/8-block tail).

Distinct inputs per repeat + forced readback; rep-0 discarded. Data is
generated ON DEVICE (a [98304, 512] f32 upload is ~200 MB at the
tunnel's ~15 MB/s = 13 s/rep — keep it resident instead).

Usage: python benchmarks/northstar_bench.py [--iters 200] [--reps 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N, D, K = 98304, 512, 2048
ALPHA = 0.1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lasso_tpu.linear.solvers import ista
    from lasso_tpu.linalg import lipschitz_constant

    rng = np.random.default_rng(0)
    W_np = (rng.standard_normal((D, K)) / np.sqrt(D)).astype(np.float32)
    W = jnp.asarray(W_np)
    lr = float(1.0 / lipschitz_constant(W))
    z0 = jnp.zeros((N, K), jnp.float32)

    # device-resident distinct inputs: one normal draw per repeat, keyed
    keys = [jax.random.PRNGKey(i) for i in range(args.reps + 1)]
    make_x = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.float32))
    xs = [make_x(k) for k in keys]
    jax.block_until_ready(xs)

    for label, kws in [
        ("fused-f32", dict(kernel_precision="f32")),
        ("fused-mixed-t37", dict(kernel_precision="mixed",
                                 mixed_tail_iters=37)),
        ("fused-bf16", dict(kernel_precision="bf16")),
    ]:
        run = jax.jit(lambda x, z0, W, kws=kws: ista(
            x, z0, W, ALPHA, lr=lr, maxiter=args.iters, tol=0.0, **kws))
        t0 = time.perf_counter()
        out = run(xs[0], z0, W)
        out.block_until_ready()
        print(f"{label}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        times = []
        for i in range(1, args.reps + 1):
            t0 = time.perf_counter()
            out = run(xs[i], z0, W)
            out.block_until_ready()
            float(out[0, 0])
            times.append(time.perf_counter() - t0)
        best = min(times[1:]) if len(times) > 1 else times[0]
        print(f"{label}: {args.iters / best:.1f} it/s "
              f"(times {['%.2f' % t for t in times]})", flush=True)


if __name__ == "__main__":
    main()
