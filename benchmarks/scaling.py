#!/usr/bin/env python
"""Scaling harness: iterations/s and parallel efficiency across mesh sizes.

Reports the BASELINE deliverable "iterations/s efficiency at 1 chip /
1 host / N hosts". On real multi-chip hardware run as-is; on a single-host
dev box pass --virtual N to simulate an N-device CPU mesh
(xla_force_host_platform_device_count).

Prints one row per mesh size: devices, iterations/s, speedup, efficiency.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="simulate N CPU devices (dev only)")
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--alpha", type=float, default=0.1)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import numpy as np
    import jax.numpy as jnp
    from lasso_tpu.linear.solvers import ista
    from lasso_tpu.parallel import make_mesh, data_sharding, weight_sharding

    from jax.sharding import PartitionSpec as P

    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    # distinct inputs per repeat (identical re-executions can be served
    # from an execution cache on some backends)
    xs_np = [rng.standard_normal((args.n, args.d)).astype(np.float32)
             for _ in range(4)]
    W_np = (rng.standard_normal((args.d, args.k))
            / np.sqrt(args.d)).astype(np.float32)

    def bench(n_devices):
        mesh = make_mesh(n_devices=n_devices)
        x_sh = data_sharding(mesh)
        w_sh = weight_sharding(mesh)
        xs = [jax.device_put(jnp.asarray(x_np), x_sh) for x_np in xs_np]
        W = jax.device_put(jnp.asarray(W_np), w_sh)
        z0 = jax.device_put(
            jnp.zeros((args.n, args.k), jnp.float32), x_sh)
        # shard_map route (same as parallel.data_parallel_encode): local
        # shapes so the fused Pallas kernel partitions; psum convergence
        local = lambda x, z0, W: ista(x, z0, W, args.alpha, lr=0.05,
                                      maxiter=args.iters, tol=0.0,
                                      axis_name="data")
        run = jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=(P("data"), P("data"), P()),
            out_specs=P("data"), check_vma=False))
        run(xs[0], z0, W).block_until_ready()
        best = float("inf")
        for x in xs[1:]:
            t0 = time.perf_counter()
            out = run(x, z0, W)
            out.block_until_ready()
            float(out[0, 0])  # force readback
            best = min(best, time.perf_counter() - t0)
        return args.iters / best

    sizes = [s for s in [1, 2, 4, 8, 16, 32] if s <= n_dev]
    base = None
    rows = []
    for s in sizes:
        its = bench(s)
        if base is None:
            base = its
        rows.append({"devices": s, "iters_per_s": round(its, 2),
                     "speedup": round(its / base, 2),
                     "efficiency": round(its / base / s, 3)})
        print(json.dumps(rows[-1]))


if __name__ == "__main__":
    main()
