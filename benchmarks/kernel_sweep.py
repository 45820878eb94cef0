#!/usr/bin/env python
"""Sweep fused-FISTA kernel variants on the real TPU.

Times the steady-state per-iteration cost of the fused step for a grid of
(block_n, kernel_precision) choices, with the honest-benchmark rules from
CLAUDE.md: distinct inputs per repeat, forced readback, loop fully on
device (lax.fori_loop around the kernel).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N, D, K = 16384, 512, 2048
ITERS = 100


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from lasso_tpu.ops.fused_ista import fused_fista_step

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
          for _ in range(3)]
    W = jnp.asarray(
        (rng.standard_normal((D, K)) / np.sqrt(D)).astype(np.float32))
    z0 = jnp.zeros((N, K), jnp.float32)

    def make_run(block_n, kp):
        def run(x, z, zp, W):
            def body(i, carry):
                z, zp = carry
                z_new, _ = fused_fista_step(
                    x, z, zp, W, 0.05, 0.1, 0.5,
                    block_n=block_n, kernel_precision=kp)
                return (z_new, z)
            return lax.fori_loop(0, ITERS, body, (z, zp))[0]
        return jax.jit(run)

    for kp in ("bf16", "f32"):
        for block_n in (128, 256, 512, 1024, 2048):
            try:
                run = make_run(block_n, kp)
                run(xs[0], z0, z0, W).block_until_ready()  # compile
                ts = []
                for x in xs:
                    t0 = time.perf_counter()
                    out = run(x, z0, z0, W)
                    float(out[0, 0])  # force readback
                    ts.append(time.perf_counter() - t0)
                best = min(ts)
                print(f"{kp:5s} block_n={block_n:5d}: "
                      f"{ITERS / best:8.1f} it/s  "
                      f"({1e3 * best / ITERS:.3f} ms/iter)", flush=True)
            except Exception as e:
                msg = str(e).split(chr(10))[0][:120]
                print(f"{kp:5s} block_n={block_n:5d}: FAILED {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
