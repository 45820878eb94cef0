#!/usr/bin/env python
"""Measure the chip's achievable matmul TFLOP/s (the practical roofline).

Times a chain of dependent matmuls fully on device, distinct inputs per
repeat, forced readback. Reports TFLOP/s for square-ish MXU-friendly
shapes plus the two shapes used by the FISTA step.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def time_chain(M, Kc, Nc, dtype, iters=50):
        # z [M, Kc] @ W [Kc, Nc] repeatedly (dependent chain via re-use of
        # output scaled back into input shape when square; otherwise
        # alternate with the transposed weight to keep shapes closed)
        W = jnp.asarray(rng.standard_normal((Kc, Nc)), dtype)
        Wt = jnp.asarray(rng.standard_normal((Nc, Kc)), dtype)
        xs = [jnp.asarray(rng.standard_normal((M, Kc)), dtype)
              for _ in range(3)]

        def run(a, W, Wt):
            def body(i, a):
                b = jnp.matmul(a, W)   # [M, Nc]
                return jnp.matmul(b, Wt) * 1e-3  # [M, Kc], keep finite
            return lax.fori_loop(0, iters, body, a)

        f = jax.jit(run)
        f(xs[0], W, Wt).block_until_ready()
        ts = []
        for a in xs:
            t0 = time.perf_counter()
            out = f(a, W, Wt)
            float(out[0, 0])
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        flops = 2 * iters * (2 * M * Kc * Nc)  # two matmuls per body
        return flops / best / 1e12

    for dtype_name, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        for (M, Kc, Nc) in ((4096, 4096, 4096),
                            (8192, 2048, 2048),
                            (16384, 2048, 512),
                            (16384, 512, 2048)):
            tf = time_chain(M, Kc, Nc, dtype)
            print(f"{dtype_name:5s} [{M:6d},{Kc:5d}]x[{Kc:5d},{Nc:5d}]: "
                  f"{tf:7.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
