"""On-hardware certification of the mixed-precision tail schedule.

The CPU test matrix runs the Pallas kernels in interpret mode, where
XLA CPU's default excess-precision elision REMOVES the kernel's
f32->bf16 operand casts — interpret-mode 'bf16' and 'mixed' execute f32
arithmetic, so CPU tests cannot distinguish precision schedules. Mosaic
on real TPU hardware honors the casts, so the tail-length question
("does one f32 block contract the bf16 phase's rounding?") can only be
answered here.

Runs f32 / mixed / bf16 at headline shapes on the TPU at the 200-iter
headline budget and a converged 800-iter budget; objectives evaluated
in f64 on the host.

Usage: python benchmarks/mixed_tpu_validation.py  (TPU; ~5-10 min of
fresh compiles on first run)
"""

import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from lasso_tpu.linear.solvers import ista
    from lasso_tpu.linalg import lipschitz_constant

    N, D, K = 16384, 512, 2048
    ALPHA = 0.1
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((N, D)).astype(np.float32)
    W_np = (rng.standard_normal((D, K)) / np.sqrt(D)).astype(np.float32)
    x = jnp.asarray(x_np)
    W = jnp.asarray(W_np)
    z0 = jnp.zeros((N, K), jnp.float32)
    lr = float(1.0 / lipschitz_constant(W))

    x64 = x_np.astype(np.float64)
    W64 = W_np.astype(np.float64)

    def obj64(z):
        z64 = np.asarray(z, np.float64)
        r = z64 @ W64.T - x64
        return 0.5 * np.sum(r * r) + ALPHA * np.sum(np.abs(z64))

    for iters in (200, 800):
        objs = {}
        for kp in ("f32", "mixed", "bf16"):
            t0 = time.perf_counter()
            z = jax.jit(lambda x, z0, W, kp=kp: ista(
                x, z0, W, ALPHA, lr=lr, maxiter=iters, tol=0.0,
                kernel_precision=kp))(x, z0, W)
            z.block_until_ready()
            objs[kp] = obj64(z)
            print(f"iters={iters} {kp:5s}: obj {objs[kp]:.10e} "
                  f"({time.perf_counter() - t0:.1f}s incl compile)",
                  flush=True)
        f = objs["f32"]
        print(f"iters={iters}: rel(mixed-f32) {(objs['mixed']-f)/abs(f):+.3e}"
              f"  rel(bf16-f32) {(objs['bf16']-f)/abs(f):+.3e}", flush=True)


if __name__ == "__main__":
    main()
