"""Conv FISTA precision-continuation benchmark (BASELINE #5 config).

Measures ista_conv2d at 256x1x32x32 with 64 7x7 atoms (the config whose
reference torch-CPU rate is 2.35 it/s) for kernel_precision f32 / mixed
/ bf16, distinct inputs per repeat, plus the f64-evaluated final
objective of each mode so the speed/accuracy trade is recorded
honestly in one place.

Usage: python benchmarks/conv_precision_bench.py   (TPU)
"""

import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ALPHA = 0.05
ITERS = 200

# (N, C_z, C_x, H, k): the BASELINE #5 config (C_x=1 — MXU-hostile,
# bandwidth-bound, precision is nearly free) and a channel-rich config
# where the convs are matmul-bound and the precision lever bites
CONFIGS = [
    ("baseline#5", 256, 64, 1, 32, 7),
    ("channel-rich", 64, 256, 16, 32, 5),
]


def bench_config(name, N, CZ, CX, H, KS):
    import jax
    import jax.numpy as jnp
    from lasso_tpu.conv2d import ista_conv2d, conv_transpose2d

    rng = np.random.default_rng(0)
    k_np = (rng.standard_normal((CZ, CX, KS, KS)) * 0.1).astype(np.float32)
    k = jnp.asarray(k_np)
    pad = KS // 2
    xs = [jnp.asarray(rng.standard_normal((N, CX, H, H)), jnp.float32)
          for _ in range(5)]
    z0 = jnp.zeros((N, CZ, H, H), jnp.float32)

    def obj64(x, z):
        with jax.enable_x64():
            z64 = jnp.asarray(np.asarray(z, np.float64))
            xh = conv_transpose2d(z64, jnp.asarray(k_np.astype(np.float64)),
                                  padding=pad)
            return float(0.5 * jnp.sum(jnp.square(
                xh - jnp.asarray(np.asarray(x, np.float64))))
                + ALPHA * jnp.sum(jnp.abs(z64)))

    for kp in ("f32", "mixed", "bf16"):
        run = jax.jit(lambda x, z0, kp=kp: ista_conv2d(
            x, z0, k, alpha=ALPHA, padding=pad, maxiter=ITERS, tol=0.0,
            lr="auto", kernel_precision=kp))
        out = run(xs[0], z0)
        out.block_until_ready()
        times = []
        for i in range(1, 5):
            t0 = time.perf_counter()
            o = run(xs[i], z0)
            o.block_until_ready()
            float(o[0, 0, 0, 0])
            times.append(time.perf_counter() - t0)
        print(f"{name} {kp:5s}: {ITERS / min(times):8.1f} it/s   "
              f"obj64(last input) {obj64(xs[4], o):.6e}", flush=True)


def main():
    for cfg in CONFIGS:
        bench_config(*cfg)


if __name__ == "__main__":
    main()
