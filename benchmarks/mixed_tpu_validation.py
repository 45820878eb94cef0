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

``--tails`` instead sweeps the SUB-BLOCK f32 tail (ista(mixed_tail_iters
=N), VERDICT r3 item 4) on hardware: accuracy (f64 objective gap vs the
all-f32 run) AND throughput per tail length — the Pareto that picks the
headline default. Throughput timed on distinct inputs, rep 0 discarded.
"""

import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _setup():
    import jax.numpy as jnp
    from lasso_tpu.linalg import lipschitz_constant

    N, D, K = 16384, 512, 2048
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
        return 0.5 * np.sum(r * r) + 0.1 * np.sum(np.abs(z64))

    return x, W, z0, lr, obj64


def main():
    import jax
    from lasso_tpu.linear.solvers import ista

    ALPHA = 0.1
    x, W, z0, lr, obj64 = _setup()

    for iters in (200, 800):
        objs = {}
        for kp in ("f32", "mixed", "bf16"):
            t0 = time.perf_counter()
            z = jax.jit(lambda x, z0, W, kp=kp, iters=iters: ista(
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


def tails(iters=200, tail_list=(4, 8, 12, 18, 25, 37, 50)):
    """Hardware Pareto of the sub-block f32 tail at the headline config."""
    import jax
    import jax.numpy as jnp
    from lasso_tpu.linear.solvers import ista

    ALPHA, REPS = 0.1, 4
    x, W, z0, lr, obj64 = _setup()
    rng = np.random.default_rng(7)
    xs = [jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
          for _ in range(REPS)]

    def measure(label, **kw):
        run = jax.jit(lambda x, z0, W: ista(
            x, z0, W, ALPHA, lr=lr, maxiter=iters, tol=0.0, **kw))
        z = run(x, z0, W)
        z.block_until_ready()
        gap_obj = obj64(z)
        times = []
        for xr in xs:
            t0 = time.perf_counter()
            out = run(xr, z0, W)
            out.block_until_ready()
            float(out[0, 0])
            times.append(time.perf_counter() - t0)
        rate = iters / min(times[1:])
        return gap_obj, rate

    f_f32, rate_f32 = measure("f32")
    print(f"tail sweep @ {iters} iters  (f32 anchor obj {f_f32:.10e}, "
          f"{rate_f32:.1f} it/s)", flush=True)
    f_b, rate_b = measure("bf16", kernel_precision="bf16")
    print(f"tail=  0 (bf16): rel_obj {(f_b-f_f32)/abs(f_f32):+.3e}  "
          f"{rate_b:7.1f} it/s", flush=True)
    for t in tail_list:
        if t > iters:
            continue
        f_t, rate_t = measure(f"tail={t}", kernel_precision="mixed",
                              mixed_tail_iters=t)
        print(f"tail={t:4d}      : rel_obj {(f_t-f_f32)/abs(f_f32):+.3e}  "
              f"{rate_t:7.1f} it/s", flush=True)


if __name__ == "__main__":
    if "--tails" in sys.argv:
        tails()
    else:
        main()
