"""Mixed-precision f32-tail length vs error floor.

The fused multi-step kernel performs identical arithmetic regardless of
chunking, so the f32-tail-length question is purely numerical: the tail
contracts the bf16 phase's ~2e-5-relative objective floor at FISTA's
linear rate (~0.96/iter on these problems), so each added f32 iteration
multiplies the floor by ~rho until the f32 rounding floor is reached.

Runs on forced CPU in interpret mode. VALIDITY NOTE: interpret-mode
kernels only emulate TPU bf16 numerics since the round-3
``lax.reduce_precision`` emulation path (before it, XLA CPU's default
excess-precision elision silently ran every precision mode as f32 and
this experiment's first incarnation "showed" a 0-iteration tail was
fine). TPU cross-check: benchmarks/mixed_tpu_validation.py.

Usage: python benchmarks/tail_len_experiment.py
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from lasso_tpu.ops.fused_ista import fused_fista_multistep


def make_problem(seed, n, d, k, alpha):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    W = jnp.asarray((rng.standard_normal((d, k)) / np.sqrt(d)).astype(np.float32))
    z0 = jnp.zeros((n, k), jnp.float32)
    return x, W, z0


def obj(x, W, alpha, z):
    # evaluate in f64: f32 objective evaluation has ~1e-7 relative
    # rounding, coarser than the gaps being compared
    x64 = np.asarray(x, np.float64)
    W64 = np.asarray(W, np.float64)
    z64 = np.asarray(z, np.float64)
    r = z64 @ W64.T - x64
    return 0.5 * np.sum(r * r) + alpha * np.sum(np.abs(z64))


def f_star_x64(x, W, alpha, lr, maxiter=20000):
    from lasso_tpu.linear.solvers import ista
    with jax.enable_x64():
        x64 = jnp.asarray(np.asarray(x), jnp.float64)
        W64 = jnp.asarray(np.asarray(W), jnp.float64)
        z0 = jnp.zeros((x.shape[0], W.shape[1]), jnp.float64)
        z = ista(x64, z0, W64, alpha, lr=lr, maxiter=maxiter, tol=0.0,
                 use_pallas=False)
        return float(obj(x64, W64, alpha, z))


def run_schedule(x, W, z0, alpha, lr, schedule):
    """schedule: list of (precision, n_steps) chunks; momentum sequence is
    global across chunks (matches what a production split would do)."""
    z, zp = z0, z0
    t = 1.0
    moms_all = []
    total = sum(s for _, s in schedule)
    for _ in range(total):
        moms_all.append((t - 1) / ((1 + np.sqrt(1 + 4 * t * t)) / 2))
        t = (1 + np.sqrt(1 + 4 * t * t)) / 2
    idx = 0
    for kp, s in schedule:
        moms = jnp.asarray(moms_all[idx:idx + s], jnp.float32)
        lrs = jnp.full((s,), lr, jnp.float32)
        ths = jnp.full((s,), alpha * lr, jnp.float32)
        z, zp, _ = fused_fista_multistep(
            x, z, zp, W, lrs, ths, moms, steps=s, interpret=True,
            kernel_precision=kp)
        idx += s
    return z


def main():
    for (n, d, k, alpha, lr) in [
        (16, 128, 256, 0.3, 0.08),
        (16, 128, 256, 0.05, 0.08),
        (32, 256, 512, 0.1, 0.05),
    ]:
        x, W, z0 = make_problem(7, n, d, k, alpha)
        fs = f_star_x64(x, W, alpha, lr)
        budget = 800
        gap_f = (float(obj(x, W, alpha, run_schedule(
            x, W, z0, alpha, lr, [("f32", 25)] * (budget // 25)))) - fs) / abs(fs)
        print(f"== {n}x({d}->{k}) alpha={alpha}  f32 floor gap: {gap_f:.3e}")
        for T in (25, 16, 8, 4, 2, 1, 0):
            sched = [("bf16", 25)] * ((budget - T) // 25)
            rem = (budget - T) % 25
            if rem:
                sched.append(("bf16", rem))
            if T:
                sched.append(("f32", T))
            g = (float(obj(x, W, alpha, run_schedule(
                x, W, z0, alpha, lr, sched))) - fs) / abs(fs)
            print(f"   tail {T:3d} f32 iters: gap {g:.3e}  "
                  f"({'OK' if g <= gap_f * 1.1 + 1e-10 else 'DEGRADED'})")


if __name__ == "__main__":
    main()
