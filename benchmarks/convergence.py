#!/usr/bin/env python
"""Time-to-objective-gap harness (the second half of the BASELINE metric).

Measures wall-clock time for batched FISTA to reach a relative objective
gap <= --gap (default 1e-6) against a converged reference objective, for
this framework on the current backend and (optionally, --reference) for
pytorch-lasso on CPU.

Prints one JSON line per measured system.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--alpha", type=float, default=0.1)
    ap.add_argument("--gap", type=float, default=1e-6)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--max-chunks", type=int, default=200)
    ap.add_argument("--reference", action="store_true",
                    help="also measure pytorch-lasso on CPU")
    ap.add_argument("--restart", action="store_true",
                    help="per-row adaptive momentum restart (the "
                         "algorithmic time-to-gap lever; see ista(restart=))")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lasso_tpu.linalg import lipschitz_constant
    from lasso_tpu.ops.fused_ista import (fista_step_reference,
                                          fused_fista_multistep,
                                          supports_fused_step)

    rng = np.random.default_rng(0)
    x_np = rng.standard_normal((args.n, args.d)).astype(np.float32)
    W_np = (rng.standard_normal((args.d, args.k))
            / np.sqrt(args.d)).astype(np.float32)

    x = jnp.asarray(x_np)
    W = jnp.asarray(W_np)
    lr = float(1.0 / lipschitz_constant(W))

    fused = (jax.default_backend() == "tpu"
             and supports_fused_step(x, x @ W, W))
    # multi-step in-VMEM fusion: largest divisor of the chunk size <= 32
    S = next((s for s in range(min(32, args.chunk), 0, -1)
              if args.chunk % s == 0), 1) if fused else 1

    if args.restart:
        from lasso_tpu.ops.shrink import soft_threshold
        lr_s = jnp.broadcast_to(jnp.float32(lr), (S,))
        th_s = lr_s * jnp.float32(args.alpha)

        @jax.jit
        def run_chunk(z, z_prev, t_vec):
            def body(_, carry):
                z, z_prev, t_vec = carry
                if fused:
                    z_next, z_pen, t_new, _ = fused_fista_multistep(
                        x, z, z_prev, W, lr_s, th_s, jnp.zeros((S,)),
                        steps=S, t_vec=t_vec)
                else:
                    t_next = (1 + jnp.sqrt(1 + 4 * t_vec * t_vec)) / 2
                    y = z + ((t_vec - 1) / t_next) * (z - z_prev)
                    g = jnp.matmul(
                        jnp.matmul(y, W.T) - x, W)
                    z_next = soft_threshold(y - lr * g, args.alpha * lr)
                    rdot = jnp.sum((y - z_next) * (z_next - z), axis=1,
                                   keepdims=True)
                    t_new = jnp.where(rdot > 0, 1.0, t_next)
                    z_pen = z
                return (z_next, z_pen, t_new)
            return jax.lax.fori_loop(0, args.chunk // S, body,
                                     (z, z_prev, t_vec))
    else:
        @jax.jit
        def run_chunk(z, z_prev, t, mom):
            def body(_, carry):
                z, z_prev, t, mom = carry
                moms = []
                for _s in range(S):
                    moms.append(mom)
                    t_next = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
                    mom = (t - 1) / t_next
                    t = t_next
                if fused:
                    z_next, z_pen, _ = fused_fista_multistep(
                        x, z, z_prev, W, lr, args.alpha * lr,
                        jnp.stack(moms), steps=S)
                else:
                    z_next, _ = fista_step_reference(x, z, z_prev, W, lr,
                                                     args.alpha, moms[0])
                    z_pen = z
                return (z_next, z_pen, t, mom)
            return jax.lax.fori_loop(0, args.chunk // S, body,
                                     (z, z_prev, t, mom))

    @jax.jit
    def objective(z):
        r = jnp.matmul(z, W.T, precision=jax.lax.Precision.HIGHEST) - x
        return 0.5 * jnp.sum(jnp.square(r)) + args.alpha * jnp.sum(jnp.abs(z))

    # converged reference objective: long run
    z = jnp.zeros((args.n, args.k), jnp.float32)
    if args.restart:
        init = (z, z, jnp.zeros((args.n, 1), jnp.float32))
    else:
        init = (z, z, jnp.float32(1), jnp.float32(0))
    state = init
    for _ in range(args.max_chunks):
        state = run_chunk(*state)
    f_star = float(objective(state[0]))

    # timed run to the gap (chunk boundaries only; compile excluded)
    state = jax.block_until_ready(run_chunk(*init))  # warm (already built)
    state = init
    t0 = time.perf_counter()
    iters = 0
    reached = None
    for _ in range(args.max_chunks):
        state = run_chunk(*state)
        iters += args.chunk
        f = float(objective(state[0]))
        if (f - f_star) <= args.gap * abs(f_star):
            reached = time.perf_counter() - t0
            break
    print(json.dumps({
        "system": f"lasso_tpu[{jax.default_backend()}]"
                  + ("+pallas" if fused else "")
                  + ("+restart" if args.restart else ""),
        "config": f"{args.n}x({args.d}->{args.k})",
        "gap": args.gap,
        "seconds_to_gap": None if reached is None else round(reached, 3),
        "iterations": iters if reached is not None else None,
        "f_star": f_star,
    }))

    if args.reference:
        sys.path.insert(0, "/root/reference")
        import scipy.optimize.optimize as soo
        if not hasattr(soo, "_status_message"):
            from scipy.optimize._optimize import _status_message
            soo._status_message = _status_message
        import torch
        from lasso.linear.solvers.ista import ista as ref_ista

        xt = torch.from_numpy(x_np)
        Wt = torch.from_numpy(W_np)

        def obj_t(z):
            r = z @ Wt.T - xt
            return float(0.5 * (r ** 2).sum()
                         + args.alpha * z.abs().sum())

        t0 = time.perf_counter()
        z_t = torch.zeros(args.n, args.k)
        iters = 0
        reached = None
        for _ in range(args.max_chunks):
            z_t = ref_ista(xt, z_t, Wt, args.alpha, lr=lr,
                           maxiter=args.chunk, tol=0.0)
            iters += args.chunk
            if (obj_t(z_t) - f_star) <= args.gap * abs(f_star):
                reached = time.perf_counter() - t0
                break
        print(json.dumps({
            "system": "pytorch-lasso[cpu]",
            "config": f"{args.n}x({args.d}->{args.k})",
            "gap": args.gap,
            "seconds_to_gap": None if reached is None else round(reached, 3),
            "iterations": iters if reached is not None else None,
        }))


if __name__ == "__main__":
    main()
