#!/usr/bin/env python
"""Screened-serving micro-batch latency: screened_encode vs full-K solve.

The gap-safe screen only pays when the union support of the micro-batch
sits well under K (strongly-sparse serving alphas on a learned
dictionary — CLAUDE.md: union supports stay full below ~90% sparsity).
This harness measures the honest end-to-end request latency of both
paths on dictionary-generated micro-batches across alphas, INCLUDING the
screen's host sync. Distinct inputs per repeat. One JSON line per
(alpha, batch) config.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_export_bench(args):
    """AOT-exported-encoder serving path (VERDICT r4 item 7): export ->
    deserialize -> execute on this backend, vs the live-jitted encoder,
    plus the full serving composition encode -> native CSR pack. One
    JSON line."""
    import jax
    import jax.numpy as jnp
    from lasso_tpu.linear import sparse_encode
    from lasso_tpu.native import have_native, pack_codes_csr
    from lasso_tpu.utils.export import export_encoder, load_encoder

    rng = np.random.default_rng(0)
    D, K, B = args.d, args.k, args.batch
    W = rng.standard_normal((D, K)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    Wj = jnp.asarray(W)
    kw = dict(algorithm="ista", maxiter=args.maxiter, tol=1e-7)

    t0 = time.perf_counter()
    blob = export_encoder(Wj, alpha=1.0, batch_size=B, **kw)
    t_export = time.perf_counter() - t0
    call = load_encoder(blob)

    jitted = jax.jit(lambda x, w: sparse_encode(x, w, 1.0, **kw))

    xs = [jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
          for _ in range(args.repeats + 1)]
    # warm both paths (compile / first-dispatch)
    jax.block_until_ready(jitted(xs[0], Wj))
    jax.block_until_ready(call(xs[0], Wj))

    t_jit, t_exp, t_e2e = [], [], []
    for i in range(1, args.repeats + 1):
        t0 = time.perf_counter()
        z = jitted(xs[i], Wj)
        z.block_until_ready(); float(z[0, 0])
        t_jit.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        z2 = call(xs[i], Wj)
        z2.block_until_ready(); float(z2[0, 0])
        t_exp.append(time.perf_counter() - t0)

        # full serving response: exported encode -> host CSR pack
        t0 = time.perf_counter()
        z3 = call(xs[i], Wj)
        vals, cols, rp = pack_codes_csr(np.asarray(z3), eps=0.0)
        t_e2e.append(time.perf_counter() - t0)

    # parity of the exported artifact vs the live path
    gap = float(jnp.max(jnp.abs(z2 - z)))
    print(json.dumps({
        "mode": "export", "batch": B, "D": D, "K": K,
        "backend": jax.default_backend(),
        "export_s": round(t_export, 2),
        "blob_mb": round(len(blob) / 2 ** 20, 2),
        "jit_ms": round(1e3 * min(t_jit), 2),
        "exported_ms": round(1e3 * min(t_exp), 2),
        "e2e_csr_ms": round(1e3 * min(t_e2e), 2),
        "native_csr": have_native(),
        "nnz": int(rp[-1]),
        "max_abs_diff": gap,
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--maxiter", type=int, default=300)
    ap.add_argument("--export", action="store_true",
                    help="measure the AOT-exported encoder serving path "
                         "instead of the screening comparison")
    args = ap.parse_args()
    if args.export:
        return run_export_bench(args)

    import jax
    import jax.numpy as jnp
    from lasso_tpu.linear import screened_encode, sparse_encode

    rng = np.random.default_rng(0)
    D, K, B = args.d, args.k, args.batch
    W = rng.standard_normal((D, K)).astype(np.float32)
    W /= np.linalg.norm(W, axis=0, keepdims=True)
    Wj = jnp.asarray(W)

    def micro_batch(i):
        # dictionary-generated requests: s-sparse codes + noise
        z = np.zeros((B, K), np.float32)
        for r in range(B):
            idx = rng.choice(K, size=8, replace=False)
            z[r, idx] = rng.standard_normal(8)
        x = z @ W.T + 0.02 * rng.standard_normal((B, D))
        return jnp.asarray(x.astype(np.float32))

    for alpha in (0.5, 1.0, 2.0):
        xs = [micro_batch(i) for i in range(args.repeats + 1)]
        full = jax.jit(lambda x: sparse_encode(
            x, Wj, alpha, algorithm="ista", maxiter=args.maxiter,
            tol=1e-7))
        full(xs[0]).block_until_ready()
        # warm the screened path's jitted stages (incl. likely buckets)
        screened_encode(xs[0], Wj, alpha, warm_iters=20, bucket=128,
                        maxiter=args.maxiter, tol=1e-7)

        t_full, t_scr, kept = [], [], []
        for i in range(1, args.repeats + 1):
            t0 = time.perf_counter()
            z = full(xs[i])
            z.block_until_ready(); float(z[0, 0])
            t_full.append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            z2, info = screened_encode(xs[i], Wj, alpha, warm_iters=20,
                                       bucket=128, maxiter=args.maxiter,
                                       tol=1e-7)
            z2.block_until_ready(); float(z2[0, 0])
            t_scr.append(time.perf_counter() - t0)
            kept.append(info["kept"])

        print(json.dumps({
            "alpha": alpha, "batch": B, "K": K,
            "full_ms": round(1e3 * min(t_full), 2),
            "screened_ms": round(1e3 * min(t_scr), 2),
            "kept_atoms": int(np.median(kept)),
            "speedup": round(min(t_full) / min(t_scr), 2),
        }))


if __name__ == "__main__":
    main()
