#!/usr/bin/env python
"""End-to-end production serving pipeline.

1. Train a dictionary with `dict_learning` (fused FISTA E-steps).
2. Export the encoder as an AOT-compiled StableHLO artifact
   (`export_encoder`) — the serving side needs no Python solver code.
3. Stream an out-of-memory-sized batch through the chip with
   `chunked_encode(output='csr')`, landing packed sparse codes via the
   native C++ CSR packer.

Run: python examples/serving_pipeline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from lasso_tpu import dict_learning
    from lasso_tpu.native import unpack_codes_csr
    from lasso_tpu.utils import chunked_encode, export_encoder, load_encoder

    rng = np.random.default_rng(0)
    N_train, D, K = 2048, 64, 256

    # --- 1. train ---
    X = jnp.asarray(rng.standard_normal((N_train, D)), jnp.float32)
    t0 = time.time()
    W, losses = dict_learning(X, n_components=K, alpha=0.2,
                              constrained=True, dict_update="block",
                              steps=15, maxiter=100, tol=0.0, lr=0.1)
    print(f"train: {time.time()-t0:.2f}s, loss {float(losses[0]):.4f} -> "
          f"{float(losses[-1]):.4f}")

    # --- 2. export the encoder for serving ---
    blob = export_encoder(W, alpha=0.2, algorithm="ista", batch_size=256,
                          maxiter=200, tol=1e-7, lr=0.1)
    print(f"export: {len(blob)} bytes of StableHLO")
    encode = load_encoder(blob)
    x_req = jnp.asarray(rng.standard_normal((256, D)), jnp.float32)
    z_req = encode(x_req, W)
    print(f"serve (AOT): batch {z_req.shape}, "
          f"sparsity {float(jnp.mean(jnp.abs(z_req) < 1e-6)):.3f}")

    # --- 3. bulk encode to packed sparse codes ---
    X_bulk = rng.standard_normal((10_000, D)).astype(np.float32)
    values, cols, row_ptr = chunked_encode(
        X_bulk, np.asarray(W), alpha=0.2, chunk_size=2048, maxiter=200,
        tol=0.0, lr=0.1, output="csr")
    dense_bytes = X_bulk.shape[0] * K * 4
    packed_bytes = values.nbytes + cols.nbytes + row_ptr.nbytes
    print(f"bulk: {X_bulk.shape[0]} samples -> {row_ptr[-1]} nonzeros "
          f"({1 - row_ptr[-1]/(X_bulk.shape[0]*K):.1%} sparse), "
          f"{dense_bytes/1e6:.1f} MB dense -> {packed_bytes/1e6:.1f} MB CSR")

    # decode check on a slice
    z0 = unpack_codes_csr(values[:row_ptr[10]], cols[:row_ptr[10]],
                          row_ptr[:11], K)
    rec = z0 @ np.asarray(W).T
    err = np.linalg.norm(rec - X_bulk[:10]) / np.linalg.norm(X_bulk[:10])
    print(f"decode check: rel reconstruction err {err:.3f} "
          f"(alpha-limited, expected ~0.2-0.5)")

    # --- 4. gap-safe screening for sparse micro-batches ---
    # at serving alphas the union of active atoms across a small request
    # batch can sit well under K; screened_encode certifies and drops the
    # rest, solving at a bucket-padded reduced K (falls back to full K
    # automatically when supports are dense)
    from lasso_tpu.linear import screened_encode
    x_micro = jnp.asarray(
        (np.asarray(z_req[:64]) @ np.asarray(W).T
         + 0.05 * rng.standard_normal((64, D))).astype(np.float32))
    # learned atoms correlate with every residual, so the safe sphere
    # only excludes atoms at strongly-sparse alphas (here ~90%+)
    z_scr, info = screened_encode(x_micro, W, alpha=2.0, warm_iters=100,
                                  bucket=64, maxiter=300, tol=1e-7)
    print(f"screened micro-batch: kept {info['kept']}/{info['K']} atoms "
          f"(screened={info['screened']}, "
          f"gap_max {info['gap_max']:.2e})")


if __name__ == "__main__":
    main()
