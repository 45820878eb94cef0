#!/usr/bin/env python
"""Convolutional sparse coding with `ista_conv2d`.

Builds a bank of oriented-edge filters, synthesizes images as sparse
combinations of those filters placed at random locations, then recovers
the (shift-invariant) sparse feature maps with convolutional FISTA and
reports reconstruction quality + code sparsity. Exercises both Lipschitz
estimators (exact power iteration vs the Araujo Toeplitz bound).

Run: python examples/conv_sparse_coding.py [--n 64] [--size 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def edge_filters(n_filters=16, ks=7):
    """Oriented Gabor-ish edges, unit-normalized, [C, 1, ks, ks]."""
    ang = np.linspace(0, np.pi, n_filters, endpoint=False)
    yy, xx = np.mgrid[-(ks // 2):ks // 2 + 1, -(ks // 2):ks // 2 + 1]
    bank = []
    for a in ang:
        u = xx * np.cos(a) + yy * np.sin(a)
        v = -xx * np.sin(a) + yy * np.cos(a)
        f = np.exp(-(u ** 2 + v ** 2) / (2 * (ks / 4) ** 2)) * np.sin(
            2 * np.pi * u / ks)
        bank.append(f / np.linalg.norm(f))
    return np.asarray(bank, np.float32)[:, None]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--filters", type=int, default=16)
    ap.add_argument("--ks", type=int, default=7)
    ap.add_argument("--alpha", type=float, default=0.1)
    ap.add_argument("--maxiter", type=int, default=300)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lasso_tpu.conv2d import ista_conv2d, conv_transpose2d
    from lasso_tpu.conv2d.lip_const import lip_bound_conv2d, lip_constant

    rng = np.random.default_rng(0)
    Wk = jnp.asarray(edge_filters(args.filters, args.ks))
    Hz = args.size - args.ks + 1

    # ground-truth sparse codes -> images
    z_true = np.zeros((args.n, args.filters, Hz, Hz), np.float32)
    for i in range(args.n):
        for _ in range(6):
            c = rng.integers(args.filters)
            y0, x0 = rng.integers(Hz, size=2)
            z_true[i, c, y0, x0] = rng.uniform(0.5, 2.0)
    x = conv_transpose2d(jnp.asarray(z_true), Wk)
    x = x + 0.01 * jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

    L_exact = float(lip_constant(Wk, imsize=(Hz, Hz)))
    L_bound = float(lip_bound_conv2d(Wk, padding=args.ks - 1))
    print(f"Lipschitz: exact {L_exact:.4f}  Araujo bound {L_bound:.4f} "
          f"(bound must dominate: {L_bound >= L_exact})")

    z0 = jnp.zeros_like(jnp.asarray(z_true))
    run = jax.jit(lambda x, z0: ista_conv2d(
        x, z0, Wk, alpha=args.alpha, maxiter=args.maxiter, tol=1e-7))
    z = run(x, z0)
    jax.block_until_ready(z)
    t0 = time.perf_counter()
    z = run(x, z0)
    jax.block_until_ready(z)
    dt = time.perf_counter() - t0

    x_hat = conv_transpose2d(z, Wk)
    rel_err = float(jnp.linalg.norm(x_hat - x) / jnp.linalg.norm(x))
    sparsity = float((jnp.abs(z) < 1e-6).mean())
    print(f"conv FISTA: {dt:.3f}s  rel recon err {rel_err:.4f}  "
          f"code sparsity {sparsity:.4f}")

    # --- learn the filter bank from scratch (conv dictionary learning) ---
    from lasso_tpu.conv2d import conv_dict_learning, conv_lasso_loss, conv2d

    t0 = time.perf_counter()
    W_learn, losses = conv_dict_learning(
        x, n_filters=args.filters, kernel_size=args.ks, alpha=args.alpha,
        steps=15, maxiter=100, key=jax.random.PRNGKey(0))
    jax.block_until_ready(W_learn)
    dt = time.perf_counter() - t0
    losses = np.asarray(losses)

    # compare codability: learned filters vs the generating bank
    def enc_loss(W):
        z0 = jnp.zeros_like(conv2d(x, W))
        zz = ista_conv2d(x, z0, W, alpha=args.alpha, maxiter=args.maxiter)
        return float(conv_lasso_loss(x, zz, W, args.alpha))

    print(f"conv dict learning: {dt:.3f}s for 15 EM steps; loss "
          f"{losses[0]:.4f} -> {losses[-1]:.4f}")
    print(f"encode loss with learned filters {enc_loss(W_learn):.4f} "
          f"vs generating bank {enc_loss(Wk):.4f}")


if __name__ == "__main__":
    main()
