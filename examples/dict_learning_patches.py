#!/usr/bin/env python
"""Dictionary learning on image patches — the TPU-native replacement for
the reference's missing `examples/dict_learning_omniglot.ipynb` tutorial
(README.md:25 of the reference; the notebook blob is absent from its
checkout).

Generates Omniglot-like stroke images synthetically (random walks rendered
onto a grid — no dataset download, this environment has no egress),
extracts 8x8 patches, and learns an overcomplete unit-norm dictionary with
alternating FISTA encoding / per-atom updates.

Run: python examples/dict_learning_patches.py [--steps 30] [--atoms 128]
"""

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_stroke_images(n_images=200, size=28, seed=0):
    """Random-walk 'strokes' on a grid: crude Omniglot-character stand-ins."""
    rng = np.random.default_rng(seed)
    imgs = np.zeros((n_images, size, size), np.float32)
    for i in range(n_images):
        n_strokes = rng.integers(2, 5)
        for _ in range(n_strokes):
            x, y = rng.integers(4, size - 4, size=2).astype(float)
            vx, vy = rng.normal(size=2)
            for _ in range(rng.integers(8, 20)):
                xi, yi = int(round(x)), int(round(y))
                if 0 <= xi < size and 0 <= yi < size:
                    imgs[i, yi, xi] = 1.0
                    for dx, dy in ((0, 1), (1, 0)):
                        if 0 <= yi + dy < size and 0 <= xi + dx < size:
                            imgs[i, yi + dy, xi + dx] = max(
                                imgs[i, yi + dy, xi + dx], 0.5)
                vx += rng.normal() * 0.6
                vy += rng.normal() * 0.6
                n = max(1.0, np.hypot(vx, vy))
                x += vx / n * 1.5
                y += vy / n * 1.5
    return imgs


def extract_patches(imgs, patch=8, per_image=20, seed=1):
    # native C++ pipeline (multithreaded, numpy fallback without g++)
    from lasso_tpu import native
    out = native.extract_patches_random(imgs, patch=patch,
                                        per_image=per_image, seed=seed)
    # center patches (standard sparse-coding preprocessing)
    native.center_patches(out)
    keep = (out ** 2).sum(1) > 1e-3  # drop empty patches
    return out[keep]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--atoms", type=int, default=128)
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("--patch", type=int, default=8)
    ap.add_argument("--constrained", action="store_true", default=True)
    args = ap.parse_args()

    import jax.numpy as jnp
    from lasso_tpu.linear import dict_learning, dict_evaluate

    print("generating synthetic stroke images + patches ...")
    imgs = make_stroke_images()
    X = extract_patches(imgs, patch=args.patch)
    print(f"patches: {X.shape[0]} x {X.shape[1]}")

    X = jnp.asarray(X)
    t0 = time.time()
    W, losses = dict_learning(
        X, n_components=args.atoms, alpha=args.alpha,
        constrained=args.constrained, steps=args.steps,
        maxiter=200, tol=1e-7)
    losses = np.asarray(losses)
    print(f"trained {args.steps} EM steps in {time.time()-t0:.1f}s")
    print("loss trajectory:", np.round(losses[:: max(1, args.steps // 10)], 4))
    final = float(dict_evaluate(X, W, args.alpha, maxiter=500))
    print(f"final eval loss: {final:.4f} "
          f"(first-step loss {losses[0]:.4f})")

    # render the dictionary as an ascii atom grid summary
    Wn = np.asarray(W)
    print(f"dictionary: {Wn.shape}, atom norms "
          f"min={np.linalg.norm(Wn, axis=0).min():.3f} "
          f"max={np.linalg.norm(Wn, axis=0).max():.3f}")


if __name__ == "__main__":
    main()
