"""Soft-thresholding (shrinkage) operators.

TPU-native equivalent of the proximal step used throughout the reference:
``F.softshrink`` (e.g. /root/reference/lasso/linear/solvers/ista.py:90) and
its non-scalar-threshold variant (/root/reference/lasso/nonlinear/ista.py:21-23).
Pure VPU elementwise math; XLA fuses it into adjacent matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp


def soft_threshold(x, theta):
    """prox of ``theta * ||.||_1``: sign(x) * max(|x| - theta, 0).

    ``theta`` may be a scalar or any shape broadcastable against ``x``
    (the nonlinear ISTA path uses a per-sample threshold).
    """
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - theta, 0.0)


def soft_threshold_nonneg(x, theta):
    """prox of ``theta * ||.||_1 + i_{>=0}``: max(x - theta, 0).

    The one-sided shrink of the non-negative lasso (the l1 term is
    linear on the feasible orthant, so the prox is shift-then-project).
    """
    return jnp.maximum(x - theta, 0.0)


# Alias matching the torch naming used by the reference.
softshrink = soft_threshold
