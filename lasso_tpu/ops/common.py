"""Shared dense-op helpers used by every solver."""

from __future__ import annotations

import jax.numpy as jnp

from lasso_tpu.config import get_precision


def matmul(a, b, precision=None):
    """Matmul at the library's default (fp32) precision on the MXU."""
    return jnp.matmul(a, b, precision=get_precision(precision))


def l1_norm(x):
    return jnp.sum(jnp.abs(x))


def sq_norm(x):
    return jnp.sum(jnp.square(x))
