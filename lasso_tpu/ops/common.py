"""Shared dense-op helpers used by every solver."""

from __future__ import annotations

import jax.numpy as jnp

from lasso_tpu.config import get_precision


def resolve_pallas(use_pallas, supported):
    """Shared Pallas-routing policy: resolve ``use_pallas`` ('auto' /
    True / False) against a shape-support predicate result.

    Returns ``(enabled, interpret)``: 'auto' enables only on real TPU
    backends; True forces the kernel (interpreted off-TPU, for tests);
    False always takes the plain XLA path.
    """
    import jax

    if use_pallas == "auto":
        return (jax.default_backend() == "tpu" and supported), False
    if use_pallas:
        return supported, jax.default_backend() != "tpu"
    return False, False


def matmul(a, b, precision=None):
    """Matmul at the library's default (fp32) precision on the MXU."""
    return jnp.matmul(a, b, precision=get_precision(precision))


def l1_norm(x):
    return jnp.sum(jnp.abs(x))


def sq_norm(x):
    return jnp.sum(jnp.square(x))
