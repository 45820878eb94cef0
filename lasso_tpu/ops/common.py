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


def largest_aligned_divisor(n, limit, align=8):
    """Largest multiple of ``align`` that divides ``n`` and is <= limit.

    Requires ``align | n``. Used to pick Pallas batch-tile sizes: a
    multiple-of-8 (sublane) or multiple-of-128 (lane) block that exactly
    tiles the array, so ``grid * block == n`` always holds — naive
    halving of an odd divisor (e.g. 120 -> 60 -> 30 -> 15 -> 7) would
    silently under-cover the batch.
    """
    assert n % align == 0, (n, align)
    m = n // align
    d = max(1, min(limit // align, m))
    while m % d != 0:
        d -= 1
    return align * d


def matmul(a, b, precision=None):
    """Matmul at the library's default (fp32) precision on the MXU."""
    return jnp.matmul(a, b, precision=get_precision(precision))


def l1_norm(x):
    return jnp.sum(jnp.abs(x))


def sq_norm(x):
    return jnp.sum(jnp.square(x))
