"""Global numeric configuration for lasso_tpu.

The reference library (rfeinman/pytorch-lasso) runs float32 torch ops on
CPU/GPU, where matmuls are true fp32. On TPU the MXU natively multiplies
bfloat16 tiles, so JAX's *default* matmul precision would silently truncate
inputs to bf16 — enough to break the 1e-6 objective-gap parity target for
iterative solvers. We therefore default every matmul in this library to
``lax.Precision.HIGHEST`` (multi-pass fp32 on the MXU) and expose a context
manager to trade precision for speed when the caller wants raw throughput.
"""

from __future__ import annotations

import contextlib

from jax import lax

_PRECISION_NAMES = {
    "default": lax.Precision.DEFAULT,
    "bfloat16": lax.Precision.DEFAULT,
    "float32": lax.Precision.HIGHEST,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}

_default_precision = lax.Precision.HIGHEST


def _parse_precision(p):
    if p is None:
        return _default_precision
    if isinstance(p, lax.Precision):
        return p
    if isinstance(p, str):
        try:
            return _PRECISION_NAMES[p.lower()]
        except KeyError:
            raise ValueError(
                f"unknown precision {p!r}; expected one of {sorted(_PRECISION_NAMES)}"
            ) from None
    raise TypeError(f"cannot interpret {p!r} as a matmul precision")


def get_precision(override=None) -> lax.Precision:
    """Resolve an optional per-call precision override to a lax.Precision."""
    return _parse_precision(override)


@contextlib.contextmanager
def matmul_precision(p):
    """Context manager setting the library-wide default matmul precision.

    Must be active while a function is *traced* (i.e. wrap the first call of a
    jitted function, or trace inside the context) to take effect under jit.
    """
    global _default_precision
    old = _default_precision
    _default_precision = _parse_precision(p)
    try:
        yield
    finally:
        _default_precision = old
