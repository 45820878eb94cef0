"""Shared bf16 split-float / rounding helpers for kernels AND solvers.

The precision machinery (bf16x3 manual split-float, interpret-mode
emulation of Mosaic's bf16 operand truncation) is used both inside the
Pallas kernels (``ops/fused_*.py``) and by XLA-land solvers that offer
``kernel_precision`` (``linear/solvers/split_bregman.py``,
``conv2d/ista.py``). It lives here so the solvers don't import a Pallas
kernel module's internals.

Two families, because the two compilation paths treat casts differently:

* Mosaic (in-kernel) honors plain dtype casts but cannot lower
  ``lax.reduce_precision`` — use :func:`split_bf16` (with
  ``emulate=True`` only in interpret mode).
* XLA-land elides ``f32->bf16->f32`` cast round-trips under
  ``--xla_allow_excess_precision`` (the axon default) but must honor
  ``lax.reduce_precision`` — use :func:`split_bf16_xla` /
  :func:`round_bf16`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def round_bf16(a):
    """Round f32 values onto the bf16 grid, keeping f32 dtype.

    Interpret-mode TPU-numerics emulation: on real hardware Mosaic's
    DEFAULT dot precision truncates f32 dot operands to one bf16 pass
    (f32 accumulate). In interpret mode the same dot runs through XLA
    CPU at full f32 — and plain ``astype(bfloat16)`` round-trips are
    ELIDED under XLA's default excess-precision rules — so without this
    the 'bf16' and 'f32' kernel modes execute identical f32 arithmetic
    on CPU and precision tests validate nothing. ``lax.reduce_precision``
    is an explicit rounding op the compiler must honor; applying it to
    dot operands reproduces MXU semantics (bf16-rounded operands, f32
    accumulate) up to dot ordering. Mosaic cannot lower
    reduce_precision, so in-kernel uses are built only when
    ``interpret``; XLA-land solvers use it directly (it is exactly the
    explicit rounding they need).
    """
    return jax.lax.reduce_precision(a, exponent_bits=8, mantissa_bits=7)


def split_bf16(a, emulate=False):
    """Split f32 into bf16 high + bf16 residual parts (Mosaic/in-kernel).

    Plain dtype casts: Mosaic lowers these as real conversions. Do NOT use
    this variant in XLA-land (see :func:`split_bf16_xla`).

    ``emulate=True`` (interpret mode only): the same split via
    ``lax.reduce_precision``, which XLA CPU cannot elide — the parts stay
    f32-dtyped but carry bf16-grid values (see :func:`round_bf16`).
    """
    if emulate:
        hi = round_bf16(a)
        lo = round_bf16(a - hi)
        return hi, lo
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def split_bf16_xla(a):
    """Split f32 into bf16 high + residual parts, safe under XLA.

    Under ``--xla_allow_excess_precision`` XLA elides f32->bf16->f32
    convert chains, which silently zeroes the residual term and degrades
    the scheme to plain bf16 (observed on v5e). ``lax.reduce_precision``
    is an explicit rounding op the compiler must honor (but which Mosaic
    cannot lower — hence the two variants).
    """
    a_hi = jax.lax.reduce_precision(a, exponent_bits=8, mantissa_bits=7)
    lo = jax.lax.reduce_precision(a - a_hi, exponent_bits=8, mantissa_bits=7)
    return a_hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


def dot_nt(a, b):
    """a[M, K] . b[N, K]^T -> [M, N], bf16 inputs, f32 accumulate."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def dot_nn(a, b):
    """a[M, K] . b[K, N] -> [M, N], bf16 inputs, f32 accumulate."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
