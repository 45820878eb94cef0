"""Convolution primitives in the reference's (torch) layout.

The conv sparse-coding path needs an exact adjoint pair: the decoder is
``x_hat = conv_transpose2d(z, W)`` and its adjoint is ``conv2d(., W)``
(/root/reference/lasso/conv2d/ista.py:18-20). Both map onto a single XLA
``conv_general_dilated`` (MXU-tiled) with NCHW/OIHW dimension numbers; the
transpose is expressed with input dilation + flipped kernels so that the
pair is adjoint *exactly* as linear operators.

Layouts (matching torch):
    conv2d:            x [N, C_in, H, W],  kernel [C_out, C_in, kh, kw]
    conv_transpose2d:  z [N, C_in, H, W],  kernel [C_in, C_out, kh, kw]
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from lasso_tpu.config import get_precision

_DIMSPEC = ("NCHW", "OIHW", "NCHW")


def _pair(v):
    if isinstance(v, (tuple, list)):
        assert len(v) == 2
        return tuple(v)
    return (v, v)


def conv2d(x, kernel, stride=1, padding=0, precision=None):
    """torch.nn.functional.conv2d equivalent."""
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    return lax.conv_general_dilated(
        x, kernel,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=_DIMSPEC,
        precision=get_precision(precision),
    )


def conv_transpose2d(z, kernel, stride=1, padding=0, precision=None):
    """torch.nn.functional.conv_transpose2d equivalent (exact adjoint of
    :func:`conv2d` with the same kernel/stride/padding)."""
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    kh, kw = kernel.shape[-2:]
    # [C_in, C_out, kh, kw] -> flipped [C_out, C_in, kh, kw]
    k = jnp.flip(kernel, axis=(-2, -1)).swapaxes(0, 1)
    return lax.conv_general_dilated(
        z, k,
        window_strides=(1, 1),
        padding=((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw)),
        lhs_dilation=(sh, sw),
        dimension_numbers=_DIMSPEC,
        precision=get_precision(precision),
    )
