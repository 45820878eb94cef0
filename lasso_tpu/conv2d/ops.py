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


def _conv2d_gemm(x, kernel, ph, pw, precision):
    """Stride-1 conv as static-shift im2col + one GEMM.

    For small C_in the native lowering's GEMM has a tiny contraction and
    poor MXU utilization; stacking the kernel taps into the contraction
    (im2col via kh*kw static shifted slices) makes it
    [N*Ho*Wo, C_in*kh*kw] x [C_in*kh*kw, C_out]. Same linear map.
    """
    N, Ci, H, W = x.shape
    Co, kh, kw = kernel.shape[0], kernel.shape[2], kernel.shape[3]
    prec = get_precision(precision)
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    Ho, Wo = x.shape[2] - kh + 1, x.shape[3] - kw + 1
    cols = jnp.stack(
        [x[:, :, ki:ki + Ho, kj:kj + Wo]
         for ki in range(kh) for kj in range(kw)], axis=-1)  # [N,Ci,Ho,Wo,kh*kw]
    k_mat = kernel.transpose(1, 2, 3, 0).reshape(Ci * kh * kw, Co)
    cols = cols.transpose(0, 2, 3, 1, 4).reshape(N, Ho, Wo, Ci * kh * kw)
    y = jnp.matmul(cols, k_mat, precision=prec)              # [N,Ho,Wo,Co]
    return y.transpose(0, 3, 1, 2)


def conv2d(x, kernel, stride=1, padding=0, precision=None, method="auto"):
    """torch.nn.functional.conv2d equivalent.

    ``method``: 'gemm' forces static-shift im2col + GEMM (stride 1 only).
    Not auto-selected: unlike the transpose direction (where C_out=1
    collapses the GEMM to one column), the forward conv's small
    contraction is handled well natively — measured neutral-to-slower
    with the im2col materialization at C_in=1.
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    kh, kw = kernel.shape[-2:]
    use_gemm = method == "gemm"
    if use_gemm:
        if (sh, sw) != (1, 1):
            raise ValueError("method='gemm' requires stride 1")
        return _conv2d_gemm(x, kernel, ph, pw, precision)
    return lax.conv_general_dilated(
        x, kernel,
        window_strides=(sh, sw),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=_DIMSPEC,
        precision=get_precision(precision),
    )


def _conv_transpose2d_gemm(z, kernel, ph, pw, precision):
    """Stride-1 conv_transpose as pointwise GEMM + overlap-add fold.

    With few output channels the native conv lowering is a 1-to-few-column
    GEMM — MXU-hostile (measured 0.8 TF/s for C_out=1 on v5e, 8x the cost
    of the adjoint conv). Moving the kernel's spatial taps into GEMM
    columns fixes the shape: one [N*H*W, C_in] x [C_in, C_out*kh*kw]
    matmul, then kh*kw static shifted slice-adds (overlap-add), then a
    crop for the padding. Same linear map as the dilated-conv form.
    """
    N, Ci, H, W = z.shape
    Co, kh, kw = kernel.shape[1], kernel.shape[2], kernel.shape[3]
    prec = get_precision(precision)
    # [N, H, W, Co, kh, kw] via one MXU GEMM over C_in
    y = jnp.tensordot(z.transpose(0, 2, 3, 1), kernel,
                      axes=([3], [0]), precision=prec)
    out = jnp.zeros((N, Co, H + kh - 1, W + kw - 1), z.dtype)
    for ki in range(kh):
        for kj in range(kw):
            out = out.at[:, :, ki:ki + H, kj:kj + W].add(
                y[:, :, :, :, ki, kj].transpose(0, 3, 1, 2))
    return out[:, :, ph:out.shape[2] - ph, pw:out.shape[3] - pw]


def conv_transpose2d(z, kernel, stride=1, padding=0, precision=None,
                     method="auto"):
    """torch.nn.functional.conv_transpose2d equivalent (exact adjoint of
    :func:`conv2d` with the same kernel/stride/padding).

    ``method``: 'auto' picks the GEMM + overlap-add formulation for
    stride-1 transposes with few output channels (where the native conv
    lowering degenerates to a skinny GEMM; ~7x measured at C_out=1),
    'dilated' forces the lax.conv_general_dilated form, 'gemm' forces
    the fold form (stride 1 only).
    """
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    kh, kw = kernel.shape[-2:]
    Co = kernel.shape[1]
    use_gemm = method == "gemm" or (
        method == "auto" and (sh, sw) == (1, 1) and Co <= 16
        and kh * kw > 1)
    if use_gemm:
        if (sh, sw) != (1, 1):
            raise ValueError("method='gemm' requires stride 1")
        return _conv_transpose2d_gemm(z, kernel, ph, pw, precision)
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
