"""Lipschitz-constant estimation for convolutional operators.

TPU-native rebuild of /root/reference/lasso/conv2d/lip_const.py:

* :func:`lip_constant` — exact top eigenvalue of the conv normal operator.
  The reference round-trips every matvec through scipy's eigsh on host
  (lip_const.py:15-24); here it is an on-device power iteration over the
  same operator.
* :func:`lip_bound_conv2d` / :class:`LipBoundConv2d` — the fast Araujo
  et al. (2020) trigonometric-polynomial upper bound. Pure matmul math;
  the module variant caches the frequency buffer exactly like the
  reference's registered buffer (lip_const.py:60-72).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from lasso_tpu.config import get_precision
from lasso_tpu.conv2d.ops import conv2d, conv_transpose2d
from lasso_tpu.linalg.spectral import power_iteration


def lip_constant(kernel, imsize, transpose=False, sqrt=False, stride=1,
                 padding=0, maxiter=500, tol=1e-9, key=None):
    """Top eigenvalue of the conv normal operator (reference
    lip_const.py:8-31), computed fully on device.

    kernel: [C_z, C_x, kh, kw] (torch conv_transpose layout when
    ``transpose=True``, conv layout otherwise).
    """
    out_channels, in_channels = kernel.shape[:2]
    channels = out_channels if transpose else in_channels
    height, width = imsize
    if key is None:
        key = jax.random.PRNGKey(0)
    v0 = jax.random.normal(key, (1, channels, height, width), kernel.dtype)

    def matvec(v):
        if transpose:
            u = conv_transpose2d(v, kernel, stride=stride, padding=padding)
            return conv2d(u, kernel, stride=stride, padding=padding)
        u = conv2d(v, kernel, stride=stride, padding=padding)
        return conv_transpose2d(u, kernel, stride=stride, padding=padding)

    # flatten-aware power iteration over the 4-D operator
    def flat_matvec(vf):
        return matvec(vf.reshape(v0.shape)).ravel()

    lam, _ = power_iteration(flat_matvec, v0.ravel(), maxiter=maxiter,
                             tol=tol)
    if sqrt:
        lam = jnp.sqrt(lam)
    return lam


def _freq_buffer(ksize, padding, sample, dtype=jnp.float32):
    """Frequency-location phase buffer (reference lip_const.py:60-72)."""
    xs = jnp.linspace(0.0, 2 * math.pi, sample, dtype=dtype)
    w0, w1 = jnp.meshgrid(xs, xs, indexing="ij")
    w0 = w0.reshape(-1, 1)
    w1 = w1.reshape(-1, 1)
    p_index = 1.0 + jnp.arange(padding - ksize, padding, dtype=dtype)
    H0, H1 = jnp.meshgrid(p_index, p_index, indexing="ij")
    H0 = H0.reshape(1, -1)
    H1 = H1.reshape(1, -1)
    return (w0 * H0 + w1 * H1).T  # [K^2, S^2]


def _lip_bound(kernel, buf, sqrt, prec):
    if kernel.shape[0] > kernel.shape[1]:
        kernel = kernel.swapaxes(0, 1)
    real = jnp.cos(buf)
    imag = jnp.sin(buf)
    k = kernel.reshape(kernel.shape[0], kernel.shape[1], -1)  # [Co, Ci, K^2]
    poly_real = jnp.matmul(k, real, precision=prec)           # [Co, Ci, S^2]
    poly_imag = jnp.matmul(k, imag, precision=prec)
    poly = jnp.sum(jnp.square(poly_real), axis=1) \
        + jnp.sum(jnp.square(poly_imag), axis=1)              # [Co, S^2]
    bound = jnp.sum(jnp.max(poly, axis=-1))
    return jnp.sqrt(bound) if sqrt else bound


def lip_bound_conv2d(kernel, padding, stride=1, sample=50, sqrt=False,
                     precision=None):
    """Araujo Toeplitz bound on the top eigenvalue of ``W^T W`` for a conv
    operator (reference lip_const.py:96-135). Square odd kernels, stride 1."""
    assert kernel.ndim == 4
    if kernel.shape[-1] != kernel.shape[-2]:
        raise ValueError("The last 2 dim of the kernel must be equal.")
    if kernel.shape[-1] % 2 != 1:
        raise ValueError("The dimension of the kernel must be odd.")
    if stride != 1:
        raise NotImplementedError("LipBound not implemented for stride > 1.")
    buf = _freq_buffer(kernel.shape[-1], padding, sample, kernel.dtype)
    return _lip_bound(kernel, buf, sqrt, get_precision(precision))


class LipBoundConv2d:
    """Callable caching the frequency buffer across evaluations
    (reference lip_const.py:34-93)."""

    def __init__(self, kernel_size, padding, stride=1, sample=50, sqrt=False):
        assert len(kernel_size) == 4
        if kernel_size[-1] != kernel_size[-2]:
            raise ValueError("The last 2 dim of the kernel must be equal.")
        if kernel_size[-1] % 2 != 1:
            raise ValueError("The dimension of the kernel must be odd.")
        if stride != 1:
            raise NotImplementedError(
                "LipBound not implemented for stride > 1.")
        self.ksize = kernel_size[-1]
        self.sqrt = sqrt
        self.buf = _freq_buffer(self.ksize, padding, sample)

    def __call__(self, kernel, precision=None):
        assert kernel.ndim == 4
        assert kernel.shape[2] == kernel.shape[3] == self.ksize
        return _lip_bound(kernel, self.buf.astype(kernel.dtype), self.sqrt,
                          get_precision(precision))
