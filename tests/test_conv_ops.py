"""conv2d / conv_transpose2d wrappers: torch parity + exact adjointness."""

import numpy as np
import jax.numpy as jnp
import pytest

from lasso_tpu.conv2d import conv2d, conv_transpose2d

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("stride,padding", [(1, 0), (1, 2), (2, 1)])
def test_conv2d_matches_torch(rng, stride, padding):
    x = rng.standard_normal((2, 3, 12, 12)).astype(np.float32)
    k = rng.standard_normal((5, 3, 3, 3)).astype(np.float32)
    ours = conv2d(jnp.asarray(x), jnp.asarray(k), stride=stride, padding=padding)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(k),
                   stride=stride, padding=padding).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


@pytest.mark.parametrize("stride,padding", [(1, 0), (1, 1), (2, 1)])
def test_conv_transpose2d_matches_torch(rng, stride, padding):
    z = rng.standard_normal((2, 5, 6, 6)).astype(np.float32)
    k = rng.standard_normal((5, 3, 3, 3)).astype(np.float32)  # [C_in, C_out, kh, kw]
    ours = conv_transpose2d(jnp.asarray(z), jnp.asarray(k),
                            stride=stride, padding=padding)
    ref = F.conv_transpose2d(torch.from_numpy(z), torch.from_numpy(k),
                             stride=stride, padding=padding).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4)


@pytest.mark.parametrize("stride,padding,size", [(1, 0, 10), (1, 1, 10), (2, 1, 9)])
def test_conv_pair_is_exact_adjoint(rng, stride, padding, size):
    # <conv2d(x, k), z> == <x, conv_transpose2d(z, k)> for all x, z
    # (size chosen so the strided shapes round-trip exactly)
    k = jnp.asarray(rng.standard_normal((4, 3, 3, 3)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((2, 3, size, size)).astype(np.float32))
    y = conv2d(x, k, stride=stride, padding=padding)  # [2,4,h,w]
    z = jnp.asarray(rng.standard_normal(y.shape).astype(np.float32))
    # note conv2d kernel layout [C_out,C_in,.,.]; its adjoint uses the same
    # tensor seen as a conv_transpose kernel [C_in',C_out',.,.]
    xt = conv_transpose2d(z, k, stride=stride, padding=padding)
    lhs = float(jnp.vdot(y, z))
    rhs = float(jnp.vdot(x, xt))
    assert abs(lhs - rhs) < 1e-2 * max(1.0, abs(lhs))
