"""Native C++ patch pipeline: build, parity with numpy fallback,
determinism, threading."""

import numpy as np
import pytest

from lasso_tpu import native


@pytest.fixture(scope="module")
def imgs(request):
    rng = np.random.default_rng(0)
    return rng.standard_normal((6, 20, 24)).astype(np.float32)


def test_native_builds():
    assert native.have_native(), "g++ build of patch_ops.cpp failed"


def test_dense_matches_numpy_fallback(imgs):
    out_native = native.extract_patches_dense(imgs, patch=8, stride=4)
    lib = native._LIB
    try:
        native._LIB, native._BUILD_ERROR = None, RuntimeError("forced")
        out_np = native.extract_patches_dense(imgs, patch=8, stride=4)
    finally:
        native._LIB, native._BUILD_ERROR = lib, None
    np.testing.assert_array_equal(out_native, out_np)


def test_random_patches_deterministic_and_valid(imgs):
    a = native.extract_patches_random(imgs, patch=7, per_image=5, seed=42)
    b = native.extract_patches_random(imgs, patch=7, per_image=5, seed=42)
    c = native.extract_patches_random(imgs, patch=7, per_image=5, seed=43)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.shape == (30, 49)
    # every extracted patch must be an actual subwindow of its image
    patch0 = a[0].reshape(7, 7)
    found = False
    for y0 in range(imgs.shape[1] - 6):
        for x0 in range(imgs.shape[2] - 6):
            if np.array_equal(imgs[0, y0:y0 + 7, x0:x0 + 7], patch0):
                found = True
    assert found


def test_center_patches_matches_numpy(imgs):
    p1 = native.extract_patches_dense(imgs, patch=6, stride=6)
    p2 = p1.copy()
    native.center_patches(p1, normalize=True)
    p2 -= p2.mean(axis=1, keepdims=True)
    nrm = np.linalg.norm(p2, axis=1, keepdims=True)
    p2 *= np.where(nrm > 1e-6, 1.0 / np.maximum(nrm, 1e-30), 0.0)
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_threading_matches_single_thread(imgs):
    a = native.extract_patches_random(imgs, patch=5, per_image=9, seed=7,
                                      threads=1)
    b = native.extract_patches_random(imgs, patch=5, per_image=9, seed=7,
                                      threads=4)
    np.testing.assert_array_equal(a, b)


def test_csr_pack_roundtrip(rng):
    from lasso_tpu.native import pack_codes_csr, unpack_codes_csr
    z = rng.standard_normal((37, 53)).astype(np.float32)
    z[np.abs(z) < 1.0] = 0.0  # ~68% sparse
    values, cols, row_ptr = pack_codes_csr(z)
    assert values.shape == cols.shape
    assert row_ptr[-1] == (z != 0).sum()
    z_back = unpack_codes_csr(values, cols, row_ptr, z.shape[1])
    np.testing.assert_array_equal(z_back, z)


def test_csr_pack_matches_numpy_fallback(rng, monkeypatch):
    import lasso_tpu.native as nat
    z = rng.standard_normal((16, 24)).astype(np.float32)
    z[np.abs(z) < 0.8] = 0.0
    v1, c1, r1 = nat.pack_codes_csr(z)
    monkeypatch.setattr(nat, "get_lib", lambda: None)
    v2, c2, r2 = nat.pack_codes_csr(z)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(r1, r2)
