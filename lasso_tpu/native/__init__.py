"""Native (C++) runtime components, built on demand.

The compute path of this framework is JAX/XLA/Pallas on TPU; the host-side
runtime around it — here, the patch-extraction data pipeline that feeds
dictionary learning — is multithreaded C++ compiled at first use with the
system toolchain and bound via ctypes (no pybind11 required). Every entry
point has a numpy fallback, selected automatically when no compiler is
available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "patch_ops.cpp")
_LOCK = threading.Lock()
_LIB = None
_BUILD_ERROR = None


def _build_lib():
    """Compile patch_ops.cpp into a cached shared library."""
    cache_dir = os.environ.get(
        "LASSO_TPU_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "lasso_tpu_native"))
    os.makedirs(cache_dir, exist_ok=True)
    import hashlib
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(cache_dir, f"patch_ops_{tag}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", "-pthread", _SRC, "-o", tmp]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)
    lib = ctypes.CDLL(so_path)

    i64, f32p, i32, u64 = (ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                           ctypes.c_int, ctypes.c_uint64)
    lib.extract_patches_dense.restype = i64
    lib.extract_patches_dense.argtypes = [f32p, i64, i64, i64, i64, i64,
                                          f32p, i32]
    lib.extract_patches_random.restype = i64
    lib.extract_patches_random.argtypes = [f32p, i64, i64, i64, i64, i64,
                                           u64, f32p, i32]
    lib.center_patches.restype = None
    lib.center_patches.argtypes = [f32p, i64, i64, i32, i32]
    return lib


def get_lib():
    """Return the ctypes library, or None when native build is impossible."""
    global _LIB, _BUILD_ERROR
    with _LOCK:
        if _LIB is None and _BUILD_ERROR is None:
            try:
                _LIB = _build_lib()
            except Exception as e:  # no compiler / failed build -> fallback
                _BUILD_ERROR = e
    return _LIB


def have_native():
    return get_lib() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _threads(threads):
    if threads is None:
        threads = os.cpu_count() or 1
    return int(threads)


def extract_patches_dense(imgs, patch, stride=1, threads=None):
    """All patches on a stride grid. imgs: [n, h, w] f32 ->
    [n * n_y * n_x, patch*patch]."""
    imgs = np.ascontiguousarray(imgs, np.float32)
    n, h, w = imgs.shape
    n_y = (h - patch) // stride + 1
    n_x = (w - patch) // stride + 1
    out = np.empty((n * n_y * n_x, patch * patch), np.float32)
    lib = get_lib()
    if lib is not None:
        count = lib.extract_patches_dense(
            _fptr(imgs), n, h, w, patch, stride, _fptr(out),
            _threads(threads))
        assert count == out.shape[0]
        return out
    # numpy fallback
    k = 0
    for i in range(n):
        for yy in range(0, h - patch + 1, stride):
            for xx in range(0, w - patch + 1, stride):
                out[k] = imgs[i, yy:yy + patch, xx:xx + patch].ravel()
                k += 1
    return out


def extract_patches_random(imgs, patch, per_image, seed=0, threads=None):
    """per_image random patches per image (deterministic in seed)."""
    imgs = np.ascontiguousarray(imgs, np.float32)
    n, h, w = imgs.shape
    out = np.empty((n * per_image, patch * patch), np.float32)
    lib = get_lib()
    if lib is not None:
        count = lib.extract_patches_random(
            _fptr(imgs), n, h, w, patch, per_image, seed, _fptr(out),
            _threads(threads))
        assert count == out.shape[0]
        return out
    rng = np.random.default_rng(seed)
    k = 0
    for i in range(n):
        for _ in range(per_image):
            y0 = rng.integers(0, h - patch + 1)
            x0 = rng.integers(0, w - patch + 1)
            out[k] = imgs[i, y0:y0 + patch, x0:x0 + patch].ravel()
            k += 1
    return out


def center_patches(patches, normalize=False, threads=None):
    """In-place per-patch mean subtraction (and optional l2 normalize).
    Returns the same array."""
    assert patches.dtype == np.float32 and patches.flags.c_contiguous
    lib = get_lib()
    if lib is not None:
        lib.center_patches(_fptr(patches), patches.shape[0],
                           patches.shape[1], int(normalize),
                           _threads(threads))
        return patches
    patches -= patches.mean(axis=1, keepdims=True)
    if normalize:
        nrm = np.linalg.norm(patches, axis=1, keepdims=True)
        patches *= np.where(nrm > 1e-6, 1.0 / np.maximum(nrm, 1e-30), 0.0)
    return patches
