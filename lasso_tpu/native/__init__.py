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
_SRC2 = os.path.join(_HERE, "sparse_pack.cpp")
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
    h = hashlib.sha256()
    for src in (_SRC, _SRC2):
        with open(src, "rb") as f:
            h.update(f.read())
    tag = h.hexdigest()[:16]
    so_path = os.path.join(cache_dir, f"lasso_native_{tag}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", "-pthread", _SRC, _SRC2, "-o", tmp]
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
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.csr_count_nnz.restype = i64
    lib.csr_count_nnz.argtypes = [f32p, i64, i64, ctypes.c_float, i64p, i32]
    lib.csr_pack.restype = None
    lib.csr_pack.argtypes = [f32p, i64, i64, ctypes.c_float, i64p, f32p,
                             i32p, i32]
    lib.csr_unpack.restype = None
    lib.csr_unpack.argtypes = [f32p, i32p, i64p, i64, i64, f32p, i32]
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


def _i64ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _i32ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def pack_codes_csr(z, eps=0.0, threads=None):
    """Pack a dense code matrix z [N, K] into CSR (values, cols, row_ptr).

    Sparse lasso codes are 80-96% zeros at typical alpha; CSR cuts
    storage/transfer in serving pipelines (the reference has no output
    layer at all). Multithreaded C++ two-pass packer with a numpy
    fallback. ``eps``: magnitude threshold counted as zero.
    """
    z = np.ascontiguousarray(np.asarray(z), dtype=np.float32)
    N, K = z.shape
    lib = get_lib()
    if lib is None:
        mask = np.abs(z) > eps
        row_nnz = mask.sum(axis=1).astype(np.int64)
        row_ptr = np.zeros(N + 1, np.int64)
        np.cumsum(row_nnz, out=row_ptr[1:])
        cols = np.nonzero(mask)[1].astype(np.int32)
        values = z[mask]
        return values, cols, row_ptr

    row_nnz = np.empty(N, np.int64)
    total = lib.csr_count_nnz(_fptr(z), N, K, np.float32(eps),
                              _i64ptr(row_nnz), _threads(threads))
    row_ptr = np.zeros(N + 1, np.int64)
    np.cumsum(row_nnz, out=row_ptr[1:])
    values = np.empty(total, np.float32)
    cols = np.empty(total, np.int32)
    lib.csr_pack(_fptr(z), N, K, np.float32(eps), _i64ptr(row_ptr),
                 _fptr(values), _i32ptr(cols), _threads(threads))
    return values, cols, row_ptr


def unpack_codes_csr(values, cols, row_ptr, n_components, threads=None):
    """CSR -> dense [N, n_components] (decode side of pack_codes_csr)."""
    values = np.ascontiguousarray(values, np.float32)
    cols = np.ascontiguousarray(cols, np.int32)
    row_ptr = np.ascontiguousarray(row_ptr, np.int64)
    N = row_ptr.shape[0] - 1
    out = np.empty((N, n_components), np.float32)
    lib = get_lib()
    if lib is None:
        out[:] = 0.0
        for r in range(N):
            sl = slice(row_ptr[r], row_ptr[r + 1])
            out[r, cols[sl]] = values[sl]
        return out
    lib.csr_unpack(_fptr(values), _i32ptr(cols), _i64ptr(row_ptr),
                   N, n_components, _fptr(out), _threads(threads))
    return out
