"""Chunked encoding: stream batches larger than device memory.

The sparse-coding working set (z, z_prev, x and kernel outputs) is
~4·N·K·4 bytes; on a 16 GB chip the fused FISTA path tops out around
N ≈ 200k for K = 2048. Per-sample solves are independent, so bigger
batches stream through in fixed-size chunks: one compiled solver
executable (shapes are constant across chunks), device transfers
overlapped with compute by JAX's async dispatch, results gathered to
host memory.

The reference has no equivalent — its answer to a too-big batch is an
OOM. This is the single-host analogue of the mesh-sharded batch axis
(`lasso_tpu.parallel`): use the mesh across chips, chunking beyond HBM.

Throughput is transfer-bound when the host link is slow (e.g. ~15 MB/s
over this dev container's TPU tunnel); on directly-attached hardware
(PCIe/DMA) the per-chunk upload+download overlaps with compute via JAX
async dispatch and the solver dominates.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def chunked_encode(x, weight, alpha=1.0, chunk_size=65536, algorithm="ista",
                   out=None, output="dense", csr_eps=0.0, screen=False,
                   screen_kwargs=None, **kwargs):
    """Encode an arbitrarily large batch in fixed-size chunks.

    x: [N, D] (numpy or jax array, host-resident is fine),
    weight: [D, K]. Returns a host numpy array [N, K] (or fills ``out``,
    which may be any preallocated array-like, e.g. a np.memmap).

    ``output='csr'`` instead returns ``(values, cols, row_ptr)`` packed
    per chunk by the native CSR packer (codes are 80-96% zeros at
    typical alpha — the packed form is what serving pipelines want, and
    the dense [N, K] matrix never materializes on the host).

    The final partial chunk is zero-padded to ``chunk_size`` so every
    chunk reuses the same compiled executable (padding rows solve a
    zero problem and are discarded).

    ``screen=True`` routes each chunk through
    :func:`lasso_tpu.linear.screened_encode` (gap-safe certified
    dictionary shrinking with automatic full-K fallback; pays off at
    strongly-sparse alphas where a chunk's union support sits well
    under K). ``screen_kwargs`` forwards warm_iters/bucket/min_shrink.
    Note: the screened path host-syncs inside each dispatch (keep-mask +
    gap readback), so the one-deep dispatch/land pipeline below degrades
    to sequential chunk processing when ``screen=True``.

    ``algorithm='ista_conv2d'`` streams a conv sparse-coding batch:
    x: [N, C_x, H, W], weight: [C_z, C_x, kh, kw], codes
    [N, C_z, H_z, W_z] (conv geometry); forwards stride/padding/etc. to
    :func:`lasso_tpu.conv2d.ista_conv2d`. Dense output only.
    """
    from lasso_tpu.linear.screening import screened_encode
    from lasso_tpu.linear.sparse_encode import sparse_encode

    if output not in ("dense", "csr"):
        raise ValueError(f"output must be 'dense' or 'csr', got {output!r}")
    if out is not None and output == "csr":
        raise ValueError(
            "a preallocated `out` buffer applies only to output='dense'; "
            "the CSR path returns freshly packed (values, cols, row_ptr) "
            "arrays whose sizes are data-dependent")
    conv = algorithm == "ista_conv2d"
    if conv and (output != "dense" or screen):
        raise ValueError("ista_conv2d supports only output='dense' "
                         "without screening (the CSR packer and gap-safe "
                         "screening are 2-D code paths)")
    N = x.shape[0]
    weight = jnp.asarray(weight)
    # codes follow x's dtype (sparse_encode initializes z0 as x.dtype)
    out_dtype = np.asarray(x[:0]).dtype

    if conv:
        from lasso_tpu.conv2d.ista import ista_conv2d
        from lasso_tpu.conv2d.ops import conv2d
        conv_kw = {k: kwargs.pop(k) for k in ("stride", "padding")
                   if k in kwargs}
        code = jax.eval_shape(
            lambda xx: conv2d(xx, weight, **conv_kw),
            jax.ShapeDtypeStruct((min(chunk_size, max(N, 1)),)
                                 + x.shape[1:], out_dtype))
        code_shape = code.shape[1:]
    else:
        code_shape = (weight.shape[1],)

    csr = output == "csr"
    if csr:
        vals_parts, cols_parts, nnz_rows = [], [], []
    elif out is None:
        out = np.empty((N,) + code_shape, dtype=out_dtype)
    if N == 0:
        if csr:
            return (np.empty(0, np.float32), np.empty(0, np.int32),
                    np.zeros(1, np.int64))
        return out
    chunk_size = min(chunk_size, N)

    a_arr = np.asarray(alpha)
    # a per-feature [1, K] alpha row is batch-invariant: it passes
    # through to every chunk unchanged like a scalar. Only per-sample
    # forms ((N,) / (N,1)) are sliced per chunk.
    per_feature = (a_arr.ndim == 2 and a_arr.shape[0] == 1
                   and a_arr.shape[1] != 1)
    vec_alpha = a_arr.ndim >= 1 and not per_feature
    if a_arr.ndim >= 1:
        if screen:
            raise ValueError("screen=True requires a scalar alpha (the "
                             "gap-safe certificate is a scalar-penalty "
                             "construction)")
        if vec_alpha and a_arr.shape[0] != N:
            raise ValueError(f"per-sample alpha must have shape ({N},), "
                             f"got {a_arr.shape}")
        if vec_alpha and a_arr.ndim == 2:
            a_arr = a_arr[:, 0]

    if screen:
        run = partial(screened_encode, alpha=alpha, algorithm=algorithm,
                      **(screen_kwargs or {}), **kwargs)
    elif conv:
        z0_chunk = jnp.zeros((chunk_size,) + code_shape, out_dtype)
        run = jax.jit(lambda xb, w, ab: ista_conv2d(
            xb, z0_chunk, w, alpha=ab, **conv_kw, **kwargs))
    else:
        run = jax.jit(lambda xb, w, ab: sparse_encode(
            xb, w, alpha=ab, algorithm=algorithm, **kwargs))

    def dispatch(start):
        stop = min(start + chunk_size, N)
        xb = np.asarray(x[start:stop])
        if stop - start < chunk_size:  # pad the tail chunk
            pad = np.zeros((chunk_size - (stop - start),) + x.shape[1:],
                           dtype=xb.dtype)
            xb = np.concatenate([xb, pad], axis=0)
        if screen:
            zb = run(jnp.asarray(xb), weight)
        else:
            if vec_alpha:
                ab = a_arr[start:stop].astype(np.float32)
                if stop - start < chunk_size:
                    # padding rows solve a zero problem; any positive
                    # penalty keeps their codes exactly zero
                    ab = np.concatenate(
                        [ab, np.ones(chunk_size - (stop - start),
                                     np.float32)])
                ab = jnp.asarray(ab)
            else:
                ab = alpha
            zb = run(jnp.asarray(xb), weight, ab)
        return (zb[0] if isinstance(zb, tuple) else zb), start, stop

    def land(zb, start, stop):
        zb = np.asarray(zb)[: stop - start]   # blocks on this chunk only
        if csr:
            from lasso_tpu.native import pack_codes_csr
            v, c, rp = pack_codes_csr(zb, eps=csr_eps)
            vals_parts.append(v)
            cols_parts.append(c)
            nnz_rows.append(np.diff(rp))
        else:
            out[start:stop] = zb

    # one-deep pipeline: dispatch chunk i+1 (async under JAX) before
    # materializing chunk i, so host packing/copies overlap device solves
    pending = None
    for start in range(0, N, chunk_size):
        nxt = dispatch(start)
        if pending is not None:
            land(*pending)
        pending = nxt
    land(*pending)

    if csr:
        row_ptr = np.zeros(N + 1, np.int64)
        np.cumsum(np.concatenate(nnz_rows), out=row_ptr[1:])
        return (np.concatenate(vals_parts), np.concatenate(cols_parts),
                row_ptr)
    return out
