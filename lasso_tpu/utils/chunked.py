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
                   out=None, **kwargs):
    """Encode an arbitrarily large batch in fixed-size chunks.

    x: [N, D] (numpy or jax array, host-resident is fine),
    weight: [D, K]. Returns a host numpy array [N, K] (or fills ``out``,
    which may be any preallocated array-like, e.g. a np.memmap).

    The final partial chunk is zero-padded to ``chunk_size`` so every
    chunk reuses the same compiled executable (padding rows solve a
    zero problem and are discarded).
    """
    from lasso_tpu.linear.sparse_encode import sparse_encode

    N = x.shape[0]
    K = weight.shape[1]
    weight = jnp.asarray(weight)
    # codes follow x's dtype (sparse_encode initializes z0 as x.dtype)
    out_dtype = np.asarray(x[:0]).dtype

    if out is None:
        out = np.empty((N, K), dtype=out_dtype)
    if N == 0:
        return out
    chunk_size = min(chunk_size, N)

    run = jax.jit(partial(sparse_encode, alpha=alpha, algorithm=algorithm,
                          **kwargs))

    for start in range(0, N, chunk_size):
        stop = min(start + chunk_size, N)
        xb = np.asarray(x[start:stop])
        if stop - start < chunk_size:  # pad the tail chunk
            pad = np.zeros((chunk_size - (stop - start), x.shape[1]),
                           dtype=xb.dtype)
            xb = np.concatenate([xb, pad], axis=0)
        zb = run(jnp.asarray(xb), weight)
        if isinstance(zb, tuple):
            zb = zb[0]
        out[start:stop] = np.asarray(zb)[: stop - start]
    return out
