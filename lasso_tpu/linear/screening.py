"""Gap-safe atom screening (Fercoq, Gramfort & Salmon 2015).

The reference has no screening; this is a TPU-serving-oriented addition:
for the per-sample lasso ``min_z 0.5||x - W z||^2 + alpha ||z||_1`` any
primal iterate yields a dual-feasible point and a duality gap, and every
atom inside the resulting "safe sphere" test is CERTIFIED to be zero at
the optimum — independent of how the iterate was produced. Dropping the
globally-inactive columns shrinks K for the whole batch, which is where
the MXU time goes.

Static-shape note: XLA cannot shrink K dynamically, so the elimination
happens at the HOST boundary (a serving-natural place): a cheap warm
start runs at full K, the certified keep-mask comes back to the host,
the kept columns are gathered into a bucket-padded dictionary (buckets
bound recompilation to a handful of sizes), and the reduced solve's
codes are scattered back into [N, K]. Eliminated coordinates are exact
zeros of the full problem, so the result equals the full-K solve.

The win depends on support overlap: screening pays when the UNION of
per-sample candidate supports is well under K — high-alpha serving
workloads and small latency-bound micro-batches, not huge random-data
batches whose supports cover every atom.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from lasso_tpu.config import get_precision


def screen_atoms(x, weight, alpha, z=None, precision=None):
    """Per-sample gap-safe sphere test. Returns ``(keep, gap)``.

    x: [N, D], weight: [D, K], z: [N, K] warm primal (zeros if None).
    ``keep``: [N, K] bool — False entries are CERTIFIED zero at each
    sample's optimum; ``gap``: [N] duality gaps of the warm points.

    Construction (Fercoq et al. 2015, eq. 2.2-2.4): with residual
    ``R = x - z W^T``, the scaled dual point ``theta = R / max(alpha,
    ||W^T R||_inf)`` is feasible; the safe radius is
    ``r = sqrt(2 gap) / alpha`` and atom k is eliminated when
    ``|w_k^T theta| + r ||w_k|| < 1``.
    """
    prec = get_precision(precision)
    if z is None:
        z = jnp.zeros((x.shape[0], weight.shape[1]), x.dtype)
    R = x - jnp.matmul(z, weight.T, precision=prec)            # [N, D]
    WtR = jnp.matmul(R, weight, precision=prec)                # [N, K]
    dual_inf = jnp.max(jnp.abs(WtR), axis=1, keepdims=True)    # [N, 1]
    scale = jnp.maximum(alpha, dual_inf)
    theta = R / scale                                          # [N, D]

    primal = (0.5 * jnp.sum(jnp.square(R), axis=1)
              + alpha * jnp.sum(jnp.abs(z), axis=1))           # [N]
    # D(theta) = 0.5||x||^2 - 0.5||x - alpha*theta||^2
    dual = (0.5 * jnp.sum(jnp.square(x), axis=1)
            - 0.5 * jnp.sum(jnp.square(x - alpha * theta), axis=1))
    gap = jnp.maximum(primal - dual, 0.0)                      # [N]

    w_norms = jnp.sqrt(jnp.sum(jnp.square(weight), axis=0))    # [K]
    corr = jnp.abs(jnp.matmul(theta, weight, precision=prec))  # [N, K]
    radius = jnp.sqrt(2.0 * gap)[:, None] / alpha              # [N, 1]
    keep = corr + radius * w_norms[None, :] >= 1.0
    return keep, gap


def screened_encode(x, weight, alpha, warm_iters=10, bucket=128,
                    algorithm="ista", min_shrink=0.75, **kwargs):
    """Encode with certified gap-safe dictionary shrinking.

    Runs ``warm_iters`` FISTA iterations at full K, screens, gathers the
    union of kept atoms into a bucket-padded dictionary, solves the
    reduced problem (warm-started from the warm iterate), and scatters
    back. Returns ``(z, info)`` with ``info = {'kept': K', 'K': K,
    'gap_max': float}``. Falls back to a full-K solve when screening
    keeps more than ``min_shrink`` of the atoms (the reduced compile
    would not pay for itself).

    Host-boundary utility: the keep-mask crosses to the host (one small
    sync), so use this from serving/chunked pipelines, not inside jit.
    """
    N, D = x.shape
    K = weight.shape[1]
    # all device stages come from lru-cached jitted builders: a fresh
    # closure per call would defeat jax.jit's cache and recompile every
    # serving request; eager dispatch is equally fatal on high-latency
    # links (~25 ms/op over a TPU tunnel)
    z_warm, keep_ps, gap = _warm_and_screen(float(alpha),
                                            int(warm_iters))(x, weight)
    keep = np.asarray(jnp.any(keep_ps, axis=0))                # [K] union
    kept = int(keep.sum())
    info = {"kept": kept, "K": K, "gap_max": float(jnp.max(gap))}

    kw_key = tuple(sorted(kwargs.items()))
    if kept > min_shrink * K:
        z = _full_solve(float(alpha), algorithm, kw_key)(x, weight,
                                                         z_warm)
        info["screened"] = False
        return z, info

    # bucket-pad the kept set so recompiles are bounded to K/bucket sizes
    k_pad = min(K, max(bucket, -(-kept // bucket) * bucket))
    idx = np.flatnonzero(keep)
    # pad with arbitrary distinct unkept columns: they enter with their
    # (generally nonzero) warm values and converge to their certified-zero
    # optima like any other reduced-problem coordinate
    if len(idx) < k_pad:
        unkept = np.flatnonzero(~keep)[: k_pad - len(idx)]
        idx = np.concatenate([idx, unkept])
    idx_j = jnp.asarray(idx)

    z = _reduced_solve(float(alpha), algorithm, kw_key)(
        x, weight, z_warm, idx_j)
    info["screened"] = True
    return z, info


@functools.lru_cache(maxsize=64)
def _warm_and_screen(alpha, warm_iters):
    from lasso_tpu.linear.sparse_encode import sparse_encode

    @jax.jit
    def fn(x, weight):
        zw = sparse_encode(x, weight, alpha, algorithm="ista",
                           maxiter=warm_iters, tol=0.0)
        keep, gap = screen_atoms(x, weight, alpha, zw)
        return zw, keep, gap

    return fn


@functools.lru_cache(maxsize=64)
def _full_solve(alpha, algorithm, kw_key):
    from lasso_tpu.linear.sparse_encode import sparse_encode
    kwargs = dict(kw_key)

    @jax.jit
    def fn(x, weight, z_warm):
        return sparse_encode(x, weight, alpha, algorithm=algorithm,
                             z0=z_warm, **kwargs)

    return fn


@functools.lru_cache(maxsize=64)
def _reduced_solve(alpha, algorithm, kw_key):
    from lasso_tpu.linear.sparse_encode import sparse_encode
    kwargs = dict(kw_key)

    @jax.jit
    def fn(x, weight, z_warm, idx_j):
        W_s = jnp.take(weight, idx_j, axis=1)                  # [D, K']
        z0_s = jnp.take(z_warm, idx_j, axis=1)                 # [N, K']
        z_s = sparse_encode(x, W_s, alpha, algorithm=algorithm, z0=z0_s,
                            **kwargs)
        return (jnp.zeros((x.shape[0], weight.shape[1]), x.dtype)
                .at[:, idx_j].set(z_s))

    return fn
