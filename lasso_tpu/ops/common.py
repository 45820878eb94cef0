"""Shared dense-op helpers used by every solver."""

from __future__ import annotations

import jax.numpy as jnp

from lasso_tpu.config import get_precision


def resolve_pallas(use_pallas, supported):
    """Shared Pallas-routing policy: resolve ``use_pallas`` ('auto' /
    True / False) against a shape-support predicate result.

    Returns ``(enabled, interpret)``: 'auto' enables only on real TPU
    backends; True forces the kernel (interpreted off-TPU, for tests);
    False always takes the plain XLA path.
    """
    import jax

    if use_pallas == "auto":
        return (jax.default_backend() == "tpu" and supported), False
    if use_pallas:
        return supported, jax.default_backend() != "tpu"
    return False, False


def largest_aligned_divisor(n, limit, align=8):
    """Largest multiple of ``align`` that divides ``n`` and is <= limit.

    Requires ``align | n``. Used to pick Pallas batch-tile sizes: a
    multiple-of-8 (sublane) or multiple-of-128 (lane) block that exactly
    tiles the array, so ``grid * block == n`` always holds — naive
    halving of an odd divisor (e.g. 120 -> 60 -> 30 -> 15 -> 7) would
    silently under-cover the batch.
    """
    assert n % align == 0, (n, align)
    m = n // align
    d = max(1, min(limit // align, m))
    while m % d != 0:
        d -= 1
    return align * d


def pad_lasso_operands(x, z0, weight, alpha=None):
    """Zero-pad ``(x, z0, weight[, per-feature alpha row])`` onto the
    fused kernels' lane grid (N % 8 == 0, D % 128 == 0, K % 128 == 0).

    Returns ``(x_p, z0_p, w_p, alpha_p, (N, K))`` — ``alpha_p`` is None
    when ``alpha`` was a scalar, ``z0_p`` is None when ``z0`` is (OMP
    has no iterate to carry) — or ``None`` when the shapes are already
    aligned. Real-world dictionaries are rarely lane-aligned
    (image patches have D = 784, 1024-atom-minus-a-few dictionaries
    abound); without this, such problems silently fell off the fused
    Pallas paths onto the plain XLA step (a 3-7x cliff at scale).

    The padding is EXACT, not approximate:

    - zero feature ROWS (D tail) leave ``W^T W``, ``W^T x``, the
      spectral norm (so ``lr='auto'``), residuals, and objectives
      unchanged;
    - zero ATOM columns (K tail) are invariant coordinates: their
      gradient component ``w_k^T r`` is identically 0, so the
      ISTA/FISTA prox, momentum, restart, l2 contraction, nonneg
      projection, greedy-CD selection (``shrink(b_k) - z_k = 0``) and
      cyclic sweeps all hold them at exactly 0 forever — the real
      coordinates never interact with them (padded alpha entries are 1
      so thresholds stay positive);
    - zero batch ROWS (N tail) solve the zero problem at ``z = 0`` and
      contribute exactly 0 to every convergence statistic.

    Callers must rescale size-proportional stopping thresholds (e.g.
    FISTA's global ``numel * tol``) to the ORIGINAL numel and slice the
    result back to ``[N, K]``.
    """
    N, D = x.shape
    K = weight.shape[1]
    Np = -(-N // 8) * 8
    Dp = -(-D // 128) * 128
    Kp = -(-K // 128) * 128
    if (Np, Dp, Kp) == (N, D, K):
        return None
    x_p = jnp.pad(x, ((0, Np - N), (0, Dp - D)))
    z0_p = (None if z0 is None
            else jnp.pad(z0, ((0, Np - N), (0, Kp - K))))
    w_p = jnp.pad(weight, ((0, Dp - D), (0, Kp - K)))
    a_p = None
    if alpha is not None:
        a_arr = jnp.asarray(alpha)
        if a_arr.ndim > 0:
            a_p = jnp.pad(a_arr.reshape(1, K), ((0, 0), (0, Kp - K)),
                          constant_values=1.0)
    return x_p, z0_p, w_p, a_p, (N, K)


def matmul(a, b, precision=None):
    """Matmul at the library's default (fp32) precision on the MXU."""
    return jnp.matmul(a, b, precision=get_precision(precision))


def l1_norm(x):
    return jnp.sum(jnp.abs(x))


def sq_norm(x):
    return jnp.sum(jnp.square(x))


def per_sample_alpha_column(alpha, batch_size, ndim=2):
    """Resolve a per-sample penalty vector to a broadcastable column.

    Returns ``None`` when ``alpha`` is a scalar (the common path), else
    a ``[N, 1, ...]`` array (``ndim`` total dims) validated against the
    batch size. Solvers use this to support ``alpha`` as an [N]-vector
    through the lasso's exact homogeneity: with ``a_i > 0``,

        argmin_z 0.5 ||z W^T - x_i||^2 + a_i ||z||_1
          = a_i * argmin_u 0.5 ||u W^T - x_i / a_i||^2 + 1 * ||u||_1

    so a per-sample-alpha solve IS the alpha=1 solve on row-rescaled
    inputs — every kernel, precision schedule, and restart path applies
    unchanged (FISTA/CD are row-separable). One batch can then sweep a
    regularization path or per-request penalties at full throughput.

    Positivity is checked when ``alpha`` is concrete; traced values are
    the caller's contract (a zero entry divides by zero).
    """
    import numpy as np
    import jax

    arr = jnp.asarray(alpha)
    if arr.ndim == 0:
        return None
    if arr.shape != (batch_size,) and arr.shape != (batch_size, 1):
        raise ValueError(
            f"per-sample alpha must have shape ({batch_size},), got "
            f"{arr.shape}")
    if not isinstance(arr, jax.core.Tracer):
        if not bool(np.all(np.asarray(arr) > 0)):
            raise ValueError("per-sample alpha entries must be > 0")
    return arr.reshape((batch_size,) + (1,) * (ndim - 1))


def per_feature_alpha_row(alpha, n_components, n_samples=None):
    """Resolve a per-feature (per-atom) penalty vector to a [1, K] row.

    Returns ``None`` when ``alpha`` is a scalar or is a per-SAMPLE form
    (handled by :func:`per_sample_alpha_column`), else a ``[1, K]`` array.
    Accepted per-feature shapes: ``(1, K)`` always; bare ``(K,)`` only
    when unambiguous (``K != n_samples`` — an ``(N,)``-vector is
    per-sample). When ``K == N``, pass shape ``(1, K)`` explicitly.

    Solvers use this to support ``alpha`` as a per-atom weight vector
    (a weighted lasso / adaptive lasso) through an exact column
    rescaling: with ``a_k > 0`` and ``u = z * a`` (columnwise),

        min_z 0.5 ||z W^T - x||^2 + sum_k a_k |z_{:,k}|
          = (1/a) * argmin_u 0.5 ||u (W diag(1/a))^T - x||^2 + ||u||_1

    so the weighted solve IS the alpha=1 solve on a column-rescaled
    dictionary — every kernel, precision schedule, and restart path
    applies unchanged. Note ``lr='auto'`` re-estimates the Lipschitz
    constant of the rescaled dictionary; an explicit numeric ``lr``
    is interpreted as the step size for the rescaled problem.

    Positivity is checked when ``alpha`` is concrete; traced values are
    the caller's contract (a zero entry divides by zero).
    """
    import numpy as np
    import jax

    arr = jnp.asarray(alpha)
    if arr.ndim == 0:
        return None
    is_row = arr.shape == (1, n_components) and n_components != 1
    is_bare = (arr.shape == (n_components,)
               and (n_samples is None or n_components != n_samples))
    if not (is_row or is_bare):
        return None
    if not isinstance(arr, jax.core.Tracer):
        if not bool(np.all(np.asarray(arr) > 0)):
            raise ValueError("per-feature alpha entries must be > 0")
    return arr.reshape(1, n_components)
