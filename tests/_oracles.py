"""Solver-independent correctness oracles (SURVEY.md §4 items 2-4).

The reference library has no tests; these oracles are the test strategy we
commit to instead: KKT/subgradient certificates, duality gaps, and
objective-value comparison against the reference run on CPU.
"""

import sys

import numpy as np


def lasso_objective(x, W, z, alpha):
    """0.5 ||z W^T - x||^2 + alpha ||z||_1 (total, not per-sample-mean)."""
    x, W, z = map(np.asarray, (x, W, z))
    resid = z @ W.T - x
    return 0.5 * np.sum(resid ** 2) + alpha * np.sum(np.abs(z))


def kkt_violation(x, W, z, alpha, support_tol=1e-6):
    """Max violation of the lasso KKT conditions.

    At an optimum: |W^T(Wz - x)|_k <= alpha where z_k = 0, and
    W^T(Wz - x)_k = -alpha * sign(z_k) on the support.
    Returns the max absolute violation over all coordinates.
    """
    x, W, z = map(np.asarray, (x, W, z))
    g = (z @ W.T - x) @ W  # [N, K]
    on_support = np.abs(z) > support_tol
    viol_support = np.abs(g + alpha * np.sign(z)) * on_support
    viol_zero = np.maximum(np.abs(g) - alpha, 0.0) * (~on_support)
    return max(viol_support.max(initial=0.0), viol_zero.max(initial=0.0))


def duality_gap(x, W, z, alpha):
    """Per-sample lasso duality gap (same construction as reference
    coordinate_descent.py:87-99); returns the max over samples."""
    x, W, z = map(np.asarray, (x, W, z))
    R = x - z @ W.T  # [N, D]
    XtA = R @ W  # [N, K]
    dual_norm = np.abs(XtA).max(axis=1)
    R_norm2 = (R ** 2).sum(axis=1)
    small = dual_norm <= alpha
    const = np.where(small, 1.0, alpha / np.maximum(dual_norm, 1e-30))
    gap = np.where(small, R_norm2, 0.5 * R_norm2 * (1 + const ** 2))
    gap = gap + alpha * np.abs(z).sum(axis=1) - const * (R * x).sum(axis=1)
    return gap.max()


def load_reference():
    """Import the untrusted reference library (read-only) for golden parity
    tests. Returns the module or None when unavailable."""
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        # the reference targets an older scipy; restore the private symbol it
        # imports (moved to scipy.optimize._optimize in modern scipy)
        import scipy.optimize.optimize as _soo
        if not hasattr(_soo, "_status_message"):
            from scipy.optimize._optimize import _status_message
            _soo._status_message = _status_message
    except Exception:
        pass
    try:
        import lasso  # noqa: F401
        return lasso
    except Exception:
        return None
