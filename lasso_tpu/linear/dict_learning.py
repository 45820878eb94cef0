"""Alternating-minimization dictionary learning.

TPU-native rebuild of /root/reference/lasso/linear/dict_learning.py:10-123.

Structural changes vs the reference (math preserved):

* the outer EM loop (dl.py:36-51) is a ``lax.scan`` over steps, so the
  whole training run compiles to one XLA program with no per-step host sync
  (the reference calls ``.item()`` for its tqdm postfix every step);
* the constrained per-atom update (dl.py:56-103) — a Python loop of K
  rank-1 residual updates with data-dependent re-randomization of
  degenerate atoms — becomes a ``lax.fori_loop`` whose degenerate branch is
  a ``jnp.where`` on a pre-drawn random atom (RNG via explicit keys);
* ``update_dict_ridge`` (dl.py:106-123) is two Gram matmuls + one [K, K]
  Cholesky solve; under a data-sharded mesh the Gram products become psum
  reductions automatically (see lasso_tpu.parallel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from lasso_tpu.config import get_precision
from lasso_tpu.linalg.basic import cholesky_solve
from lasso_tpu.linear.sparse_encode import sparse_encode


def lasso_loss(X, Z, weight, alpha=1.0, precision=None):
    """Per-sample-mean lasso objective (reference dl.py:10-13)."""
    prec = get_precision(precision)
    X_hat = jnp.matmul(Z, weight.T, precision=prec)
    loss = 0.5 * jnp.sum(jnp.square(X - X_hat)) + alpha * jnp.sum(jnp.abs(Z))
    return loss / X.shape[0]


def dict_evaluate(X, weight, alpha, **kwargs):
    """Encode X under the current dictionary and report the loss
    (reference dl.py:16-20)."""
    Z = sparse_encode(X, weight, alpha, **kwargs)
    return lasso_loss(X, Z, weight, alpha)


def update_dict(dictionary, X, Z, key=None, positive=False, eps=1e-10,
                precision=None, axis_name=None):
    """Sequential per-atom dictionary update (sklearn-style).

    Reference dl.py:56-103: for each atom k, add back its rank-1
    contribution to the residual, re-fit it as ``Z[:,k]^T R``, renormalize,
    and re-randomize degenerate atoms (zeroing their coefficients).
    Order-dependent by construction — kept as a ``fori_loop`` for parity.

    ``axis_name``: inside ``jax.shard_map`` with the sample axis sharded,
    pass the axis name so each atom's refit ``Z[:,k]^T R`` psums to its
    global value (the ONLY cross-shard quantity: the rank-1 residual
    updates are row-local, and the degenerate-atom decision then depends
    only on the psum'd atom, so every shard takes the same branch).

    Returns ``(dictionary, Z)`` (the reference mutates Z in place).
    """
    prec = get_precision(precision)
    n_components = dictionary.shape[1]
    if key is None:
        key = jax.random.PRNGKey(0)
    # pre-draw one replacement atom per component for the degenerate branch
    rand_atoms = jax.random.normal(
        key, (n_components, dictionary.shape[0]), dtype=dictionary.dtype)

    R0 = X - jnp.matmul(Z, dictionary.T, precision=prec)  # [N, D]

    def body(k, carry):
        R, W, Z = carry
        w_k = W[:, k]
        z_k = Z[:, k]
        # add back atom k's contribution
        R = R + jnp.outer(z_k, w_k)
        # re-fit atom k against the residual
        atom = jnp.matmul(z_k, R, precision=prec)  # [D]
        if axis_name is not None:
            atom = lax.psum(atom, axis_name)
        if positive:
            atom = jnp.maximum(atom, 0.0)
        atom_norm = jnp.linalg.norm(atom)

        degenerate = atom_norm < eps
        rand_atom = rand_atoms[k]
        if positive:
            rand_atom = jnp.maximum(rand_atom, 0.0)
        rand_atom = rand_atom / (jnp.linalg.norm(rand_atom) + 1e-30)

        atom_new = jnp.where(degenerate, rand_atom,
                             atom / jnp.where(degenerate, 1.0, atom_norm))
        z_k_new = jnp.where(degenerate, jnp.zeros_like(z_k), z_k)

        W = W.at[:, k].set(atom_new)
        Z = Z.at[:, k].set(z_k_new)
        # subtract the updated contribution (skipped for degenerate atoms,
        # whose coefficients are now zero — matching reference dl.py:91-101)
        R = R - jnp.outer(z_k_new, atom_new)
        return (R, W, Z)

    _, W, Z = lax.fori_loop(0, n_components, body, (R0, dictionary, Z))
    return W, Z


def update_dict_block(dictionary, X, Z, key=None, positive=False, eps=1e-10,
                      lambd=1e-6, precision=None, axis_name=None):
    """Block-parallel constrained dictionary update (TPU-native alternative
    to the sequential :func:`update_dict`; SURVEY.md §7 phase 5 variant b).

    Fits all atoms jointly with one ridge solve, renormalizes columns to
    unit norm, and re-randomizes degenerate atoms (zeroing their
    coefficients) — the same fixed points as the sequential update without
    its order dependence, and one [K,K] Cholesky instead of K rank-1
    passes. Returns ``(dictionary, Z)``.

    ``axis_name`` threads to the inner ridge fit's Gram psums (the joint
    fit and the renormalization that follows are then global; degenerate
    decisions agree across shards).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    V = update_dict_ridge(X, Z, lambd=lambd, precision=precision,
                          axis_name=axis_name)                     # [D, K]
    if positive:
        V = jnp.maximum(V, 0.0)
    norms = jnp.linalg.norm(V, axis=0)                             # [K]
    degenerate = norms < eps

    rand_atoms = jax.random.normal(key, dictionary.shape,
                                   dtype=dictionary.dtype)         # [D, K]
    if positive:
        rand_atoms = jnp.maximum(rand_atoms, 0.0)
    rand_atoms = rand_atoms / (jnp.linalg.norm(rand_atoms, axis=0,
                                               keepdims=True) + 1e-30)

    W = jnp.where(degenerate[None, :], rand_atoms,
                  V / jnp.where(degenerate, 1.0, norms)[None, :])
    Z = jnp.where(degenerate[None, :], 0.0, Z)
    return W, Z


def update_dict_ridge(x, z, lambd=1e-4, axis_name=None, precision=None):
    """Unconstrained ridge dictionary update (reference dl.py:106-123).

    Newton step of ``f(V) = 1/(2N) ||z V^T - x||^2 + (lambd/2)||V||^2``:
    solve ``(Z^T Z + lambd N I) V^T = Z^T X``. The two Gram products are
    the psum-reduction points under a data-sharded mesh: pass
    ``axis_name`` when running inside ``jax.shard_map`` with the sample
    axis sharded, and the partial Z^T X / Z^T Z (and the sample count in
    the regularizer) psum to their global values.
    """
    prec = get_precision(precision)
    rhs = jnp.matmul(z.T, x, precision=prec)          # [K, D]
    M = jnp.matmul(z.T, z, precision=prec)            # [K, K]
    n = jnp.asarray(x.shape[0], x.dtype)
    if axis_name is not None:
        rhs = lax.psum(rhs, axis_name)
        M = lax.psum(M, axis_name)
        n = lax.psum(n, axis_name)
    M = M + (lambd * n) * jnp.eye(M.shape[0], dtype=M.dtype)
    L = jnp.linalg.cholesky(M)
    V = cholesky_solve(rhs, L).T                      # [D, K]
    return V


def dict_learning(X, n_components, alpha=1.0, constrained=True, persist=False,
                  lambd=1e-2, steps=60, key=None, algorithm="ista",
                  dict_update="sequential", block_lambd=1e-6, positive=False,
                  progbar=False, **solver_kwargs):
    """Alternating sparse-coding / dictionary-update EM loop
    (reference dl.py:23-53).

    The whole loop runs as one jitted ``lax.scan``; returns
    ``(weight, losses)`` with ``losses: [steps]`` tracked on device.
    ``progbar`` prints per-step losses via ``jax.debug.print`` (the
    reference uses tqdm host-side).

    ``dict_update`` selects the constrained M-step: ``'sequential'``
    (reference-parity per-atom scan, order-dependent) or ``'block'``
    (joint ridge fit + renormalization + degenerate-atom re-init —
    order-free and ~2.5x faster at production sizes; see
    :func:`update_dict_block`). Ignored when ``constrained=False``.
    ``lambd`` regularizes the unconstrained ridge M-step (scaled by N);
    ``block_lambd`` is the block M-step's small stabilizing ridge — kept
    separate because the block fit is renormalized to unit columns, so
    it wants a much weaker ridge than the unconstrained Newton step.

    ``positive=True`` (constrained only) projects atoms onto the
    nonnegative orthant in the M-step; combine with the solvers'
    ``nonneg=True`` (via ``solver_kwargs``) for fully nonnegative
    sparse NMF-style factorizations.
    """
    if dict_update not in ("sequential", "block"):
        raise ValueError(f"dict_update must be 'sequential' or 'block', "
                         f"got {dict_update!r}")
    if positive and not constrained:
        raise ValueError("positive=True requires constrained=True (the "
                         "ridge M-step has no nonnegativity projection)")
    n_samples, n_features = X.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    key, init_key = jax.random.split(key)

    weight = jax.nn.initializers.orthogonal()(
        init_key, (n_features, n_components), dtype=X.dtype)
    if constrained:
        weight = weight / (jnp.linalg.norm(weight, axis=0, keepdims=True) + 1e-30)

    Z0_init = jnp.zeros((n_samples, n_components), dtype=X.dtype)
    step_keys = jax.random.split(key, steps)

    def em_step(carry, step_key):
        weight, Z0 = carry
        z0_arg = Z0 if persist else None
        Z = sparse_encode(X, weight, alpha, z0=z0_arg, algorithm=algorithm,
                          **solver_kwargs)
        loss = lasso_loss(X, Z, weight, alpha)
        if progbar:
            jax.debug.print("dict_learning loss: {l}", l=loss)
        if constrained and dict_update == "sequential":
            weight_new, Z = update_dict(weight, X, Z, key=step_key,
                                        positive=positive)
        elif constrained:
            weight_new, Z = update_dict_block(weight, X, Z, key=step_key,
                                              lambd=block_lambd,
                                              positive=positive)
        else:
            weight_new = update_dict_ridge(X, Z, lambd=lambd)
        return (weight_new, Z), loss

    (weight, _), losses = lax.scan(em_step, (weight, Z0_init), step_keys)
    return weight, losses


def update_dict_online(dictionary, A, B, sweeps=1, positive=False,
                       eps=1e-10, axis_name=None):
    """Online dictionary update from sufficient statistics (Mairal,
    Bach, Ponce & Sapiro 2009, Algorithm 2 — TPU extension; no
    reference counterpart).

    Given the accumulated statistics ``A = sum z z^T`` ([K, K]) and
    ``B = sum x^T z`` ([D, K]), performs ``sweeps`` passes of block
    coordinate descent over atoms:

        u_k = w_k + (B[:, k] - W A[:, k]) / A[k, k]
        w_k = u_k / max(||u_k||_2, 1)        (unit-ball projection)

    Atoms with ``A[k, k] < eps`` (never activated) are left unchanged.
    The statistics are already globally reduced by the caller under a
    mesh (``axis_name`` is accepted for signature symmetry but unused —
    A and B are replicated once accumulated).
    """
    del axis_name
    n_components = dictionary.shape[1]

    def atom(k, W):
        a_kk = A[k, k]
        u = W[:, k] + (B[:, k] - jnp.matmul(W, A[:, k])) \
            / jnp.maximum(a_kk, eps)
        if positive:
            u = jnp.maximum(u, 0.0)
        w_new = u / jnp.maximum(jnp.linalg.norm(u), 1.0)
        w_new = jnp.where(a_kk < eps, W[:, k], w_new)
        return W.at[:, k].set(w_new)

    def sweep(_, W):
        return lax.fori_loop(0, n_components, atom, W)

    return lax.fori_loop(0, sweeps, sweep, dictionary)


def dict_learning_online(X, n_components, alpha=1.0, batch_size=256,
                         steps=500, key=None, algorithm="ista",
                         forget=None, positive=False, eps=1e-10,
                         dict_sweeps=1, stats_jitter=1e-6, progbar=False,
                         **solver_kwargs):
    """Online (minibatch) dictionary learning — Mairal et al. 2009
    (TPU extension; the reference only ships full-batch EM).

    Each step draws a ``batch_size`` minibatch (uniformly with
    replacement, pre-drawn keys), sparse-codes it under the current
    dictionary, folds it into the sufficient statistics

        A <- gamma A + Z^T Z / batch_size
        B <- gamma B + X^T Z / batch_size

    (``gamma = forget`` in (0, 1] for exponential forgetting on
    non-stationary streams; ``None`` = 1, the paper's plain
    accumulation), then runs ``dict_sweeps`` block-coordinate atom
    sweeps (:func:`update_dict_online`). Memory is O(K^2 + DK + B*D)
    regardless of len(X) — the large-N training path: the full-batch
    EM's per-step cost is one encode of ALL N samples, while T online
    steps touch T*batch_size rows total.

    The whole run is one jitted ``lax.scan``; returns
    ``(weight, losses)`` with ``losses[t]`` the minibatch lasso loss at
    step t (a noisy but unbiased progress signal; evaluate on held-out
    data with :func:`dict_evaluate` for a clean number).

    ``stats_jitter`` seeds ``A`` with a small multiple of the identity
    so the first atom updates are well-conditioned (the paper's ``t0``
    warm-up plays the same role).
    """
    n_samples, n_features = X.shape
    if not 0 < batch_size:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    batch_size = min(batch_size, n_samples)
    if forget is not None and not 0.0 < forget <= 1.0:
        raise ValueError(f"forget must be in (0, 1], got {forget}")
    gamma = 1.0 if forget is None else float(forget)
    if key is None:
        key = jax.random.PRNGKey(0)
    key, init_key, idx_key = jax.random.split(key, 3)

    weight = jax.nn.initializers.orthogonal()(
        init_key, (n_features, n_components), dtype=X.dtype)
    weight = weight / (jnp.linalg.norm(weight, axis=0, keepdims=True)
                       + 1e-30)

    idx = jax.random.randint(idx_key, (steps, batch_size), 0, n_samples)
    A0 = stats_jitter * jnp.eye(n_components, dtype=X.dtype)
    B0 = stats_jitter * weight

    def step(carry, idx_t):
        W, A, B = carry
        x_t = X[idx_t]                                     # [B, D]
        Z = sparse_encode(x_t, W, alpha, algorithm=algorithm,
                          **solver_kwargs)
        loss = lasso_loss(x_t, Z, W, alpha)
        if progbar:
            jax.debug.print("dict_learning_online loss: {l}", l=loss)
        A = gamma * A + jnp.matmul(Z.T, Z) / batch_size
        B = gamma * B + jnp.matmul(x_t.T, Z) / batch_size
        W = update_dict_online(W, A, B, sweeps=dict_sweeps,
                               positive=positive, eps=eps)
        return (W, A, B), loss

    (weight, _, _), losses = lax.scan(step, (weight, A0, B0), idx)
    return weight, losses
