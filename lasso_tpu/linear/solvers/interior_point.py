"""Primal-dual log-barrier interior point (basis pursuit denoising).

TPU-native rebuild of /root/reference/lasso/linear/solvers/interior_point.py
(Chen et al. 2001 via Schmidt 2005 §2.3): positive/negative variable split
``z = [z+, z-]``, Sardy-style initialization from the ridge estimate, Newton
steps on the perturbed KKT system via per-sample normal-equations Cholesky,
fraction-to-boundary step sizes, and a per-sample barrier parameter.

Structural changes vs the reference (math preserved):
* the Newton loop with per-iteration host syncs (ip.py:151-219) is one
  ``lax.while_loop`` whose mean-feasibility/gap stopping test runs on
  device;
* the batched KKT matrix build ``M = W diag(d) W^T + I`` (ip.py:171-172)
  is a single einsum into ``[B, D, D]`` followed by the batched Cholesky
  solve (LU fallback in-graph) — OR, for large problems, a matrix-free
  warm-started batched CG on the same normal equations that never
  materializes M (``kkt_solver='cg'``; the reference has no equivalent —
  its [B, D, D] build is an OOM at the headline batch sizes);
* the feasibility asserts of the initializer (ip.py:65-67) cannot raise
  inside jit; the initialization guarantees them mathematically for
  ``alpha > 0`` (s = alpha - lambda W_pn with |lambda W| < alpha by
  construction).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from lasso_tpu.config import get_precision
from lasso_tpu.linalg.basic import batch_cholesky_solve, ridge

_INF = float("inf")


def _general_inverse(x, eps=1e-5):
    """Reciprocal with small values zeroed (reference ip.py:32-35)."""
    small = jnp.abs(x) < eps
    return jnp.where(small, 0.0, 1.0 / jnp.where(small, 1.0, x))


def _normal_cg(W, d, b, x0, maxiter, rtol, prec):
    """Matrix-free batched CG on ``(W diag(d_i) W^T + I) x_i = b_i``.

    W: [D, 2K], d: [B, 2K], b/x0: [B, D]. The normal matrix is never
    materialized — each CG iteration is two [B, D] x [D, 2K]-class
    matmuls (``((v W) * d) W^T + v``), so memory stays O(B(D+K)) instead
    of the Cholesky path's O(B D^2). The +I term bounds the spectrum
    from below at 1, so the system is always PD; ``rtol`` is the global
    relative-residual exit ``sum ||r_i||^2 <= rtol^2 * sum ||b_i||^2``.
    Warm-started from the previous Newton step's solution (x0).

    Deliberately unpreconditioned: as mu -> 0 the barrier weights d spike
    on the (few) active coordinates, making M a low-rank perturbation of
    I — Jacobi scaling mis-handles exactly that structure (measured WORSE
    trajectories than plain CG at equal iteration budgets).
    """
    def Adot(v):
        t = jnp.matmul(v, W, precision=prec) * d           # [B, 2K]
        return jnp.matmul(t, W.T, precision=prec) + v      # [B, D]

    def pdot(u, v):
        return jnp.sum(u * v, axis=1, keepdims=True)       # [B, 1]

    def safe_div(num, den):
        ok = den != 0
        return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)

    r0 = b - Adot(x0)
    rs0 = pdot(r0, r0)
    stop_at = rtol * rtol * jnp.sum(jnp.square(b))

    def cond(state):
        _, _, _, rs, k = state
        return jnp.logical_and(jnp.sum(rs) > stop_at, k < maxiter)

    def body(state):
        x, r, p, rs, k = state
        Ap = Adot(p)
        a = safe_div(rs, pdot(p, Ap))
        x = x + a * p
        r = r - a * Ap
        rs_new = pdot(r, r)
        p = r + safe_div(rs_new, rs) * p
        return (x, r, p, rs_new, k + 1)

    x, _, _, _, _ = lax.while_loop(cond, body, (x0, r0, r0, rs0,
                                                jnp.asarray(0)))
    return x


def _initialize_params(z0, weight, alpha, prec):
    """Sardy et al. (2000) §2.3 initialization (reference ip.py:38-69)."""
    z0_pn = jnp.concatenate([jnp.maximum(z0, 0.0), jnp.maximum(-z0, 0.0)], 1)
    weight_pn = jnp.concatenate([weight, -weight], 1)          # [D, 2K]

    z = z0_pn + 0.1

    y = jnp.matmul(jnp.sign(z0_pn), weight_pn.T, precision=prec)  # [B, D]
    omega = 1.1 * jnp.max(
        jnp.abs(jnp.matmul(y, weight, precision=prec)), axis=1, keepdims=True)
    lmbda = alpha * y / jnp.maximum(omega, 1e-30)              # [B, D]
    s = alpha - jnp.matmul(lmbda, weight_pn, precision=prec)   # [B, 2K]
    return z, lmbda, s, weight_pn


def interior_point(x, weight, z0=None, alpha=1.0, maxiter=20,
                   barrier_init=0.1, tol=1e-2, eps=None, precision=None,
                   per_sample=False, kkt_solver="auto", cg_rtol="forcing",
                   cg_maxiter=None, barrier_schedule="reference",
                   sigma=0.1, axis_name=None, verbose=False,
                   return_iters=False):
    """Interior-point lasso solver (reference ip.py:93-224).

    x: [B, D], weight: [D, K] -> (z: [B, K], success: bool scalar).

    ``per_sample=True`` upgrades the reference's mean-over-batch stopping
    test (ip.py:210-219) to independent per-sample feasibility/gap tests:
    a sample's primal-dual state freezes permanently once its own
    criteria pass, so one ill-conditioned sample cannot drive the whole
    batch's barrier schedule past everyone else's convergence point.
    ``success`` is then a per-sample bool vector [B]. Default False for
    reference parity.

    ``kkt_solver`` selects how each Newton step's normal equations
    ``(W diag(d) W^T + I) d_lambda = rhs`` are solved:

    * ``'cholesky'`` — materialize the per-sample ``[B, D, D]`` normal
      matrix and batch-factorize (the reference's approach,
      ip.py:171-173). Exact, but memory is O(B D^2): ~17 GB at the
      headline 16384x(512->2048) config — an OOM on a 16 GB chip.
    * ``'cg'`` — matrix-free batched conjugate gradient on the same
      system (two [B,D]x[D,2K] matmuls per CG iteration, normal matrix
      never built, memory O(B(D+K))), warm-started from the previous
      Newton step's solution. The +I term keeps the system PD at every
      barrier value. ``cg_rtol`` (relative-residual exit) and
      ``cg_maxiter`` (default ``min(2 D, 512)``) control the inner
      solve; at their defaults the two paths agree to ~1e-5 relative
      objective (test_heavy_solvers.py pins it).

      ``cg_rtol='forcing'`` (the default) is an INEXACT-NEWTON forcing
      sequence (Dembo-Eisenstat-Steihaug): each Newton iteration's
      inner relative-residual target is ``clip(0.1 * gap, 1e-7, 1e-2)``
      where ``gap`` is the current batch-mean normalized duality gap —
      loose inner solves while far from the central path (where an
      exact Newton direction is wasted anyway), tightening
      geometrically as the gap contracts. TPU-measured equal-gap wins
      at every scale tried (1.31x on 'adaptive' at 8192-16384 x
      (512->2048), 1.13x on 'mehrotra'; benchmarks/
      ip_headline_bench.py), and its 1e-7 floor is TIGHTER than the
      old fixed 1e-6 default. Pass a float to pin a fixed tolerance
      instead (x64 certification runs use e.g. 1e-13).
    * ``'auto'`` — 'cholesky' while the [B, D, D] build stays under
      1 GB, 'cg' beyond (the headline-scale default).

    ``barrier_schedule`` selects how the barrier parameter mu shrinks:

    * ``'reference'`` (default) — the reference's step-size-coupled decay
      ``mu *= 1 - min(beta)`` (ip.py:198). Its terminal accuracy is
      schedule-capped: once steps shorten near the central path, mu stops
      shrinking and the relative gap stalls (~7e-4 at 1024-class sizes,
      identical in x64 — it is the schedule, not arithmetic).
    * ``'adaptive'`` — complementarity-proportional centering:
      ``mu = sigma * <z, s> / (2K)`` per sample, so mu tracks the
      ACHIEVED duality measure each Newton step instead of a one-way
      decay; short steps no longer freeze the schedule and the gap
      keeps contracting geometrically (factor ~sigma per iteration
      once steps are unblocked). Reaches <=1e-5-class relative
      objective gaps where the reference schedule stalls
      (test_heavy_solvers pins it at equal Newton-iteration budgets).
      ``sigma`` is the centering parameter (0 < sigma < 1).
    * ``'mehrotra'`` — full predictor-corrector (Mehrotra 1992): each
      Newton iteration first solves the AFFINE system (mu = 0) to probe
      how far pure Newton could go, sets the centering parameter
      adaptively per sample (``sigma_i = (mu_aff / mu)^3``), then solves
      the CORRECTOR system whose complementarity rhs also cancels the
      second-order term ``dz_aff * ds_aff``. Both solves share one
      normal matrix: the Cholesky path builds (and factorizes) M once
      per iteration with two triangular solves' worth of extra work,
      and the CG path warm-starts the corrector from the affine
      direction. ~2x fewer Newton iterations to a given gap than
      'adaptive' (test_heavy_solvers pins the iteration advantage);
      the ``sigma`` argument is ignored. With ``kkt_solver='cg'`` the
      INNER solve accuracy must track the target gap: the predictor
      conditions the normal equations like the terminal
      complementarity, so sub-1e-5-class gaps need
      ``cg_maxiter``/``cg_rtol`` tightened (x64-measured: defaults are
      fine to ~1e-5; cg_maxiter=2000, cg_rtol=1e-13 matches the
      Cholesky path's 4e-8 exactly). Rows whose inner solve breaks
      down keep their last finite iterate (in-body guard) rather than
      returning NaN.

    ``eps`` (the ``_general_inverse`` small-value cutoff, ip.py:32-35)
    sets the terminal-accuracy floor: dual slacks below it have their
    inverses zeroed, which freezes those coordinates' Newton components,
    so the achievable gap is eps-class. ``None`` resolves to the
    reference's 1e-5 under the reference schedule (parity) and to 1e-8
    under 'adaptive' (measured: the adaptive schedule stalls at ~4e-5
    with the 1e-5 cutoff and reaches ~3e-8 with 1e-8 in x64).

    ``axis_name``: when the batch is sharded over a mesh axis inside
    ``jax.shard_map``, pass the axis name so the default mean-over-batch
    stopping test (and verbose report columns) psum-reduce to the global
    batch mean, preserving the reference's whole-batch semantics.
    ``per_sample=True`` needs no reduction (rows are whole in a shard).
    """
    if barrier_schedule not in ("reference", "adaptive", "mehrotra"):
        raise ValueError(f"barrier_schedule must be 'reference', "
                         f"'adaptive' or 'mehrotra', got "
                         f"{barrier_schedule!r}")
    if eps is None:
        if barrier_schedule == "reference":
            eps = 1e-5
        elif barrier_schedule == "mehrotra" and x.dtype == jnp.float32:
            # TPU-measured (benchmarks/ip_headline_bench.py, f32
            # headline 16384x(512->2048)): the predictor drives slacks
            # to the inverse-cutoff regime within ~20 iterations, where
            # d = z/s spikes ~1/eps and the f32 normal-equations CG
            # breaks down (objectives exploded to ~1e72 with eps=1e-8;
            # 'adaptive' never reaches that regime at practical
            # budgets). The 1e-5 floor keeps d within f32-safe
            # conditioning; the achievable gap is then eps-class —
            # still far below 'adaptive' f32 terminal gaps. x64 keeps
            # 1e-8 (certified to 4e-8 gaps in tests).
            eps = 1e-5
        else:
            eps = 1e-8
    prec = get_precision(precision)
    batch_size, input_size = x.shape
    assert weight.ndim == 2 and weight.shape[0] == input_size
    if z0 is None:
        z0 = ridge(x.T, weight, alpha=alpha).T

    if kkt_solver == "auto":
        kkt_solver = ("cholesky" if batch_size * input_size ** 2 * 4
                      <= 2 ** 30 else "cg")
    if kkt_solver not in ("cholesky", "cg"):
        raise ValueError(f"kkt_solver must be 'auto', 'cholesky' or 'cg', "
                         f"got {kkt_solver!r}")
    if cg_maxiter is None:
        cg_maxiter = min(2 * input_size, 512)
    cg_forcing = isinstance(cg_rtol, str)
    if cg_forcing and cg_rtol != "forcing":
        raise ValueError(f"cg_rtol must be a float or 'forcing', got "
                         f"{cg_rtol!r}")

    def batch_mean(v):
        """Mean over the (possibly sharded) global batch."""
        if axis_name is None:
            return jnp.mean(v)
        total = lax.psum(jnp.sum(v), axis_name)
        count = lax.psum(jnp.asarray(v.shape[0], v.dtype), axis_name)
        return total / count

    mu0 = barrier_init * jnp.ones((batch_size, 1), x.dtype)
    z_init, lmbda_init, s_init, W = _initialize_params(z0, weight, alpha, prec)
    eye = (jnp.eye(input_size, dtype=x.dtype) if kkt_solver == "cholesky"
           else None)

    def body(state):
        z, lmbda, s, mu, dl_prev, k, done_prev, _ = state

        # KKT residuals (ip.py:157-159)
        ra = -jnp.matmul(lmbda, W, precision=prec) - s + alpha   # [B, 2K]
        rb = x - jnp.matmul(z, W.T, precision=prec) - lmbda      # [B, D]
        rc = mu - z * s                                          # [B, 2K]

        # Newton directions (ip.py:165-179)
        s_inv = _general_inverse(s, eps)
        d = s_inv * z                                            # [B, 2K]
        if kkt_solver == "cg" and cg_forcing:
            # inexact-Newton forcing: the inner target tracks the
            # CURRENT normalized duality gap (see docstring)
            gap_cur = batch_mean(
                jnp.sum(z * s, axis=1)
                / (1 + jnp.linalg.norm(z, axis=1)
                   * jnp.linalg.norm(lmbda, axis=1)))
            rtol_k = jnp.clip(0.1 * gap_cur, 1e-7, 1e-2)
        else:
            rtol_k = cg_rtol
        if kkt_solver == "cholesky":
            # M = W diag(d) W^T + I per sample: [B, D, D] — built ONCE
            # per iteration (both Mehrotra solves share it)
            M = jnp.einsum("dk,bk,ek->bde", W, d, W,
                           precision=prec, optimize=True) + eye

        def directions(rc_vec, warm):
            """Newton directions for a given complementarity rhs; the
            normal matrix (d) is fixed within the iteration, so the
            predictor and corrector reuse the same M / CG operator."""
            rhs = s_inv * rc_vec - d * ra
            rhs = rb - jnp.matmul(rhs, W.T, precision=prec)      # [B, D]
            if kkt_solver == "cholesky":
                d_l = batch_cholesky_solve(rhs, M)               # [B, D]
            else:
                d_l = _normal_cg(W, d, rhs, warm,
                                 cg_maxiter, rtol_k, prec)       # [B, D]
            d_sl = ra - jnp.matmul(d_l, W, precision=prec)
            d_zc = s_inv * (rc_vec - z * d_sl)
            return d_zc, d_l, d_sl

        def ftb(v, dv):
            """Fraction-to-boundary step length, capped at 1."""
            beta = jnp.min(jnp.where(dv >= 0, _INF, -v / dv), 1,
                           keepdims=True)
            return jnp.clip(beta, None, 1.0)

        if barrier_schedule == "mehrotra":
            # predictor: pure-Newton (mu = 0) affine-scaling probe
            dz_aff, dl_aff, ds_aff = directions(-z * s, dl_prev)
            a_z = ftb(z, dz_aff)
            a_s = ftb(s, ds_aff)
            mu_cur = jnp.mean(z * s, axis=1, keepdims=True)      # [B, 1]
            mu_aff = jnp.mean((z + a_z * dz_aff) * (s + a_s * ds_aff),
                              axis=1, keepdims=True)
            # adaptive per-sample centering: aggressive (sigma -> 0)
            # where the affine step nearly clears complementarity,
            # conservative (sigma -> 1) where it is blocked
            ratio = mu_aff / jnp.maximum(mu_cur, 1e-30)
            sigma_m = jnp.clip(ratio, 0.0, 1.0) ** 3
            # corrector: center on sigma*mu and cancel the second-order
            # complementarity term dz_aff * ds_aff (Mehrotra 1992).
            # The term is CLAMPED to a multiple of the current duality
            # measure (Gondzio-style target-complementarity safeguard):
            # an inexact inner solve can make dz_aff * ds_aff enormous
            # for blocked coordinates, and an unclamped corrector then
            # amplifies it into divergence (f32 headline, measured);
            # clamping only degrades those coordinates to first-order
            soc = jnp.clip(dz_aff * ds_aff, -10.0 * mu_cur,
                           10.0 * mu_cur)
            rc = sigma_m * mu_cur - soc - z * s
            d_z, d_lmbda, d_s = directions(rc, dl_aff)
        else:
            d_z, d_lmbda, d_s = directions(rc, dl_prev)

        # fraction-to-boundary step sizes (ip.py:186-198)
        beta_z = jnp.min(jnp.where(d_z >= 0, _INF, -z / d_z), 1, keepdims=True)
        beta_sl = jnp.min(jnp.where(d_s >= 0, _INF, -s / d_s), 1, keepdims=True)
        beta_z = jnp.clip(beta_z, None, 1.0)
        beta_sl = jnp.clip(beta_sl, None, 1.0)

        z_new = jnp.maximum(z + 0.99 * beta_z * d_z, 0.0)
        lmbda_new = lmbda + 0.99 * beta_sl * d_lmbda
        s_new = jnp.maximum(s + 0.99 * beta_sl * d_s, 0.0)

        # per-row finiteness guard: at extreme terminal conditioning an
        # inexact inner solve (kkt_solver='cg' past its accuracy budget)
        # can produce a non-finite direction; keep that row's last good
        # iterate instead of poisoning the output
        row_ok = (jnp.isfinite(jnp.sum(z_new, axis=1))
                  & jnp.isfinite(jnp.sum(lmbda_new, axis=1))
                  & jnp.isfinite(jnp.sum(s_new, axis=1)))[:, None]
        z_new = jnp.where(row_ok, z_new, z)
        lmbda_new = jnp.where(row_ok, lmbda_new, lmbda)
        s_new = jnp.where(row_ok, s_new, s)
        if barrier_schedule == "adaptive":
            # center on a fraction of the achieved per-sample duality
            # measure <z, s> / (2K) instead of the reference's one-way
            # step-coupled decay (see docstring)
            mu_new = sigma * (jnp.sum(z_new * s_new, axis=1, keepdims=True)
                              / z.shape[1])
        elif barrier_schedule == "mehrotra":
            # mu is re-derived inside the predictor each iteration; the
            # carry just tracks the achieved duality measure
            mu_new = jnp.mean(z_new * s_new, axis=1, keepdims=True)
        else:
            mu_new = mu * (1 - jnp.clip(jnp.minimum(beta_z, beta_sl),
                                        None, 0.99))

        # stopping criteria (ip.py:210-219): batch-mean by default,
        # per-sample when requested
        z_norm = jnp.linalg.norm(z_new, axis=1)
        l_norm = jnp.linalg.norm(lmbda_new, axis=1)
        prim_i = jnp.linalg.norm(rb, axis=1) / (1 + z_norm)
        dual_i = jnp.linalg.norm(ra, axis=1) / (1 + l_norm)
        gap_i = jnp.sum(z_new * s_new, axis=1) / (1 + z_norm * l_norm)
        if per_sample:
            done_i = done_prev | ((prim_i < tol) & (dual_i < tol)
                                  & (gap_i < tol))               # [B]
            keep = done_prev[:, None]
            z_new = jnp.where(keep, z, z_new)
            lmbda_new = jnp.where(keep, lmbda, lmbda_new)
            s_new = jnp.where(keep, s, s_new)
            mu_new = jnp.where(keep, mu, mu_new)
            success = done_i
            all_done = jnp.all(done_i)
        else:
            prim_feas = batch_mean(prim_i)
            dual_feas = batch_mean(dual_i)
            gap = batch_mean(gap_i)
            success = (prim_feas < tol) & (dual_feas < tol) & (gap < tol)
            all_done = success

        if verbose:
            # iteration report columns matching the reference's BasicReport
            # (ip.py:11-14, 215-216)
            import jax
            objf = alpha * jnp.sum(z_new) + 0.5 * jnp.sum(jnp.square(lmbda_new))
            jax.debug.print(
                "niter {k}  obj {o:.4e}  prim {p:.2e}  dual {d:.2e}  gap {g:.2e}",
                k=k + 1, o=objf, p=batch_mean(prim_i), d=batch_mean(dual_i),
                g=batch_mean(gap_i))

        return (z_new, lmbda_new, s_new, mu_new, d_lmbda, k + 1,
                success, all_done)

    def cond(state):
        _, _, _, _, _, k, _, done = state
        return jnp.logical_and(jnp.logical_not(done), k < maxiter)

    success0 = (jnp.zeros((batch_size,), bool) if per_sample
                else jnp.asarray(False))
    init = (z_init, lmbda_init, s_init, mu0, jnp.zeros_like(x),
            jnp.asarray(0), success0, jnp.asarray(False))
    z, _, _, _, _, k, success, _ = lax.while_loop(cond, body, init)

    z_pos, z_neg = jnp.split(z, 2, axis=1)
    zf = z_pos - z_neg
    if return_iters:
        return zf, success, k
    return zf, success
