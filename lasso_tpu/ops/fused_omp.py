"""Pallas kernel: the ENTIRE batched OMP solve in one invocation.

VERDICT r3 item 2: even after the incremental-Gram + append-Cholesky
redesign, the XLA OMP loop (linear/solvers/omp.py) still costs
~59 ms/iteration at the 16384x(512->2048) T=64 headline — the residual
spread across the argmax selection, the one-hot gathers, the [N, T, D]
W_S contractions (2 GB HBM reads each) and ~10 dispatches per
iteration. This kernel moves the WHOLE T-iteration greedy solve into
one ``pallas_call``: per 128-sample lane tile the residual, the
orthonormal basis stack Q [T, D, bn], the R factor and the selection
mask all stay VMEM-resident; per-iteration HBM traffic is ZERO.

Formulation: QR-OMP via modified Gram-Schmidt (mathematically the same
greedy recursion as the solver's Cholesky paths; rounding differs):

  r_0 = x
  k-th step:  c    = W^T r            (one [K, D] x [D, bn] MXU dot)
              k*   = argmax |c| / ||w||   (masked by the selected set)
              w    = W e_{k*}         (one-hot MXU gather, exact)
              w    = w - sum_t (q_t . w) q_t       (MGS; R[t, k] = coef)
              q_k  = w / ||w||,  R[k, k] = ||w||
              d_k  = q_k . r
              r   <- r - d_k q_k      (r == the exact LS residual)
  after T steps: back-substitute R z_s = d (column-oriented, VPU).

Per-sample atom selection, the Gram/QR update, and the LS solve — the
three pieces the while_loop paid dispatches and HBM for — are one
kernel. MXU work per step is the same two [K, D]-class dots the XLA
path needs; everything else is lane-parallel VPU with samples on the
128-lane axis. The selected-set mask uses the same first-max argmax
tie-breaking as ``jnp.argmax``; frozen (tol-converged) lanes append
nothing (q_k = 0, R column = e_k, d_k = 0), reproducing the solver's
exact freeze semantics.

Matmul precision: the correlation dot runs split-float bf16x3
(kernel_precision='f32', f32-grade scores) or a single bf16 pass
('bf16' — selection only; the solve itself is always VPU f32). The
dictionary gather is a 2-pass split gather (one-hot is exact in bf16).
Interpret mode emulates Mosaic's bf16 operand truncation via
``lax.reduce_precision`` exactly as ops/fused_ista.py.

Used by :func:`lasso_tpu.linear.solvers.omp.orthogonal_matching_pursuit`
as ``solver='fused'`` (the TPU 'auto' default for supported shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lasso_tpu.ops.precision import (dot_nn as _dot_nn,
                                     round_bf16 as _round_bf16,
                                     split_bf16 as _split_bf16,
                                     split_bf16_xla as _split_bf16_xla)


def _make_omp_kernel(T, Tp, D, K, split_float, emulate=False, gs="mgs",
                     profile=None):
    """Kernel body builder.

    ``gs`` selects the orthogonalization scheme:

    * ``'mgs'`` (default) — modified Gram-Schmidt with a DYNAMIC trip
      count: step k projects against exactly the k resident basis
      vectors (``fori_loop(0, k, ...)``; rows >= k are zero anyway, so
      this is bit-identical to the round-4 fixed-T loop that read them
      all). TPU-measured (benchmarks/omp_roofline.py, headline T=64):
      the GS stage is VMEM-THROUGHPUT-bound at ~1.9 ms/iter when every
      step reads all T rows — 52% of the whole iteration — and the
      dynamic bound halves it (0.95 ms/iter; whole solve 0.241 →
      0.177 s f32 / 0.152 s bf16, identical RSS).
    * ``'cgs2'`` — classical Gram-Schmidt with one reorthogonalization
      pass ("twice is enough", Giraud et al. 2005): ALL T projection
      coefficients in two bulk [T, D, bn] passes, no sequential
      t-chain. TPU-measured a WASH vs fixed-T MGS (2.00 vs 1.92
      ms/iter): the stage was never latency-bound, and CGS2's 2×
      VMEM reads cancel its better pipelining. Kept as the measured
      counter-hypothesis and interpret-mode cross-check.

    ``profile`` (None | 'no_gs' | 'select_only') builds TIMING variants
    for the roofline accounting (benchmarks/omp_roofline.py): 'no_gs'
    skips the orthogonalization work, 'select_only' additionally skips
    the atom gather + residual update. Their outputs are wrong by
    construction — never expose them through the solver API.
    """
    def kernel(scal_ref, x_ref, *refs):
        refs = list(refs)
        if split_float:
            wt_hi, wt_lo = refs.pop(0)[:], refs.pop(0)[:]   # [K, D]
            w_hi, w_lo = refs.pop(0)[:], refs.pop(0)[:]     # [D, K]
        else:
            wt = refs.pop(0)[:]
            w_hi, w_lo = refs.pop(0)[:], refs.pop(0)[:]
        invn = refs.pop(0)[:]                               # [K, 1]
        idx_ref, valid_ref, z_ref, q_s, r_s = refs
        tol = scal_ref[0, 0]                                # < 0: disabled

        x = x_ref[:]                                        # [D, bn]
        bn = x.shape[1]
        iotaK = lax.broadcasted_iota(jnp.int32, (K, bn), 0)
        rowsT = lax.broadcasted_iota(jnp.int32, (Tp, bn), 0)

        # Q must read as zero beyond the appended rows: MGS coefficients
        # for t >= k then vanish without masking (and the first tile
        # never multiplies VMEM garbage)
        q_s[...] = jnp.zeros((T, D, bn), jnp.float32)

        def step(k, carry):
            r, sel, d, act = carry
            # --- tol freeze (sklearn semantics: squared residual norm)
            rss = jnp.sum(r * r, axis=0, keepdims=True)     # [1, bn]
            act = act * (rss > tol).astype(jnp.float32)
            # --- selection: c = W^T r, masked normalized argmax
            if split_float:
                r_hi, r_lo = _split_bf16(r, emulate)
                c = (_dot_nn(wt_hi, r_hi) + _dot_nn(wt_hi, r_lo)
                     + _dot_nn(wt_lo, r_hi))                # [K, bn]
            elif emulate:
                c = _dot_nn(_round_bf16(wt), _round_bf16(r))
            else:
                c = _dot_nn(wt, r.astype(wt.dtype))
            score = jnp.where(sel > 0, -1.0, jnp.abs(c) * invn)
            m = jnp.max(score, axis=0, keepdims=True)       # [1, bn]
            kstar = jnp.min(jnp.where(score == m, iotaK, K),
                            axis=0, keepdims=True)          # [1, bn] i32
            oh = (iotaK == kstar).astype(jnp.float32)       # [K, bn]
            sel = jnp.maximum(sel, oh * act)
            kstar = jnp.where(act > 0, kstar, 0)
            idx_ref[pl.ds(k, 1), :] = kstar
            valid_ref[pl.ds(k, 1), :] = act
            if profile == "select_only":
                # timing variant: selection dot only (output is wrong)
                r_s[pl.ds(k, 1), :, :] = jnp.zeros((1, Tp, bn),
                                                   jnp.float32)
                return (r, sel, d, act)
            # --- one-hot MXU gather of the chosen atoms (2-pass split)
            ohq = _round_bf16(oh) if emulate else oh.astype(jnp.bfloat16)
            w = _dot_nn(w_hi, ohq) + _dot_nn(w_lo, ohq)     # [D, bn]
            w0n = jnp.sum(w * w, axis=0, keepdims=True)     # [1, bn]
            # --- orthogonalize against the resident Q stack (rows >= k
            # are zero, so their coefficients vanish without masking)
            if profile == "no_gs":
                P = jnp.zeros((Tp, bn), jnp.float32)
            elif gs == "cgs2":
                # classical GS, two bulk passes (see builder docstring):
                # every pass is one [T, D, bn] multiply + sublane
                # reduction over D — throughput-bound VPU work with no
                # t-chain; coefficients accumulate exactly (c = c1 + c2)
                qs = q_s[...]                               # [T, D, bn]
                c1 = jnp.sum(qs * w[None, :, :], axis=1)    # [T, bn]
                w = w - jnp.sum(c1[:, None, :] * qs, axis=0)
                c2 = jnp.sum(qs * w[None, :, :], axis=1)
                w = w - jnp.sum(c2[:, None, :] * qs, axis=0)
                coef = c1 + c2
                P = (coef if Tp == T else
                     jnp.concatenate(
                         [coef, jnp.zeros((Tp - T, bn), jnp.float32)],
                         axis=0))
            else:
                def proj(t, c2):
                    wv, Pv = c2
                    qt = q_s[pl.ds(t, 1), :, :].reshape(D, bn)
                    cf = jnp.sum(qt * wv, axis=0, keepdims=True)
                    wv = wv - cf * qt
                    Pv = Pv + (rowsT == t).astype(jnp.float32) * cf
                    return (wv, Pv)

                # dynamic trip count: only rows 0..k-1 are populated at
                # step k (q_k is written below) — reading the zero tail
                # was pure VMEM traffic (see builder docstring)
                w, P = lax.fori_loop(0, k, proj,
                                     (w, jnp.zeros((Tp, bn),
                                                   jnp.float32)))
            nrm2 = jnp.sum(w * w, axis=0, keepdims=True)
            # relative pivot floor: a linearly-dependent selection
            # (duplicated atom on a degenerate dictionary) would give
            # ||w_orth|| ~ 0 -> inf/NaN; the floor bounds it while
            # leaving healthy pivots bit-unchanged (same policy as
            # ops/batched_cholesky._make_append_kernel)
            pivot = jnp.maximum(nrm2, 1e-12 * w0n + 1e-30)
            qk = (w * lax.rsqrt(pivot)) * act               # [D, bn]
            d_k = jnp.sum(qk * r, axis=0, keepdims=True)    # [1, bn]
            selk = (rowsT == k).astype(jnp.float32)
            col = jnp.where(act > 0, P + selk * jnp.sqrt(pivot), selk)
            r_s[pl.ds(k, 1), :, :] = col.reshape(1, Tp, bn)
            q_s[pl.ds(k, 1), :, :] = qk.reshape(1, D, bn)
            d = d + selk * d_k                              # d_k: act-masked
            r = r - d_k * qk
            return (r, sel, d, act)

        _, _, d, _ = lax.fori_loop(
            0, T, step,
            (x, jnp.zeros((K, bn), jnp.float32),
             jnp.zeros((Tp, bn), jnp.float32),
             jnp.ones((1, bn), jnp.float32)))

        # --- column-oriented back-substitution R z = d (frozen/unused
        # slots carry R column e_j and d_j = 0, solving to exactly 0)
        def bwd(s, c2):
            z, rhs = c2
            j = T - 1 - s
            col = r_s[pl.ds(j, 1), :, :].reshape(Tp, bn)
            selj = (rowsT == j).astype(jnp.float32)
            diag = jnp.sum(col * selj, axis=0, keepdims=True)
            zj = jnp.sum(rhs * selj, axis=0, keepdims=True) / diag
            z = z + selj * zj
            rhs = rhs - zj * jnp.where(rowsT < j, col, 0.0)
            return (z, rhs)

        z, _ = lax.fori_loop(0, T, bwd,
                             (jnp.zeros((Tp, bn), jnp.float32), d))
        z_ref[:] = z

    return kernel


_VMEM_BUDGET = 88 * 1024 * 1024


def _omp_tile_bytes(T, Tp, D, K, bn):
    """VMEM model for the default (gs='mgs') kernel: Q + R scratch,
    both W split orientations (bf16), the x tile, [K, bn]-class
    selection temporaries (c, score, sel, iota), and [D, bn]-class
    vectors (r, w, splits). gs='cgs2' additionally materializes a
    [T, D, bn]-class bulk temporary — opting into it near the VMEM
    boundary can push the compile over the limit (clear compiler
    error, not silent corruption)."""
    return (T * D * bn * 4 + T * Tp * bn * 4
            + 2 * 2 * K * D * 2
            + 5 * K * bn * 4
            + 6 * D * bn * 4)


def supports_fused_omp(N, D, K, T, dtype):
    """Gate: f32, MXU-aligned D/K, and the whole-solve working set
    within VMEM at the 128-lane tile."""
    Tp = -(-T // 8) * 8
    bn = min(128, N)
    return (dtype == jnp.float32 and D % 128 == 0 and K % 128 == 0
            and _omp_tile_bytes(T, Tp, D, K, bn) <= _VMEM_BUDGET)


@functools.partial(jax.jit,
                   static_argnames=("T", "interpret", "kernel_precision",
                                    "gs", "profile"))
def fused_omp_solve(x, weight, T, tol=None, interpret=False,
                    kernel_precision="f32", gs="mgs", profile=None):
    """Whole-solve fused OMP: greedy T-atom selection + LS fit in one
    kernel invocation per 128-sample tile.

    x: [N, D], weight: [D, K]. Returns ``(idx, valid, z_s)`` each
    [N, T]: per-sample support indices, slot validity (False once the
    ``tol`` residual stop froze the sample), and the LS coefficients on
    the support (f32-grade vs the solver's exact-Cholesky paths).

    ``gs``: 'mgs' (default — dynamic-trip-count modified Gram-Schmidt,
    reads only the k live basis rows at step k) or 'cgs2' (bulk
    two-pass classical GS); both are f32-grade, see
    :func:`_make_omp_kernel`. ``profile`` builds wrong-by-construction
    timing variants for the roofline bench only.
    """
    N, D = x.shape
    K = weight.shape[1]
    Tp = -(-T // 8) * 8
    bn = min(128, N)
    Np = -(-N // bn) * bn
    xt = x.T                                                # [D, N]
    if Np != N:
        xt = jnp.pad(xt, ((0, 0), (0, Np - N)))
    grid = (Np // bn,)

    nrm = jnp.sqrt(jnp.clip(jnp.sum(weight * weight, axis=0), 1e-30))
    invn = (1.0 / nrm).reshape(K, 1)
    scal = jnp.asarray(-1.0 if tol is None else tol,
                       jnp.float32).reshape(1, 1)

    wt = weight.T
    if kernel_precision == "f32":
        wt_hi, wt_lo = _split_bf16_xla(wt)
        w_args = (wt_hi, wt_lo)
        w_specs_kd = 2
    elif kernel_precision == "bf16":
        w_args = ((wt,) if interpret else (wt.astype(jnp.bfloat16),))
        w_specs_kd = 1
    else:
        raise ValueError(f"kernel_precision must be 'f32' or 'bf16', "
                         f"got {kernel_precision!r}")
    w_hi, w_lo = _split_bf16_xla(weight)

    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    tile_d = pl.BlockSpec((D, bn), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    tile_t = lambda: pl.BlockSpec((Tp, bn), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0),
                        memory_space=pltpu.SMEM)

    kernel = _make_omp_kernel(T, Tp, D, K,
                              kernel_precision == "f32",
                              emulate=interpret, gs=gs, profile=profile)

    idx_t, valid_t, z_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem, tile_d]
        + [full((K, D))] * w_specs_kd
        + [full((D, K))] * 2 + [full((K, 1))],
        out_specs=[tile_t(), tile_t(), tile_t()],
        out_shape=[jax.ShapeDtypeStruct((Tp, Np), jnp.int32),
                   jax.ShapeDtypeStruct((Tp, Np), jnp.float32),
                   jax.ShapeDtypeStruct((Tp, Np), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((T, D, bn), jnp.float32),
                        pltpu.VMEM((T, Tp, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=T * (3 if kernel_precision == "f32" else 1)
            * 2 * K * D * Np + T * T * D * Np * 4,
            bytes_accessed=(D * Np + 3 * T * Np) * 4 + 4 * K * D * 2,
            transcendentals=2 * T * Np,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(scal, xt, *w_args, w_hi, w_lo, invn)

    idx = idx_t[:T, :N].T
    valid = valid_t[:T, :N].T > 0
    z_s = jnp.where(valid, z_t[:T, :N].T, 0.0)
    return idx, valid, z_s
