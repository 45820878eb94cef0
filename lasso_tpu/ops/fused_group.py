"""Pallas MXU kernel: fully-fused group-lasso FISTA (S-step).

Same multi-step VMEM-residency design as :mod:`lasso_tpu.ops.fused_ista`
(S iterations per kernel invocation, iterates never leaving VMEM, the
dictionary resident across the grid), with the l1 prox replaced by the
GROUP shrink

    u_g = v_g * max(1 - theta_g / ||v_g||_2, 0)

realized the MXU way: per-group sums of squares and the scatter of the
per-group scale back to coordinates are two one-hot matmuls against a
[K, G] membership matrix (the exact-gather trick of ops/fused_cd.py) —
no reshapes of the lane axis, no segment ops, any group structure
(contiguous blocks or arbitrary id arrays) at identical cost. One-hot
bf16 operands make the membership products EXACT; the value operands
(v^2 and the scale row) follow the kernel's precision mode — split-float
bf16x3-style two-pass accumulation in 'f32' mode, single truncated pass
in 'bf16' mode (same scheme and rationale as fused_ista's dictionary
matmuls; see that module's docstring for the Mosaic precision story).

The sparse-group lasso's extra l1 term composes exactly as
``group_shrink(soft_threshold(v, l1_thresh))`` — one VPU shrink before
the group scaling, free next to the matmuls.

Group count is padded to a 128-lane multiple with empty groups: their
norms are exactly 0, the guarded scale resolves to 0, and the one-hot
scatter-back gives them no coordinates — pure lane padding.

Extra per-sub-step FLOPs vs plain fused FISTA: 2 x [bn,K]x[K,G_pad]
passes per split part — with G = K/8 and D = 512 that is ~17% on top of
the two dictionary matmuls, against the ~4x HBM-traffic win of fusion
(measured: the unfused XLA group step runs at ~200 it/s where plain
fused FISTA runs ~790 at the headline size).

TPU extension — the reference has no group lasso at all; the solver
semantics being fused are those of
:func:`lasso_tpu.linear.solvers.group_lasso.group_ista`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lasso_tpu.ops.fused_ista import _pick_block_n
from lasso_tpu.ops.precision import (dot_nn as _dot_nn,
                                     dot_nt as _dot_nt,
                                     round_bf16 as _round_bf16,
                                     split_bf16 as _split_bf16,
                                     split_bf16_xla as _split_bf16_xla)
from lasso_tpu.ops.shrink import soft_threshold


def _group_prox_mxu(v, thg_row, m_fwd, m_bwd, split_float, emulate):
    """In-kernel group shrink via one-hot matmuls.

    v: [bn, K] f32; thg_row: [1, G_pad] f32 (theta * w_g, garbage on
    padded groups is fine — their norms are 0); m_fwd: [K, G_pad],
    m_bwd: [G_pad, K] one-hot (bf16 compiled / f32 interpret).
    """
    sq = v * v
    if split_float:
        s_hi, s_lo = _split_bf16(sq, emulate)
        if emulate:
            mf, mb = _round_bf16(m_fwd), _round_bf16(m_bwd)
        else:
            mf, mb = m_fwd, m_bwd
        gsq = _dot_nn(s_hi, mf) + _dot_nn(s_lo, mf)
    elif emulate:
        mf, mb = _round_bf16(m_fwd), _round_bf16(m_bwd)
        gsq = _dot_nn(_round_bf16(sq), mf)
    else:
        mf, mb = m_fwd, m_bwd
        gsq = _dot_nn(sq.astype(mf.dtype), mf)
    norms = jnp.sqrt(jnp.maximum(gsq, 0.0))            # [bn, G_pad]
    nz = norms > 0.0
    scale = jnp.where(
        nz, jnp.maximum(1.0 - thg_row / jnp.where(nz, norms, 1.0), 0.0),
        0.0)
    if split_float:
        c_hi, c_lo = _split_bf16(scale, emulate)
        coord = _dot_nn(c_hi, mb) + _dot_nn(c_lo, mb)
    elif emulate:
        coord = _dot_nn(_round_bf16(scale), mb)
    else:
        coord = _dot_nn(scale.astype(mb.dtype), mb)
    return v * coord


def _make_group_multistep_kernel(steps, split_float, use_l1, restart,
                                 emulate):
    """S-step fused group-FISTA body. Operand order after the fixed
    (scal, x, z, zp) prefix: w refs (1 or 2), m_fwd, m_bwd, thg_row,
    [t_in]; outputs z_out, zp_out, [t_out], delta.

    scal rows: [lr, l1_thresh (l1_alpha*lr), mom, unused].
    """
    def kernel(scal_ref, x_ref, z_ref, zp_ref, *refs):
        refs = list(refs)
        if split_float:
            w_hi, w_lo = refs.pop(0)[:], refs.pop(0)[:]
        else:
            w = refs.pop(0)[:]
        m_fwd = refs.pop(0)[:]
        m_bwd = refs.pop(0)[:]
        thg_row = refs.pop(0)[:]                       # [1, G_pad]
        if restart:
            t = refs.pop(0)[:]                         # [bn, 1]
            z_out_ref, zp_out_ref, t_out_ref, delta_ref = refs
        else:
            z_out_ref, zp_out_ref, delta_ref = refs
        z = z_ref[:]
        zp = zp_ref[:]
        x = x_ref[:]
        for s in range(steps):
            if restart:
                t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) * 0.5
                y = z + ((t - 1.0) / t_next) * (z - zp)
            else:
                y = z + scal_ref[s, 2] * (z - zp)
            if split_float:
                y_hi, y_lo = _split_bf16(y, emulate)
                resid = (_dot_nt(y_hi, w_hi) + _dot_nt(y_hi, w_lo)
                         + _dot_nt(y_lo, w_hi)) - x
                r_hi, r_lo = _split_bf16(resid, emulate)
                grad = (_dot_nn(r_hi, w_hi) + _dot_nn(r_hi, w_lo)
                        + _dot_nn(r_lo, w_hi))
            elif emulate:
                resid = _dot_nt(_round_bf16(y), _round_bf16(w)) - x
                grad = _dot_nn(_round_bf16(resid), _round_bf16(w))
            else:
                resid = _dot_nt(y.astype(w.dtype), w) - x
                grad = _dot_nn(resid.astype(w.dtype), w)
            v = y - scal_ref[s, 0] * grad
            if use_l1:
                v = soft_threshold(v, scal_ref[s, 1])
            z_new = _group_prox_mxu(v, thg_row, m_fwd, m_bwd,
                                    split_float, emulate)
            if restart:
                rdot = jnp.sum((y - z_new) * (z_new - z), axis=1,
                               keepdims=True)
                t = jnp.where(rdot > 0, 1.0, t_next)
            zp = z
            z = z_new
        z_out_ref[:] = z
        zp_out_ref[:] = zp
        if restart:
            t_out_ref[:] = t

        @pl.when(pl.program_id(0) == 0)
        def _():
            delta_ref[0, 0] = 0.0

        delta_ref[0, 0] += jnp.sum(jnp.abs(z - zp))

    return kernel


def pad_group_count(n_groups):
    """Pad G up to the 128-lane multiple the kernel needs."""
    return ((n_groups + 127) // 128) * 128


def build_membership(ids, n_groups):
    """[K, G_pad] one-hot membership + its transpose (f32; cast to bf16
    at kernel build — entries are 0/1, exact in either dtype)."""
    import numpy as np
    g_pad = pad_group_count(n_groups)
    member = np.zeros((ids.shape[0], g_pad), np.float32)
    member[np.arange(ids.shape[0]), np.asarray(ids)] = 1.0
    return jnp.asarray(member), jnp.asarray(member.T.copy())


def _member_bytes(K, g_pad, interpret):
    per = 4 if interpret else 2
    return 2 * K * g_pad * per


def supports_fused_group_step(x, z0, weight, n_groups):
    """Alignment + VMEM-envelope check (mirrors
    :func:`lasso_tpu.ops.fused_ista.supports_fused_step` plus the
    resident membership pair)."""
    from lasso_tpu.ops.fused_ista import _tile_bytes, _VMEM_BUDGET
    N, D = x.shape
    K = weight.shape[1]
    w_bytes = 4 * D * K + _member_bytes(K, pad_group_count(n_groups),
                                        False)
    return (D % 128 == 0 and K % 128 == 0 and N % 8 == 0
            and x.dtype == jnp.float32
            and w_bytes + _tile_bytes(8, D, K) <= _VMEM_BUDGET)


@functools.partial(jax.jit,
                   static_argnames=("steps", "block_n", "interpret",
                                    "kernel_precision", "use_l1"))
def fused_group_fista_multistep(x, z, z_prev, weight, lr, thg_row,
                                l1_thresh, moms, member_fwd, member_bwd,
                                steps, block_n=512, interpret=False,
                                kernel_precision="f32", t_vec=None,
                                use_l1=False):
    """``steps`` fused group-FISTA iterations in ONE kernel invocation.

    thg_row: [1, G_pad] group thresholds (alpha * lr * w_g); l1_thresh:
    scalar sparse-group l1 threshold (l1_alpha * lr, engaged only when
    ``use_l1``); moms: [S] momentum coefficients (ignored under
    ``t_vec`` per-row restart, same conventions as
    :func:`lasso_tpu.ops.fused_ista.fused_fista_multistep`); member_*:
    one-hot membership pair from :func:`build_membership`.

    Returns ``(z_final, z_penultimate, [t_out,] delta)``.
    """
    N, D = x.shape
    K = weight.shape[1]
    g_pad = member_fwd.shape[1]
    restart = t_vec is not None
    w_bytes = ((4 if kernel_precision == "f32" else 2) * D * K
               + _member_bytes(K, g_pad, interpret))
    block_n = _pick_block_n(N, D, K, w_bytes, block_n)
    grid = (N // block_n,)

    lr_f = jnp.asarray(lr, jnp.float32)
    scal = jnp.stack([
        jnp.broadcast_to(lr_f, (steps,)),
        jnp.broadcast_to(jnp.asarray(l1_thresh, jnp.float32), (steps,)),
        jnp.broadcast_to(jnp.asarray(moms, jnp.float32), (steps,)),
        jnp.zeros((steps,), jnp.float32),
    ], axis=1)  # [S, 4]

    smem_in = pl.BlockSpec((steps, 4), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    tile_d = pl.BlockSpec((block_n, D), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    tile_k = lambda: pl.BlockSpec((block_n, K), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    tile_1 = lambda: pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    full = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)

    # interpret mode keeps f32 members + reduce_precision emulation;
    # compiled mode stores them bf16 (0/1 entries are exact, halves VMEM)
    mdt = jnp.float32 if interpret else jnp.bfloat16
    m_fwd = member_fwd.astype(mdt)
    m_bwd = member_bwd.astype(mdt)

    if kernel_precision == "f32":
        w_hi, w_lo = _split_bf16_xla(weight)
        w_args = (w_hi, w_lo)
        w_specs = [full(D, K), full(D, K)]
        flops_per_step = (12 * D + 4 * g_pad) * N * K
    elif kernel_precision == "bf16":
        w_args = (weight if interpret else weight.astype(jnp.bfloat16),)
        w_specs = [full(D, K)]
        flops_per_step = (4 * D + 2 * g_pad) * N * K
    else:
        raise ValueError(f"kernel_precision must be 'f32' or 'bf16', got "
                         f"{kernel_precision!r}")

    kernel = _make_group_multistep_kernel(
        steps, kernel_precision == "f32", use_l1, restart,
        emulate=interpret)

    in_specs = ([smem_in, tile_d, tile_k(), tile_k()] + w_specs
                + [full(K, g_pad), full(g_pad, K), full(1, g_pad)])
    in_args = [scal, x, z, z_prev, *w_args, m_fwd, m_bwd,
               jnp.asarray(thg_row, jnp.float32).reshape(1, g_pad)]
    out_specs = [tile_k(), tile_k()]
    out_shape = [jax.ShapeDtypeStruct((N, K), jnp.float32),
                 jax.ShapeDtypeStruct((N, K), jnp.float32)]
    if restart:
        in_specs.append(tile_1())
        in_args.append(t_vec)
        out_specs.append(tile_1())
        out_shape.append(jax.ShapeDtypeStruct((N, 1), jnp.float32))
    out_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM))
    out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=steps * flops_per_step,
            bytes_accessed=(4 * N * K + N * D + D * K) * 4,
            transcendentals=steps * N * g_pad,  # sqrt per group
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*in_args)

    if restart:
        z_next, z_pen, t_out, delta = outs
        return z_next, z_pen, t_out, delta[0, 0]
    z_next, z_pen, delta = outs
    return z_next, z_pen, delta[0, 0]
