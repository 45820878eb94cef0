"""Convolutional FISTA: sparse coding with a conv_transpose decoder.

TPU-native rebuild of /root/reference/lasso/conv2d/ista.py: the decoder is
``x_hat = conv_transpose2d(z, W)`` and the RSS gradient is
``conv2d(x_hat - x, W)``; the automatic step size uses the Araujo Toeplitz
bound (stride=1 only, like the reference). The Python loop with host-synced
convergence (conv2d/ista.py:36-47) becomes one ``lax.while_loop``.

z: [N, C_z, H_z, W_z], weight: [C_z, C_x, kh, kw], x: [N, C_x, H, W]
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from lasso_tpu.conv2d.lip_const import lip_bound_conv2d
from lasso_tpu.conv2d.ops import conv2d, conv_transpose2d
from lasso_tpu.ops.precision import round_bf16 as _round_bf16
from lasso_tpu.ops.shrink import (soft_threshold,
                                  soft_threshold_nonneg)


def _ista_conv2d_fused(x, z0, weight, alpha, padding, maxiter, lr,
                       tol_total, phases, fuse_steps, nonneg, restart,
                       interpret, axis_name, return_iters):
    """Multi-step fused-kernel path of :func:`ista_conv2d` (stride 1).

    The iterates live in the canvas layout of
    :mod:`lasso_tpu.ops.fused_conv` for the whole solve (packed once,
    unpacked once); each phase (one for 'f32'/'bf16', bf16-bulk + f32
    tail for 'mixed') runs full ``S``-iteration fused blocks plus one
    remainder block of its own size, so any ``maxiter``/tail split is
    covered exactly — the same structure as the linear solver's
    precision continuation (linear/solvers/ista.py).
    """
    from lasso_tpu.conv2d.ops import _pair
    from lasso_tpu.ops.fused_conv import (canvas_dims,
                                          fused_conv_fista_multistep,
                                          pack_codes, pack_images,
                                          unpack_codes)

    N = x.shape[0]
    Cz, Cx, kh, kw = weight.shape
    Hz, Wz = z0.shape[-2:]
    pad = _pair(padding)[0]
    Hp, Wp, cells = canvas_dims((Hz, Wz), (kh, kw))
    shape_info = (Cx, kh, kw, Wp, cells, pad, Hz, Wz)

    if fuse_steps == "auto":
        from lasso_tpu.ops.fused_conv import max_fuse_steps_conv
        s_cap = min(16, max_fuse_steps_conv(weight))
        S = next((s for s in range(min(s_cap, maxiter), 0, -1)
                  if maxiter % s == 0), 1)
        if S < 4 <= s_cap:
            S = min(8, maxiter, s_cap)
    else:
        S = max(1, int(fuse_steps))
    S = min(S, maxiter)

    lr_f = jnp.asarray(lr, jnp.float32)
    a_arr = jnp.asarray(alpha, jnp.float32)
    per_channel = a_arr.ndim > 0
    if per_channel:
        th_col = a_arr.reshape(Cz, 1) * lr_f

    x_t = pack_images(x, (Hz, Wz), (kh, kw), pad)
    z_t = pack_codes(z0, (kh, kw))

    def make_block(mode, limit, steps):
        lrs = jnp.broadcast_to(lr_f, (steps,))
        ths = th_col if per_channel else lrs * a_arr

        def cond(st):
            _, _, _, _, k, done = st
            return jnp.logical_and(jnp.logical_not(done),
                                   k + steps <= limit)

        def body(st):
            z, zp, t, mom, k, _ = st
            if restart:
                # per-sample t rides in-kernel; the scalar mom slot is a
                # placeholder (the kernel ignores moms under restart)
                z2, zp2, t2, delta = fused_conv_fista_multistep(
                    x_t, z, zp, weight, lrs, ths,
                    jnp.zeros((steps,), jnp.float32), steps=steps,
                    shape_info=shape_info, interpret=interpret,
                    kernel_precision=mode, nonneg=nonneg, t_vec=t)
                m_c = mom
            else:
                mom_list = []
                t_c, m_c = t, mom
                for _ in range(steps):
                    mom_list.append(m_c)
                    t_n = (1 + jnp.sqrt(1 + 4 * t_c * t_c)) / 2
                    m_c = (t_c - 1) / t_n
                    t_c = t_n
                z2, zp2, delta = fused_conv_fista_multistep(
                    x_t, z, zp, weight, lrs, ths, jnp.stack(mom_list),
                    steps=steps, shape_info=shape_info,
                    interpret=interpret, kernel_precision=mode,
                    nonneg=nonneg)
                t2 = t_c
            if axis_name is not None:
                delta = lax.psum(delta, axis_name)
            return (z2, zp2, t2, m_c, k + steps, delta <= tol_total)

        return cond, body

    # restart carries the per-sample t row, canvas-expanded (lagged
    # convention, init 0 — matching the XLA restart body); plain FISTA
    # carries the scalar t/momentum pair
    st = (z_t, z_t,
          jnp.zeros((1, z_t.shape[1]), jnp.float32) if restart
          else jnp.asarray(1.0, jnp.float32),
          jnp.asarray(0.0, jnp.float32), jnp.asarray(0),
          jnp.asarray(False))
    start = 0
    for idx, (mode, limit) in enumerate(phases):
        length = limit - start
        if length <= 0:
            start = limit
            continue
        Sb = min(S, length)
        r = length % Sb
        st = lax.while_loop(*make_block(mode, limit - r, Sb), st)
        if r:
            st = lax.while_loop(*make_block(mode, limit, r), st)
        if idx + 1 < len(phases):
            # a bf16 phase's convergence statistic is bf16-grade: the
            # f32 tail must always run
            st = st[:5] + (jnp.asarray(False),)
        start = limit

    z_t, _, _, _, k, _ = st
    z = unpack_codes(z_t, N, (Hz, Wz), (kh, kw))
    if return_iters:
        return z, k
    return z


def ista_conv2d(x, z0, weight, alpha=1.0, stride=1, padding=0, fast=True,
                maxiter=10, lr="auto", tol=1e-5, restart=False,
                kernel_precision="f32", mixed_tail="auto", nonneg=False,
                use_pallas="auto", fuse_steps="auto",
                axis_name=None, verbose=False, return_iters=False):
    """Conv FISTA (reference conv2d/ista.py:7-48).

    ``restart=True``: per-sample adaptive momentum restart (O'Donoghue &
    Candes), same lever as :func:`lasso_tpu.linear.solvers.ista` — each
    sample carries its own t-sequence and resets it when its
    gradient-mapping test fires. Off by default for reference parity.

    ``axis_name``: when the batch axis is sharded inside ``jax.shard_map``,
    pass the mesh axis name so the reference's batch-GLOBAL stopping sum
    ``sum|dz| <= numel * tol`` (conv2d/ista.py:44) psum-reduces across
    shards; the per-sample conv solves themselves need no communication.

    ``kernel_precision``: the same precision-continuation lever as
    :func:`lasso_tpu.linear.solvers.ista`, realized in XLA (the conv
    path has no Pallas kernel): 'f32' (default, HIGHEST conv precision =
    multi-pass MXU f32, reference-accurate), 'bf16' (operands rounded to
    the bf16 grid + DEFAULT conv precision = single MXU pass; the
    explicit ``lax.reduce_precision`` makes CPU runs emulate the TPU
    truncation faithfully), or 'mixed' (bf16 bulk, f32 tail; the tail
    contracts the bf16 phase's rounding at FISTA's linear rate — see
    linear/solvers/ista.py's error model). The bf16 phase's convergence
    statistic is discarded, so 'mixed' never stops before its f32 tail.

    ``mixed_tail``: f32-tail length for 'mixed', in ITERATIONS here
    (the conv path has no fused blocks); 'auto' = max(1, maxiter // 8).

    ``alpha`` may also be an [N]-vector of per-sample penalties (exact
    via lasso homogeneity — see the linear solver's docstring and
    ops.common.per_sample_alpha_column), or a per-CHANNEL vector over
    the ``C_z`` code channels (shape ``(1, C_z)`` always, or bare
    ``(C_z,)`` when unambiguous): the prox threshold is elementwise, so
    the channel weights broadcast as ``[1, C_z, 1, 1]`` through every
    precision/restart path natively (weighted conv lasso).

    ``use_pallas``: 'auto' runs stride-1 problems through the MULTI-STEP
    fused Pallas kernel (:mod:`lasso_tpu.ops.fused_conv`) on TPU
    backends — ``fuse_steps`` conv FISTA iterations per invocation with
    the iterates resident in VMEM in the channels-on-sublanes canvas
    layout (the same HBM-amortization lever as the linear solver's
    fused kernel). True forces it (interpreted off-TPU, for tests);
    False always uses the plain XLA step. The fused path engages for
    ``fast=True`` without ``verbose`` (``restart=True`` composes: the
    per-sample t-sequence rides in-kernel, with the lane-segment
    reductions done via a one-hot membership matrix on the MXU);
    convergence is then checked every ``fuse_steps`` iterations at
    block boundaries (never stopping earlier than the reference would —
    same contract as linear ``ista``'s ``fuse_steps``).

    ``fuse_steps``: iterations fused per kernel invocation; 'auto'
    picks the largest divisor of ``maxiter`` <= 16 (falling back to 8
    with an in-kernel remainder block).

    ``verbose`` prints the lasso loss per iteration (reference
    conv2d/ista.py:36-37).
    """
    from lasso_tpu.ops.common import (per_feature_alpha_row,
                                      per_sample_alpha_column)
    a_ch = per_feature_alpha_row(alpha, z0.shape[1], x.shape[0])
    if a_ch is not None:
        alpha = a_ch.astype(x.dtype).reshape(1, z0.shape[1], 1, 1)
    a_col = (None if a_ch is not None else
             per_sample_alpha_column(alpha, x.shape[0], ndim=x.ndim))
    if a_col is not None:
        a_col = a_col.astype(x.dtype)
        out = ista_conv2d(
            x / a_col, z0 / a_col, weight, 1.0, stride=stride,
            padding=padding, fast=fast, maxiter=maxiter, lr=lr, tol=tol,
            restart=restart, kernel_precision=kernel_precision,
            mixed_tail=mixed_tail, nonneg=nonneg, use_pallas=use_pallas,
            fuse_steps=fuse_steps, axis_name=axis_name,
            verbose=verbose, return_iters=return_iters)
        if return_iters:
            z_u, k = out
            return z_u * a_col, k
        return out * a_col

    if isinstance(lr, str):
        if lr != "auto":
            raise ValueError(f"invalid lr {lr!r}")
        if stride == 1:
            L = lip_bound_conv2d(weight, padding)
        else:
            # the Araujo bound needs stride 1 (the reference raises here,
            # conv2d/ista.py:12-15); fall back to the exact on-device
            # power iteration of the conv normal operator instead
            from lasso_tpu.conv2d.lip_const import lip_constant
            L = lip_constant(weight, imsize=z0.shape[-2:], stride=stride,
                             padding=padding)
        lr = 1.0 / L
    lr = jnp.asarray(lr, x.dtype)
    tol_total = z0.size * tol
    if axis_name is not None:
        tol_total = lax.psum(jnp.asarray(tol_total, x.dtype), axis_name)

    if kernel_precision not in ("f32", "bf16", "mixed"):
        raise ValueError(f"kernel_precision must be 'f32', 'bf16' or "
                         f"'mixed', got {kernel_precision!r}")
    # precision phases: list of (mode, iteration_limit); 'mixed' = bf16
    # bulk then f32 tail, each later phase resuming the carried state
    if kernel_precision == "mixed":
        if mixed_tail == "auto":
            tail = max(1, maxiter // 8)
        else:
            tail = int(mixed_tail)
            if tail < 1:
                raise ValueError(
                    f"mixed_tail must be >= 1 iteration, got {mixed_tail}")
        tail = min(tail, maxiter)
        phases = [("bf16", maxiter - tail), ("f32", maxiter)]
    else:
        phases = [(kernel_precision, maxiter)]
    w_bf16 = _round_bf16(weight) if phases[0][0] == "bf16" else None

    from lasso_tpu.ops.common import resolve_pallas
    from lasso_tpu.ops.fused_conv import supports_fused_conv
    fused, interpret = resolve_pallas(
        use_pallas,
        fast and not verbose
        and supports_fused_conv(x, z0, weight, stride, padding))
    if fused:
        return _ista_conv2d_fused(
            x, z0, weight, alpha, padding, maxiter, lr, tol_total, phases,
            fuse_steps, nonneg, restart, interpret, axis_name,
            return_iters)

    def rss_grad(zk, mode):
        if mode == "bf16":
            # bf16-grid operands + DEFAULT precision = one MXU pass on
            # TPU; the explicit rounding (not a cast round-trip, which
            # excess-precision rules elide) makes CPU runs emulate the
            # same truncation
            x_hat = conv_transpose2d(_round_bf16(zk), w_bf16, stride=stride,
                                     padding=padding, precision="default")
            return conv2d(_round_bf16(x_hat - x), w_bf16, stride=stride,
                          padding=padding, precision="default")
        x_hat = conv_transpose2d(zk, weight, stride=stride, padding=padding)
        return conv2d(x_hat - x, weight, stride=stride, padding=padding)

    prox = soft_threshold_nonneg if nonneg else soft_threshold

    def step(zk, mode):
        return prox(zk - lr * rss_grad(zk, mode), alpha * lr)

    def _delta(z_new, z_old):
        d = jnp.sum(jnp.abs(z_new - z_old))
        if axis_name is not None:
            d = lax.psum(d, axis_name)
        return d

    def print_loss(zk):
        import jax
        x_hat = conv_transpose2d(zk, weight, stride=stride, padding=padding)
        loss = (0.5 * jnp.sum(jnp.square(x_hat - x))
                + jnp.sum(alpha * jnp.abs(zk)))
        jax.debug.print("loss: {l:.4f}", l=loss)

    def make_cond(limit):
        def cond(state):
            k, done = state[-2], state[-1]
            return jnp.logical_and(jnp.logical_not(done), k < limit)
        return cond

    if restart:
        if not fast:
            raise ValueError("restart=True requires fast=True")
        feat_axes = tuple(range(1, z0.ndim))

        def make_body_r(mode):
            def body_r(state):
                z, z_prev, t_vec, k, _ = state
                if verbose:
                    print_loss(z)
                t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t_vec * t_vec)) * 0.5
                y = z + ((t_vec - 1.0) / t_next) * (z - z_prev)
                z_new = step(y, mode)
                rdot = jnp.sum((y - z_new) * (z_new - z), axis=feat_axes,
                               keepdims=True)
                t_new = jnp.where(rdot > 0, 1.0, t_next)
                done = _delta(z_new, z) <= tol_total
                return (z_new, z, t_new, k + 1, done)
            return body_r

        t0 = jnp.zeros((z0.shape[0],) + (1,) * (z0.ndim - 1), x.dtype)
        state = (z0, z0, t0, jnp.asarray(0), jnp.asarray(False))
        for mode, limit in phases:
            state = lax.while_loop(make_cond(limit), make_body_r(mode),
                                   state)
            # a bf16 phase's convergence statistic is bf16-grade:
            # discard it so the f32 tail always runs
            state = state[:-1] + (jnp.asarray(False),)
        z, _, _, k, _ = state
        if return_iters:
            return z, k
        return z

    def make_body(mode):
        def body(state):
            z, y, t, k, _ = state
            if verbose:
                print_loss(z)
            z_next = step(y, mode) if fast else step(z, mode)
            if fast:
                t_next = (1 + jnp.sqrt(1 + 4 * t * t)) / 2
                y_next = z_next + ((t - 1) / t_next) * (z_next - z)
            else:
                t_next, y_next = t, z_next
            done = _delta(z_next, z) <= tol_total
            return (z_next, y_next, t_next, k + 1, done)
        return body

    state = (z0, z0, jnp.asarray(1.0, x.dtype), jnp.asarray(0),
             jnp.asarray(False))
    for mode, limit in phases:
        state = lax.while_loop(make_cond(limit), make_body(mode), state)
        state = state[:-1] + (jnp.asarray(False),)
    z, _, _, k, _ = state
    if return_iters:
        return z, k
    return z
