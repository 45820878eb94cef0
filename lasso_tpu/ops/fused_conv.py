"""Pallas MXU kernel: multi-step fused CONVOLUTIONAL FISTA.

The conv FISTA step (reference /root/reference/lasso/conv2d/ista.py:18-35)
is ``z+ = shrink(y - lr * conv2d(conv_transpose2d(y, W) - x, W))``. The
XLA path (conv2d/ista.py + conv2d/ops.py) is bandwidth/fold-bound: every
iteration round-trips the [N, Cz, Hz, Wz] iterate through HBM and pays a
49-slice overlap-add fold. This kernel applies the same lever that bought
2.5x on linear FISTA (ops/fused_ista.py): S iterations per invocation with
the iterates resident in VMEM — per-iteration HBM traffic drops to
(4 * |z_canvas| + |x|) / S.

TPU-native formulation ("canvas layout"): channels ride the SUBLANE axis
and flattened spatial pixels ride the LANE axis, with codes and images
sharing one zero-padded canvas of pitch Wp = Wz + kw - 1:

    Z_T [Cz, N * cells],  cells = roundup(Hp * Wp, 128),  Hp = Hz + kh - 1
    canvas cell of pixel (i, j) = i * Wp + j   (same pitch for z and x)

On a shared-pitch canvas every conv tap (ki, kj) is a CONSTANT lane
offset ki * Wp + kj, so the whole stride-1 conv pair becomes:

    decode:  U = k1 . y            (one [Cx*kh*kw, Cz] x [Cz, L] MXU dot)
             x_hat[cx] = sum_taps roll(U[tap row], +tap offset)
    adjoint: R[tap row] = roll(resid[cx], -tap offset)
             grad = k2 . R         (one [Cz, Cx*kh*kw] x [.., L] MXU dot)

i.e. two small-M MXU dots plus VPU lane-rotates per sub-step — no im2col
materialization, no reshapes, no HBM fold traffic. Zero canvas padding
makes every rotate's wraparound land in provably-zero or masked cells
(the canvas tail exceeds the maximum tap offset by construction), and a
``mask_z`` multiply after the prox keeps the code padding exactly zero.

Matmul precision (``kernel_precision``) follows ops/fused_ista.py: 'bf16'
(native MXU pass), 'f32' (manual bf16x3 split-float), with the same
interpret-mode ``lax.reduce_precision`` emulation of Mosaic's bf16
operand truncation so CPU tests exercise real precision schedules.

Used by :func:`lasso_tpu.conv2d.ista.ista_conv2d` on TPU backends for
stride-1 problems; everything else falls back to the XLA step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lasso_tpu.ops.precision import (dot_nn as _dot_nn,
                                     dot_nt as _dot_nt,
                                     round_bf16 as _round_bf16,
                                     split_bf16 as _split_bf16,
                                     split_bf16_xla as _split_bf16_xla)
from lasso_tpu.ops.shrink import (soft_threshold,
                                  soft_threshold_nonneg)


def _dot(a, b):
    """a[M, K] . b[K, L] -> [M, L], f32 accumulate (MXU)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def canvas_dims(z_hw, k_hw):
    """(Hp, Wp, cells): full-fold canvas height/pitch and the 128-aligned
    per-sample lane count. The canvas always holds the maximum tap
    offset past the last real code cell (Hp*Wp - 1 is the last fold
    target), so in-kernel lane rotates never bleed across samples."""
    Hz, Wz = z_hw
    kh, kw = k_hw
    Hp, Wp = Hz + kh - 1, Wz + kw - 1
    cells = ((Hp * Wp + 127) // 128) * 128
    return Hp, Wp, cells


def pack_codes(z, k_hw):
    """[N, Cz, Hz, Wz] -> canvas layout [Cz, N * cells] (zero-padded)."""
    N, Cz, Hz, Wz = z.shape
    Hp, Wp, cells = canvas_dims((Hz, Wz), k_hw)
    buf = jnp.zeros((N, Cz, Hp, Wp), z.dtype).at[:, :, :Hz, :Wz].set(z)
    buf = buf.reshape(N, Cz, Hp * Wp)
    buf = jnp.pad(buf, ((0, 0), (0, 0), (0, cells - Hp * Wp)))
    return buf.transpose(1, 0, 2).reshape(Cz, N * cells)


def unpack_codes(zt, n, z_hw, k_hw):
    """Inverse of :func:`pack_codes`."""
    Hz, Wz = z_hw
    Hp, Wp, cells = canvas_dims(z_hw, k_hw)
    Cz = zt.shape[0]
    buf = zt.reshape(Cz, n, cells).transpose(1, 0, 2)
    return buf[:, :, :Hp * Wp].reshape(n, Cz, Hp, Wp)[:, :, :Hz, :Wz]


def pack_images(x, z_hw, k_hw, padding):
    """[N, Cx, H, W] -> canvas layout [Cx, N * cells], embedded at the
    crop offset (the conv_transpose output region is canvas
    [p:Hp-p, p:Wp-p])."""
    N, Cx, H, W = x.shape
    Hp, Wp, cells = canvas_dims(z_hw, k_hw)
    p = padding
    assert H == Hp - 2 * p and W == Wp - 2 * p, (x.shape, Hp, Wp, p)
    buf = jnp.zeros((N, Cx, Hp, Wp), x.dtype)
    buf = buf.at[:, :, p:p + H, p:p + W].set(x)
    buf = buf.reshape(N, Cx, Hp * Wp)
    buf = jnp.pad(buf, ((0, 0), (0, 0), (0, cells - Hp * Wp)))
    return buf.transpose(1, 0, 2).reshape(Cx, N * cells)


def _mask_row(z_hw, k_hw, padding, which):
    """Per-sample canvas validity row [1, cells] (numpy, built once):
    'z' marks real code cells (i < Hz, j < Wz); 'x' marks the crop
    region (p <= i < Hp-p, p <= j < Wp-p) — the real decoder output."""
    import numpy as np
    Hz, Wz = z_hw
    Hp, Wp, cells = canvas_dims(z_hw, k_hw)
    m = np.zeros((Hp, Wp), np.float32)
    if which == "z":
        m[:Hz, :Wz] = 1.0
    else:
        p = padding
        m[p:Hp - p, p:Wp - p] = 1.0
    row = np.zeros((1, cells), np.float32)
    row[0, :Hp * Wp] = m.reshape(-1)
    return row


def _n_g8(kw):
    """8-row roll subgroups per (cx, ki) tap row: kj is chunked into
    ceil(kw/8) stride-1 groups so every rotate runs on a full 8-sublane
    vreg regardless of filter width."""
    return -(-kw // 8)


def _k_mats(weight):
    """(k1, k2): tap-major fold matrices, kj-slots PADDED TO 8-row
    subgroups so the in-kernel rotates run on full 8-sublane vregs (a
    single-row rotate wastes 7/8 of the VPU — measured as the kernel's
    bottleneck). Filters wider than 8 take ceil(kw/8) subgroups per
    (cx, ki), each covering kj in [8*g8, min(kw, 8*g8+8)).

    k1 rows are ordered ((cx, ki, g8), kj ASCENDING within the
    subgroup): subgroup (cx, ki, g8) rolls with base ki*Wp + 8*g8 and
    stride 1, so row r lands at lane offset ki*Wp + 8*g8 + r = the tap
    offset of kj = 8*g8 + r. Pad rows are zero, so their (garbage)
    rotations contribute nothing to the fold sum.

    k2 columns are ordered ((cx, ki, g8), kj DESCENDING within the
    subgroup): the adjoint needs NEGATIVE offsets -(ki*Wp + kj) mod L,
    which become a stride-(+1) progression exactly when kj descends
    (shift_r = L - ki*Wp - (hi-1) + r ≡ -(ki*Wp + kj) for kj = hi-1-r,
    hi = the subgroup's end). Pad columns are zero, masking the
    spread's garbage rows.
    """
    Cz, Cx, kh, kw = weight.shape
    rows = Cx * kh * _n_g8(kw) * 8
    k1 = jnp.zeros((rows, Cz), weight.dtype)
    k1 = k1.at[_slot_rows(Cx, kh, kw, descending=False), :].set(
        weight.transpose(1, 2, 3, 0).reshape(Cx * kh * kw, Cz))
    k2 = jnp.zeros((Cz, rows), weight.dtype)
    k2 = k2.at[:, _slot_rows(Cx, kh, kw, descending=True)].set(
        weight.transpose(1, 2, 3, 0).reshape(Cx * kh * kw, Cz).T)
    return k1, k2


def _slot_rows(Cx, kh, kw, descending):
    """Subgroup-layout row of each source tap (source order: cx, ki, kj
    ascending). 'descending' places tap kj at its subgroup's row
    base + (hi-1-kj) where hi is the subgroup's (exclusive) end."""
    import numpy as np
    G8 = _n_g8(kw)
    rows = []
    for cx in range(Cx):
        for ki in range(kh):
            for kj in range(kw):
                g8 = kj // 8
                lo, hi = 8 * g8, min(kw, 8 * g8 + 8)
                base = ((cx * kh + ki) * G8 + g8) * 8
                rows.append(base + (hi - 1 - kj if descending
                                    else kj - lo))
    return np.asarray(rows)


def _strided_roll8(v, base, Lw):
    """Roll row r of an 8-sublane block by ``(base + r) mod Lw`` lanes.

    Mosaic lowers the strided ``tpu.dynamic_rotate`` with an intra-vreg
    shift of ``base % 128 + r``; when the last sublane's shift exceeds
    the 128-lane vreg width (base % 128 > 120) it refuses to compile
    ("max shift in a vreg 129 is larger than the vreg's width 128").
    ``base`` is static, so we split into a uniform rotate by ``base``
    plus a stride-only rotate (shifts 0..7) exactly when needed.
    """
    base = base % Lw
    if base % 128 > 120:
        v = pltpu.roll(v, base, axis=1)
        base = 0
    return pltpu.roll(v, base, axis=1, stride=1, stride_axis=0)


def _make_conv_kernel(steps, split_float, shape_info, emulate=False,
                      nonneg=False, has_col=False, restart=False):
    """Build the S-step fused conv FISTA kernel body.

    ``shape_info`` = (Cx, kh, kw, Wp): static tap geometry. The kernel
    operates on one lane-tile of ``bn`` samples; conv FISTA is
    sample-parallel, so consecutive iterations stay in VMEM exactly as
    in the linear multi-step kernel (ops/fused_ista.py).

    ``restart=True`` adds PER-SAMPLE adaptive momentum restart
    (O'Donoghue & Candes, same scheme as the linear kernel): the FISTA
    t-sequence rides as a [1, bn] row, and the per-sample reductions the
    canvas layout cannot do directly (each sample owns a LANE SEGMENT of
    ``cells`` lanes) run through the 0/1 membership matrix ``Mm``
    [bn, L] on the MXU — one split 2-pass dot broadcasts the momentum
    coefficient sample->lanes, another contracts the gradient-mapping
    test <y - z+, z+ - z> lanes->sample (one-hot rows are exact in bf16,
    so both are f32-grade).
    """
    Cx, kh, kw, Wp = shape_info

    def kernel(scal_ref, x_ref, z_ref, zp_ref, *refs):
        refs = list(refs)
        if split_float:
            k1_hi, k1_lo = refs.pop(0)[:], refs.pop(0)[:]
            k2_hi, k2_lo = refs.pop(0)[:], refs.pop(0)[:]
        else:
            k1 = refs.pop(0)[:]
            k2 = refs.pop(0)[:]
        mx = refs.pop(0)[:]               # [1, L] decoder-crop mask
        mz = refs.pop(0)[:]               # [1, L] code-cell mask
        tcol = refs.pop(0)[:] if has_col else None   # [Cz, 1] alpha*lr
        if restart:
            # t rides EXPANDED to canvas lanes ([1, L], each sample's
            # value broadcast over its cells): lane tiles must be
            # 128-multiples, which a per-sample [1, bn] row is not
            t = refs.pop(0)[:]            # [1, L] per-sample t (lagged)
            mm = refs.pop(0)[:]           # [bn, L] membership, bf16
            z_out_ref, zp_out_ref, t_out_ref, delta_ref = refs
        else:
            z_out_ref, zp_out_ref, delta_ref = refs
        z = z_ref[:]
        zp = zp_ref[:]
        x = x_ref[:]
        prox = soft_threshold_nonneg if nonneg else soft_threshold

        for s in range(steps):
            if restart:
                # t is per-sample-constant across lanes, so the
                # momentum coefficient needs no membership broadcast
                t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) * 0.5
                y = z + ((t - 1.0) / t_next) * (z - zp)
            else:
                y = z + scal_ref[s, 2] * (z - zp)
            # ---- decode: one MXU dot + per-tap lane rotates
            if split_float:
                y_hi, y_lo = _split_bf16(y, emulate)
                U = (_dot(k1_hi, y_hi) + _dot(k1_hi, y_lo)
                     + _dot(k1_lo, y_hi))
            elif emulate:
                U = _dot(_round_bf16(k1), _round_bf16(y))
            else:
                U = _dot(k1, y.astype(k1.dtype))
            # fold via GROUPED strided rotates: each (cx, ki, g8)
            # subgroup of 8 kj-rows rolls in one full-vreg op (row r by
            # ki*Wp + 8*g8 + r); zero pad rows rotate garbage into zeros
            G8 = _n_g8(kw)
            xh_rows = []
            for cx in range(Cx):
                acc8 = None
                for ki in range(kh):
                    for g8 in range(G8):
                        g = (cx * kh + ki) * G8 + g8
                        rolled = _strided_roll8(U[g * 8:(g + 1) * 8, :],
                                                ki * Wp + 8 * g8,
                                                U.shape[1])
                        acc8 = rolled if acc8 is None else acc8 + rolled
                xh_rows.append(jnp.sum(acc8, axis=0, keepdims=True))
            xh = (jnp.concatenate(xh_rows, axis=0) if Cx > 1
                  else xh_rows[0])
            resid = (xh - x) * mx
            # ---- adjoint: grouped NEGATIVE rotates (kj-descending rows
            # turn -(ki*Wp + kj) mod L into a stride-(+1) progression —
            # see _k_mats) + one MXU dot; k2's zero pad columns mask the
            # pad rows' garbage rotations
            Lw = resid.shape[1]
            groups = []
            for cx in range(Cx):
                r8 = jnp.broadcast_to(resid[cx:cx + 1, :], (8, Lw))
                for ki in range(kh):
                    for g8 in range(G8):
                        hi = min(kw, 8 * g8 + 8)
                        groups.append(_strided_roll8(
                            r8, Lw - ki * Wp - (hi - 1), Lw))
            R = (jnp.concatenate(groups, axis=0) if len(groups) > 1
                 else groups[0])
            if split_float:
                r_hi, r_lo = _split_bf16(R, emulate)
                grad = (_dot(k2_hi, r_hi) + _dot(k2_hi, r_lo)
                        + _dot(k2_lo, r_hi))
            elif emulate:
                grad = _dot(_round_bf16(k2), _round_bf16(R))
            else:
                grad = _dot(k2, R.astype(k2.dtype))
            # ---- prox + canvas-validity mask (grad is garbage on the
            # z-padding cells, which receive wrapped/out-of-range taps)
            z_new = prox(y - scal_ref[s, 0] * grad,
                         tcol if has_col else scal_ref[s, 1]) \
                * scal_ref[s, 3] * mz
            if restart:
                # per-sample gradient-mapping test: reduce channels on
                # the VPU, then lane segments -> samples -> lanes via
                # the membership matrix (split 2-pass pairs keep the
                # sign f32-grade; one-hot rows are exact in bf16)
                p = jnp.sum((y - z_new) * (z_new - z), axis=0,
                            keepdims=True)                     # [1, L]
                p_hi, p_lo = _split_bf16(p, emulate)
                rdot = _dot_nt(p_hi, mm) + _dot_nt(p_lo, mm)   # [1, bn]
                r_hi, r_lo = _split_bf16(rdot, emulate)
                rdot_l = _dot_nn(r_hi, mm) + _dot_nn(r_lo, mm)  # [1, L]
                t = jnp.where(rdot_l > 0, 1.0, t_next)
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


# in/out tile budget (same rationale as ops/fused_ista.py): z-class
# canvas tiles dominate; split-float temporaries add ~50% on top
_VMEM_BUDGET = 56 * 1024 * 1024


def _conv_tile_bytes(bn, Cz, Cx, rows, cells, restart=False):
    """Per-tile VMEM model: 4 z-class canvas tiles (z, zp, z_out,
    zp_out) + x + U + R scratch, f32, double-buffered on the i/o.
    ``rows`` is the 8-padded tap-matrix row count (Cx * kh * 8);
    restart adds the [bn, L] bf16 membership matrix."""
    L = bn * cells
    io = 2 * (4 * Cz * L + Cx * L) * 4
    scratch = 2 * rows * L * 4
    member = bn * L * 2 if restart else 0
    return io + scratch + member


def _pick_block_n_conv(N, Cz, Cx, rows, cells, requested, restart=False):
    bn = min(requested, N)
    while bn > 1 and (N % bn != 0
                      or _conv_tile_bytes(bn, Cz, Cx, rows, cells,
                                          restart)
                      > _VMEM_BUDGET):
        bn -= 1
    while N % bn:
        bn -= 1
    return bn


def max_fuse_steps_conv(weight):
    """Cap on iterations fused per invocation, by tap-row count.

    The kernel body unrolls ``2 * Cx * kh * ceil(kw/8)`` lane rotates
    per fused iteration; channel-rich dictionaries (Cx >= 16, 7x7 ->
    1792 tap rows) make the Mosaic program large enough that compile
    time, not VMEM, becomes the limit. Capping S so that
    ``S * rows <= 8192`` keeps the unrolled body bounded while leaving
    the headline configs (rows <= 640) at the full S = 16.
    """
    Cx, kh, kw = weight.shape[1], weight.shape[2], weight.shape[3]
    rows = Cx * kh * _n_g8(kw) * 8
    return max(1, 8192 // rows)


def supports_fused_conv(x, z0, weight, stride, padding):
    """Fast-path predicate: stride 1 (any padding), f32, and at least a
    1-sample tile within the VMEM budget.

    The VMEM tile model (U/R scratch is ``2 * rows * L`` f32) is the
    real gate for channel-rich dictionaries; the ``rows <= 4096``
    pre-check only excludes degenerate geometries where even a 1-sample
    tile's tap matrices would crowd out the canvas (a 4096-row fold is
    ~32 MB of scratch per sample at 32x32). Round 4's ``rows <= 1024``
    hard gate silently dropped Cx >= 16 7x7 dictionaries — exactly the
    conv dict-learning regime — onto the ~1.6-1.9x slower XLA path;
    round 5 lifts it and instead caps the fused step count
    (:func:`max_fuse_steps_conv`) to bound compile time.
    """
    from lasso_tpu.conv2d.ops import _pair
    if _pair(stride) != (1, 1):
        return False
    if x.dtype != jnp.float32 or z0.dtype != jnp.float32:
        return False
    ph, pw = _pair(padding)
    if ph != pw:
        return False
    N, Cz, Hz, Wz = z0.shape
    Cx, kh, kw = weight.shape[1], weight.shape[2], weight.shape[3]
    _, _, cells = canvas_dims((Hz, Wz), (kh, kw))
    rows = Cx * kh * _n_g8(kw) * 8
    if rows > 4096:
        return False
    return _conv_tile_bytes(1, Cz, Cx, rows, cells) <= _VMEM_BUDGET


@functools.partial(jax.jit,
                   static_argnames=("steps", "shape_info", "block_n",
                                    "interpret", "kernel_precision",
                                    "nonneg"))
def fused_conv_fista_multistep(x_t, z_t, zp_t, weight, lrs, threshs, moms,
                               steps, shape_info, block_n=64,
                               interpret=False, kernel_precision="f32",
                               nonneg=False, t_vec=None):
    """``steps`` fused conv FISTA iterations in ONE kernel invocation.

    Operands are in canvas layout (see module docstring): ``x_t``
    [Cx, N*cells] (images embedded at the crop offset), ``z_t``/``zp_t``
    [Cz, N*cells]. ``weight`` is the torch-layout [Cz, Cx, kh, kw]
    dictionary; ``shape_info`` = (Cx, kh, kw, Wp, cells, padding, Hz, Wz)
    static geometry. ``lrs``/``moms`` are length-``steps`` vectors
    (lagged-momentum convention of ops/fused_ista.py); ``threshs`` is a
    length-``steps`` vector of alpha*lr scalars OR a [Cz, 1] per-channel
    threshold column (already * lr).

    ``t_vec`` ([1, N*cells] — the per-sample t broadcast over each
    sample's canvas cells, so lane tiles stay 128-aligned; or None)
    switches on PER-SAMPLE adaptive-restart momentum: ``moms`` is
    ignored and the O'Donoghue-Candes t-sequence is carried in-kernel
    (lagged convention: t entering an iteration is t_{k-1}, init 0).

    Returns ``(z_final, z_penultimate, delta)`` in canvas layout, with
    the updated t-row inserted before ``delta`` when ``t_vec`` is given.
    """
    Cx, kh, kw, Wp, cells, padding, Hz, Wz = shape_info
    restart = t_vec is not None
    Cz = z_t.shape[0]
    L_total = z_t.shape[1]
    N = L_total // cells
    rows = Cx * kh * _n_g8(kw) * 8   # 8-padded tap rows (_k_mats)
    bn = _pick_block_n_conv(N, Cz, Cx, rows, cells, block_n, restart)
    grid = (N // bn,)
    L = bn * cells

    th_arr = jnp.asarray(threshs, jnp.float32)
    has_col = th_arr.ndim == 2
    lrs_f = jnp.broadcast_to(jnp.asarray(lrs, jnp.float32), (steps,))
    scal = jnp.stack([
        lrs_f,
        (jnp.zeros((steps,), jnp.float32) if has_col
         else jnp.broadcast_to(th_arr, (steps,))),
        jnp.broadcast_to(jnp.asarray(moms, jnp.float32), (steps,)),
        jnp.ones((steps,), jnp.float32),
    ], axis=1)  # [S, 4]

    k1, k2 = _k_mats(weight)
    import numpy as np
    mx = jnp.asarray(np.tile(_mask_row((Hz, Wz), (kh, kw), padding, "x"),
                             (1, bn)))
    mz = jnp.asarray(np.tile(_mask_row((Hz, Wz), (kh, kw), padding, "z"),
                             (1, bn)))

    smem_in = pl.BlockSpec((steps, 4), lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    tile_x = pl.BlockSpec((Cx, L), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    tile_z = lambda: pl.BlockSpec((Cz, L), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    row_l = lambda: pl.BlockSpec((1, L), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)

    if kernel_precision == "f32":
        k1_hi, k1_lo = _split_bf16_xla(k1)
        k2_hi, k2_lo = _split_bf16_xla(k2)
        k_args = (k1_hi, k1_lo, k2_hi, k2_lo)
        k_specs = [full((rows, Cz)), full((rows, Cz)),
                   full((Cz, rows)), full((Cz, rows))]
        flops_mult = 12
    elif kernel_precision == "bf16":
        k_args = ((k1, k2) if interpret
                  else (k1.astype(jnp.bfloat16), k2.astype(jnp.bfloat16)))
        k_specs = [full((rows, Cz)), full((Cz, rows))]
        flops_mult = 4
    else:
        raise ValueError(f"kernel_precision must be 'f32' or 'bf16', got "
                         f"{kernel_precision!r}")

    kernel = _make_conv_kernel(steps, kernel_precision == "f32",
                               (Cx, kh, kw, Wp), emulate=interpret,
                               nonneg=nonneg, has_col=has_col,
                               restart=restart)

    in_specs = [smem_in, tile_x, tile_z(), tile_z()] + k_specs \
        + [row_l(), row_l()]
    in_args = [scal, x_t, z_t, zp_t, *k_args, mx, mz]
    if has_col:
        in_specs.append(full((Cz, 1)))
        in_args.append(th_arr)
    out_specs = [tile_z(), tile_z()]
    out_shape = [jax.ShapeDtypeStruct((Cz, L_total), jnp.float32),
                 jax.ShapeDtypeStruct((Cz, L_total), jnp.float32)]
    if restart:
        # canvas-expanded per-sample t row + the lane-segment
        # membership matrix (0/1 rows are exact in bf16; the same
        # matrix serves every tile)
        member = np.kron(np.eye(bn, dtype=np.float32),
                         np.ones((1, cells), np.float32))
        trow_tile = pl.BlockSpec((1, L), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
        in_specs += [trow_tile, full((bn, L))]
        in_args += [jnp.asarray(t_vec, jnp.float32),
                    jnp.asarray(member, jnp.bfloat16)]
        out_specs.append(trow_tile)
        out_shape.append(jax.ShapeDtypeStruct((1, L_total), jnp.float32))
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
            flops=steps * flops_mult * rows * Cz * L_total,
            bytes_accessed=(4 * Cz * L_total + Cx * L_total) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*in_args)

    if restart:
        z_next, z_pen, t_new, delta = outs
        return z_next, z_pen, t_new, delta[0, 0]
    z_next, z_pen, delta = outs
    return z_next, z_pen, delta[0, 0]
