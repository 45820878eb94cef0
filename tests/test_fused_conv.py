"""Fused multi-step conv FISTA kernel (ops/fused_conv.py): exactness vs
the XLA step, canvas pack/unpack, precision schedules, and the solver
route (VERDICT r3 item 1 — the linear multi-step VMEM-residency lever
applied to the conv path).

Run in interpret mode on CPU; 'bf16'/'mixed' exercise the
lax.reduce_precision emulation of Mosaic's bf16 dot truncation, so the
precision schedules are real here (same machinery as
tests/test_mixed_precision.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasso_tpu.conv2d.ista import ista_conv2d
from lasso_tpu.conv2d.ops import conv2d, conv_transpose2d
from lasso_tpu.ops.fused_conv import (canvas_dims,
                                      fused_conv_fista_multistep,
                                      pack_codes, pack_images,
                                      supports_fused_conv, unpack_codes)
from lasso_tpu.ops.fused_ista import _round_bf16
from lasso_tpu.ops.shrink import soft_threshold, soft_threshold_nonneg


def _problem(seed, n, cz, cx, hz, wz, kh, kw, pad=0, wscale=0.25):
    rng = np.random.default_rng(seed)
    h, w = hz + kh - 1 - 2 * pad, wz + kw - 1 - 2 * pad
    x = jnp.asarray(rng.standard_normal((n, cx, h, w)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((cz, cx, kh, kw)),
                    jnp.float32) * wscale
    z0 = jnp.zeros((n, cz, hz, wz), jnp.float32)
    return x, W, z0


def test_canvas_pack_roundtrip():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((3, 8, 9, 11)), jnp.float32)
    zt = pack_codes(z, (4, 3))
    Hp, Wp, cells = canvas_dims((9, 11), (4, 3))
    assert zt.shape == (8, 3 * cells) and cells % 128 == 0
    np.testing.assert_array_equal(
        np.asarray(unpack_codes(zt, 3, (9, 11), (4, 3))), np.asarray(z))


@pytest.mark.parametrize("cz,cx,hz,wz,kh,kw,pad,nonneg,percol", [
    (16, 1, 10, 10, 5, 5, 0, False, False),
    (8, 2, 7, 9, 4, 2, 1, True, False),
    (8, 1, 7, 7, 3, 3, 0, False, True),
    (64, 1, 10, 10, 7, 7, 0, False, False),
    (8, 1, 6, 8, 11, 11, 0, False, False),   # kw > 8: 2 roll subgroups
    (8, 1, 5, 5, 3, 9, 1, False, False),     # kw = 9: ragged subgroup
    (16, 8, 6, 6, 3, 3, 0, False, False),    # channel-rich input (Cx=8)
    (8, 32, 4, 4, 7, 7, 0, False, False),    # rows=1792 > old 1024 gate
])
def test_kernel_matches_xla_steps(cz, cx, hz, wz, kh, kw, pad, nonneg,
                                  percol):
    """S fused sub-steps == S explicit XLA conv FISTA steps (split-float
    grade for f32), across channel counts, padding, nonneg, and
    per-channel thresholds."""
    rng = np.random.default_rng(cz + kh)
    x, W, _ = _problem(cz + kh, 3, cz, cx, hz, wz, kh, kw, pad)
    z = jnp.asarray(rng.standard_normal((3, cz, hz, wz)), jnp.float32)
    zp = z + 0.1 * jnp.asarray(rng.standard_normal(z.shape), jnp.float32)
    lr, S = 0.04, 3
    Hp, Wp, cells = canvas_dims((hz, wz), (kh, kw))
    si = (cx, kh, kw, Wp, cells, pad, hz, wz)
    moms = jnp.asarray([0.3, 0.15, 0.0])
    if percol:
        a_col = jnp.asarray(rng.uniform(0.05, 0.3, (cz, 1)), jnp.float32)
        ths, a_b = a_col * lr, a_col.reshape(1, cz, 1, 1)
    else:
        ths, a_b = jnp.full((S,), 0.1 * lr), 0.1

    zf_t, zpen_t, delta = fused_conv_fista_multistep(
        pack_images(x, (hz, wz), (kh, kw), pad), pack_codes(z, (kh, kw)),
        pack_codes(zp, (kh, kw)), W, jnp.full((S,), lr), ths, moms,
        steps=S, shape_info=si, interpret=True, kernel_precision="f32",
        nonneg=nonneg)
    zf = np.asarray(unpack_codes(zf_t, 3, (hz, wz), (kh, kw)))

    prox = soft_threshold_nonneg if nonneg else soft_threshold
    zc, zpc = z, zp
    for s in range(S):
        y = zc + moms[s] * (zc - zpc)
        g = conv2d(conv_transpose2d(y, W, padding=pad) - x, W, padding=pad)
        zn = prox(y - lr * g, a_b * lr)
        zpc, zc = zc, zn
    scale = max(1.0, float(jnp.abs(zc).max()))
    np.testing.assert_allclose(zf, np.asarray(zc), atol=3e-5 * scale)
    np.testing.assert_allclose(
        np.asarray(unpack_codes(zpen_t, 3, (hz, wz), (kh, kw))),
        np.asarray(zpc), atol=3e-5 * scale)
    assert abs(float(delta) - float(jnp.sum(jnp.abs(zc - zpc)))) \
        <= 1e-3 * max(1.0, float(jnp.sum(jnp.abs(zc - zpc))))


def test_kernel_bf16_matches_emulated_oracle():
    """'bf16' mode == XLA step with reduce_precision-rounded operands
    and DEFAULT conv precision (the Mosaic hardware semantics)."""
    rng = np.random.default_rng(3)
    x, W, _ = _problem(3, 2, 16, 1, 9, 9, 3, 3)
    z = jnp.asarray(rng.standard_normal((2, 16, 9, 9)), jnp.float32)
    zp = z + 0.1 * jnp.asarray(rng.standard_normal(z.shape), jnp.float32)
    lr, S = 0.04, 2
    Hp, Wp, cells = canvas_dims((9, 9), (3, 3))
    si = (1, 3, 3, Wp, cells, 0, 9, 9)
    moms = jnp.asarray([0.3, 0.1])
    zf_t, _, _ = fused_conv_fista_multistep(
        pack_images(x, (9, 9), (3, 3), 0), pack_codes(z, (3, 3)),
        pack_codes(zp, (3, 3)), W, jnp.full((S,), lr),
        jnp.full((S,), 0.1 * lr), moms, steps=S, shape_info=si,
        interpret=True, kernel_precision="bf16")
    zf = np.asarray(unpack_codes(zf_t, 2, (9, 9), (3, 3)))

    Wq = _round_bf16(W)
    zc, zpc = z, zp
    for s in range(S):
        y = zc + moms[s] * (zc - zpc)
        xh = conv_transpose2d(_round_bf16(y), Wq, precision="default")
        g = conv2d(_round_bf16(xh - x), Wq, precision="default")
        zn = soft_threshold(y - lr * g, 0.1 * lr)
        zpc, zc = zc, zn
    np.testing.assert_allclose(zf, np.asarray(zc), atol=2e-5)


@pytest.mark.parametrize("tol,kp,maxiter", [
    (0.0, "f32", 30), (1e-6, "f32", 50), (0.0, "mixed", 32),
])
def test_solver_route_matches_xla(tol, kp, maxiter):
    """ista_conv2d(use_pallas=True) == use_pallas=False end-to-end,
    including iteration counts (block-boundary stopping never stops
    earlier; at these sizes both run the full budget or stop at the
    same boundary)."""
    x, W, z0 = _problem(11, 4, 16, 1, 10, 10, 5, 5)
    kw = dict(maxiter=maxiter, tol=tol, kernel_precision=kp,
              return_iters=True)
    za, ka = ista_conv2d(x, z0, W, 0.1, use_pallas=False, **kw)
    zb, kb = ista_conv2d(x, z0, W, 0.1, use_pallas=True, **kw)
    tol_z = 5e-5 if kp == "f32" else 5e-4
    np.testing.assert_allclose(np.asarray(zb), np.asarray(za),
                               atol=tol_z)
    assert int(kb) >= int(ka) or int(kb) == maxiter
    assert int(kb) == int(ka)  # same budget/boundary at these sizes


def test_kernel_restart_matches_xla_steps():
    """S fused restart sub-steps == S explicit XLA restart steps: the
    per-sample t-sequence (lagged, init 0) and the gradient-mapping
    reset must track exactly through the membership-matrix reductions."""
    rng = np.random.default_rng(9)
    cz, cx, hz, wz, kh, kw = 8, 1, 9, 9, 3, 3
    x, W, _ = _problem(9, 4, cz, cx, hz, wz, kh, kw)
    z = jnp.asarray(rng.standard_normal((4, cz, hz, wz)), jnp.float32)
    zp = z + 0.05 * jnp.asarray(rng.standard_normal(z.shape), jnp.float32)
    lr, S = 0.04, 4
    Hp, Wp, cells = canvas_dims((hz, wz), (kh, kw))
    si = (cx, kh, kw, Wp, cells, 0, hz, wz)
    t0 = jnp.asarray(rng.uniform(0.0, 3.0, (1, 4)), jnp.float32)
    t0_l = jnp.repeat(t0, cells, axis=1)        # canvas-expanded

    zf_t, zpen_t, t_new, _ = fused_conv_fista_multistep(
        pack_images(x, (hz, wz), (kh, kw), 0), pack_codes(z, (kh, kw)),
        pack_codes(zp, (kh, kw)), W, jnp.full((S,), lr),
        jnp.full((S,), 0.1 * lr), jnp.zeros((S,)), steps=S,
        shape_info=si, interpret=True, kernel_precision="f32",
        t_vec=t0_l)
    t_new = t_new[:, ::cells]                   # one value per sample
    zf = np.asarray(unpack_codes(zf_t, 4, (hz, wz), (kh, kw)))

    zc, zpc = z, zp
    tv = t0.reshape(4, 1, 1, 1)
    for _ in range(S):
        t_next = (1.0 + jnp.sqrt(1.0 + 4.0 * tv * tv)) * 0.5
        y = zc + ((tv - 1.0) / t_next) * (zc - zpc)
        g = conv2d(conv_transpose2d(y, W) - x, W)
        zn = soft_threshold(y - lr * g, 0.1 * lr)
        rdot = jnp.sum((y - zn) * (zn - zc), axis=(1, 2, 3),
                       keepdims=True)
        tv = jnp.where(rdot > 0, 1.0, t_next)
        zpc, zc = zc, zn
    scale = max(1.0, float(jnp.abs(zc).max()))
    np.testing.assert_allclose(zf, np.asarray(zc), atol=5e-5 * scale)
    np.testing.assert_allclose(np.asarray(t_new).ravel(),
                               np.asarray(tv).ravel(), rtol=1e-6)


def test_solver_route_restart_matches_xla():
    """ista_conv2d(restart=True, use_pallas=True) == the XLA restart
    path end-to-end (t carried across fused blocks and phases)."""
    x, W, z0 = _problem(13, 4, 16, 1, 10, 10, 5, 5)
    kw = dict(maxiter=36, tol=0.0, restart=True, return_iters=True)
    za, ka = ista_conv2d(x, z0, W, 0.1, use_pallas=False, **kw)
    zb, kb = ista_conv2d(x, z0, W, 0.1, use_pallas=True, **kw)
    assert int(kb) == int(ka) == 36
    np.testing.assert_allclose(np.asarray(zb), np.asarray(za), atol=1e-4)


def test_solver_route_remainder_blocks():
    """maxiter with no divisor <= 16 exercises the remainder-block path
    (full S blocks + one smaller block) and still covers the budget."""
    x, W, z0 = _problem(5, 2, 8, 1, 8, 8, 3, 3)
    z, k = ista_conv2d(x, z0, W, 0.1, maxiter=37, tol=0.0,
                       use_pallas=True, return_iters=True)
    assert int(k) == 37
    za = ista_conv2d(x, z0, W, 0.1, maxiter=37, tol=0.0,
                     use_pallas=False)
    np.testing.assert_allclose(np.asarray(z), np.asarray(za), atol=5e-5)


def test_supports_predicate():
    x, W, z0 = _problem(1, 2, 8, 1, 8, 8, 3, 3)
    assert supports_fused_conv(x, z0, W, 1, 0)
    assert not supports_fused_conv(x, z0, W, 2, 0)       # stride
    assert not supports_fused_conv(
        x.astype(jnp.bfloat16), z0, W, 1, 0)             # dtype
    # channel-rich 7x7 (rows = 32*7*8 = 1792): supported since round 5
    # (the old rows <= 1024 hard gate silently dropped it to XLA); the
    # fused step count is capped instead to bound compile time
    from lasso_tpu.ops.fused_conv import max_fuse_steps_conv
    xr, Wr, zr = _problem(2, 2, 8, 32, 6, 6, 7, 7)
    assert supports_fused_conv(xr, zr, Wr, 1, 0)
    assert max_fuse_steps_conv(Wr) == 4                  # 8192 // 1792
    assert max_fuse_steps_conv(W) >= 16                  # small-row
    # dictionaries are uncapped (the solver's own <= 16 divisor search
    # is then the binding limit)


def test_solver_route_channel_rich_caps_fuse_steps():
    """A rows > 1024 dictionary rides the fused path (round-5 gate lift)
    with the auto step count capped, and matches the XLA path."""
    x, W, z0 = _problem(7, 2, 8, 32, 4, 4, 7, 7, wscale=0.05)
    za, ka = ista_conv2d(x, z0, W, 0.05, maxiter=8, tol=0.0,
                         use_pallas=False, return_iters=True)
    zb, kb = ista_conv2d(x, z0, W, 0.05, maxiter=8, tol=0.0,
                         use_pallas=True, return_iters=True)
    assert int(ka) == int(kb) == 8
    np.testing.assert_allclose(np.asarray(zb), np.asarray(za), atol=5e-5)
