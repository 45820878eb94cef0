#!/usr/bin/env python
"""Experimental variants of the fused FISTA kernel, timed on the real TPU.

Variants (all bf16 passes, f32 accumulate):
  A  current production kernel (y.W^T via NT-dot, W resident)
  B  first dot uses a pre-transposed Wt [K, D] passed in (two NN-dots)
  C  variant B without the delta accumulation / momentum epilogue
  D  variant B fused over S steps per kernel invocation
Honest timing: on-device fori_loop, distinct inputs, forced readback.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, K = 16384, 512, 2048
ITERS = 100


def _dot_nn(a, b):
    return lax.dot_general(a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _kernel_B(scal_ref, x_ref, z_ref, zp_ref, w_ref, wt_ref,
              z_out_ref, delta_ref):
    z = z_ref[:]
    y = z + scal_ref[0, 2] * (z - zp_ref[:])
    resid = _dot_nn(y, wt_ref[:]) - x_ref[:]
    grad = _dot_nn(resid, w_ref[:])
    lr = scal_ref[0, 0]
    u = y - lr * grad
    z_next = jnp.sign(u) * jnp.maximum(jnp.abs(u) - scal_ref[0, 1], 0.0)
    z_out_ref[:] = z_next

    @pl.when(pl.program_id(0) == 0)
    def _():
        delta_ref[0, 0] = 0.0
    delta_ref[0, 0] += jnp.sum(jnp.abs(z_next - z))


def _kernel_C(scal_ref, x_ref, z_ref, zp_ref, w_ref, wt_ref,
              z_out_ref, delta_ref):
    z = z_ref[:]
    resid = _dot_nn(z, wt_ref[:]) - x_ref[:]
    grad = _dot_nn(resid, w_ref[:])
    z_out_ref[:] = z - scal_ref[0, 0] * grad
    delta_ref[0, 0] = 0.0


def _make_kernel_D(S):
    def kern(scal_ref, x_ref, z_ref, zp_ref, w_ref, wt_ref,
             z_out_ref, zp_out_ref, delta_ref):
        z = z_ref[:]
        zp = zp_ref[:]
        x = x_ref[:]
        w = w_ref[:]
        wt = wt_ref[:]
        for s in range(S):
            y = z + scal_ref[s, 2] * (z - zp)
            resid = _dot_nn(y, wt) - x
            grad = _dot_nn(resid, w)
            u = y - scal_ref[s, 0] * grad
            z_new = jnp.sign(u) * jnp.maximum(jnp.abs(u) - scal_ref[s, 1],
                                              0.0)
            zp = z
            z = z_new
        z_out_ref[:] = z
        zp_out_ref[:] = zp

        @pl.when(pl.program_id(0) == 0)
        def _():
            delta_ref[0, 0] = 0.0
        delta_ref[0, 0] += jnp.sum(jnp.abs(z - zp))
    return kern


def _split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_nt(a, b):
    return lax.dot_general(a, b, dimension_numbers=(((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32)


def _make_kernel_E(S):
    """Multi-step with split-float (bf16x3) f32-grade matmuls."""
    def kern(scal_ref, x_ref, z_ref, zp_ref, whi_ref, wlo_ref,
             z_out_ref, zp_out_ref, delta_ref):
        z = z_ref[:]
        zp = zp_ref[:]
        x = x_ref[:]
        w_hi = whi_ref[:]
        w_lo = wlo_ref[:]
        for s in range(S):
            y = z + scal_ref[s, 2] * (z - zp)
            y_hi, y_lo = _split(y)
            resid = (_dot_nt(y_hi, w_hi) + _dot_nt(y_hi, w_lo)
                     + _dot_nt(y_lo, w_hi)) - x
            r_hi, r_lo = _split(resid)
            grad = (_dot_nn(r_hi, w_hi) + _dot_nn(r_hi, w_lo)
                    + _dot_nn(r_lo, w_hi))
            u = y - scal_ref[s, 0] * grad
            z_new = jnp.sign(u) * jnp.maximum(jnp.abs(u) - scal_ref[s, 1],
                                              0.0)
            zp = z
            z = z_new
        z_out_ref[:] = z
        zp_out_ref[:] = zp

        @pl.when(pl.program_id(0) == 0)
        def _():
            delta_ref[0, 0] = 0.0
        delta_ref[0, 0] += jnp.sum(jnp.abs(z - zp))
    return kern


def _specs(block_n, n_w, S, two_out, w_shapes=None):
    smem = pl.BlockSpec((S, 3), lambda i: (0, 0), memory_space=pltpu.SMEM)
    tile_d = pl.BlockSpec((block_n, D), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    tile_k = pl.BlockSpec((block_n, K), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    if w_shapes is None:
        w_shapes = [(D, K), (K, D)][:n_w]
    w_specs = [pl.BlockSpec(s, lambda i: (0, 0), memory_space=pltpu.VMEM)
               for s in w_shapes]
    in_specs = [smem, tile_d, tile_k, tile_k] + w_specs
    out_specs = [tile_k] + ([tile_k] if two_out else []) + [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)]
    out_shape = [jax.ShapeDtypeStruct((N, K), jnp.float32)] \
        + ([jax.ShapeDtypeStruct((N, K), jnp.float32)] if two_out else []) \
        + [jax.ShapeDtypeStruct((1, 1), jnp.float32)]
    return in_specs, out_specs, out_shape


@functools.partial(jax.jit, static_argnames=("variant", "block_n", "S"))
def run_variant(x, z0, W, variant="B", block_n=512, S=4):
    Wb = W.astype(jnp.bfloat16)
    Wtb = W.T.astype(jnp.bfloat16)
    scal1 = jnp.asarray([[0.05, 0.005, 0.5]], jnp.float32)
    scalS = jnp.tile(scal1, (S, 1))
    grid = (N // block_n,)

    if variant in ("B", "C"):
        kern = _kernel_B if variant == "B" else _kernel_C
        in_specs, out_specs, out_shape = _specs(block_n, 2, 1, False)
        call = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))

        def body(i, carry):
            z, zp = carry
            z_new, _ = call(scal1, x, z, zp, Wb, Wtb)
            return (z_new, z)
        z, _ = lax.fori_loop(0, ITERS, body, (z0, z0))
        return z

    if variant == "E":
        w_hi = W.astype(jnp.bfloat16)
        w_lo = (W - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        kern = _make_kernel_E(S)
        in_specs, out_specs, out_shape = _specs(
            block_n, 2, S, True, w_shapes=[(D, K), (D, K)])
        call = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))

        def body(i, carry):
            z, zp = carry
            z_new, zp_new, _ = call(scalS, x, z, zp, w_hi, w_lo)
            return (z_new, zp_new)
        z, _ = lax.fori_loop(0, ITERS // S, body, (z0, z0))
        return z

    if variant == "D":
        kern = _make_kernel_D(S)
        in_specs, out_specs, out_shape = _specs(block_n, 2, S, True)
        call = pl.pallas_call(
            kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024))

        def body(i, carry):
            z, zp = carry
            z_new, zp_new, _ = call(scalS, x, z, zp, Wb, Wtb)
            return (z_new, zp_new)
        z, _ = lax.fori_loop(0, ITERS // S, body, (z0, z0))
        return z

    raise ValueError(variant)


def main():
    from lasso_tpu.ops.fused_ista import fused_fista_step

    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
          for _ in range(3)]
    W = jnp.asarray(
        (rng.standard_normal((D, K)) / np.sqrt(D)).astype(np.float32))
    z0 = jnp.zeros((N, K), jnp.float32)

    def timeit(f, *args):
        f(*args).block_until_ready() if hasattr(f(*args), "block_until_ready") \
            else None
        ts = []
        for x in xs:
            t0 = time.perf_counter()
            out = f(x, *args[1:])
            out = out[0] if isinstance(out, tuple) else out
            float(out[0, 0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # baseline A: production kernel
    @jax.jit
    def run_A(x, z0, W):
        def body(i, carry):
            z, zp = carry
            z_new, _ = fused_fista_step(x, z, zp, W, 0.05, 0.1, 0.5,
                                        block_n=512,
                                        kernel_precision="bf16")
            return (z_new, z)
        return lax.fori_loop(0, ITERS, body, (z0, z0))[0]

    t = timeit(run_A, xs[0], z0, W)
    print(f"A  production bf16          : {ITERS/t:8.1f} it/s "
          f"({1e3*t/ITERS:.3f} ms/iter)", flush=True)

    for variant, kw in (("D", {"S": 8}), ("D", {"S": 16}), ("D", {"S": 32}),
                        ("E", {"S": 4}), ("E", {"S": 8}), ("E", {"S": 16})):
        try:
            f = lambda x, z0, W: run_variant(x, z0, W, variant=variant,
                                             block_n=512, **kw)
            t = timeit(f, xs[0], z0, W)
            tag = f"{variant} S={kw.get('S', 1)}"
            print(f"{tag:28s}: {ITERS/t:8.1f} it/s "
                  f"({1e3*t/ITERS:.3f} ms/iter)", flush=True)
        except Exception as e:
            print(f"{variant} {kw}: FAILED {str(e).splitlines()[0][:140]}",
                  flush=True)


if __name__ == "__main__":
    main()
