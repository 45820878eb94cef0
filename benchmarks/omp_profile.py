"""Per-iteration cost breakdown of the OMP body at the headline size.

Ablates the while_loop body piece by piece (matmuls -> +selection ->
+Gram update -> +solve) and sweeps the matmul precision of the
correlation pair, to locate the remaining ~60 ms/iter (worklist item).

ABLATION GOTCHA (this script's original sin, kept as a warning): each
stage feeds only a tiny function of its intermediates into the carried
``z`` slot, and XLA DEAD-CODE-ELIMINATES whole op chains that reach no
live output — the original 'sel'/'gram' stages reported ~14 ms/iter
because their take_along_axis gathers and index updates were never
executed. The honest measurement (value-chain everything, or stub one
op at a time inside the real solver) showed the gathers + scatter cost
~35 ms/iter, which motivated the gather-free W_S redesign in
linear/solvers/omp.py. Every stage below now mixes ALL stage outputs
into the live carry; treat any suspiciously-flat stage delta as DCE
until proven executed.

Honest-timing rules (CLAUDE.md): distinct inputs per rep, >=2 reps with
rep 0 discarded, force a readback, whole loop on device.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax import lax

N, D, K, T = 16384, 512, 2048, 64
REPS = 3


def make_inputs(seed):
    kx, kw = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(kx, (N, D), jnp.float32)
    w = jax.random.normal(kw, (D, K), jnp.float32)
    w = w / jnp.linalg.norm(w, axis=0, keepdims=True)
    return x, w


def timed(fn, args_list):
    outs = []
    for i, a in enumerate(args_list):
        t0 = time.perf_counter()
        out = fn(*a)
        out = jax.tree_util.tree_leaves(out)[0]
        float(out.reshape(-1)[0])
        dt = time.perf_counter() - t0
        outs.append(dt)
    return min(outs[1:])  # discard rep 0 (fresh-compile spike)


def loop_variant(stage, prec):
    """stage: 'mm2' (r,c only) | 'mm4' (+onehot pair) | 'sel' | 'gram'
    | 'full'."""

    def run(x, w):
        G = jnp.matmul(w.T, w, precision=jax.lax.Precision.HIGHEST)
        b = jnp.matmul(x, w, precision=jax.lax.Precision.HIGHEST)
        col_norm = jnp.sqrt(jnp.clip(jnp.diagonal(G), 1e-30))
        rows = jnp.arange(N)
        eyeT = jnp.eye(T, dtype=x.dtype)

        def body(k, state):
            idx, valid, z_s, G_ss, sel = state
            z_dense = jnp.zeros((N, K), x.dtype).at[
                rows[:, None], idx].add(z_s)
            r = x - jnp.matmul(z_dense, w.T, precision=prec)
            c = jnp.matmul(r, w, precision=prec)
            if stage == "mm2":
                return (idx, valid, z_s + jnp.sum(c[:, :T] * 1e-9, axis=1,
                                                  keepdims=True) * 0 +
                        c[:, :T] * 1e-20, G_ss, sel)
            score = jnp.where(sel, -1.0, jnp.abs(c) / col_norm)
            k_star = jnp.argmax(score, axis=1)
            onehot_f = jax.nn.one_hot(k_star, K, dtype=x.dtype)
            w_sel = jnp.matmul(onehot_f, w.T, precision=prec)
            g_full = jnp.matmul(w_sel, w, precision=prec)
            if stage == "mm4":
                return (idx, valid,
                        z_s + g_full[:, :T] * 1e-20, G_ss, sel)
            onehot_b = jax.nn.one_hot(k_star, K, dtype=bool)
            sel = jnp.logical_or(sel, onehot_b)
            idx = idx.at[:, k].set(k_star)
            valid = valid.at[:, k].set(True)
            if stage == "sel":
                return (idx, valid, z_s + g_full[:, :T] * 1e-20, G_ss, sel)
            g_row = jnp.take_along_axis(g_full, idx, axis=1)
            row_k = jnp.where(valid, g_row, eyeT[k])
            G_ss = G_ss.at[:, k, :].set(row_k)
            G_ss = G_ss.at[:, :, k].set(row_k)
            if stage == "gram":
                return (idx, valid, z_s + g_full[:, :T] * 1e-20, G_ss, sel)
            b_s = jnp.where(valid, jnp.take_along_axis(b, idx, axis=1), 0.0)
            from lasso_tpu.linalg.basic import batch_cholesky_solve
            z_new = batch_cholesky_solve(b_s, G_ss)
            z_new = jnp.where(valid, z_new, 0.0)
            return (idx, valid, z_new, G_ss, sel)

        init = (jnp.zeros((N, T), jnp.int32), jnp.zeros((N, T), bool),
                jnp.zeros((N, T), x.dtype),
                jnp.broadcast_to(eyeT, (N, T, T)),
                jnp.zeros((N, K), bool))
        out = lax.fori_loop(0, T, body, init)
        return out[2]

    return jax.jit(run)


def main():
    print(f"OMP body ablation at [{N}, {D}->{K}], T={T} "
          f"(times are s per {T}-iter solve)")
    inputs = [make_inputs(s) for s in range(REPS)]
    P = jax.lax.Precision
    for stage in ("mm2", "mm4", "sel", "gram", "full"):
        for prec in (P.HIGHEST, P.HIGH, P.DEFAULT):
            fn = loop_variant(stage, prec)
            dt = timed(fn, inputs)
            print(f"  stage={stage:5s} prec={str(prec):18s} {dt:7.3f} s "
                  f"({dt / T * 1e3:6.1f} ms/iter)")


if __name__ == "__main__":
    main()
