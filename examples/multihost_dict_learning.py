"""Multi-host dictionary-learning throughput harness (BASELINE "N>=2
hosts" deliverable).

The reference has no distributed story; this drives
``lasso_tpu.parallel.distributed`` across processes: one process per
host, a global ('data', 'model') mesh over every device of every host,
batch rows sharded over 'data' (per-sample solves need no cross-host
traffic), and the dictionary update's Z^T Z / Z^T X Gram reductions
psum'd across the mesh (ICI within a slice, DCN across hosts).

Launch once per host (or per simulated process):

    python examples/multihost_dict_learning.py \
        --coordinator HOST:PORT --num-processes N --process-id I \
        --batch 65536 --dim 256 --atoms 1024 --steps 10

Single-process runs omit the first three flags. Process 0 prints one
JSON line with global and per-host throughput.

Real-pod numbers are blocked on hardware in this container (one v5e chip
behind a tunnel); the 2-process CPU simulation in
tests/test_multihost.py validates the full flow — initialization, global
array construction from process-local shards, the sharded EM step, and
cross-process agreement of the loss.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port (multi-process only)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--batch", type=int, default=4096,
                   help="GLOBAL batch size (rows split across processes)")
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--atoms", type=int, default=128)
    p.add_argument("--alpha", type=float, default=0.2)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--maxiter", type=int, default=50,
                   help="FISTA iterations per E-step")
    p.add_argument("--model-parallel", type=int, default=1)
    p.add_argument("--constrained", action="store_true",
                   help="unit-norm-atom training (sequential or block "
                        "M-step) instead of the unconstrained ridge")
    p.add_argument("--dict-update", default="sequential",
                   choices=("sequential", "block"))
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    # initialize BEFORE any jax op so the runtime sees all processes
    from lasso_tpu.parallel.distributed import initialize
    initialize(coordinator_address=args.coordinator,
               num_processes=args.num_processes,
               process_id=args.process_id)

    import jax
    import jax.numpy as jnp
    from lasso_tpu.parallel import make_train_step
    from lasso_tpu.parallel.distributed import (make_global_mesh,
                                                process_local_batch)

    n_proc = jax.process_count()
    pid = jax.process_index()
    mesh = make_global_mesh(model_parallel=args.model_parallel)

    # deterministic GLOBAL data: every process generates the same batch
    # and keeps its own contiguous rows, so single- and multi-process
    # runs see identical problems (the CPU-sim test relies on this)
    rng = np.random.default_rng(args.seed)
    W0 = ((rng.standard_normal((args.dim, args.atoms)) / np.sqrt(args.dim))
          .astype(np.float32))
    X_global = rng.standard_normal((args.batch, args.dim)).astype(np.float32)
    start, end = process_local_batch(args.batch)
    x_local = X_global[start:end]

    if args.constrained:
        W0 /= np.linalg.norm(W0, axis=0, keepdims=True)
    step, (x_sh, w_sh) = make_train_step(
        mesh, alpha=args.alpha, lambd=1e-2, algorithm="ista",
        shard_atoms=(args.model_parallel > 1),
        constrained=args.constrained, dict_update=args.dict_update,
        maxiter=args.maxiter, tol=0.0)
    if args.constrained:
        # identical key on every process (the degenerate-atom RNG)
        keys = jax.random.split(jax.random.PRNGKey(args.seed),
                                args.steps + 1)
        run = lambda x, W, i: step(x, W, keys[i])
    else:
        run = lambda x, W, i: step(x, W)

    x = jax.make_array_from_process_local_data(
        x_sh, x_local, (args.batch, args.dim))
    W = jax.make_array_from_process_local_data(w_sh, W0, W0.shape)

    # warmup / compile
    W_c, loss = run(x, W, 0)
    jax.block_until_ready((W_c, loss))

    t0 = time.perf_counter()
    losses = []
    for i in range(args.steps):
        W_c, loss = run(x, W_c, i + 1)
        losses.append(loss)
    jax.block_until_ready(W_c)
    dt = time.perf_counter() - t0

    final_loss = float(losses[-1])
    em_per_s = args.steps / dt
    report = {
        "metric": "dict-learning EM steps/s (multi-host harness)",
        "value": round(em_per_s, 4),
        "unit": "EM steps/s",
        "processes": n_proc,
        "devices": len(jax.devices()),
        "global_batch": args.batch,
        "samples_per_s_global": round(em_per_s * args.batch, 1),
        "samples_per_s_per_host": round(em_per_s * args.batch / n_proc, 1),
        "final_loss": final_loss,
    }
    if pid == 0:
        print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
