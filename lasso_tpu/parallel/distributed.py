"""Multi-host initialization and mesh construction.

The reference has no distributed story (its only multi-worker path is a
CPU multiprocessing pool). Here multi-host runs use JAX's native runtime:
call :func:`initialize` once per process before any jax op, then build a
global mesh with :func:`make_global_mesh`; all collectives (the psum Gram
reductions of the dictionary update, convergence sums) ride ICI within a
slice and DCN across hosts, inserted by XLA from sharding annotations.
"""

from __future__ import annotations

import jax


def initialize(coordinator_address=None, num_processes=None,
               process_id=None, **kwargs):
    """Initialize the multi-host runtime (no-op for single-process runs).

    On Cloud TPU pods the arguments are auto-detected from the metadata
    server; pass them explicitly elsewhere.
    """
    if num_processes is not None and num_processes <= 1:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs)
        return True
    except RuntimeError as e:
        # the only benign RuntimeError is double initialization ("should
        # only be called once" in jax>=0.9, "already initialized" in
        # older releases); anything else (bad coordinator address,
        # mismatched process counts, ...) is a real multi-host
        # misconfiguration and must not be swallowed
        msg = str(e).lower()
        if "already initialized" in msg or "only be called once" in msg:
            return False
        raise
    except ValueError:
        # with NO explicit coordinator AND no explicit process count,
        # jax relies on cluster auto-detection, which raises ValueError
        # on a plain single-host environment — the expected no-op case.
        # An explicitly requested multi-process run (or an explicit
        # coordinator) failing the same way is a misconfiguration.
        if coordinator_address is None and num_processes is None:
            return False
        raise


def make_global_mesh(model_parallel=1):
    """('data', 'model') mesh over all devices of all hosts.

    The 'data' axis spans hosts (per-sample solves need no cross-host
    traffic except the scalar convergence psum); keep 'model' (atom
    sharding) within a host so its all-gathers stay on ICI.
    """
    from lasso_tpu.parallel.mesh import make_mesh
    return make_mesh(n_devices=len(jax.devices()),
                     model_parallel=model_parallel)


def process_local_batch(global_batch_size):
    """Rows of the global batch owned by this process (contiguous split)."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    per = global_batch_size // n_proc
    start = pid * per
    end = start + per if pid < n_proc - 1 else global_batch_size
    return start, end
