"""Sharded entry points: data-parallel encoding and dictionary learning.

Two routing strategies (SURVEY.md §2.3):

* **shard_map route** (default for ISTA without atom sharding): the solver
  body runs per-shard on local data with an explicit ``psum`` of the global
  convergence statistic (``axis_name='data'``) and of the Z^T Z / Z^T X
  Gram statistics in the dictionary update. This is the route that keeps
  the fused Pallas kernel usable on multi-chip meshes — a ``pallas_call``
  is a custom call that GSPMD cannot partition, so it must see the
  per-device local shapes.
* **GSPMD route** (everything else, incl. atom-sharded dictionaries): wrap
  the single-device API in ``jax.jit`` with sharding annotations and let
  XLA insert the collectives. Solvers other than ISTA are plain XLA
  (matmuls + reductions), which GSPMD partitions well.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lasso_tpu.linear.dict_learning import lasso_loss, update_dict_ridge
from lasso_tpu.linear.sparse_encode import sparse_encode
from lasso_tpu.parallel.mesh import (code_sharding, data_sharding,
                                     replicated, weight_sharding)

# Solver families routed through shard_map (per-device local shapes, so
# their Pallas kernels stay usable on multi-chip meshes). 'ista' and
# 'interior-point' have batch-GLOBAL stopping statistics in the reference
# and take an axis_name to psum them; cd / cd-mod stop per sample, so
# shards legitimately exit their loops independently with no collective.
_SHARD_MAP_ALGOS = ("ista", "cd", "cd-mod", "interior-point")
_AXIS_NAME_ALGOS = ("ista", "interior-point")
# Solvers with a use_pallas switch: under the GSPMD route they must run
# the plain XLA path — a pallas_call is a custom call GSPMD cannot
# partition, and on TPU 'auto' would otherwise engage it on global shapes.
_PALLAS_ALGOS = ("ista", "cd", "cd-mod")


def data_parallel_encode(mesh, x, weight, alpha=1.0, shard_atoms=False,
                         algorithm="ista", **kwargs):
    """Shard the batch over the mesh's 'data' axis and encode.

    Per-sample solves are independent; the only cross-device traffic is the
    global convergence reduction inside the solver loop (for the solvers
    that have one).
    """
    if kwargs.get("return_iters"):
        raise ValueError(
            "return_iters is not supported under data_parallel_encode: "
            "solvers with per-sample stopping (cd, cd-mod) exit their "
            "loops at different counts per shard, so there is no single "
            "global iteration count to return. Call the solver directly "
            "inside your own shard_map if you need per-shard counts.")

    x_sh = data_sharding(mesh)
    w_sh = weight_sharding(mesh, shard_atoms)
    z_sh = code_sharding(mesh, shard_atoms)

    if algorithm in _SHARD_MAP_ALGOS and not shard_atoms:
        # per-sample arrays (z0 warm starts) must enter shard_map as
        # explicit 'data'-sharded operands, not closed-over globals —
        # the local body sees per-device shapes
        z0 = kwargs.pop("z0", None)
        extra = ({"axis_name": "data"}
                 if algorithm in _AXIS_NAME_ALGOS else {})
        local = partial(sparse_encode, alpha=alpha, algorithm=algorithm,
                        **extra, **kwargs)
        if z0 is not None:
            fn_z0 = jax.jit(jax.shard_map(
                lambda x, w, z0: local(x, w, z0=z0), mesh=mesh,
                in_specs=(P("data"), P(), P("data")), out_specs=P("data"),
                check_vma=False))
            x = jax.device_put(x, x_sh)
            weight = jax.device_put(weight, w_sh)
            return fn_z0(x, weight, jax.device_put(z0, z_sh))
        fn = jax.jit(jax.shard_map(
            local, mesh=mesh,
            in_specs=(P("data"), P()), out_specs=P("data"),
            check_vma=False))
    else:
        if algorithm in _PALLAS_ALGOS:
            kwargs.setdefault("use_pallas", False)
        fn = jax.jit(
            partial(sparse_encode, alpha=alpha, algorithm=algorithm,
                    **kwargs),
            in_shardings=(x_sh, w_sh),
            out_shardings=z_sh,
        )
    x = jax.device_put(x, x_sh)
    weight = jax.device_put(weight, w_sh)
    return fn(x, weight)


def make_train_step(mesh, alpha=1.0, lambd=1e-2, shard_atoms=False,
                    algorithm="ista", **solver_kwargs):
    """One jitted EM step of unconstrained dictionary learning over a mesh.

    x is sharded over 'data'; W is replicated (or column-sharded over
    'model'). The ridge update's Z^T Z / Z^T X products psum over 'data'.
    Returns ``step(x, W) -> (W_new, loss)`` plus the input shardings.
    """
    x_sh = data_sharding(mesh)
    w_sh = weight_sharding(mesh, shard_atoms)

    if algorithm in _SHARD_MAP_ALGOS and not shard_atoms:
        # shard_map route: psum-reduced Gram statistics (SURVEY.md §2.3),
        # via update_dict_ridge's own axis_name support
        extra = ({"axis_name": "data"}
                 if algorithm in _AXIS_NAME_ALGOS else {})

        def local_step(x, weight):
            Z = sparse_encode(x, weight, alpha, algorithm=algorithm,
                              **extra, **solver_kwargs)
            n_global = jax.lax.psum(jnp.asarray(x.shape[0], x.dtype),
                                    "data")
            loss = jax.lax.psum(
                lasso_loss(x, Z, weight, alpha) * x.shape[0], "data"
            ) / n_global
            W_new = update_dict_ridge(x, Z, lambd=lambd, axis_name="data")
            return W_new, loss

        jit_step = jax.jit(jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(P("data"), P()), out_specs=(P(), P()),
            check_vma=False))
        return jit_step, (x_sh, w_sh)

    if algorithm in _PALLAS_ALGOS:
        solver_kwargs.setdefault("use_pallas", False)

    def step(x, weight):
        Z = sparse_encode(x, weight, alpha, algorithm=algorithm,
                          **solver_kwargs)
        loss = lasso_loss(x, Z, weight, alpha)
        W_new = update_dict_ridge(x, Z, lambd=lambd)
        return W_new, loss

    jit_step = jax.jit(step, in_shardings=(x_sh, w_sh),
                       out_shardings=(w_sh, replicated(mesh)))
    return jit_step, (x_sh, w_sh)
