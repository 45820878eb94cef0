"""Sharded entry points: data-parallel encoding and dictionary learning.

These wrap the single-device API with mesh shardings; XLA turns the Gram
matmuls of the ridge dictionary update into psum reductions over the 'data'
axis and the solver's global convergence sums into cross-shard psums
(SURVEY.md §2.3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lasso_tpu.linear.dict_learning import lasso_loss, update_dict_ridge
from lasso_tpu.linear.sparse_encode import sparse_encode
from lasso_tpu.parallel.mesh import (code_sharding, data_sharding,
                                     replicated, weight_sharding)


def data_parallel_encode(mesh, x, weight, alpha=1.0, shard_atoms=False,
                         **kwargs):
    """Shard the batch over the mesh's 'data' axis and encode.

    Per-sample solves are independent; the only cross-device traffic is the
    global convergence reduction inside the solver loop.
    """
    x_sh = data_sharding(mesh)
    w_sh = weight_sharding(mesh, shard_atoms)
    z_sh = code_sharding(mesh, shard_atoms)

    fn = jax.jit(
        partial(sparse_encode, alpha=alpha, **kwargs),
        in_shardings=(x_sh, w_sh),
        out_shardings=z_sh,
    )
    x = jax.device_put(x, x_sh)
    weight = jax.device_put(weight, w_sh)
    return fn(x, weight)


def make_train_step(mesh, alpha=1.0, lambd=1e-2, shard_atoms=False,
                    **solver_kwargs):
    """One jitted EM step of unconstrained dictionary learning over a mesh.

    x is sharded over 'data'; W is replicated (or column-sharded over
    'model'). The ridge update's Z^T Z / Z^T X products psum over 'data'.
    Returns ``step(x, W) -> (W_new, loss)`` plus the input shardings.
    """
    x_sh = data_sharding(mesh)
    w_sh = weight_sharding(mesh, shard_atoms)

    def step(x, weight):
        Z = sparse_encode(x, weight, alpha, **solver_kwargs)
        loss = lasso_loss(x, Z, weight, alpha)
        W_new = update_dict_ridge(x, Z, lambd=lambd)
        return W_new, loss

    jit_step = jax.jit(step, in_shardings=(x_sh, w_sh),
                       out_shardings=(w_sh, replicated(mesh)))
    return jit_step, (x_sh, w_sh)
