"""Device-mesh construction and sharding helpers.

The reference has no distributed support at all (SURVEY.md §2 census); this
layer is the TPU-native scale-out story: a ('data', 'model') mesh where the
embarrassingly-parallel sample axis shards over 'data' and (optionally) the
dictionary's atom axis K shards over 'model'. All collectives (psum of the
Z^T Z / Z^T X Gram statistics in the dictionary update, psum of global
convergence sums inside solver while_loops) are inserted by XLA from these
sharding annotations — no hand-written communication.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, model_parallel=1, devices=None):
    """Build a ('data', 'model') mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    assert n_devices % model_parallel == 0, (n_devices, model_parallel)
    grid = np.asarray(devices).reshape(n_devices // model_parallel,
                                       model_parallel)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh):
    """Sharding for batched per-sample arrays: [N, ...] split over 'data'."""
    return NamedSharding(mesh, P("data"))


def code_sharding(mesh, shard_atoms=False):
    """Sharding for code arrays z: [N, K] — 'data' on N, optionally 'model'
    on K for very large dictionaries."""
    return NamedSharding(mesh, P("data", "model" if shard_atoms else None))


def weight_sharding(mesh, shard_atoms=False):
    """Sharding for the dictionary W: [D, K] — replicated by default,
    column-sharded over 'model' when ``shard_atoms``."""
    return NamedSharding(mesh, P(None, "model" if shard_atoms else None))


def replicated(mesh):
    return NamedSharding(mesh, P())
