"""AOT export of compiled encoders for serving.

Production serving wants a fixed, pre-compiled artifact rather than
runtime tracing. This wraps ``jax.export``: serialize a jitted encode
function (shapes and solver hyperparameters baked in) to portable
StableHLO bytes, reload it in a serving process, and call it with zero
Python-side solver code.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def export_encoder(weight, alpha=1.0, algorithm="ista", batch_size=None,
                   **solver_kwargs):
    """Serialize a compiled ``encode(x) -> z`` for a fixed dictionary shape.

    Returns StableHLO bytes. ``batch_size=None`` exports with a symbolic
    batch dimension when supported, else requires a fixed batch size.
    """
    from jax import export as jax_export
    from lasso_tpu.linear.sparse_encode import sparse_encode

    d, k = weight.shape

    def encode(x, weight):
        return sparse_encode(x, weight, alpha, algorithm=algorithm,
                             **solver_kwargs)

    if batch_size is None:
        scope = jax_export.SymbolicScope()
        n = jax_export.symbolic_shape("n", scope=scope)[0]
        x_spec = jax.ShapeDtypeStruct((n, d), jnp.float32)
    else:
        x_spec = jax.ShapeDtypeStruct((batch_size, d), jnp.float32)
    w_spec = jax.ShapeDtypeStruct((d, k), jnp.float32)

    exported = jax_export.export(jax.jit(encode))(x_spec, w_spec)
    return exported.serialize()


def load_encoder(blob):
    """Deserialize an exported encoder; returns ``call(x, weight) -> z``."""
    from jax import export as jax_export
    exported = jax_export.deserialize(blob)
    return exported.call
