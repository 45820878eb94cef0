"""Checkpoint / resume for dictionary learning.

The reference keeps everything in memory (SURVEY.md §5: its only warm-start
facility is ``persist=True`` carrying Z between EM steps). For production
TPU training this module adds Orbax-backed checkpointing of the full EM
state ``(weight, step, losses, Z0, key)`` so preempted pod jobs resume
exactly, including the warm-start codes when ``persist`` is on.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(path: str, state: dict, step: int) -> None:
    """Save a pytree state dict under ``path/step``."""
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(state))
        mngr.wait_until_finished()


def latest_step(path: str) -> Optional[int]:
    ocp = _ocp()
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None
    with ocp.CheckpointManager(path) as mngr:
        return mngr.latest_step()


def restore_checkpoint(path: str, template: Any = None,
                       step: Optional[int] = None):
    """Restore the state saved by :func:`save_checkpoint`. Returns
    ``(state, step)`` or ``(None, None)`` when nothing is saved."""
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mngr:
        if step is None:
            step = mngr.latest_step()
        if step is None:
            return None, None
        if template is not None:
            state = mngr.restore(
                step, args=ocp.args.StandardRestore(template))
        else:
            state = mngr.restore(step)
    return state, step


def dict_learning_resumable(X, n_components, alpha=1.0, constrained=True,
                            persist=False, lambd=1e-2, steps=60,
                            ckpt_dir=None, save_every=10, key=None,
                            algorithm="ista", dict_update="sequential",
                            block_lambd=1e-6, progbar=False,
                            **solver_kwargs):
    """`dict_learning` with periodic Orbax checkpoints and exact resume.

    Runs ``save_every`` EM steps per compiled scan segment, checkpointing
    between segments; on restart, picks up from the latest saved step.
    Returns ``(weight, losses)`` like
    :func:`lasso_tpu.linear.dict_learning.dict_learning`, and accepts the
    same M-step options (``dict_update``/``block_lambd``/``progbar``) so
    the checkpointed path never diverges from the main path's behavior.
    """
    from jax import lax
    from lasso_tpu.linear.dict_learning import (lasso_loss, update_dict,
                                                update_dict_block,
                                                update_dict_ridge)
    from lasso_tpu.linear.sparse_encode import sparse_encode

    if dict_update not in ("sequential", "block"):
        raise ValueError(f"dict_update must be 'sequential' or 'block', "
                         f"got {dict_update!r}")

    n_samples, n_features = X.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    key, init_key = jax.random.split(key)

    weight = jax.nn.initializers.orthogonal()(
        init_key, (n_features, n_components), dtype=X.dtype)
    if constrained:
        weight = weight / (jnp.linalg.norm(weight, axis=0, keepdims=True)
                           + 1e-30)
    Z0 = jnp.zeros((n_samples, n_components), dtype=X.dtype)
    losses = jnp.zeros((steps,), X.dtype)
    start_step = 0

    state = {"weight": weight, "Z0": Z0, "losses": losses, "key": key}
    if ckpt_dir is not None:
        # restore without a strict template: the caller may resume with a
        # different total `steps`, changing the losses array length
        restored, saved_step = restore_checkpoint(ckpt_dir)
        if restored is not None:
            old_losses = jnp.asarray(restored["losses"])
            n_keep = min(old_losses.shape[0], steps)
            state = {
                "weight": jnp.asarray(restored["weight"], X.dtype),
                "Z0": jnp.asarray(restored["Z0"], X.dtype),
                "losses": losses.at[:n_keep].set(old_losses[:n_keep]),
                "key": jnp.asarray(restored["key"], key.dtype),
            }
            start_step = min(int(saved_step), steps)

    def em_step(carry, step_key):
        weight, Z0 = carry
        z0_arg = Z0 if persist else None
        Z = sparse_encode(X, weight, alpha, z0=z0_arg, algorithm=algorithm,
                          **solver_kwargs)
        loss = lasso_loss(X, Z, weight, alpha)
        if progbar:
            jax.debug.print("dict_learning loss: {l}", l=loss)
        if constrained and dict_update == "sequential":
            weight_new, Z = update_dict(weight, X, Z, key=step_key)
        elif constrained:
            weight_new, Z = update_dict_block(weight, X, Z, key=step_key,
                                              lambd=block_lambd)
        else:
            weight_new = update_dict_ridge(X, Z, lambd=lambd)
        return (weight_new, Z), loss

    @jax.jit
    def run_segment(weight, Z0, seg_keys):
        (w, z), seg_losses = lax.scan(em_step, (weight, Z0), seg_keys)
        return w, z, seg_losses

    all_keys = jax.random.split(state["key"], steps)
    i = start_step
    while i < steps:
        n = min(save_every, steps - i)
        w, z, seg_losses = run_segment(state["weight"], state["Z0"],
                                       all_keys[i:i + n])
        state = {
            "weight": w,
            "Z0": z,
            "losses": state["losses"].at[i:i + n].set(seg_losses),
            "key": state["key"],
        }
        i += n
        if ckpt_dir is not None:
            save_checkpoint(ckpt_dir, jax.device_get(state), i)

    return state["weight"], state["losses"]
