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

from lasso_tpu.linear.dict_learning import (lasso_loss, update_dict,
                                            update_dict_block,
                                            update_dict_online,
                                            update_dict_ridge)
from lasso_tpu.linear.sparse_encode import sparse_encode
from lasso_tpu.parallel.mesh import (code_sharding, data_sharding,
                                     replicated, weight_sharding)

# Solver families routed through shard_map (per-device local shapes, so
# their Pallas kernels stay usable on multi-chip meshes). 'ista' and
# 'interior-point' have batch-GLOBAL stopping statistics in the reference
# and take an axis_name to psum them; cd / cd-mod stop per sample, so
# shards legitimately exit their loops independently with no collective.
_SHARD_MAP_ALGOS = ("ista", "cd", "cd-mod", "interior-point", "omp",
                    "group-ista")
_AXIS_NAME_ALGOS = ("ista", "interior-point", "group-ista")
# Solvers with a use_pallas switch: under the GSPMD route they must run
# the plain XLA path — a pallas_call is a custom call GSPMD cannot
# partition, and on TPU 'auto' would otherwise engage it on global shapes.
_PALLAS_ALGOS = ("ista", "cd", "cd-mod", "omp", "group-ista")


def _data_pad(mesh, n_rows):
    """Zero-rows of padding that make n_rows divisible by the 'data'
    axis size (0 when already divisible)."""
    return (-n_rows) % mesh.shape["data"]


def _pad_rows(arr, n_pad, fill=0.0):
    """Append ``n_pad`` constant rows to a batched array."""
    if n_pad == 0:
        return arr
    arr = jnp.asarray(arr)
    pad = jnp.full((n_pad,) + arr.shape[1:], fill, arr.dtype)
    return jnp.concatenate([arr, pad], axis=0)


def data_parallel_encode(mesh, x, weight, alpha=1.0, shard_atoms=False,
                         algorithm="ista", **kwargs):
    """Shard the batch over the mesh's 'data' axis and encode.

    Per-sample solves are independent; the only cross-device traffic is the
    global convergence reduction inside the solver loop (for the solvers
    that have one).

    Ragged batches (N not divisible by the data-axis size) are handled by
    zero-padding to the next multiple and slicing the result back — a zero
    row solves a zero problem, so its codes are exactly zero and its
    contribution to the global ``sum|dz|`` stopping statistic is 0 (the
    same trick as ``utils.chunked``). For the sum-stopping solvers (ista,
    group-ista) the tolerance is rescaled by ``N / N_padded`` so the
    global threshold ``numel * tol`` is that of the UNPADDED batch —
    stopping behavior is bit-identical to the single-device solve. For
    'interior-point' the batch-MEAN stopping statistics are diluted by
    the inert padding rows (the padded run can stop a little later,
    never with worse iterates); pass ``per_sample=True`` there if exact
    ragged stopping parity matters.
    """
    return_iters = bool(kwargs.get("return_iters"))
    if return_iters and (algorithm in ("cd", "cd-mod", "omp")
                         or kwargs.get("per_sample_tol")
                         or kwargs.get("per_sample")):
        raise ValueError(
            "return_iters is not supported under data_parallel_encode "
            "for solvers with per-sample stopping (cd, cd-mod, or "
            "per_sample/per_sample_tol modes): each shard exits its loop "
            "at a different count, so there is no single global iteration "
            "count to return. Call the solver directly inside your own "
            "shard_map if you need per-shard counts.")

    x_sh = data_sharding(mesh)
    w_sh = weight_sharding(mesh, shard_atoms)
    z_sh = code_sharding(mesh, shard_atoms)

    if algorithm in _SHARD_MAP_ALGOS and not shard_atoms:
        # per-sample arrays (z0 warm starts, [N]-vector alpha) must
        # enter shard_map as explicit 'data'-sharded operands, not
        # closed-over globals — the local body sees per-device shapes
        z0 = kwargs.pop("z0", None)
        a_arr = jnp.asarray(alpha)
        # only PER-SAMPLE alpha forms ((N,) / (N,1)) shard over 'data';
        # a per-feature [1, K] row is batch-invariant and closes over
        # the local body like the scalar form
        vec_alpha = (a_arr.ndim >= 1 and a_arr.shape[0] == x.shape[0]
                     and (a_arr.ndim == 1 or a_arr.shape[1:] == (1,)))
        n_rows = x.shape[0]
        n_pad = _data_pad(mesh, n_rows)
        if n_pad:
            x = _pad_rows(x, n_pad)
            if z0 is not None:
                z0 = _pad_rows(z0, n_pad)
            if vec_alpha:
                # ones-pad: any positive penalty keeps a zero row's codes
                # exactly zero (and the homogeneity rescale x/alpha stays
                # well defined)
                a_arr = _pad_rows(a_arr, n_pad, fill=1.0)
            if (algorithm in ("ista", "group-ista")
                    and not kwargs.get("per_sample_tol")):
                # preserve the UNPADDED global threshold numel * tol: the
                # padded rows contribute 0 to sum|dz| but would otherwise
                # inflate numel and loosen the stop
                kwargs["tol"] = (kwargs.get("tol", 1e-5)
                                 * n_rows / (n_rows + n_pad))
        extra = ({"axis_name": "data"}
                 if algorithm in _AXIS_NAME_ALGOS else {})
        # with return_iters, sparse_encode returns (z, n_iter): the count
        # is identical across shards for the axis_name solvers (their
        # stopping statistic is psum-reduced), so it comes out replicated
        out_specs = (P("data"), P()) if return_iters else P("data")

        in_specs = [P("data"), P()]
        args = [jax.device_put(x, x_sh), jax.device_put(weight, w_sh)]
        names = []
        if z0 is not None:
            in_specs.append(P("data"))
            args.append(jax.device_put(z0, z_sh))
            names.append("z0")
        if vec_alpha:
            in_specs.append(P("data"))
            args.append(jax.device_put(a_arr, x_sh))
            names.append("alpha")

        def local(x, w, *rest):
            kw = dict(zip(names, rest))
            a = kw.pop("alpha", alpha)
            return sparse_encode(x, w, alpha=a, algorithm=algorithm,
                                 **kw, **extra, **kwargs)

        fn = jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=tuple(in_specs),
            out_specs=out_specs, check_vma=False))
        out = fn(*args)
        if n_pad:
            if return_iters:
                return out[0][:n_rows], out[1]
            return out[:n_rows]
        return out
    else:
        if algorithm in _PALLAS_ALGOS:
            kwargs.setdefault("use_pallas", False)
        fn = jax.jit(
            partial(sparse_encode, alpha=alpha, algorithm=algorithm,
                    **kwargs),
            in_shardings=(x_sh, w_sh),
            out_shardings=(z_sh, replicated(mesh)) if return_iters
            else z_sh,
        )
    x = jax.device_put(x, x_sh)
    weight = jax.device_put(weight, w_sh)
    return fn(x, weight)


def data_parallel_encode_conv2d(mesh, x, weight, alpha=1.0, z0=None,
                                stride=1, padding=0, **kwargs):
    """Shard a conv sparse-coding batch over the mesh's 'data' axis.

    x: [N, C_x, H, W] (N divisible by the data-axis size), weight:
    [C_z, C_x, kh, kw] replicated. Per-sample conv solves are independent;
    the solver's batch-global stopping sum psums over 'data'
    (``ista_conv2d(axis_name=...)``). ``z0`` defaults to zeros with the
    conv-geometry code shape.
    """
    from lasso_tpu.conv2d.ista import ista_conv2d
    from lasso_tpu.conv2d.ops import conv2d

    weight = jnp.asarray(weight)
    # ragged batches: zero-pad to the next data-axis multiple (a zero
    # image solves a zero problem) and rescale tol so the global
    # sum-stopping threshold is the unpadded batch's; slice back below
    n_rows = x.shape[0]
    n_pad = _data_pad(mesh, n_rows)
    if n_pad:
        x = _pad_rows(x, n_pad)
        if z0 is not None:
            z0 = _pad_rows(z0, n_pad)
        kwargs["tol"] = kwargs.get("tol", 1e-5) * n_rows / (n_rows + n_pad)
    if z0 is None:
        code = jax.eval_shape(
            lambda xx: conv2d(xx, weight, stride=stride, padding=padding),
            jax.ShapeDtypeStruct(x.shape, x.dtype))
        z0 = jnp.zeros(code.shape, x.dtype)

    if kwargs.get("return_iters"):
        raise ValueError("return_iters is not supported under "
                         "data_parallel_encode_conv2d")
    local = partial(ista_conv2d, alpha=alpha, stride=stride,
                    padding=padding, axis_name="data", **kwargs)
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P("data"), P("data"), P()),
        out_specs=P("data"), check_vma=False))
    x_sh = data_sharding(mesh)
    out = fn(jax.device_put(x, x_sh), jax.device_put(z0, x_sh),
             jax.device_put(weight, replicated(mesh)))
    return out[:n_rows] if n_pad else out


def data_parallel_encode_nl(mesh, x, z0, decoder, alpha=1.0, **kwargs):
    """Shard a nonlinear sparse-coding batch over the mesh's 'data' axis.

    ``decoder`` must be per-sample (batched elementwise over rows — true
    of any ``vmap``-style decoder), since each shard applies it to its
    local rows only. The batch-global stopping sum psums over 'data'
    (``ista_nl(axis_name=...)``); the per-sample Hessian power iteration
    is row-local.
    """
    from lasso_tpu.nonlinear.ista import ista_nl

    if kwargs.get("return_iters"):
        raise ValueError("return_iters is not supported under "
                         "data_parallel_encode_nl")
    # ragged batches: zero-pad to the next data-axis multiple and rescale
    # tol to preserve the unpadded global stop threshold. Rows are
    # independent, so padded rows never change real rows' iterates; their
    # own deltas are 0 when decoder(0) == 0 (exact stopping parity) and
    # otherwise only ADD to the global sum|dz| — the padded run may stop
    # later than the unpadded one, never earlier with worse iterates.
    n_rows = x.shape[0]
    n_pad = _data_pad(mesh, n_rows)
    if n_pad:
        x = _pad_rows(x, n_pad)
        z0 = _pad_rows(z0, n_pad)
        kwargs["tol"] = kwargs.get("tol", 1e-5) * n_rows / (n_rows + n_pad)
    local = partial(ista_nl, alpha=alpha, axis_name="data", **kwargs)
    fn = jax.jit(jax.shard_map(
        lambda x_, z0_: local(x_, z0_, decoder), mesh=mesh,
        in_specs=(P("data"), P("data")), out_specs=P("data"),
        check_vma=False))
    x_sh = data_sharding(mesh)
    out = fn(jax.device_put(x, x_sh), jax.device_put(z0, x_sh))
    return out[:n_rows] if n_pad else out


def make_train_step(mesh, alpha=1.0, lambd=1e-2, shard_atoms=False,
                    algorithm="ista", constrained=False,
                    dict_update="sequential", block_lambd=1e-6,
                    **solver_kwargs):
    """One jitted EM step of dictionary learning over a mesh.

    x is sharded over 'data'; W is replicated (or column-sharded over
    'model'). The ridge update's Z^T Z / Z^T X products psum over 'data'.

    ``constrained=False`` (default) uses the unconstrained ridge M-step
    and returns ``step(x, W) -> (W_new, loss)``. ``constrained=True``
    mirrors :func:`lasso_tpu.linear.dict_learning` (unit-norm atoms with
    degenerate re-randomization; ``dict_update`` selects 'sequential'
    reference parity, per-atom psum of ``Z[:,k]^T R`` — or 'block', one
    psum'd joint ridge + renormalization) and returns
    ``step(x, W, key) -> (W_new, loss)`` — the PRNG key seeds the
    degenerate-atom replacements and must be identical on every process.
    Returns the step plus the input shardings either way.
    """
    if dict_update not in ("sequential", "block"):
        raise ValueError(f"dict_update must be 'sequential' or 'block', "
                         f"got {dict_update!r}")
    x_sh = data_sharding(mesh)
    w_sh = weight_sharding(mesh, shard_atoms)

    def m_step(x, weight, Z, key, axis_name=None):
        if not constrained:
            return update_dict_ridge(x, Z, lambd=lambd,
                                     axis_name=axis_name)
        if dict_update == "sequential":
            W_new, _ = update_dict(weight, x, Z, key=key,
                                   axis_name=axis_name)
        else:
            W_new, _ = update_dict_block(weight, x, Z, key=key,
                                         lambd=block_lambd,
                                         axis_name=axis_name)
        return W_new

    if algorithm in _SHARD_MAP_ALGOS and not shard_atoms:
        # shard_map route: psum-reduced Gram statistics (SURVEY.md §2.3),
        # via the dict updates' own axis_name support
        extra = ({"axis_name": "data"}
                 if algorithm in _AXIS_NAME_ALGOS else {})

        def local_step(x, weight, key):
            Z = sparse_encode(x, weight, alpha, algorithm=algorithm,
                              **extra, **solver_kwargs)
            n_global = jax.lax.psum(jnp.asarray(x.shape[0], x.dtype),
                                    "data")
            loss = jax.lax.psum(
                lasso_loss(x, Z, weight, alpha) * x.shape[0], "data"
            ) / n_global
            W_new = m_step(x, weight, Z, key, axis_name="data")
            return W_new, loss

        jit_step = jax.jit(jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(P("data"), P(), P()), out_specs=(P(), P()),
            check_vma=False))
    else:
        if algorithm in _PALLAS_ALGOS:
            solver_kwargs.setdefault("use_pallas", False)

        def step(x, weight, key):
            Z = sparse_encode(x, weight, alpha, algorithm=algorithm,
                              **solver_kwargs)
            loss = lasso_loss(x, Z, weight, alpha)
            W_new = m_step(x, weight, Z, key)
            return W_new, loss

        jit_step = jax.jit(
            step, in_shardings=(x_sh, w_sh, replicated(mesh)),
            out_shardings=(w_sh if not constrained else replicated(mesh),
                           replicated(mesh)))

    if constrained:
        return jit_step, (x_sh, w_sh)

    # unconstrained: keep the step(x, W) signature (the key is unused by
    # the ridge M-step)
    _dummy_key = jax.random.PRNGKey(0)
    return (lambda x, weight: jit_step(x, weight, _dummy_key)), (x_sh, w_sh)


def make_task_driven_step(mesh, downstream_loss, alpha=0.1, opt_lr=0.05,
                          algorithm="ista", normalize_atoms=True,
                          persist=False, **enc_kwargs):
    """One jitted TASK-DRIVEN dictionary-training step over a mesh.

    The differentiable encoder
    (:func:`lasso_tpu.linear.make_implicit_encoder`) runs under GSPMD
    with ``x`` sharded over 'data' and ``W`` replicated: the forward
    FISTA matmuls and the IFT backward's masked-CG matmuls partition
    along the batch axis identically, and the partitioner inserts the
    cross-shard reduction of the (replicated) dictionary cotangent —
    the mesh version of the example's single-chip loop
    (examples/task_driven_dict_learning.py).

    ``downstream_loss(x, z, weight) -> scalar`` is the user's training
    objective (sum or mean over the GLOBAL batch). ``enc_kwargs`` thread
    to the encoder/solver (``use_pallas`` is forced off — a pallas_call
    is a custom call GSPMD cannot partition). ``normalize_atoms`` clips
    atom norms to <= 1 after the gradient step (plain projected GD).

    Returns ``(step, (x_sharding, w_sharding))`` with
    ``step(x, W) -> (W_new, loss)``. With ``persist=True`` the step
    becomes ``step(x, W, Z0) -> (W_new, loss, Z)``: the encoder
    warm-starts from ``Z0`` (the previous step's codes — the dictionary
    moves slowly, so with ``tol > 0`` the forward converges in a
    fraction of the cold iterations) and returns the new codes,
    data-sharded, for the next step. The warm start has zero cotangent
    (IFT semantics), so gradients are unchanged.
    """
    from lasso_tpu.linear.implicit import make_implicit_encoder

    enc_kwargs.setdefault("use_pallas", False)
    enc = make_implicit_encoder(algorithm=algorithm, **enc_kwargs)
    x_sh, w_sh = data_sharding(mesh), replicated(mesh)

    def finish(weight, loss, g):
        w_new = weight - opt_lr * g
        if normalize_atoms:
            w_new = w_new / jnp.maximum(
                jnp.linalg.norm(w_new, axis=0, keepdims=True), 1.0)
        return w_new, loss

    if persist:
        def step_p(x, weight, z0):
            def loss_fn(w):
                z = enc(x, w, jnp.asarray(alpha, x.dtype), z0)
                return downstream_loss(x, z, w), z

            (loss, z), g = jax.value_and_grad(
                loss_fn, has_aux=True)(weight)
            w_new, loss = finish(weight, loss, g)
            return w_new, loss, z

        fn = jax.jit(step_p, in_shardings=(x_sh, w_sh, x_sh),
                     out_shardings=(w_sh, replicated(mesh), x_sh))
        return fn, (x_sh, w_sh)

    def step(x, weight):
        def loss_fn(w):
            z = enc(x, w, jnp.asarray(alpha, x.dtype))
            return downstream_loss(x, z, w)

        loss, g = jax.value_and_grad(loss_fn)(weight)
        return finish(weight, loss, g)

    fn = jax.jit(step, in_shardings=(x_sh, w_sh),
                 out_shardings=(w_sh, replicated(mesh)))
    return fn, (x_sh, w_sh)


def make_conv_train_step(mesh, alpha=1.0, kernel_size=7, stride=1,
                         padding=0, constrained=True, lambd=None,
                         cg_iters=30, eps=1e-10, **solver_kwargs):
    """One jitted EM step of CONVOLUTIONAL dictionary learning over the
    mesh (see :func:`lasso_tpu.conv2d.conv_dict_learning`).

    ``step(x, weight, key) -> (weight_new, loss)``: the image batch x
    [N, C, H, W] shards over 'data'; the filter stack replicates. The
    encode's batch-global stopping sum psums over 'data'
    (``ista_conv2d(axis_name=...)``) and the M-step's filter-space CG
    psums only its adjoint reductions (``update_kernel(axis_name=...)``)
    — CG state is replicated, so per-CG-iteration traffic is one
    filter-tensor psum. The PRNG key seeds degenerate-filter
    replacements and must be identical on every process.
    """
    from lasso_tpu.conv2d.dict_learning import (conv_lasso_loss,
                                                update_kernel,
                                                update_kernel_constrained)
    from lasso_tpu.conv2d.ista import ista_conv2d
    from lasso_tpu.conv2d.ops import conv2d

    if lambd is None:
        lambd = 1e-6 if constrained else 1e-4
    x_sh = data_sharding(mesh)

    def local_step(x, weight, key):
        code = jax.eval_shape(
            lambda xx: conv2d(xx, weight, stride=stride, padding=padding),
            jax.ShapeDtypeStruct(x.shape, x.dtype))
        z0 = jnp.zeros(code.shape, x.dtype)
        Z = ista_conv2d(x, z0, weight, alpha, stride=stride,
                        padding=padding, axis_name="data", **solver_kwargs)
        n_global = jax.lax.psum(jnp.asarray(x.shape[0], x.dtype), "data")
        loss = jax.lax.psum(
            conv_lasso_loss(x, Z, weight, alpha, stride=stride,
                            padding=padding) * x.shape[0], "data"
        ) / n_global
        if constrained:
            W_new, _ = update_kernel_constrained(
                x, Z, weight, key, stride=stride, padding=padding,
                lambd=lambd, cg_iters=cg_iters, eps=eps, axis_name="data")
        else:
            W_new = update_kernel(x, Z, weight, stride=stride,
                                  padding=padding, lambd=lambd,
                                  cg_iters=cg_iters, axis_name="data")
        return W_new, loss

    jit_step = jax.jit(jax.shard_map(
        local_step, mesh=mesh, in_specs=(P("data"), P(), P()),
        out_specs=(P(), P()), check_vma=False))
    return jit_step, (x_sh, replicated(mesh))


def make_online_train_step(mesh, alpha=1.0, algorithm="ista", forget=None,
                           positive=False, eps=1e-10, dict_sweeps=1,
                           **solver_kwargs):
    """One jitted ONLINE dictionary-learning step over the mesh
    (minibatch Mairal update; see
    :func:`lasso_tpu.linear.dict_learning_online`).

    ``step(x_t, W, A, B) -> (W_new, A_new, B_new, loss)``: the minibatch
    ``x_t`` is sharded over 'data'; the dictionary and the sufficient
    statistics A [K, K] / B [D, K] are replicated. The per-shard
    statistic partials ``Z^T Z`` / ``x^T Z`` psum over 'data' (the only
    collectives — the atom sweep then runs on replicated data), so the
    communication volume per step is O(K^2 + DK), independent of the
    minibatch size. Returns the step plus ``(x_sharding, replicated)``.
    """
    gamma = 1.0 if forget is None else float(forget)
    x_sh = data_sharding(mesh)
    extra = ({"axis_name": "data"}
             if algorithm in _AXIS_NAME_ALGOS else {})
    if algorithm not in _SHARD_MAP_ALGOS:
        raise ValueError(
            f"make_online_train_step supports the shard_map solver "
            f"routes {_SHARD_MAP_ALGOS}, got {algorithm!r}")

    def local_step(x, weight, A, B):
        Z = sparse_encode(x, weight, alpha, algorithm=algorithm,
                          **extra, **solver_kwargs)
        n_g = jax.lax.psum(jnp.asarray(x.shape[0], x.dtype), "data")
        loss = jax.lax.psum(
            lasso_loss(x, Z, weight, alpha) * x.shape[0], "data") / n_g
        A_new = gamma * A + jax.lax.psum(jnp.matmul(Z.T, Z), "data") / n_g
        B_new = gamma * B + jax.lax.psum(jnp.matmul(x.T, Z), "data") / n_g
        W_new = update_dict_online(weight, A_new, B_new,
                                   sweeps=dict_sweeps, positive=positive,
                                   eps=eps)
        return W_new, A_new, B_new, loss

    jit_step = jax.jit(jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P("data"), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False))
    return jit_step, (x_sh, replicated(mesh))
