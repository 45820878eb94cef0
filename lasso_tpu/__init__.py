"""lasso_tpu — a TPU-native sparse-coding and dictionary-learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
rfeinman/pytorch-lasso: batched lasso solvers (ISTA/FISTA, coordinate
descent, GPSR, interior point, iterative ridge, split Bregman, orthant-wise
Newton, constrained formulations), convolutional and nonlinear (autograd)
variants, and alternating dictionary learning — all expressed as
jit-compiled ``lax.while_loop`` programs with on-device convergence tests,
a Pallas-fused FISTA MXU kernel, mesh-sharded scale-out, and Orbax
checkpoint/resume.
"""

from lasso_tpu import (config, conv2d, linalg, linear, nonlinear, ops,
                       parallel, utils)
from lasso_tpu.conjgrad import batch_cg, batch_cg_conv2d, cg, conjgrad
from lasso_tpu.linear import (dict_evaluate, dict_learning, initialize_code,
                              lasso_loss, sparse_encode, update_dict,
                              update_dict_block, update_dict_ridge)

__version__ = "0.1.0"

__all__ = [
    "linear", "nonlinear", "conv2d", "ops", "linalg", "parallel", "utils",
    "config", "sparse_encode", "initialize_code", "dict_learning",
    "dict_evaluate", "lasso_loss", "update_dict", "update_dict_block",
    "update_dict_ridge",
    "conjgrad", "cg", "batch_cg", "batch_cg_conv2d",
]
