"""lasso_tpu — a TPU-native sparse-coding and dictionary-learning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
rfeinman/pytorch-lasso: batched lasso solvers (ISTA/FISTA, coordinate
descent, GPSR, interior point, iterative ridge, split Bregman, orthant-wise
Newton), convolutional and nonlinear (autograd) variants, and alternating
dictionary learning — all expressed as jit-compiled ``lax.while_loop``
programs with on-device convergence tests, Pallas-fused hot kernels, and
``jax.sharding`` data-parallel scale-out.
"""

from lasso_tpu import config, linalg, ops
from lasso_tpu.conjgrad import batch_cg, batch_cg_conv2d, cg, conjgrad

__version__ = "0.1.0"
