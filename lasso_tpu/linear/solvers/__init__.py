from lasso_tpu.linear.solvers.constrained import constrained_inference
from lasso_tpu.linear.solvers.coordinate_descent import (coord_descent,
                                                         coord_descent_mod)
from lasso_tpu.linear.solvers.gpsr import gpsr_basic
from lasso_tpu.linear.solvers.group_lasso import (group_ista,
                                                  group_lasso_objective,
                                                  group_soft_threshold)
from lasso_tpu.linear.solvers.interior_point import interior_point
from lasso_tpu.linear.solvers.ista import ista
from lasso_tpu.linear.solvers.iterative_ridge import iterative_ridge
from lasso_tpu.linear.solvers.omp import orthogonal_matching_pursuit
from lasso_tpu.linear.solvers.orthant_wise_newton import orthant_wise_newton
from lasso_tpu.linear.solvers.split_bregman import split_bregman

__all__ = [
    "constrained_inference",
    "coord_descent",
    "coord_descent_mod",
    "gpsr_basic",
    "group_ista",
    "group_lasso_objective",
    "group_soft_threshold",
    "interior_point",
    "ista",
    "iterative_ridge",
    "orthant_wise_newton",
    "orthogonal_matching_pursuit",
    "split_bregman",
]
