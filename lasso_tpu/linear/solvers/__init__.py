from lasso_tpu.linear.solvers.ista import ista

__all__ = ["ista"]

# Solvers are appended to this namespace as they land; keep imports lazy-ish
# so a partially-built tree still imports.
try:
    from lasso_tpu.linear.solvers.coordinate_descent import (coord_descent,
                                                             coord_descent_mod)
    __all__ += ["coord_descent", "coord_descent_mod"]
except ImportError:  # pragma: no cover
    pass
try:
    from lasso_tpu.linear.solvers.gpsr import gpsr_basic
    __all__ += ["gpsr_basic"]
except ImportError:  # pragma: no cover
    pass
try:
    from lasso_tpu.linear.solvers.iterative_ridge import iterative_ridge
    __all__ += ["iterative_ridge"]
except ImportError:  # pragma: no cover
    pass
try:
    from lasso_tpu.linear.solvers.interior_point import interior_point
    __all__ += ["interior_point"]
except ImportError:  # pragma: no cover
    pass
try:
    from lasso_tpu.linear.solvers.split_bregman import split_bregman
    __all__ += ["split_bregman"]
except ImportError:  # pragma: no cover
    pass
try:
    from lasso_tpu.linear.solvers.orthant_wise_newton import orthant_wise_newton
    __all__ += ["orthant_wise_newton"]
except ImportError:  # pragma: no cover
    pass
try:
    from lasso_tpu.linear.solvers.constrained import constrained_inference
    __all__ += ["constrained_inference"]
except ImportError:  # pragma: no cover
    pass
