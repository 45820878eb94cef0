"""API-parity shim: the reference exposes its shared linalg helpers as
``lasso.linear.utils`` (/root/reference/lasso/linear/utils.py); the
implementations live in :mod:`lasso_tpu.linalg`."""

from lasso_tpu.linalg.basic import (batch_cholesky_solve, cholesky_inverse,
                                    lstsq, qr, ridge)

__all__ = ["qr", "lstsq", "ridge", "batch_cholesky_solve", "cholesky_inverse"]
