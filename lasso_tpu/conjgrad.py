"""Top-level conjugate-gradient module, mirroring the reference layout
(``lasso.conjgrad`` -> ``lasso_tpu.conjgrad``)."""

from lasso_tpu.linalg.conjgrad import (STATUS_MESSAGES, batch_cg,
                                       batch_cg_conv2d, cg, conjgrad)

__all__ = ["conjgrad", "cg", "batch_cg", "batch_cg_conv2d", "STATUS_MESSAGES"]
