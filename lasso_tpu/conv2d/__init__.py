from lasso_tpu.conv2d.ops import conv2d, conv_transpose2d

__all__ = ["conv2d", "conv_transpose2d"]
