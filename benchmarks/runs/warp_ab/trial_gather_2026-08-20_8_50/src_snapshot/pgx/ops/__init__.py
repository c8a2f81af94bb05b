"""Numerics ops layer (resize, upfirdn2d, bias_act, grid_sample, Pallas)."""

from pgx.ops.bias_act import activation_funcs, bias_act  # noqa: F401
from pgx.ops.conv2d_resample import conv2d_resample  # noqa: F401
from pgx.ops.fma import fma  # noqa: F401
from pgx.ops.grid_sample import affine_grid, grid_sample  # noqa: F401
from pgx.ops.resize import avg_pool2x, downsample2x, upsample2x  # noqa: F401
from pgx.ops.upfirdn2d import (  # noqa: F401
    downsample2d,
    filter2d,
    setup_filter,
    upfirdn2d,
    upsample2d,
)
