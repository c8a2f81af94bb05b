"""Numerics ops layer (resize, upfirdn2d, bias_act, grid_sample, Pallas kernels)."""

from pgx.ops.resize import avg_pool2x, downsample2x, upsample2x  # noqa: F401
