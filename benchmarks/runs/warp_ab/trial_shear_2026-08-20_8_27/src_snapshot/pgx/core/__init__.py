"""Layer primitives (equalized-LR layers, norms, blocks)."""

from pgx.core.layers import (  # noqa: F401
    conv_block,
    conv_block_init,
    embedding,
    embedding_init,
    equal_conv2d,
    equal_conv2d_init,
    equal_conv_transpose2d,
    equal_conv_transpose2d_init,
    equal_linear,
    equal_linear_init,
    latent_to_4x4,
    leaky_relu,
    minibatch_stddev,
    pixel_norm,
    single_conv_block,
    single_conv_block_init,
)
