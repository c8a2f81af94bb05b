"""pgx — a TPU-native Progressive GAN framework (JAX / XLA / Pallas).

Re-implements, TPU-first, the full capability surface of the PyTorch reference
``gwilczynski95/Progressive-GAN-pytorch`` (see SURVEY.md): the equalized-LR
Progressive-Growing GAN model zoo, WGAN-GP training with nested-grad gradient
penalty, progressive growth schedulers, ADA augmentation, FID evaluation,
checkpointing with the smaller-to-bigger grower, and data pipelines.

Layout (bottom-up):
  pgx.ops        -- numerics kernels: exact-parity bilinear resize, upfirdn2d,
                    bias_act registry, grid_sample; Pallas TPU variants.
  pgx.core       -- layer primitives: equalized-LR conv/linear/embed,
                    PixelNorm, minibatch-stddev, conv blocks.
  pgx.models     -- unified Generator/Discriminator covering all 15 reference
                    model classes via configuration.
  pgx.train      -- WGAN-GP loss, per-stage jitted train steps, EMA, schedules.
  pgx.data       -- host-side input pipelines with device prefetch.
  pgx.parallel   -- mesh/sharding helpers and psum'd training stats.
  pgx.augment    -- ADA augmentation pipe + adaptive-p controller.
  pgx.eval       -- InceptionV3 FID machinery.
  pgx.checkpoint -- save/restore/resume + checkpoint grower.
  pgx.cli        -- entry points mirroring the reference scripts.
"""

__version__ = "0.1.0"
