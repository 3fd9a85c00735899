from mfs_tpu.models.one_dim import benes_bernoulli, well_poisson
