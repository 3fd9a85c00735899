from mfs_tpu.estimation.mle import fit_mle_scipy, fit_mle_optax
