from mfs_tpu.ops.eigh import eigh_batched, eigh_xla, eigh_refined
