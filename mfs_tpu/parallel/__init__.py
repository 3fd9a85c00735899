from mfs_tpu.parallel.mesh import trial_mesh, shard_trials, replicate
from mfs_tpu.parallel.ensemble import run_ensemble_filter, sharded_nell_grad
