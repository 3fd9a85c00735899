#!/bin/bash
# Round-4 experiment legs, sequenced for one TPU chip.
# Each leg is independently resumable; logs to experiments/logs_r04/.
set -x
cd "$(dirname "$0")/.."
mkdir -p experiments/logs_r04

# 1. Moment-filter MLE: per-trial batched L-BFGS with early stop +
#    SciPy per-trial quality parity on 100 identical trials + grad bench.
timeout 5400 python experiments/parameter_estimation.py \
    --trials 1000 --T 1000 --eigh-impl pallas --opt-steps 100 \
    --chunk-steps 5 --scipy-check 100 --grad-bench \
    > experiments/logs_r04/pe_mf.log 2>&1

# 2. GHF / EKF baselines on identical trials.
timeout 5400 python experiments/parameter_estimation_baselines.py \
    --methods ghf ekf --trials 1000 --T 1000 --opt-steps 100 \
    --chunk-steps 5 \
    > experiments/logs_r04/pe_ghf_ekf.log 2>&1

# 3. PF baseline (heavier: 512 particles x 1000 trials, remat).
timeout 7200 python experiments/parameter_estimation_baselines.py \
    --methods pf --trials 1000 --T 1000 --nparticles 512 \
    --opt-steps 60 --chunk-steps 2 \
    > experiments/logs_r04/pe_pf.log 2>&1

# 4. PF convergence foil (reference convergence_pf.py).
timeout 3600 python experiments/convergence.py \
    --Ns 2 3 4 6 8 10 --trials 1000 --mode central \
    --pf-particles 100 1000 10000 \
    > experiments/logs_r04/convergence_pf.log 2>&1

# 5. Prey-predator sweep with auto dispatch (item 4 acceptance).
timeout 5400 python experiments/prey_predator.py \
    --Ns 3 5 7 --T 200 --trials 64 --transition poly \
    --eigh-impls auto pallas refined --summary \
    > experiments/logs_r04/prey_predator_auto.log 2>&1

echo ALL DONE
