#!/bin/bash
# Round-5 experiment legs, sequenced for one TPU chip.
# Reproduces the round-5 measurement campaign; logs to
# experiments/logs_r05/.
set -x
cd "$(dirname "$0")/.."
mkdir -p experiments/logs_r05

# 1. Rescue-tier design probes (jitter selection for the bench
#    headline; writes tools/PROBE_RESCUE{2,3}.json).
timeout 1800 python tools/probe_rescue2.py \
    > experiments/logs_r05/probe_rescue2.log 2>&1
timeout 1800 python tools/probe_rescue3.py \
    > experiments/logs_r05/probe_rescue3.log 2>&1

# 2. 1D kernel order boundary (n = 16..32) for the auto-dispatch gate.
timeout 7200 python tools/measure_dispatch.py --skip-nd \
    --one-d-ns 16 18 20 24 28 32 --one-d-bs 512 --merge \
    > experiments/logs_r05/md_1d.log 2>&1

# 3. Staged K-builder validation (s = 15/28/36/45 vs monolithic / f64).
timeout 3600 python tools/probe_staged_k.py \
    > experiments/logs_r05/probe_staged.log 2>&1

# 4. ND dispatch cells in the staged range (N = 8, 9).
timeout 7200 python tools/measure_dispatch.py --skip-1d \
    --nd-ns 8 9 --nd-bs 32 64 128 --merge \
    > experiments/logs_r05/md_nd.log 2>&1

# 5. Prey-predator: the reference's GPU regime on one chip.
timeout 3600 python experiments/prey_predator.py --Ns 8 9 --trials 64 \
    --T 200 --eigh-impls pallas refined --transition poly --chunk-T 50 \
    --summary > experiments/logs_r05/pp89.log 2>&1
timeout 3600 python experiments/prey_predator.py --Ns 11 --trials 32 \
    --T 200 --eigh-impls refined --transition poly --chunk-T 25 \
    --summary > experiments/logs_r05/pp11.log 2>&1
timeout 3600 python experiments/prey_predator.py --Ns 3 5 7 --trials 64 \
    --T 200 --eigh-impls pallas refined --transition poly --chunk-T 50 \
    --summary > experiments/logs_r05/pp357.log 2>&1

# 6. d = 3: Lotka-Volterra food chain vs GHF/EKF.
timeout 3600 python experiments/lotka_volterra_3d.py --Ns 3 --trials 64 \
    --T 200 --eigh-impls auto refined --methods mf --summary \
    > experiments/logs_r05/lv3d_n3.log 2>&1
timeout 3600 python experiments/lotka_volterra_3d.py --Ns 2 --trials 64 \
    --T 200 --eigh-impls auto refined --methods mf ghf ekf --summary \
    > experiments/logs_r05/lv3d_n2.log 2>&1

# 7. Headline bench + hardware test tier + verify drive.
timeout 1800 python bench.py > experiments/logs_r05/bench.log 2>&1
MFS_TPU_TESTS_TPU=1 timeout 3600 python -m pytest \
    tests/test_tpu_hardware.py -q \
    > experiments/logs_r05/tpu_tests.log 2>&1
timeout 1200 python tools/verify_drive.py \
    > experiments/logs_r05/verify.log 2>&1
