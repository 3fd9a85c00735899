#!/bin/bash
# The remaining committed-evidence experiments, run serially (single
# chip): convergence study (both modes, reference protocol scale),
# parameter estimation + gradient ablation, method comparison.
set -u
cd "$(dirname "$0")/.."

# 1. Convergence vs the exact KF, 10k MC trials, N = 2..15, both modes
#    (reference dardel/run_convergence_mf.sh:26-30).
python experiments/convergence.py --trials 10000 --Ns 2 3 4 5 6 7 8 9 10 11 12 13 14 15 \
  --mode central --eigh-impl pallas --seed 0
python experiments/convergence.py --trials 10000 --Ns 2 3 4 5 6 7 8 9 10 11 12 13 14 15 \
  --mode raw --eigh-impl pallas --seed 0

# 2. Parameter estimation + gradient-throughput ablation.
python experiments/parameter_estimation.py --trials 1000 --N 4 --T 1000 \
  --eigh-impl pallas --grad-bench --seed 0

# 3. Method comparison (GHF + bootstrap PF scored against the cached
#    brute-force truth on the same trials as the moment-filter sweep).
python experiments/method_comparison.py --trials 1000 --cell-N 8 \
  --cell-mode raw --cell-closure tme --impl-suffix _pallas --seed 0

echo PHASE_C_DONE
