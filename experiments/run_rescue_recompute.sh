#!/bin/bash
# Phase B of the parity audit: recompute every ours-side cell that had
# divergences with the two-tier divergence rescue enabled
# (``mfs_tpu.parallel.ensemble.rescue_diverged``: fused Pallas pass,
# then the diverged trials re-run through the f64 refined path), then
# re-score the full side-by-side table.
#
# Safe to run while the stage-2 (reference-engine) sweep is still
# going: each group's ours-side cells are only dropped after ALL of
# that group's refcode cells exist (they snapshot the identical trial
# data; recomputation reproduces the same trials bit-for-bit from the
# fold_in seed protocol).
set -u
cd "$(dirname "$0")/.."

NS="2 3 4 5 6 7 8 9 10 11 12 13 14 15"
R=experiments/results/benes_bernoulli

# 1. Wait for the stage-1 sweep to have produced all 84 cells once.
while :; do
  n=$(ls $R/mf_N*_s0_pallas.npz 2>/dev/null | wc -l)
  [ "$n" -ge 84 ] && break
  sleep 60
done

for mode in raw central scaled; do
  for closure in tme tme-normal; do
    # 2. Wait for this group's reference-engine cells.
    while :; do
      missing=0
      for N in $NS; do
        [ -f "$R/refcode_N${N}_${mode}_${closure}_s0.npz" ] || missing=1
      done
      [ "$missing" = 0 ] && break
      sleep 60
    done
    # 3. Drop ours-side cells that had divergences (unless already
    #    recomputed with rescue), then recompute them.
    python - "$mode" "$closure" <<'PY'
import numpy as np, sys, glob, os
mode, clo = sys.argv[1], sys.argv[2]
for f in sorted(glob.glob(
        f"experiments/results/benes_bernoulli/mf_N*_{mode}_{clo}_s0_pallas.npz")):
    d = np.load(f)
    if "rescued" in d.files:
        continue
    fin = d["finite"]
    if fin.shape[0] - fin.sum() > 0:
        os.remove(f)
        print("recompute:", os.path.basename(f), flush=True)
PY
    python experiments/benes_bernoulli.py \
      --trials 1000 --Ns $NS --mode "$mode" --closure "$closure" \
      --tme-order 3 --chunk 500 --eigh-impl pallas --seed 0
  done
done

# 4. Final side-by-side scoring + PARITY.md with the rescued cells.
python experiments/parity_summary.py --Ns $NS --impl-suffix _pallas --seed 0
python experiments/parity_markdown.py
echo PHASE_B_DONE
