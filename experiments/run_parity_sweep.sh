#!/bin/bash
# Full reference-protocol sweep (counterpart of
# /root/reference/dardel/run_benes_bernoulli_mf.sh): N = 2..15 x
# {raw, central, scaled} x {tme, tme-normal}, 1000 trials, TME order 3.
#
# Stage 1 (TPU): ours — fused Pallas path, chunk-resumable.
# Stage 2 (CPU): the reference's own filters on the identical trials.
# Stage 3: side-by-side scoring -> SUMMARY_reference_parity.json.
#
# Every stage is resumable: re-running skips completed cells/chunks.
set -u
cd "$(dirname "$0")/.."

NS="${NS:-2 3 4 5 6 7 8 9 10 11 12 13 14 15}"
TRIALS="${TRIALS:-1000}"

for mode in raw central scaled; do
  for closure in tme tme-normal; do
    python experiments/benes_bernoulli.py \
      --trials "$TRIALS" --Ns $NS --mode "$mode" --closure "$closure" \
      --tme-order 3 --chunk 500 --eigh-impl pallas --seed 0
  done
done

for mode in raw central scaled; do
  for closure in tme tme-normal; do
    python experiments/reference_parity.py \
      --trials "$TRIALS" --Ns $NS --modes "$mode" --closures "$closure" \
      --tme-order 3 --chunk 500 --impl-suffix _pallas --platform cpu --seed 0
  done
done

python experiments/parity_summary.py --Ns $NS --impl-suffix _pallas --seed 0
python experiments/parity_markdown.py
