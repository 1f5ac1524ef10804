#!/bin/bash
# Materials Project (megnet) CartNet (reference scripts/train_cartnet_megnet.sh).
set -e
TARGETS=${TARGETS:-"e_form gap pbe"}
for target in $TARGETS; do
  for seed in 1 2 3 4; do
    python -m cartnet_tpu.cli --dataset megnet --figshare_target "$target" \
      --name "CartNet_megnet_${target}" --seed $seed --batch 64 \
      --batch_accumulation 1 --epochs 500 --lr 1e-3 "$@"
  done
  python -m cartnet_tpu.aggregate --name "CartNet_megnet_${target}" --seeds 1 2 3 4
done
