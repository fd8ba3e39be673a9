#!/bin/bash
# Quick eval driver (reference eval.sh): eurosat fusion+multimodal x 3 seeds.
for SEED in 1 2 3
do
  bash scripts/mm_cls/eval_ovmr.sh eurosat ${SEED} base 2 fusion 10 0
  bash scripts/mm_cls/eval_ovmr.sh eurosat ${SEED} base 2 multimodal 10 0
done
