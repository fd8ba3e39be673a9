#!/bin/bash
# Full experiment driver: eval OVMR on the 11-dataset suite (3 seeds x modes)
# after (optionally) pretraining the generator on ImageNet21k-OVR.
# Mirrors the reference train.sh surface.

# bash scripts/mm_cls/train_ovmr.sh imagenet_21k_P 1 2 0

for DATASET in imagenet caltech101 oxford_pets stanford_cars oxford_flowers food101 fgvc_aircraft sun397 dtd eurosat ucf101
do
  for SEED in 1 2 3
  do
    for MODE in fusion multimodal vision text
    do
      bash scripts/mm_cls/eval_ovmr.sh ${DATASET} ${SEED} base 2 ${MODE} 10 0
      bash scripts/mm_cls/eval_ovmr.sh ${DATASET} ${SEED} new 2 ${MODE} 10 0
    done
  done
done
