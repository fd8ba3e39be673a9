#!/bin/bash
# TPU-native training variant: decode-once uint8 cache + on-device
# augmentations fused into the train step (TPU.DEVICE_AUGS).
# Usage: bash scripts/mm_cls/train_ovmr_tpu.sh <dataset> <seed> <n_ctx>
DATASET=$1
SEED=$2
N_CTX=$3

DATA=./data
TRAINER=MM_CLS_OP
CFG=vit_b16_c4_ep50_imagenet21k_pretrain
SHOTS=64

DIR=output_ovmr/base2new/train_base/${DATASET}/shots_${SHOTS}/${TRAINER}/${CFG}_tpu/seed${SEED}
if [ -d "$DIR" ]; then
    echo "Oops! The results exist at ${DIR} (so skip this job)"
else
    python train.py \
    --root ${DATA} \
    --seed ${SEED} \
    --trainer ${TRAINER} \
    --dataset-config-file configs/datasets/${DATASET}.yaml \
    --config-file configs/trainers/${TRAINER}/${CFG}.yaml \
    --output-dir ${DIR} \
    --n_ctx ${N_CTX} \
    DATASET.NUM_SHOTS ${SHOTS} \
    DATASET.SUBSAMPLE_CLASSES all \
    TPU.DEVICE_AUGS True
fi
