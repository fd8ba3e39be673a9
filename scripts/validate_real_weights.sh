#!/bin/bash
# One-command accuracy validation against the paper numbers, runnable the
# moment real weights exist (this build environment has zero egress, so the
# suite is gated on the assets):
#
#   1. OpenAI CLIP ViT-B/16  ->  ~/.cache/clip/ViT-B-16.pt
#      (or point $OVMR_CLIP_CKPT at it)
#   2. OVMR generator        ->  $MODEL_DIR/prompt_learner/model.pth.tar-30
#      (HF download per the reference README; defaults to ./checkpoints)
#   3. The 11 CoOp-suite datasets under ./data (reference DATASETS.md layout)
#
# Usage: bash scripts/validate_real_weights.sh [model_dir] [tau]
#
# Expected numbers (BASELINE.md Table 1, OVMR row, 16-shot fusion; compare
# the per-dataset `* accuracy:` values parse_test_res.py prints):
#   imagenet 76.77  caltech101 98.00  oxford_pets 94.97  stanford_cars 73.93
#   oxford_flowers 97.83  food101 89.93  fgvc_aircraft 40.37  sun397 81.83
#   dtd 77.10  eurosat 90.00  ucf101 85.03   => average 82.34
set -e

MODEL_DIR=${1:-./checkpoints}
TAU=${2:-10}

CKPT=${OVMR_CLIP_CKPT:-$HOME/.cache/clip/ViT-B-16.pt}
if [ ! -f "$CKPT" ]; then
    echo "MISSING ASSET: no CLIP checkpoint at $CKPT"
    echo "Download ViT-B-16.pt (sha256-verified by ovmr_tpu.models.zoo when"
    echo "network egress exists) and re-run."
    exit 1
fi
if [ ! -f "$MODEL_DIR/prompt_learner/model.pth.tar-30" ] && \
   [ ! -f "$MODEL_DIR/prompt_learner/checkpoint" ]; then
    echo "MISSING ASSET: no generator checkpoint under $MODEL_DIR/prompt_learner"
    echo "(expected model.pth.tar-30 from the reference HF release)"
    exit 1
fi

DATASETS="imagenet caltech101 oxford_pets stanford_cars oxford_flowers \
food101 fgvc_aircraft sun397 dtd eurosat ucf101"

for DATASET in $DATASETS; do
    for SEED in 1 2 3; do
        DIR=output_ovmr/base2new/test_base_fusion_tau${TAU}/${DATASET}/shots_16/MM_CLS_OP/vit_b16_c4_ep50_imagenet21k_pretrain/seed${SEED}
        if [ -d "$DIR" ]; then
            echo "skip ${DIR} (exists)"
            continue
        fi
        python train.py \
            --root ./data \
            --seed ${SEED} \
            --trainer MM_CLS_OP \
            --dataset-config-file configs/datasets/${DATASET}.yaml \
            --config-file configs/trainers/MM_CLS_OP/vit_b16_c4_ep50_imagenet21k_pretrain.yaml \
            --output-dir ${DIR} \
            --model-dir ${MODEL_DIR} \
            --load-epoch 30 \
            --eval-only \
            --n_ctx 2 \
            --eval_mode fusion \
            --eval_tau ${TAU} \
            DATASET.NUM_SHOTS 16 \
            DATASET.SUBSAMPLE_CLASSES base
    done
    python parse_test_res.py \
        output_ovmr/base2new/test_base_fusion_tau${TAU}/${DATASET}/shots_16/MM_CLS_OP/vit_b16_c4_ep50_imagenet21k_pretrain \
        --test-log
done

echo ""
echo "Compare the means above against BASELINE.md Table 1 (OVMR row):"
echo "  imagenet 76.77 | caltech101 98.00 | oxford_pets 94.97 | cars 73.93"
echo "  flowers 97.83 | food101 89.93 | aircraft 40.37 | sun397 81.83"
echo "  dtd 77.10 | eurosat 90.00 | ucf101 85.03 | AVG 82.34"
