# sh feat_extractor.sh — dump CLIP features for the linear-probe baseline
# (same driver contract as the reference lpclip/feat_extractor.sh; our
# feat_extractor.py takes --split/--root/--seed/--dataset-config-file)
DATA=${DATA:-/path/to/datasets}
OUTPUT=${OUTPUT:-./clip_feat/}
SEED=${SEED:-1}

# oxford_pets oxford_flowers fgvc_aircraft dtd eurosat stanford_cars food101 sun397 caltech101 ucf101 imagenet
for DATASET in oxford_pets
do
    for SPLIT in train val test
    do
        python feat_extractor.py \
        --split ${SPLIT} \
        --root ${DATA} \
        --seed ${SEED} \
        --dataset-config-file ../configs/datasets/${DATASET}.yaml \
        --output-dir ${OUTPUT}
    done
done
