# sh linear_probe.sh — few-shot linear probe over dumped CLIP features
# (same driver contract as the reference lpclip/linear_probe.sh)
feature_dir=${feature_dir:-clip_feat}

for DATASET in OxfordPets
do
    python linear_probe.py \
    --dataset ${DATASET} \
    --feature_dir ${feature_dir} \
    --num_step 8 \
    --num_run 3
done
