"""CLIP feature extractor for the linear-probe baseline.

Port of the reference ``lpclip/feat_extractor.py:105-167``: dump L2-raw CLIP
image features of a dataset split to ``{OUTPUT_DIR}/{DATASET}/{split}.npz``
with keys ``feature_list`` / ``label_list``. Encoding runs jitted on TPU.

Usage:
  python lpclip/feat_extractor.py --root ./data --dataset-config-file \
      configs/datasets/eurosat.yaml --split train --output-dir ./lpclip_feats
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor JAX_PLATFORMS explicitly (some environments select the accelerator
# platform programmatically, which silently overrides the env var)
_platforms = os.environ.get("JAX_PLATFORMS")
if _platforms:
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _platforms)
    except Exception:
        pass

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp

    from ovmr_tpu.data import DataManager
    from ovmr_tpu.engine.trainer import _dtype_from_cfg, load_or_init_clip
    from ovmr_tpu.models import clip as jclip
    from ovmr_tpu.ops.attention import make_attn_fn
    from ovmr_tpu.utils import get_cfg_default, set_random_seed

    cfg = get_cfg_default()
    if args.config_file:
        # trainer yaml (the reference driver passes e.g.
        # configs/trainers/CoOp/rn50_val.yaml to pick the backbone)
        cfg.merge_from_file(args.config_file)
        args.backbone = cfg.MODEL.BACKBONE.NAME or args.backbone
    if args.dataset_config_file:
        cfg.merge_from_file(args.dataset_config_file)
    cfg.DATASET.ROOT = args.root
    cfg.OUTPUT_DIR = args.output_dir
    cfg.SEED = args.seed
    cfg.DATASET.NUM_SHOTS = -1
    cfg.INPUT.SIZE = (224, 224)
    cfg.INPUT.INTERPOLATION = "bicubic"
    cfg.INPUT.PIXEL_MEAN = [0.48145466, 0.4578275, 0.40821073]
    cfg.INPUT.PIXEL_STD = [0.26862954, 0.26130258, 0.27577711]
    cfg.INPUT.TRANSFORMS = ["normalize"]
    cfg.MODEL.BACKBONE.NAME = args.backbone
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    set_random_seed(max(cfg.SEED, 0))

    dm = DataManager(cfg)
    loader = {
        "train": dm.train_loader_x,
        "val": dm.val_loader,
        "test": dm.test_loader,
    }[args.split]
    # sequential order for feature dumps
    if args.split == "train":
        from ovmr_tpu.data.manager import HostDataLoader
        from ovmr_tpu.data.samplers import build_sampler

        loader = HostDataLoader(
            dm.dataset.train_x,
            build_sampler("SequentialSampler", dm.dataset.train_x, 0),
            dm.tfm_test,
            cfg.DATALOADER.TRAIN_X.BATCH_SIZE,
            num_workers=cfg.DATALOADER.NUM_WORKERS,
        )

    clip_params, clip_cfg = load_or_init_clip(cfg)
    dtype = _dtype_from_cfg(cfg)
    clip_params = jclip.cast_params(
        jax.tree_util.tree_map(jnp.asarray, clip_params), dtype
    )
    attn_fn = make_attn_fn(
        cfg.TPU.USE_PALLAS_ATTENTION if jax.default_backend() == "tpu" else False
    )
    block_fn = None
    if cfg.TPU.USE_FUSED_BLOCK and jax.default_backend() == "tpu":
        from ovmr_tpu.ops.block_fused import fused_residual_block

        block_fn = fused_residual_block
    # handles both float-CHW and uint8-HWC batches (the default eval path
    # ships uint8 and normalizes on device)
    from ovmr_tpu.engine.trainer import (
        make_feature_extractor,
        setup_trainer_mesh,
        tp_seam_tools,
    )

    # shared mesh/TP policy (same as the trainers): multi-device runs
    # shard batches over 'data' (shard_map keeps the fused kernels
    # per-chip); MODEL>1 takes the TP-pallas/gspmd routes. Single device
    # (the reference's regime) is byte-identical to the unsharded path.
    mesh, tp, clip_params, block_fn, attn_fn = setup_trainer_mesh(
        cfg, clip_params, block_fn, attn_fn, label="lpclip",
        clip_cfg=clip_cfg,
    )
    tp_block_fn, clip_specs = tp_seam_tools(mesh, tp, clip_params)
    encode = make_feature_extractor(
        clip_cfg, attn_fn, dtype, cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD,
        loader.batch_size,
        mesh=mesh,
        unit_norm=False,  # the reference dumps raw visual features
        block_fn=block_fn,
        u8_normalize=("normalize" in cfg.INPUT.TRANSFORMS),
        tp_block_fn=tp_block_fn,
        clip_specs=clip_specs,
    )

    from ovmr_tpu.data.prefetch import prefetch_batches

    feats, labels = [], []
    for batch in prefetch_batches(loader):
        feats.append(encode(clip_params, batch["img"]))
        labels.extend(batch["label"].tolist())

    save_dir = os.path.join(cfg.OUTPUT_DIR, cfg.DATASET.NAME)
    os.makedirs(save_dir, exist_ok=True)
    np.savez(
        os.path.join(save_dir, args.split),
        feature_list=np.concatenate(feats, 0),
        label_list=np.asarray(labels),
    )
    print(f"saved {sum(f.shape[0] for f in feats)} features to {save_dir}/{args.split}.npz")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="./data")
    parser.add_argument("--dataset-config-file", default="")
    parser.add_argument("--split", choices=["train", "val", "test"], default="train")
    parser.add_argument("--output-dir", default="./lpclip_feats")
    parser.add_argument("--backbone", default="ViT-B/16")
    parser.add_argument("--seed", type=int, default=1)
    # reference-driver compatibility (lpclip/feat_extractor.sh)
    parser.add_argument("--config-file", default="")
    parser.add_argument("--eval-only", action="store_true")  # accepted, implied
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    main(parser.parse_args())
