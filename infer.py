"""Classify images with exported OVMR classifiers (plug-and-play consumer).

The counterpart of the reference's downstream usage of
``mm_classifiers.pt`` (README.md:126-129): load the artifact, encode a
directory of images (or an explicit list) with the frozen CLIP tower and
print per-image top-k predictions.

Usage:
  python infer.py --classifiers output/mm_classifiers.pt \
      --clip ~/.cache/clip/ViT-B-16.pt --mode fusion \
      --classnames classnames.txt path/to/images/
"""

import argparse
import os as _os
_p = _os.environ.get("JAX_PLATFORMS")
if _p:
    import jax as _jax
    try:
        _jax.config.update("jax_platforms", _p)
    except Exception:
        pass
import json
import os.path as osp

import numpy as np


def main(args):
    from ovmr_tpu.api import OVMRGenerator, load_exported_classifiers
    from ovmr_tpu.data.transforms import (
        CLIP_MEAN, CLIP_STD, center_crop, normalize, resize_smaller_edge,
        to_chw_float,
    )
    from ovmr_tpu.models.ovmr import eval_logits_np
    from ovmr_tpu.utils.tools import listdir_nohidden, read_image

    classifiers = load_exported_classifiers(args.classifiers)
    n_classes = classifiers["mm_classifier"].shape[0]

    classnames = None
    if args.classnames and osp.exists(args.classnames):
        with open(args.classnames) as f:
            classnames = [line.strip() for line in f if line.strip()]

    gen = OVMRGenerator.from_checkpoints(args.clip)

    paths = []
    for target in args.inputs:
        if osp.isdir(target):
            paths.extend(
                osp.join(target, f)
                for f in listdir_nohidden(target, sort=True)
                if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp", ".webp"))
            )
        else:
            paths.append(target)
    if not paths:
        raise SystemExit("no images found")

    size = args.size
    batch = []
    for p in paths:
        img = read_image(p)
        img = center_crop(resize_smaller_edge(img, size), (size, size))
        batch.append(normalize(to_chw_float(img), CLIP_MEAN, CLIP_STD))
    feats = gen.encode_images(np.stack(batch))

    scale = float(np.exp(np.asarray(gen.clip_params["logit_scale"])))
    probs = eval_logits_np(feats, classifiers, scale, args.mode)
    topk = np.argsort(-probs, axis=1)[:, : args.topk]
    for path, idxs, row in zip(paths, topk, probs):
        preds = [
            {
                "label": int(i),
                "classname": classnames[i] if classnames else str(int(i)),
                "score": float(row[i]),
            }
            for i in idxs
        ]
        print(json.dumps({"image": path, "predictions": preds}))


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("inputs", nargs="+", help="image files or directories")
    parser.add_argument("--classifiers", required=True, help="mm_classifiers.pt path")
    parser.add_argument("--clip", default="~/.cache/clip/ViT-B-16.pt")
    parser.add_argument("--classnames", default="", help="optional classnames txt")
    parser.add_argument("--mode", default="fusion",
                        choices=["text", "vision", "multimodal", "fusion"])
    parser.add_argument("--size", type=int, default=224)
    parser.add_argument("--topk", type=int, default=5)
    main(parser.parse_args())
