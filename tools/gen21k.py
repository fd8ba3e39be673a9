"""ImageNet-21k-scale classifier generation + preference fusion, end to end.

The flagship scale capability (reference `scripts/mm_cls/train_ovmr.sh`
pretrains on 21,843-class x 64-shot ImageNet21k-OVR): generate mm/v/t
classifier heads in reused compiled chunks AND the preference-fusion
cross-validation (`mm_…:261-274`) over all 1,398,952 exemplar rows via the
streaming scan (ops/fusion.py) — the piece that round 2 could not run
(unchunked it needs a ~122 GB logits matrix per classifier).

Random towers (no weights on disk in this environment); the shapes, chunk
schedule, dispatch count and memory behavior are the real thing. Run from
the repo root:

    python tools/gen21k.py                  # TPU, ViT-B/16, 21843x64
    python tools/gen21k.py --cpu --classes 1000 --shots 8   # smoke

Prints one stage-timing line per phase plus a final JSON summary; exports
the torch artifact and verifies its row count.
"""

import argparse
import json
import os
import os.path as osp
import sys
import tempfile
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--classes", type=int, default=21843)
    ap.add_argument("--shots", type=int, default=64)
    ap.add_argument("--backbone", default="ViT-B/16")
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--tau", type=float, default=10.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="")
    ap.add_argument(
        "--repeat", type=int, default=1,
        help="run generation N times; the first is cold (compiles), "
        "later ones give the steady-state number",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    import jax.numpy as jnp
    import numpy as np

    from ovmr_tpu.api import OVMRGenerator

    print(f"backend: {jax.default_backend()}  devices: {jax.device_count()}")

    t0 = time.time()
    gen = OVMRGenerator.from_checkpoints(args.backbone)
    dim = gen.clip_cfg.embed_dim
    print(f"[{time.time() - t0:7.2f}s] towers ready ({args.backbone}, D={dim})")

    n, k = args.classes, args.shots
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(n, k, dim)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    names = [f"entity {i:05d}" for i in range(n)]
    t1 = time.time()
    print(f"[{t1 - t0:7.2f}s] {n}x{k} exemplar features synthesized")

    gen_times = []
    for rep in range(max(1, args.repeat)):
        t_rep = time.time()
        out = gen.generate_from_features(
            names,
            feats,
            eval_tau=args.tau,
            chunk_size=args.chunk,
            max_text_classes=10**9,  # force the full artifact at 21k scale
        )
        gen_times.append(time.time() - t_rep)
        print(
            f"[{time.time() - t0:7.2f}s] mm/v/t heads + STREAMING FUSION "
            f"for {n} classes x {k} shots (run {rep + 1}): "
            f"{gen_times[-1]:.2f}s"
        )
    t2 = time.time()
    gen_s = gen_times[-1]

    for key, want in (
        ("mm_classifier", (n, dim)),
        ("vision_classifier", (n, dim)),
        ("text_classifier", (n, dim)),
        ("fusion_weight", (n, 3)),
    ):
        got = out[key].shape
        assert got == want, f"{key}: {got} != {want}"
        assert np.isfinite(out[key]).all(), f"{key} has non-finite entries"
    assert np.allclose(out["fusion_weight"].sum(-1), 1.0, atol=1e-5)

    outdir = args.out or tempfile.mkdtemp(prefix="gen21k_")
    gen.export(out, outdir)
    t3 = time.time()
    import torch

    arte = torch.load(
        osp.join(outdir, "mm_classifiers.pt"),
        map_location="cpu",
        weights_only=False,
    )
    assert set(arte.keys()) == {
        "text_classifier", "vision_classifier", "mm_classifier",
        "fusion_weight",
    }
    assert arte["mm_classifier"].shape[0] == n
    print(f"[{t3 - t0:7.2f}s] torch export verified ({outdir})")

    print(
        json.dumps(
            {
                "classes": n,
                "shots": k,
                "backbone": args.backbone,
                "generation_s": round(gen_s, 2),
                "generation_s_all_runs": [round(t, 2) for t in gen_times],
                "total_s": round(t3 - t0, 2),
                "fusion_weight_rows": int(out["fusion_weight"].shape[0]),
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
