"""Sustained full-scale training soak on chip (VERDICT r4 item 2).

Runs N consecutive batch-1536 MM_CLS_OP train steps (192 classes x 8
instances, ViT-B/16 bf16 — the shipped pretrain config,
``configs/trainers/MM_CLS_OP/vit_b16_c4_ep50_imagenet21k_pretrain.yaml``)
and records the telemetry the 15-step bench sample can't:

- per-step wall time series (sync via scalar loss fetch — the relay's
  ``block_until_ready`` is a no-op), split into compile-visits and steady
  state; steady-state band = p10/p50/p90/p99;
- ``device.memory_stats()`` peaks sampled every ``--mem-every`` steps, so
  HBM growth/fragmentation over the run is visible;
- split_point rotation over the real U[2,6) support (every compiled
  variant participates, like a real epoch), image-buffer rotation so the
  relay isn't serving one cached operand;
- ``--augment`` runs the DEVICE_AUGS path (uint8 in, augment+normalize
  fused into the step); ``--host-feed`` re-ships a fresh host batch every
  step (transfer-inclusive rate — pathological through this relay, the
  realistic bound on a direct-attached host).

Writes one JSON blob to --out (default docs/soak_r05.json) and prints a
summary. Run from repo root on the TPU:
    python tools/soak.py --steps 200
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def mem_snapshot():
    try:
        stats = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return {
        k: int(stats[k])
        for k in ("bytes_in_use", "peak_bytes_in_use", "largest_alloc_size")
        if k in stats
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--augment", action="store_true")
    ap.add_argument("--host-feed", action="store_true")
    ap.add_argument("--buffers", type=int, default=3)
    ap.add_argument("--mem-every", type=int, default=20)
    ap.add_argument("--out", default="docs/soak_r05.json")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

    from ovmr_tpu.engine.optimizers import build_optimizer
    from ovmr_tpu.engine.train_step import make_train_step
    from ovmr_tpu.models import clip as jclip
    from ovmr_tpu.models import ovmr
    from ovmr_tpu.models.aggregator import init_aggregator
    from ovmr_tpu.ops.block_fused import fused_residual_block
    from ovmr_tpu.ops.layers import attention_xla
    from ovmr_tpu.utils.defaults import get_cfg_default

    on_tpu = jax.default_backend() == "tpu"
    block_fn = fused_residual_block if on_tpu else None
    cfg = jclip.VIT_B16
    key = jax.random.PRNGKey(0)
    num_cls, n_ins = 192, 8

    augment = None
    if args.augment:
        augment = dict(
            out_size=224,
            scale=(0.25, 1.0),
            jitter=(0.4, 0.4, 0.4, 0.1),
            gn_std=0.15,
            out_dtype=jnp.bfloat16,
        )

    params = jclip.init_params(key, cfg, dtype=jnp.bfloat16)
    agg = init_aggregator(key, width=cfg.embed_dim, layers=4, n_ctx=2)
    optimizer = build_optimizer(get_cfg_default().OPTIM)
    opt_state = optimizer.init(agg)
    step = make_train_step(
        cfg, optimizer, dropout=0.1, attn_fn=attention_xla,
        block_fn=block_fn, augment=augment,
    )

    ptok, eot, vtok = ovmr.build_prompt_tokens(
        [f"object {i:03d}" for i in range(num_cls)]
    )
    ptok_d, eot_d, vtok_d = (
        jnp.asarray(ptok), jnp.asarray(eot), jnp.asarray(vtok)
    )

    # buffers are generated ON DEVICE: shipping 3 x 433 MB through this
    # relay takes longer than the soak itself (and is not what a
    # direct-attached production host pays). --host-feed keeps host
    # buffers to measure the transfer-inclusive rate explicitly.
    host_bufs = None
    if args.host_feed:
        rng_np = np.random.default_rng(0)
        if args.augment:
            host_bufs = [
                rng_np.integers(0, 256, (num_cls, n_ins, 256, 256, 3), np.uint8)
                for _ in range(args.buffers)
            ]
        else:
            host_bufs = [
                rng_np.standard_normal((num_cls, n_ins, 3, 224, 224))
                .astype(np.float32).astype(jnp.bfloat16)
                for _ in range(args.buffers)
            ]
    dev_bufs = None
    if not args.host_feed:
        if args.augment:
            gen = jax.jit(
                lambda k: jax.random.randint(
                    k, (num_cls, n_ins, 256, 256, 3), 0, 256, jnp.int32
                ).astype(jnp.uint8)
            )
        else:
            gen = jax.jit(
                lambda k: jax.random.normal(
                    k, (num_cls, n_ins, 3, 224, 224), jnp.bfloat16
                )
            )
        dev_bufs = [gen(jax.random.PRNGKey(100 + i)) for i in range(args.buffers)]
        jax.block_until_ready(dev_bufs)

    splits = [2, 3, 4, 5]  # the U[2,6) support at n_ins=8
    rng = jax.random.PRNGKey(1)

    times, mem_series = [], []
    mem0 = mem_snapshot()
    t_run0 = time.perf_counter()
    for i in range(args.steps):
        sp = splits[i % len(splits)]
        images = (
            jax.device_put(host_bufs[i % args.buffers])
            if args.host_feed
            else dev_bufs[i % args.buffers]
        )
        rng, sub = jax.random.split(rng)
        t0 = time.perf_counter()
        agg, opt_state, loss = step(
            agg, opt_state, params, images, ptok_d, eot_d, vtok_d, sub, sp
        )
        loss_val = float(loss)  # sync
        times.append(time.perf_counter() - t0)
        if (i + 1) % args.mem_every == 0 or i == 0:
            snap = mem_snapshot()
            mem_series.append({"step": i + 1, "mem": snap})
            print(
                f"step {i+1:4d}  {times[-1]*1e3:8.1f} ms  loss {loss_val:.4f}"
                + (
                    f"  in_use {snap['bytes_in_use']/2**30:.2f} GiB"
                    f"  peak {snap['peak_bytes_in_use']/2**30:.2f} GiB"
                    if snap
                    else ""
                ),
                flush=True,
            )
    wall = time.perf_counter() - t_run0

    ms = np.asarray(times) * 1e3
    # compile visits: the first visit of each split_point (and augment rng
    # shape) dominates; steady state = after every variant has been seen
    warm = ms[2 * len(splits):] if len(ms) > 2 * len(splits) + 4 else ms
    summary = {
        "steps": args.steps,
        "augment": bool(args.augment),
        "host_feed": bool(args.host_feed),
        "batch": num_cls * n_ins,
        "wall_s": round(wall, 1),
        # disjoint head/tail windows (at most half the warm series each) so
        # the drift comparison is never self-referential on short runs
        "steady_ms": {
            "p10": round(float(np.percentile(warm, 10)), 1),
            "p50": round(float(np.percentile(warm, 50)), 1),
            "p90": round(float(np.percentile(warm, 90)), 1),
            "p99": round(float(np.percentile(warm, 99)), 1),
            "window": (w := min(50, len(warm) // 2)),
            "mean_first_window": round(float(warm[:w].mean()), 1),
            "mean_last_window": round(float(warm[-w:].mean()), 1),
        },
        "img_s_p50": round(
            num_cls * n_ins / (float(np.percentile(warm, 50)) / 1e3), 1
        ),
        "mem_first": mem_series[0]["mem"] if mem_series else None,
        "mem_last": mem_series[-1]["mem"] if mem_series else None,
        "mem_series": mem_series,
        "mem_before_run": mem0,
        "ms_series": [round(float(x), 1) for x in ms],
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "ms_series" and k != "mem_series"}))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
