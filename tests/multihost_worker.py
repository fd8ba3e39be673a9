"""Worker process for tests/test_multihost.py (NOT a pytest module).

Each of the N processes (OVMR_NUM_PROCESSES; 2 or 4 in the tests) owns
8 // N virtual CPU devices; after
``maybe_initialize_distributed()`` the jax program is GLOBAL over all 8.
Runs the real multi-chip paths with host-identical inputs:

1. the OVMR shard_map train step (`make_sharded_train_step`) on the
   global ('data', 'model') mesh — batch assembled cross-process by
   `shard_batch` (make_array_from_callback);
2. the Dassl Vanilla trainer via `build_trainer` (GSPMD supervised step,
   `setup_dassl_mesh` forming the global mesh) + a `model_inference`
   fetch through `to_host` (process_allgather);
3. MM_CLS_OP class-grouped sliced exemplar loading (sliced == full);
4. structure-sensitive sliced decode: SE (K-transform pairs), FixMatch
   (strong/weak views), DAELDG (domain-grouped sampling) — sliced ==
   full-decode losses;
5. tensor parallelism UNDER multi-host — the pod layout (TP over the
   in-host interconnect, DP across hosts): MM_CLS_OP on a global
   data=4 x model=2 mesh takes the TP-pallas route (split-QKV towers,
   TINY's 1-head vision tower head-padded, cross-process TP placement)
   with the sliced loader; sliced == full-decode losses.

``OVMR_MH_STAGES`` (default "1,2,3,4,5") selects a stage subset — the
dryrun's 4-process group runs the block-arithmetic-critical subset to
bound wall time; the pytest variants run everything.

Prints one ``MHOK <losses...>`` line for the parent to compare across
processes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_N_PROC = int(os.environ.get("OVMR_NUM_PROCESSES", "2"))
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={8 // _N_PROC}"
)

import jax

jax.config.update("jax_platforms", "cpu")

from ovmr_tpu.parallel import maybe_initialize_distributed

assert maybe_initialize_distributed(), "OVMR_COORDINATOR env missing"

import jax.numpy as jnp
import numpy as np


def main():
    n_proc = jax.process_count()
    assert n_proc == _N_PROC, (n_proc, _N_PROC)
    assert jax.device_count() == 8, jax.device_count()
    stages = {
        int(s)
        for s in os.environ.get("OVMR_MH_STAGES", "1,2,3,4,5").split(",")
    }
    vals = []  # MHOK payload, in stage order

    from ovmr_tpu.engine.optimizers import build_optimizer
    from ovmr_tpu.engine.train_step import make_sharded_train_step
    from ovmr_tpu.models import clip as jclip
    from ovmr_tpu.models.aggregator import init_aggregator
    from ovmr_tpu.parallel import build_mesh, replicate, shard_batch, to_host
    from ovmr_tpu.utils.defaults import get_cfg_default

    # ---- 1. OVMR shard_map train step over the global mesh -------------
    mesh = build_mesh(data=8, model=1)
    clip_cfg = jclip.TINY
    key = jax.random.PRNGKey(0)
    clip_params = jclip.init_params(key, clip_cfg)
    agg_params = init_aggregator(
        key, width=clip_cfg.embed_dim, layers=2, n_ctx=2
    )
    cfg = get_cfg_default()
    optimizer = build_optimizer(cfg.OPTIM)
    opt_state = optimizer.init(agg_params)
    step = make_sharded_train_step(clip_cfg, optimizer, mesh, dropout=0.1)

    num_cls, n_ins = 16, 4
    host_rng = np.random.default_rng(0)  # identical on both processes
    images = host_rng.normal(size=(num_cls, n_ins, 3, 32, 32)).astype(
        np.float32
    )
    ptok = host_rng.integers(1, 400, size=(num_cls, 77)).astype(np.int32)
    ptok[:, 0] = 49406
    ptok[:, 6] = 49407
    eot = np.full((num_cls,), 6, np.int32)
    vtok = np.zeros((77,), np.int32)
    vtok[[0, 1, 2, 3]] = [49406, 320, 269, 49407]

    if 1 in stages:
        new_params, _, loss = step(
            replicate(mesh, agg_params),
            replicate(mesh, opt_state),
            replicate(mesh, clip_params),
            shard_batch(mesh, images),
            shard_batch(mesh, ptok),
            shard_batch(mesh, eot),
            jnp.asarray(vtok),
            jax.random.PRNGKey(1),
            2,
        )
        jax.block_until_ready(new_params)
        loss1 = float(loss)
        assert np.isfinite(loss1)
        vals.append(loss1)

    # stages 2-5 all build trainers (mm_cfg/dassl_cfg use tempfile and
    # build_trainer), so the shared imports live OUTSIDE the stage gates
    import tempfile

    from ovmr_tpu.engine import register_all_trainers
    from ovmr_tpu.engine.trainer import build_trainer

    register_all_trainers()

    # ---- 2. Dassl Vanilla trainer end-to-end on the global mesh --------
    if 2 in stages:
        cfg2 = get_cfg_default()
        cfg2.TRAINER.NAME = "Vanilla"
        cfg2.DATASET.NAME = "SyntheticDA"
        cfg2.DATASET.ROOT = os.environ["OVMR_MH_DATA"]
        cfg2.OUTPUT_DIR = tempfile.mkdtemp(prefix="ovmr_mh_out_")
        cfg2.SEED = 1
        cfg2.INPUT.SIZE = (32, 32)
        cfg2.MODEL.BACKBONE.NAME = "cnn_digitsdg"
        cfg2.MODEL.BACKBONE.PRETRAINED = False
        cfg2.DATALOADER.TRAIN_X.BATCH_SIZE = 16
        cfg2.DATALOADER.TEST.BATCH_SIZE = 8
        cfg2.DATALOADER.NUM_WORKERS = 0
        cfg2.OPTIM.MAX_EPOCH = 1
        cfg2.TPU.MESH.DATA = 8
        cfg2.freeze()
        trainer = build_trainer(cfg2)
        assert trainer.mesh is not None
        # sliced loader (default): THIS process decodes only its 1/n_proc
        # block of the global batch; shard_batch_local re-assembles
        batch = next(iter(trainer.dm.train_loader_x))
        assert batch["_local"], "expected the per-host sliced loader"
        assert batch["img"].shape[0] == 16 // n_proc, batch["img"].shape
        metrics = trainer.forward_backward(batch)
        loss2 = metrics["loss"]
        assert np.isfinite(loss2)

        test_batch = next(iter(trainer.dm.test_loader))
        logits = trainer.model_inference(test_batch)  # to_host gather
        checksum = float(np.abs(logits).sum())

        # full-decode contract (opt-out): every process decodes the whole
        # global batch — must produce the IDENTICAL step (same seed, same
        # global batch, same initial params)
        cfg3 = cfg2.clone()
        cfg3.defrost()
        cfg3.OUTPUT_DIR = tempfile.mkdtemp(prefix="ovmr_mh_out3_")
        cfg3.TPU.MULTIHOST_SLICED_LOADER = False
        cfg3.freeze()
        trainer3 = build_trainer(cfg3)
        batch3 = next(iter(trainer3.dm.train_loader_x))
        assert not batch3.get("_local") and batch3["img"].shape[0] == 16
        loss3 = trainer3.forward_backward(batch3)["loss"]
        assert abs(loss2 - loss3) < 1e-6, (loss2, loss3)
        vals.extend([loss2, loss3, checksum])

    # ---- 3. MM_CLS_OP (flagship) sliced exemplar loading ---------------
    # class-grouped batches: 8 classes x 4 instances over data=8; each
    # process decodes 8 // n_proc classes; the shard_map step sees the
    # same global program as a full decode
    os.environ["OVMR_SYNTHETIC"] = "8,12,32"

    def mm_cfg(sliced, model=1):
        c = get_cfg_default()
        c.TRAINER.NAME = "MM_CLS_OP"
        c.DATASET.NAME = "Synthetic"
        c.DATASET.NUM_SHOTS = 4
        c.DATASET.ROOT = os.environ["OVMR_MH_DATA"] + "_mm"
        c.OUTPUT_DIR = tempfile.mkdtemp(prefix="ovmr_mh_mm_")
        c.SEED = 1
        c.INPUT.SIZE = (32, 32)
        c.INPUT.TRANSFORMS = ("normalize",)
        c.DATALOADER.TRAIN_X.SAMPLER = "RandomClassSampler"
        c.DATALOADER.TRAIN_X.BATCH_SIZE = 32
        c.DATALOADER.TRAIN_X.N_INS = 4
        c.DATALOADER.TEST.BATCH_SIZE = 16
        c.DATALOADER.NUM_WORKERS = 0
        c.MODEL.BACKBONE.NAME = "TINY"
        c.OPTIM.MAX_EPOCH = 1
        c.TRAINER.COCOOP.N_CTX = 2
        c.TPU.DTYPE = "float32"
        c.TPU.MULTIHOST_SLICED_LOADER = sliced
        if model > 1:
            c.TPU.MESH.DATA = 8 // model
            c.TPU.MESH.MODEL = model
        c.freeze()
        return c

    if 3 in stages:
        tr_s = build_trainer(mm_cfg(True))
        b_s = next(iter(tr_s.train_loader))
        assert b_s["_local"], "expected sliced exemplar batch"
        # (8 // n_proc) local classes x 4 instances
        assert b_s["img"].shape[0] == 32 // n_proc, b_s["img"].shape
        loss_mm_s = tr_s.forward_backward(b_s)["loss"]

        tr_f = build_trainer(mm_cfg(False))
        b_f = next(iter(tr_f.train_loader))
        assert not b_f.get("_local") and b_f["img"].shape[0] == 32
        loss_mm_f = tr_f.forward_backward(b_f)["loss"]
        assert abs(loss_mm_s - loss_mm_f) < 1e-5, (loss_mm_s, loss_mm_f)
        vals.append(loss_mm_s)

    # ---- 4. structure-sensitive trainers: sliced == full decode --------
    # K-transform pairs (SE), FixMatch-style strong/weak views, and
    # domain-grouped sampling (DAELDG) all slice per host now: the loader
    # slices ITEM indices before the K expansion, every augment stream is
    # keyed on global positions, and the domain-group reshape moved
    # in-step onto the re-assembled global array. Only DomainMix (host-
    # side global mix) still decodes globally.
    if 4 in stages:
        os.environ["OVMR_SYNTHETIC"] = "4,8,32"

        def dassl_cfg(trainer, dataset, sliced, tag, **overrides):
            c = get_cfg_default()
            c.TRAINER.NAME = trainer
            c.DATASET.NAME = dataset
            c.DATASET.ROOT = os.environ["OVMR_MH_DATA"] + "_ds"
            c.OUTPUT_DIR = tempfile.mkdtemp(prefix=f"ovmr_mh_{tag}_")
            c.SEED = 1
            c.INPUT.SIZE = (32, 32)
            c.MODEL.BACKBONE.NAME = "cnn_digitsdg"
            c.MODEL.BACKBONE.PRETRAINED = False
            c.DATALOADER.TRAIN_X.BATCH_SIZE = 8
            c.DATALOADER.TRAIN_U.BATCH_SIZE = 8
            c.DATALOADER.TEST.BATCH_SIZE = 8
            c.DATALOADER.NUM_WORKERS = 0
            c.OPTIM.MAX_EPOCH = 1
            c.TPU.MESH.DATA = 8
            c.TPU.MULTIHOST_SLICED_LOADER = sliced
            for key, value in overrides.items():
                node = c
                parts = key.split(".")
                for p in parts[:-1]:
                    node = node[p]
                node[parts[-1]] = value
            c.freeze()
            return c

        def step_xu(cfg, expect_local):
            tr = build_trainer(cfg)
            # epoch-loop state normally set by run_epoch (SE's rampup and the
            # FixMatch schedules read it); one direct step at position 0
            tr.epoch, tr.batch_idx, tr.num_batches = 0, 0, 1
            bx = next(iter(tr.dm.train_loader_x))
            assert bool(bx.get("_local")) == expect_local, (
                cfg.TRAINER.NAME, bx.get("_local"), expect_local
            )
            # dispatch on the trainer FAMILY, not on loader_u presence: DG
            # trainers (TrainerX) never consume train_u even when the dataset
            # carries one (and DAELDG's u-sampler config would be invalid)
            if hasattr(tr, "forward_backward_xu"):
                bu = next(iter(tr.dm.train_loader_u))
                return tr.forward_backward_xu(bx, bu)["loss"]
            return tr.forward_backward(bx)["loss"]

        struct_losses = []
        cases = [
            ("SE", "SyntheticDA", {"DATALOADER.K_TRANSFORMS": 2}),
            ("FixMatch", "SyntheticSSL",
             {"TRAINER.FIXMATCH.STRONG_TRANSFORMS": ("random_flip", "cutout")}),
            ("DAELDG", "SyntheticDA",
             {"DATALOADER.TRAIN_X.SAMPLER": "RandomDomainSampler",
              "DATALOADER.TRAIN_X.N_DOMAIN": 2,
              "DATASET.SOURCE_DOMAINS": ("a", "b"),
              "TRAINER.DAELDG.STRONG_TRANSFORMS": ("random_flip", "cutout")}),
        ]
        for trainer_name, dataset, overrides in cases:
            l_s = step_xu(
                dassl_cfg(trainer_name, dataset, True, trainer_name.lower(),
                          **overrides),
                expect_local=True,
            )
            l_f = step_xu(
                dassl_cfg(trainer_name, dataset, False,
                          trainer_name.lower() + "f", **overrides),
                expect_local=False,
            )
            assert abs(l_s - l_f) < 1e-5, (trainer_name, l_s, l_f)
            struct_losses.append(l_s)
        vals.extend(struct_losses)

    # ---- 5. tensor parallelism under multi-host (the pod layout) -------
    # global data=4 x model=2 mesh over the processes: TP groups pair
    # consecutive devices, which stay INSIDE one process for every tested
    # world size (8 // n_proc is even or the pair spans exactly the
    # process's devices at n_proc=4), so TP rides the in-host
    # interconnect while data parallelism spans hosts. The TP-pallas route must engage (split-QKV
    # towers, TINY's 1-head vision tower head-padded, TP placement
    # assembling cross-process global arrays) and the sliced loader must
    # reproduce the full-decode step.
    if 5 in stages:
        # stage 4 may have repointed the synthetic spec; the mm dataset
        # dir was cached under stage 3's geometry
        os.environ["OVMR_SYNTHETIC"] = "8,12,32"
        tr_tp = build_trainer(mm_cfg(True, model=2))
        assert tr_tp._tp == "pallas", tr_tp._tp
        assert dict(tr_tp.mesh.shape) == {"data": 4, "model": 2}
        assert "w_q" in tr_tp.clip_params["visual"]["blocks"]
        b_tp = next(iter(tr_tp.train_loader))
        assert b_tp["_local"], "expected sliced exemplar batch under TP"
        loss_tp_s = tr_tp.forward_backward(b_tp)["loss"]
        assert np.isfinite(loss_tp_s)

        tr_tpf = build_trainer(mm_cfg(False, model=2))
        b_tpf = next(iter(tr_tpf.train_loader))
        assert not b_tpf.get("_local")
        loss_tp_f = tr_tpf.forward_backward(b_tpf)["loss"]
        assert abs(loss_tp_s - loss_tp_f) < 1e-5, (loss_tp_s, loss_tp_f)
        vals.append(loss_tp_s)

    print("MHOK " + " ".join(f"{v:.6f}" for v in vals), flush=True)


if __name__ == "__main__":
    main()
