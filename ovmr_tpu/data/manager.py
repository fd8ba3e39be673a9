"""DataManager + host data loader.

The reference wires torch DataLoaders in ``dassl/data/data_manager.py``;
here a loader is a seed-stable python iterator producing numpy batches
``{"img": [B,3,H,W] float32, "label": [B] int32, "impath": list}`` with a
thread pool overlapping JPEG decode + augmentation with device compute.

Loader lineup matches the reference (``data_manager.py:116-246``):
- ``train_loader_x``: TRAIN_X sampler/batch (OVMR: RandomClassSampler 1536/8)
- ``val_loader`` / ``test_loader``: sequential, test transform
- ``eval_set_loader``: RandomClassSampler over the exemplar split with
  n_ins = DATASET.NUM_SHOTS and the TEST transform — the source of
  classifier-generation exemplars (``data_manager.py:156-170``).
"""

from __future__ import annotations

import concurrent.futures as cf
import random
from typing import Dict, Iterator, Optional

import numpy as np

from ovmr_tpu.utils.tools import read_image

from .datum import DatasetBase
from .registry import build_dataset
from .samplers import build_sampler
from .transforms import build_transform


class HostDataLoader:
    """Iterates epochs of transformed image batches."""

    def __init__(
        self,
        data_source,
        sampler,
        transform,
        batch_size: int,
        seed: int = 0,
        num_workers: int = 8,
        drop_last: bool = False,
        k_transforms: int = 1,
        text_only: bool = False,
        return_img0: bool = False,
        img0_transform=None,
        transform2=None,
        local_block=None,
        local_multiple: int = 1,
        multi_res=None,
    ):
        # (process_index, process_count) — multi-host per-host sliced
        # decode; None = every process decodes the full global batch.
        # local_multiple: minimum row multiple of the FULL batch for a
        # slice to be taken (mesh divisibility / class-group alignment)
        self.local_block = local_block
        self.local_multiple = max(local_multiple, 1)
        self.data_source = data_source
        self.sampler = sampler
        self.transform = transform
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        # TEXT_ONLY short-circuit (reference DatasetWrapper,
        # ``data_manager.py:311-312``): train batches carry labels/paths only,
        # no image IO — used by text-side-only experiments
        self.text_only = text_only
        # RETURN_IMG0 (reference ``data_manager.py:330-331``): also emit the
        # un-augmented tensorized image under "img0"
        self.return_img0 = return_img0
        self.img0_transform = img0_transform
        # second (strong) transform -> "img2" in every batch; the torch
        # DatasetWrapper gets this from a custom_tfm_train list
        # (FixMatch/DAEL/CDAC weak+strong pairs)
        self.transform2 = transform2
        # K>1 applies the (stochastic) transform K times per image and emits
        # the variants adjacently: img [B*K, ...], label repeated K times
        # (reference K_TRANSFORMS, ``data_manager.py:334-344``)
        self.k_transforms = max(1, k_transforms)
        # batch-level multi-resolution collate (data/multires.py): decodes
        # RAW images and crops/resizes the whole batch to one per-batch
        # shape — replaces the per-image transform pipeline wholesale
        self.multi_res = multi_res
        if multi_res is not None and (
            self.k_transforms > 1
            or transform2 is not None
            or return_img0
            or text_only
        ):
            raise ValueError(
                "MULTI_RES_COLLATE replaces the per-image transform "
                "pipeline; it cannot combine with K_TRANSFORMS>1, strong "
                "transforms, RETURN_IMG0 or TEXT_ONLY"
            )
        self._epoch = 0
        self._seed = seed

    def __len__(self) -> int:
        rng = np.random.default_rng(self._seed)
        n = len(self.sampler.epoch_indices(rng))
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _load_one(self, idx: int, epoch: int = 0, position: int = 0):
        item = self.data_source[idx]
        img = read_image(item.impath)
        if self.transform is None:
            arrs = [np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0]
        elif getattr(self.transform, "stochastic", False):
            # rng derives from the POSITION in the epoch index stream (not
            # the dataset index): thread-order independent, deterministic
            # per seed/epoch, and duplicate indices (few-shot classes
            # resampled with replacement) still get fresh draws
            arrs = [
                self.transform(
                    img,
                    # tuple-of-ints hash is deterministic across processes
                    rng=random.Random(
                        hash((self._seed, epoch, int(position), k)) & 0xFFFFFFFF
                    ),
                )
                for k in range(self.k_transforms)
            ]
        else:
            arrs = [self.transform(img) for _ in range(self.k_transforms)]
        img2 = None
        if self.transform2 is not None:
            # the strong transform follows K_TRANSFORMS exactly like the
            # primary one (torch DatasetWrapper applies K to EVERY listed
            # transform; CDAC consumes two strong views)
            if getattr(self.transform2, "stochastic", False):
                img2 = [
                    self.transform2(
                        img,
                        # int tag (not a string): str hashes are salted
                        # per process, which would break cross-process /
                        # resume determinism of the strong-aug stream
                        rng=random.Random(
                            hash((self._seed, epoch, int(position), 1, k))
                            & 0xFFFFFFFF
                        ),
                    )
                    for k in range(self.k_transforms)
                ]
            else:
                img2 = [self.transform2(img) for _ in range(self.k_transforms)]
        img0 = None
        if self.return_img0:
            tfm0 = self.img0_transform
            img0 = (
                tfm0(img)
                if tfm0 is not None
                else np.asarray(img, np.float32).transpose(2, 0, 1) / 255.0
            )
        return arrs, item.label, item.impath, img0, item.domain, img2

    def _local_view(self, batch_idx):
        """Per-host sliced decode (multi-host): keep only this process's
        contiguous block of the (identically seeded) global batch.
        Returns ``(sub_idx, position_offset, is_local)`` — the position
        offset preserves the GLOBAL per-item augmentation stream, so the
        locally decoded rows are pixel-identical to the corresponding
        rows of a full decode."""
        if self.local_block is None:
            return batch_idx, 0, False
        pid, nproc = self.local_block
        m = max(self.local_multiple, nproc)
        if len(batch_idx) % m != 0:
            return batch_idx, 0, False  # ragged tail: decode globally
        loc = len(batch_idx) // nproc
        return batch_idx[pid * loc : (pid + 1) * loc], pid * loc, True

    def __iter__(self) -> Iterator[Dict]:
        rng = np.random.default_rng(self._seed + self._epoch)
        indices = self.sampler.epoch_indices(rng)
        self._epoch += 1

        if self.text_only:
            for start in range(0, len(indices), self.batch_size):
                batch_idx = indices[start : start + self.batch_size]
                if self.drop_last and len(batch_idx) < self.batch_size:
                    break
                sub_idx, _, is_local = self._local_view(batch_idx)
                items = [self.data_source[i] for i in sub_idx]
                yield {
                    "label": np.asarray([it.label for it in items], np.int32),
                    "impath": [it.impath for it in items],
                    "index": np.asarray(sub_idx, np.int64),
                    "_local": is_local,
                }
            return

        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for start in range(0, len(indices), self.batch_size):
                batch_idx = indices[start : start + self.batch_size]
                if self.drop_last and len(batch_idx) < self.batch_size:
                    break
                sub_idx, pos_off, is_local = self._local_view(batch_idx)
                epoch = self._epoch - 1
                if self.multi_res is not None:
                    # decode RAW images; the collate crops/resizes the
                    # whole batch to ONE per-batch shape. The batch rng is
                    # keyed on the GLOBAL batch start (not the local
                    # slice), so multi-host sliced rows are pixel-identical
                    # to the corresponding rows of a full decode.
                    items = [self.data_source[i] for i in sub_idx]
                    pils = list(
                        pool.map(lambda it: read_image(it.impath), items)
                    )
                    brng = random.Random(
                        hash((self._seed, epoch, int(start), 11)) & 0xFFFFFFFF
                    )
                    yield {
                        "img": self.multi_res(pils, brng),
                        "label": np.asarray(
                            [it.label for it in items], np.int32
                        ),
                        "impath": [it.impath for it in items],
                        "index": np.asarray(sub_idx, np.int64),
                        "_local": is_local,
                        "domain": np.asarray(
                            [it.domain for it in items], np.int32
                        ),
                    }
                    continue
                results = list(
                    pool.map(
                        lambda args: self._load_one(
                            args[1], epoch, start + pos_off + args[0]
                        ),
                        enumerate(sub_idx),
                    )
                )
                k = len(results[0][0])
                imgs = np.stack([arr for r in results for arr in r[0]])
                if imgs.dtype != np.uint8:  # uint8 ships as-is (device path)
                    imgs = imgs.astype(np.float32, copy=False)
                labels = np.repeat(
                    np.asarray([r[1] for r in results], np.int32), k
                )
                out = {
                    "img": imgs,
                    "label": labels,
                    "impath": [r[2] for r in results for _ in range(k)],
                    "index": np.repeat(np.asarray(sub_idx, np.int64), k),
                    "_local": is_local,
                    # source-domain index (DA/DG trainers; 0 elsewhere)
                    "domain": np.repeat(
                        np.asarray([r[4] for r in results], np.int32), k
                    ),
                }
                if self.return_img0:
                    out["img0"] = np.repeat(
                        np.stack([r[3] for r in results]).astype(
                            np.float32, copy=False
                        ),
                        k,
                        axis=0,
                    )
                if self.transform2 is not None:
                    out["img2"] = np.stack(
                        [arr for r in results for arr in r[5]]
                    ).astype(np.float32, copy=False)
                yield out


class DataManager:
    def __init__(
        self,
        cfg,
        dataset: Optional[DatasetBase] = None,
        tfm_train_strong=None,
        allow_local_batches: bool = False,
        local_model_axis: int = 1,
    ):
        self.cfg = cfg
        self.dataset = dataset if dataset is not None else build_dataset(cfg)

        # multi-host per-host sliced decode for the TRAIN loaders: each
        # process decodes only its contiguous block of the identically
        # seeded global batch (placement re-assembles via
        # shard_batch_local). Only for feed paths whose HOST-side logic is
        # row-wise over items — the caller opts in (DomainMix's host-side
        # global mix opts out via SUPPORTS_LOCAL_BATCHES). Structure that
        # lives ON DEVICE slices fine: the re-assembled global array is
        # row-exact, so in-step reshapes (domain groups, K views) see the
        # identical batch. K_TRANSFORMS / strong views slice per ITEM (the
        # block is taken from the index stream BEFORE the K expansion, so
        # a slice never cuts a variant group, and every augment rng is
        # keyed on the GLOBAL stream position — local rows are
        # pixel-identical to the full decode). `_local_multiple` is the
        # ITEM multiple a batch must satisfy to slice: the mesh 'data'
        # axis size (so the assembled per-view arrays always shard),
        # times the per-class group size under RandomClassSampler
        # (slices never cut a class group; the feed reshapes
        # [num_cls, n_ins]).
        self._local_block = None
        self._local_multiple = 1
        if allow_local_batches and bool(
            cfg.get("TPU", {}).get("MULTIHOST_SLICED_LOADER", True)
        ):
            import jax

            samp = cfg.DATALOADER.TRAIN_X.SAMPLER
            # the RESOLVED data axis must exist and tile evenly across
            # processes, or a local block would not cover this process's
            # addressable shard of the global batch
            # DATA=-1 resolution must match the CALLER's mesh policy:
            # the OVMR trainers divide by the model axis
            # (setup_trainer_mesh), the Dassl mesh is data-only
            # (setup_dassl_mesh ignores MODEL) — the caller passes its
            # divisor as local_model_axis
            data_ax = cfg.TPU.MESH.DATA
            if data_ax == -1:
                data_ax = jax.device_count() // max(local_model_axis, 1)
            nproc = jax.process_count()
            if (
                nproc > 1
                and data_ax > 1
                and data_ax % nproc == 0
                and not cfg.DATALOADER.RETURN_IMG0
                and not bool(cfg.TEXT_ONLY)
            ):
                mult = max(data_ax, nproc)
                if samp == "RandomClassSampler":
                    mult *= max(cfg.DATALOADER.TRAIN_X.N_INS, 1)
                self._local_block = (jax.process_index(), nproc)
                self._local_multiple = mult

        # opt-in multi-resolution batch collate (reference
        # data_manager.py:15-67 defines it but never wires it; here
        # DATALOADER.MULTI_RES_COLLATE True enables it on the train
        # loaders — see data/multires.py for the TPU shape-set note)
        multi_res = None
        if cfg.DATALOADER.get("MULTI_RES_COLLATE", False):
            from .multires import MultiResCollate

            # dims floor to the BACKBONE's patch size when it's a known
            # ViT (so no pixel column is silently cropped by the stride-p
            # patchify); the reference hardcodes 14
            from ovmr_tpu.models.clip import CONFIGS

            patch = 14
            bb = CONFIGS.get(cfg.MODEL.BACKBONE.NAME)
            if bb is not None and not bb.is_resnet:
                patch = bb.vision_patch_size
            multi_res = MultiResCollate(patch_size=patch)

        tfm_train = build_transform(cfg, is_train=True)
        # eval transfers ship uint8 by default; on-device normalization is
        # bit-identical to the host path (see ops/preprocess.normalize_u8)
        eval_u8 = bool(cfg.get("TPU", {}).get("EVAL_UINT8_TRANSFER", False))
        tfm_test = build_transform(cfg, is_train=False, uint8=eval_u8)
        self.tfm_train, self.tfm_test = tfm_train, tfm_test
        self.eval_uint8 = eval_u8
        nw = cfg.DATALOADER.NUM_WORKERS
        seed = max(cfg.SEED, 0)

        ds = self.dataset
        img0_tfm = None
        if cfg.DATALOADER.RETURN_IMG0:
            from .transforms import to_tensor_transform

            img0_tfm = to_tensor_transform(cfg)
        self.train_loader_x = HostDataLoader(
            ds.train_x,
            build_sampler(
                cfg.DATALOADER.TRAIN_X.SAMPLER,
                ds.train_x,
                cfg.DATALOADER.TRAIN_X.BATCH_SIZE,
                cfg.DATALOADER.TRAIN_X.N_INS,
                cfg.DATALOADER.TRAIN_X.N_DOMAIN,
            ),
            tfm_train,
            cfg.DATALOADER.TRAIN_X.BATCH_SIZE,
            seed=seed,
            num_workers=nw,
            k_transforms=cfg.DATALOADER.K_TRANSFORMS,
            # reference: drop_last = is_train and len >= batch_size
            # (data_manager.py:107) — the ragged tail batch is dropped,
            # keeping step shapes static (one compile) and the epoch
            # counts / iteration-annealed schedules reference-exact
            drop_last=len(ds.train_x) >= cfg.DATALOADER.TRAIN_X.BATCH_SIZE,
            text_only=bool(cfg.TEXT_ONLY),
            return_img0=bool(cfg.DATALOADER.RETURN_IMG0),
            img0_transform=img0_tfm,
            transform2=tfm_train_strong,
            local_block=self._local_block,
            local_multiple=self._local_multiple,
            multi_res=multi_res,
        ) if ds.train_x else None

        # unlabeled loader (DA target domain / SSL unlabeled pool); the
        # reference clones the TRAIN_X settings when SAME_AS_X
        # (``data_manager.py`` train_loader_u). drop_last keeps batch
        # shapes static so the jitted XU steps compile once.
        u_cfg = (
            cfg.DATALOADER.TRAIN_X
            if cfg.DATALOADER.TRAIN_U.SAME_AS_X
            else cfg.DATALOADER.TRAIN_U
        )
        self.train_loader_u = HostDataLoader(
            ds.train_u,
            build_sampler(
                u_cfg.SAMPLER,
                ds.train_u,
                u_cfg.BATCH_SIZE,
                u_cfg.N_INS,
                u_cfg.N_DOMAIN,
            ),
            tfm_train,
            u_cfg.BATCH_SIZE,
            seed=seed + 1,  # decorrelated from the labeled stream
            num_workers=nw,
            drop_last=len(ds.train_u) >= u_cfg.BATCH_SIZE,
            k_transforms=cfg.DATALOADER.K_TRANSFORMS,
            transform2=tfm_train_strong,
            local_block=self._local_block,
            local_multiple=self._local_multiple,
            multi_res=multi_res,
        ) if getattr(ds, "train_u", None) else None

        self.val_loader = HostDataLoader(
            ds.val,
            build_sampler("SequentialSampler", ds.val, cfg.DATALOADER.TEST.BATCH_SIZE),
            tfm_test,
            cfg.DATALOADER.TEST.BATCH_SIZE,
            seed=seed,
            num_workers=nw,
        ) if ds.val else None

        self.test_loader = HostDataLoader(
            ds.test,
            build_sampler("SequentialSampler", ds.test, cfg.DATALOADER.TEST.BATCH_SIZE),
            tfm_test,
            cfg.DATALOADER.TEST.BATCH_SIZE,
            seed=seed,
            num_workers=nw,
        ) if ds.test else None

        # exemplar loader: class-grouped, NUM_SHOTS instances per class,
        # test-time transform (is_train=False contract of the reference).
        # Batch size rounds DOWN to a whole number of per-class groups so a
        # batch never splits a class's exemplars (the consumers reshape by
        # `shots`; a ragged batch would silently mix classes)
        shots = max(cfg.DATASET.NUM_SHOTS, 1)
        eval_bs = max(cfg.DATALOADER.TEST.BATCH_SIZE, shots)
        eval_bs -= eval_bs % shots
        self.eval_set_loader = HostDataLoader(
            ds.eval_set,
            build_sampler("RandomClassSampler", ds.eval_set, eval_bs, shots),
            tfm_test,
            eval_bs,
            seed=seed,
            num_workers=nw,
        ) if ds.eval_set else None

        self.num_classes = ds.num_classes
        self.lab2cname = ds.lab2cname
        # reference dm.num_source_domains (dassl data_manager.py). When no
        # SOURCE_DOMAINS are configured (synthetic/OVMR datasets), infer the
        # count from the actual train_x domain ids so domain classifiers /
        # stacked experts are sized to the labels they will see
        n_src = len(cfg.DATASET.SOURCE_DOMAINS)
        if n_src == 0:
            n_src = max((d.domain for d in ds.train_x), default=0) + 1
        self.num_source_domains = max(n_src, 1)

    def show_dataset_summary(self):
        cfg = self.cfg
        ds = self.dataset
        rows = [
            ("Dataset", cfg.DATASET.NAME),
            ("# classes", f"{self.num_classes:,}"),
            ("# train_x", f"{len(ds.train_x):,}"),
            ("# val", f"{len(ds.val):,}" if ds.val else "0"),
            ("# test", f"{len(ds.test):,}"),
        ]
        width = max(len(r[0]) for r in rows) + 2
        print("***** Dataset statistics *****")
        for k, v in rows:
            print(f"  {k:<{width}} {v}")
