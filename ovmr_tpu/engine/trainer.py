"""Trainer hierarchy and the MM_CLS_OP trainer (OVMR's main entry).

The TPU-native re-design of the reference engine
(``dassl/engine/trainer.py`` + ``trainers/mm_classifier_one_prompt.py``):

- TrainerBase: epoch loop, checkpoint cadence, logging/meters, test() driver;
- MM_CLS_OP: frozen CLIP towers (params loaded from a torch checkpoint when
  available, else random-init for smoke runs), the aggregator as the only
  trainable state, jitted train step (one compile per split-point value),
  single-program classifier generation with padded class counts, per-mode
  evaluation and ``mm_classifiers.pt`` export.

TPU specifics: static shapes everywhere (train drops ragged tail batches;
test pads the tail batch and masks), class counts padded to
``TPU.CLASS_PAD_MULTIPLE``, batch axes sharded over the mesh 'data' axis.
"""

from __future__ import annotations

import datetime
import os
import os.path as osp
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ovmr_tpu.data import DataManager
from ovmr_tpu.data.prefetch import prefetch_batches
from ovmr_tpu.engine import checkpoint as ckpt
from ovmr_tpu.engine.optimizers import build_optimizer, set_lr
from ovmr_tpu.engine.schedule import lr_schedule_from_cfg
from ovmr_tpu.engine.train_step import make_train_step, sample_split_point
from ovmr_tpu.evaluation import build_evaluator
from ovmr_tpu.models import clip as jclip
from ovmr_tpu.models import ovmr
from ovmr_tpu.models.aggregator import init_aggregator
from ovmr_tpu.ops.attention import make_attn_fn
from ovmr_tpu.ops.layers import attention_xla, l2_normalize
from ovmr_tpu.parallel import build_mesh, pad_to_multiple
from ovmr_tpu.utils import AverageMeter, MetricMeter, Registry

TRAINER_REGISTRY = Registry("TRAINER")


def build_trainer(cfg):
    return TRAINER_REGISTRY.get(cfg.TRAINER.NAME)(cfg)


def resolve_clip_checkpoint(backbone_name: str) -> Optional[str]:
    """Find a local OpenAI CLIP checkpoint for `backbone_name` via the model
    zoo ($OVMR_CLIP_CKPT > ~/.cache/clip > sha256-verified download when the
    environment has network access)."""
    from ovmr_tpu.models.zoo import resolve

    return resolve(backbone_name)


def load_or_init_clip(cfg):
    """Returns (clip_params fp32, CLIPConfig). Falls back to random init when
    no checkpoint exists (accuracy-meaningless but keeps every pipeline
    runnable end-to-end)."""
    name = cfg.MODEL.BACKBONE.NAME or "ViT-B/16"
    path = resolve_clip_checkpoint(name)
    if path is not None:
        print(f"Loading CLIP (backbone: {name}) from {path}")
        from ovmr_tpu.models.import_torch import load_clip

        return load_clip(path)
    print(
        f"WARNING: no local CLIP checkpoint for {name}; "
        "using RANDOM weights (smoke-run mode)"
    )
    clip_cfg = jclip.CONFIGS.get(name, jclip.VIT_B16)
    params = jclip.init_params(jax.random.PRNGKey(0), clip_cfg)
    return jax.tree_util.tree_map(np.asarray, params), clip_cfg


def collect_exemplar_features(
    eval_set_loader, features_fn, clip_params, n_cls, shots, dim
):
    """Gather ``[n_cls, shots, dim]`` fp32 exemplar features from the
    eval_set_loader contract (RandomClassSampler with n_ins = shots;
    reference ``mm_…:214-231``). Shared by MM_CLS_OP classifier
    generation and CoOp's fusion cross-validation — ONE copy of the
    truncate/reshape/scatter/completeness logic."""
    feats = np.zeros((n_cls, shots, dim), np.float32)
    filled = np.zeros(n_cls, bool)
    for batch in prefetch_batches(eval_set_loader):
        images, labels = batch["img"], batch["label"]
        usable = (images.shape[0] // shots) * shots
        if usable == 0:
            continue
        f = features_fn(clip_params, images[:usable]).reshape(-1, shots, dim)
        lab = labels[:usable].reshape(-1, shots)[:, 0]
        feats[lab] = f
        filled[lab] = True
    if not filled.all():  # not a bare assert: must survive python -O
        raise RuntimeError(
            f"classes missing exemplars: {np.where(~filled)[0]}"
        )
    return feats


def setup_trainer_mesh(cfg, clip_params, block_fn, attn_fn, label="",
                       clip_cfg=None):
    """Mesh construction + tensor-parallel policy shared by MM_CLS_OP and
    CoOp at build_model time (docs/DESIGN.md "Tensor parallelism").

    Returns ``(mesh, tp, clip_params, block_fn, attn_fn)`` where ``tp`` is
    ``False`` (no model axis), ``"pallas"`` or ``"gspmd"`` (both truthy):

    - one visible device with a ``MODEL > 1`` config warns loudly and runs
      un-sharded (mesh None) — the user should not believe TP is active;
    - multi-device with ``DATA != 1`` or ``MODEL > 1`` builds the
      ('data','model') mesh (``DATA=1`` alone opts out; pure TP still
      needs the mesh);
    - ``tp == "pallas"`` (model axis > 1, a ``clip_cfg`` whose MLP hidden
      dims divide it, float towers): the towers convert to the split-qkv
      layout — head counts that don't divide the axis are zero-padded to
      the next multiple (exact zeros fwd+bwd) — and TP-place per leaf
      (:mod:`ovmr_tpu.ops.block_fused_tp`); the shard_map seams (sharded
      train step, eval encode, classifier generation) run the fused Pallas
      kernels PER CHIP on each head/hidden shard with fp32 partial psums
      over 'model', and the returned ``block_fn`` is the GSPMD-safe
      split-layout XLA block (with per-layer remat) for the plain-jit
      fallback paths;
    - ``tp == "gspmd"`` (int8 serving, ``TPU.TP_SPLIT_QKV False``, a
      non-dividing MLP hidden dim, or no
      ``clip_cfg``): the legacy route — the fused Pallas block AND the
      Pallas attention kernel gate off loudly to their XLA paths (neither
      has an SPMD partitioning rule; GSPMD would silently gather the
      batch around them) and the frozen tower params TP-place
      (Megatron-style MLP split).
    """
    prefix = f"{label} " if label else ""
    if jax.device_count() == 1 and cfg.TPU.MESH.MODEL > 1:
        print(
            f"WARNING: TPU.MESH.MODEL={cfg.TPU.MESH.MODEL} requested "
            "but only one device is visible; running un-sharded"
        )
        return None, False, clip_params, block_fn, attn_fn
    if jax.device_count() <= 1 or (
        cfg.TPU.MESH.DATA == 1 and cfg.TPU.MESH.MODEL <= 1
    ):
        return None, False, clip_params, block_fn, attn_fn

    mesh = build_mesh(cfg.TPU.MESH.DATA, cfg.TPU.MESH.MODEL)
    if dict(mesh.shape).get("model", 1) <= 1:
        print(f"{prefix}data-parallel mesh: {dict(mesh.shape)}")
        return mesh, False, clip_params, block_fn, attn_fn

    msize = dict(mesh.shape)["model"]
    # split-QKV TP needs only the MLP hidden dim (4*width) to divide the
    # model axis — head counts that don't divide are zero-padded to the
    # next multiple (ops.block_fused_tp.pad_head_shards, exact zeros)
    pallas_tp = (
        clip_cfg is not None
        and not cfg.TPU.INT8
        and cfg.TPU.TP_SPLIT_QKV
        and (4 * clip_cfg.transformer_width) % msize == 0
        and (
            clip_cfg.is_resnet
            or (4 * clip_cfg.vision_width) % msize == 0
        )
    )
    if pallas_tp:
        from ovmr_tpu.ops.block_fused_tp import (
            split_clip_qkv,
            tp_gspmd_block_remat,
        )
        from ovmr_tpu.parallel import place_tower_params

        clip_params = place_tower_params(
            mesh, split_clip_qkv(clip_params, msize, clip_cfg)
        )
        pads = [
            f"{name} {heads}->{heads + (-heads) % msize}"
            for name, heads in (
                ("visual", None if clip_cfg.is_resnet else clip_cfg.vision_heads),
                ("text", clip_cfg.transformer_heads),
            )
            if heads is not None and heads % msize
        ]
        pad_note = f" (head-padded: {', '.join(pads)})" if pads else ""
        print(
            f"{prefix}tensor-parallel mesh {dict(mesh.shape)}: split-QKV "
            f"towers{pad_note}; the shard_map seams run the fused Pallas "
            "kernels per chip (head-split attention + hidden-split MLP, "
            "fp32 psum over 'model'); plain-jit fallbacks use the GSPMD "
            "split-layout XLA block"
        )
        return mesh, "pallas", clip_params, tp_gspmd_block_remat, attention_xla

    gated = []
    if block_fn is not None:  # legacy gspmd TP route below
        block_fn = None
        gated.append("block")
    if attn_fn is not attention_xla:
        attn_fn = attention_xla
        gated.append("attention")
    if gated:
        print(
            f"{prefix}model-parallel mesh (model="
            f"{dict(mesh.shape)['model']}): routing the fused "
            f"{' + '.join(gated)} kernel(s) to the XLA path — Pallas "
            "kernels have no SPMD partitioning rule (docs/DESIGN.md)"
        )
    from ovmr_tpu.parallel import place_tower_params

    clip_params = place_tower_params(mesh, clip_params)
    print(
        f"{prefix}tensor-parallel mesh: {dict(mesh.shape)} "
        "(plain jit GSPMD)"
    )
    return mesh, "gspmd", clip_params, block_fn, attn_fn


def tp_seam_tools(mesh, tp, clip_params):
    """(tp_block_fn, clip_specs) for the shard_map seams at
    ``tp == "pallas"`` (else ``(None, None)``): the per-chip TP block
    (fused Pallas on each head/hidden shard, fp32 psum over 'model') and
    the split-layout PartitionSpec tree for shard_map in_specs."""
    if tp != "pallas":
        return None, None
    from ovmr_tpu.ops.block_fused_tp import make_tp_block
    from ovmr_tpu.parallel import clip_pspecs

    msize = dict(mesh.shape)["model"]
    return make_tp_block(msize), clip_pspecs(clip_params, msize)


def make_feature_extractor(
    clip_cfg, attn_fn, dtype, mean, std, batch_size, mesh=None,
    unit_norm=True, block_fn=None, u8_normalize=True,
    tp_block_fn=None, clip_specs=None,
):
    """Returns encode(clip_params, images_np) -> fp32 features [n, D]
    (L2-normalized unless unit_norm=False — e.g. the lpclip feature dump
    matches the reference's raw features).

    Handles both float CHW and uint8 HWC batches (the latter normalize on
    device — 4x smaller transfers) and pads ragged tails to `batch_size`
    so one compiled program serves every batch. With a `mesh`, batches
    shard over the 'data' axis (embarrassingly parallel encode)."""
    from ovmr_tpu.ops.preprocess import normalize_u8

    # uint8 transfers must replicate the FLOAT pipeline exactly: when the
    # config's transforms omit "normalize", the device side only scales
    # to [0, 1] (mean 0 / std 1) — otherwise the transfer format would
    # silently change eval numerics
    if not u8_normalize:
        mean, std = (0.0, 0.0, 0.0), (1.0, 1.0, 1.0)
    mean, std = tuple(mean), tuple(std)
    post = l2_normalize if unit_norm else (lambda x: x)

    # model-parallel meshes: with a per-chip TP block (split-qkv towers,
    # ops.block_fused_tp) the encode runs as a shard_map over BOTH axes —
    # fused Pallas kernels per chip on each head/hidden shard. Without one
    # (legacy gspmd TP), plain jit: tower params are TP-placed
    # (tower_param_shardings), XLA partitions the matmuls over 'model', and
    # the Pallas fused blocks gate off loudly (no SPMD rule — GSPMD would
    # silently gather the batch around them).
    tp = mesh is not None and dict(mesh.shape).get("model", 1) > 1
    tp_pallas = tp and tp_block_fn is not None
    if tp_pallas:
        attn_fn, block_fn = attention_xla, tp_block_fn
    if tp and block_fn is not None and not tp_pallas:
        print(
            "Model-parallel mesh: eval encode routes towers to the XLA "
            "block path (Pallas kernels have no SPMD partitioning rule)"
        )
        block_fn = None
    if tp and attn_fn is not attention_xla:
        print(
            "Model-parallel mesh: eval encode routes attention to the XLA "
            "path (the Pallas attention kernel has no SPMD partitioning "
            "rule)"
        )
        attn_fn = attention_xla
    if tp_pallas and clip_specs is None:
        raise ValueError(
            "tp_block_fn needs clip_specs (the split-layout param "
            "PartitionSpec tree; parallel.clip_pspecs)"
        )

    # with a mesh, every batch pads up to a multiple of the 'data' axis (the
    # only axis the batch shards over) so the single compiled program always
    # shards over 'data' — never a silent replicated fallback
    if mesh is not None:
        data_size = dict(mesh.shape)["data"]
        if batch_size % data_size != 0:
            padded = pad_to_multiple(batch_size, data_size)
            print(
                f"WARNING: eval batch {batch_size} not divisible by the "
                f"data axis ({data_size}); padding compiled batch to {padded}"
            )
            batch_size = padded

    def enc_f32(p, x):
        return post(
            jclip.encode_image(p, clip_cfg, x, attn_fn=attn_fn, block_fn=block_fn)
        )

    def enc_u8(p, x):
        return post(
            jclip.encode_image(
                p,
                clip_cfg,
                normalize_u8(x, mean, std, dtype),
                attn_fn=attn_fn,
                layout="NHWC",
                block_fn=block_fn,
            )
        )

    if mesh is not None and (not tp or tp_pallas):
        # shard_map: each device encodes its local 'data' shard. This (not
        # plain jit) is what keeps the Pallas kernels per-chip —
        # pallas_call has no SPMD partitioning rule, so under plain jit
        # GSPMD would all-gather the batch around it. The TP-pallas route
        # is the same region manual over BOTH axes: tower shards per
        # clip_specs, the per-chip block psums partials over 'model'.
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        param_specs = clip_specs if tp_pallas else P()

        def smap(fn):
            return jax.jit(
                shard_map(
                    fn,
                    mesh=mesh,
                    in_specs=(param_specs, P("data")),
                    out_specs=P("data"),
                    check_vma=False,
                )
            )

        f32, u8 = smap(enc_f32), smap(enc_u8)
    else:
        # single device, or legacy gspmd TP: plain jit — with a TP mesh the
        # batch is 'data'-placed and params 'model'-placed, and GSPMD
        # partitions both
        f32, u8 = jax.jit(enc_f32), jax.jit(enc_u8)

    def place(x):
        if mesh is not None:  # batch_size is a device multiple (padded above)
            from ovmr_tpu.parallel import shard_batch

            return shard_batch(mesh, x)
        return x

    def encode(clip_params, images_np):
        n = images_np.shape[0]
        if n < batch_size:
            pad = np.zeros(
                (batch_size - n, *images_np.shape[1:]), images_np.dtype
            )
            images_np = np.concatenate([images_np, pad], 0)
        if images_np.dtype == np.uint8:
            out = u8(clip_params, place(jnp.asarray(images_np)))
        else:
            out = f32(clip_params, place(jnp.asarray(images_np, dtype)))
        from ovmr_tpu.parallel import to_host

        return to_host(out).astype(np.float32)[:n]

    return encode


def _dtype_from_cfg(cfg):
    return {
        "bfloat16": jnp.bfloat16,
        "float16": jnp.float16,
        "fp16": jnp.float16,
        "float32": jnp.float32,
        "fp32": jnp.float32,
    }[cfg.TPU.DTYPE]


class TrainerBase:
    """Generic epoch-loop trainer (reference ``TrainerBase``/``SimpleTrainer``
    /``TrainerX``, ``dassl/engine/trainer.py:77-674``)."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.output_dir = cfg.OUTPUT_DIR
        self.start_epoch = 0
        self.max_epoch = cfg.OPTIM.MAX_EPOCH
        self.epoch = 0
        self.best_result = -np.inf

        self.dm = self.build_data_manager()
        self.dm.show_dataset_summary()
        self.evaluator = build_evaluator(cfg, lab2cname=self.dm.lab2cname)
        self.build_model()

    # subclass hooks ------------------------------------------------------
    def build_data_manager(self):
        """Default data plumbing; trainers needing custom train transforms
        (e.g. FixMatch's weak+strong pairs) override this (reference
        ``build_data_loader`` re-implementations)."""
        return DataManager(self.cfg)

    def build_model(self):
        raise NotImplementedError

    def forward_backward(self, batch):
        raise NotImplementedError

    def before_epoch(self):
        pass

    def after_epoch(self):
        last = (self.epoch + 1) == self.max_epoch
        do_test = not self.cfg.TEST.NO_TEST
        # best-val model selection (reference SimpleTrainer.after_epoch,
        # ``dassl/engine/trainer.py:437-455``)
        if do_test and self.cfg.TEST.FINAL_MODEL == "best_val":
            curr_result = self.test(split="val")
            if curr_result > self.best_result:
                self.best_result = curr_result
                self.save_model(self.epoch + 1, model_name="model-best")
        freq = self.cfg.TRAIN.CHECKPOINT_FREQ
        if last or (freq > 0 and (self.epoch + 1) % freq == 0):
            self.save_model(self.epoch + 1)

    def save_model(self, epoch, model_name=""):
        pass

    def resume_model_if_exist(self, directory) -> int:
        """Restore state from `directory` when a checkpoint exists; return
        the epoch to resume from (reference ``before_train``,
        ``dassl/engine/trainer.py:403-407``)."""
        return 0

    def eval_loader(self, split):
        """val loader for split=='val' when it exists, else test
        (reference SimpleTrainer fallback)."""
        loader = self.dm.val_loader if split == "val" else self.dm.test_loader
        return loader if loader is not None else self.dm.test_loader

    def init_writer(self):
        if getattr(self, "_writer", None) is None:
            from ovmr_tpu.utils.tensorboard import SummaryWriter

            tb_dir = osp.join(self.output_dir, "tensorboard")
            os.makedirs(tb_dir, exist_ok=True)
            self._writer = SummaryWriter(tb_dir)
        return self._writer

    def write_scalar(self, tag, value, global_step):
        self.init_writer().add_scalar(tag, float(value), global_step)

    def train(self):
        self.before_train()

        # optional device trace: OVMR_PROFILE_DIR=<dir> captures the first
        # training epoch with jax.profiler (aux tracing subsystem)
        profile_dir = os.environ.get("OVMR_PROFILE_DIR")
        if profile_dir:
            jax.profiler.start_trace(profile_dir)

        for self.epoch in range(self.start_epoch, self.max_epoch):
            self.before_epoch()
            self.run_epoch()
            self.after_epoch()
            if profile_dir and self.epoch == self.start_epoch:
                jax.profiler.stop_trace()
                profile_dir = None
        self.after_train()

    def before_train(self):
        # automatic resume from OUTPUT_DIR, no flag needed (reference
        # ``before_train``, ``dassl/engine/trainer.py:403-407``)
        directory = self.cfg.RESUME or self.output_dir
        self.start_epoch = self.resume_model_if_exist(directory)
        self.time_start = time.time()
        self.init_writer()

    def after_train(self):
        print("Finish training")
        if not self.cfg.TEST.NO_TEST:
            if self.cfg.TEST.FINAL_MODEL == "best_val":
                print("Deploy the model with the best val performance")
                self.load_model(self.output_dir)
            else:
                print("Deploy the last-epoch model")
            self.test()
        elapsed = round(time.time() - self.time_start)
        print(f"Elapsed: {datetime.timedelta(seconds=elapsed)}")
        self._writer.flush()

    def run_epoch(self):
        losses = MetricMeter()
        batch_time = AverageMeter()
        data_time = AverageMeter()
        self.num_batches = len(self.train_loader)
        end = time.time()
        # host decode of batch N+1 overlaps the device's step N (the
        # torch-DataLoader-workers equivalent; SURVEY §7 hard part #6)
        for self.batch_idx, batch in enumerate(
            prefetch_batches(self.train_loader)
        ):
            data_time.update(time.time() - end)
            loss_summary = self.forward_backward(batch)
            batch_time.update(time.time() - end)
            if loss_summary:
                # NaN/Inf guard (reference detect_anomaly, trainer.py:236-238)
                loss_val = loss_summary.get("loss")
                if loss_val is not None and not np.isfinite(loss_val):
                    raise FloatingPointError(
                        f"non-finite loss {loss_val} at epoch {self.epoch} "
                        f"batch {self.batch_idx}"
                    )
                losses.update(loss_summary)
                global_step = self.epoch * self.num_batches + self.batch_idx
                for name, value in loss_summary.items():
                    self.write_scalar(f"train/{name}", value, global_step)
            if (
                (self.batch_idx + 1) % self.cfg.TRAIN.PRINT_FREQ == 0
                or self.num_batches < self.cfg.TRAIN.PRINT_FREQ
            ):
                nb_remain = (self.num_batches - self.batch_idx - 1) + (
                    self.max_epoch - self.epoch - 1
                ) * self.num_batches
                eta = datetime.timedelta(seconds=int(batch_time.avg * nb_remain))
                print(
                    f"epoch [{self.epoch + 1}/{self.max_epoch}]"
                    f"[{self.batch_idx + 1}/{self.num_batches}]\t"
                    f"time {batch_time.val:.3f} ({batch_time.avg:.3f})\t"
                    f"data {data_time.val:.3f} ({data_time.avg:.3f})\t"
                    f"{losses}\t"
                    f"eta {eta}"
                )
            end = time.time()

    @property
    def train_loader(self):
        return self.dm.train_loader_x

    def load_model(self, directory, epoch=None):
        pass

    # ---- generic test pipeline ------------------------------------------
    # (reference SimpleTrainer.test, ``dassl/engine/trainer.py:461-507``)
    def prepare_test(self):
        """One-time setup before the eval passes (classifier generation,
        text-feature precompute, ...)."""

    def model_inference(self, batch, scale_no=0):
        """Per-batch inference -> class scores [B, n_cls] (numpy). The OVMR
        models accept and ignore ``scale_no`` exactly like the reference's
        (``mm_…:294``, ``coop_…:307``)."""
        raise NotImplementedError

    def test(self, split: Optional[str] = None):
        cfg = self.cfg
        split = split or cfg.TEST.SPLIT
        if split == "val" and self.dm.val_loader is not None:
            loader = self.dm.val_loader
        else:
            split = "test"  # in case val_loader is None (reference :470-473)
            loader = self.dm.test_loader
        self.prepare_test()
        print(f"Evaluate on the *{split}* set")

        def eval_pass(scale_no):
            self.evaluator.reset()
            for batch in prefetch_batches(loader):
                output = self.model_inference(batch, scale_no=scale_no)
                self.evaluator.process(output, batch["label"])
            results = self.evaluator.evaluate()
            for k, v in results.items():
                self.write_scalar(f"{split}/{k}", v, self.epoch)
            return results

        if not cfg.DATASET.REGION_AUG:
            results = eval_pass(0)
        else:
            # multi-scale region eval: each scale twice — single text
            # embedding then mean text embeddings (reference ``:488-505``)
            scales = list(cfg.DATASET.REGION_SCALE)
            for test_no in range(len(scales) * 2):
                kind = (
                    "mean text embeddings"
                    if test_no >= len(scales)
                    else "corresponding single text embedding"
                )
                print(
                    "## eval region scale %d using %s"
                    % (scales[test_no % len(scales)], kind)
                )
                results = eval_pass(test_no)
        return list(results.values())[0]


@TRAINER_REGISTRY.register()
class MM_CLS_OP(TrainerBase):
    """OVMR visual-token-generator trainer + classifier-generation eval
    (reference ``trainers/mm_classifier_one_prompt.py:367-493``)."""

    def build_data_manager(self):
        from ovmr_tpu.data.manager import DataManager

        # multi-host: exemplar batches are class-grouped rows — eligible
        # for per-host sliced decode (DataManager aligns slices to
        # n_ins-sized class groups AND the mesh data axis; the "class"
        # marker also permits K_TRANSFORMS>1, which this feed handles
        # row-wise)
        return DataManager(
            self.cfg,
            allow_local_batches="class",
            local_model_axis=self.cfg.TPU.MESH.MODEL,
        )

    def build_model(self):
        cfg = self.cfg
        self.dtype = _dtype_from_cfg(cfg)
        self.attn_fn = make_attn_fn(
            cfg.TPU.USE_PALLAS_ATTENTION if jax.default_backend() == "tpu" else False
        )
        self.block_fn = None
        if cfg.TPU.USE_FUSED_BLOCK and jax.default_backend() == "tpu":
            from ovmr_tpu.ops.block_fused import fused_residual_block

            self.block_fn = fused_residual_block

        clip_params, self.clip_cfg = load_or_init_clip(cfg)
        self.clip_params = jclip.cast_params(
            jax.tree_util.tree_map(jnp.asarray, clip_params), self.dtype
        )
        # int8 is SERVING-ONLY: gradients through round/clip would be zero,
        # so training always uses the float towers; serving_params quantizes
        # lazily for eval/classifier generation (see serving_params property)
        self._fp_clip_params_np = (
            jax.tree_util.tree_map(np.asarray, clip_params) if cfg.TPU.INT8 else None
        )
        self._serving_params_cache = None

        if self.clip_cfg.embed_dim != self.clip_cfg.transformer_width:
            # voken splicing inserts image-space tokens into text embeddings;
            # it requires embed_dim == transformer_width (true for every ViT
            # CLIP; ResNet towers have embed_dim 1024 vs width 512 and the
            # reference would crash the same way — use ViT backbones here)
            raise ValueError(
                "MM_CLS_OP requires a backbone with embed_dim == "
                f"transformer_width (got {self.clip_cfg.embed_dim} vs "
                f"{self.clip_cfg.transformer_width}); use a ViT backbone"
            )

        classnames = self.dm.dataset.classnames
        self.n_cls = len(classnames)
        self.n_ctx = cfg.TRAINER.COCOOP.N_CTX
        ptok, eot, vtok = ovmr.build_prompt_tokens(classnames)
        self.prompt_tokens = jnp.asarray(ptok)
        self.eot_idx = jnp.asarray(eot)
        self.vis_tokens = jnp.asarray(vtok)

        key = jax.random.PRNGKey(max(cfg.SEED, 0))
        self.agg_params = init_aggregator(
            key,
            width=self.clip_cfg.embed_dim,
            layers=4,
            n_ctx=self.n_ctx,
        )
        if cfg.MODEL.INIT_WEIGHTS:
            from ovmr_tpu.models.import_torch import load_prompt_learner

            self.agg_params, _ = load_prompt_learner(cfg.MODEL.INIT_WEIGHTS)
            self.agg_params = jax.tree_util.tree_map(jnp.asarray, self.agg_params)

        self.optimizer = build_optimizer(cfg.OPTIM)
        self.opt_state = self.optimizer.init(self.agg_params)
        self.lr_table = lr_schedule_from_cfg(cfg.OPTIM)

        augment = None
        self._cached_train_loader = None
        if cfg.TPU.DEVICE_AUGS:
            augment = dict(
                out_size=cfg.INPUT.SIZE[0],
                scale=tuple(cfg.INPUT.RRCROP_SCALE),
                jitter=(
                    cfg.INPUT.COLORJITTER_B,
                    cfg.INPUT.COLORJITTER_C,
                    cfg.INPUT.COLORJITTER_S,
                    cfg.INPUT.COLORJITTER_H,
                ),
                gn_std=cfg.INPUT.GN_STD if "gaussian_noise" in cfg.INPUT.TRANSFORMS else 0.0,
                mean=tuple(cfg.INPUT.PIXEL_MEAN),
                std=tuple(cfg.INPUT.PIXEL_STD),
                out_dtype=self.dtype,
            )
        # mesh-parallel placement whenever more than one device is visible
        # (shared policy: setup_trainer_mesh — TP-pallas splits the towers
        # and keeps fused kernels per chip inside the shard_map seams;
        # legacy gspmd TP gates the Pallas kernels to XLA)
        self.train_step_sharded = None
        (self.mesh, self._tp, self.clip_params, self.block_fn,
         self.attn_fn) = setup_trainer_mesh(
            cfg, self.clip_params, self.block_fn, self.attn_fn,
            clip_cfg=self.clip_cfg,
        )
        self._tp_block_fn, self._clip_specs = tp_seam_tools(
            self.mesh, self._tp, self.clip_params
        )
        if self.mesh is not None and self._tp != "gspmd":
            # explicit shard_map step: classifiers all_gather over ICI,
            # grads pmean, fused Pallas kernels per chip (pallas_call
            # has no GSPMD rule, so plain jit couldn't keep them
            # sharded). TP-pallas adds the 'model' axis: tower shards per
            # clip_specs, per-chip TP block psums over 'model'.
            from ovmr_tpu.engine.train_step import make_sharded_train_step

            self.train_step_sharded = make_sharded_train_step(
                self.clip_cfg,
                self.optimizer,
                self.mesh,
                dropout=0.1,
                attn_fn=self.attn_fn,
                augment=augment,
                block_fn=(
                    self._tp_block_fn if self._tp == "pallas"
                    else self.block_fn
                ),
                clip_specs=self._clip_specs,
            )
        # single-program step: single chip, and the fallback for ragged
        # batches whose class count doesn't divide the mesh (XLA block
        # there — GSPMD would gather around Pallas kernels; under
        # TP-pallas the GSPMD-safe split-layout XLA block)
        self.train_step = make_train_step(
            self.clip_cfg,
            self.optimizer,
            dropout=0.1,
            attn_fn=self.attn_fn,
            augment=augment,
            block_fn=self.block_fn if (self.mesh is None or self._tp) else None,
        )

        self._features = make_feature_extractor(
            self.clip_cfg,
            self.attn_fn,
            self.dtype,
            cfg.INPUT.PIXEL_MEAN,
            cfg.INPUT.PIXEL_STD,
            cfg.DATALOADER.TEST.BATCH_SIZE,
            mesh=self.mesh,
            block_fn=self.block_fn,
            u8_normalize=("normalize" in cfg.INPUT.TRANSFORMS),
            tp_block_fn=self._tp_block_fn,
            clip_specs=self._clip_specs,
        )
        self.rng = jax.random.PRNGKey(max(cfg.SEED, 0) + 1)
        self.py_rng = np.random.default_rng(max(cfg.SEED, 0))
        self.classifiers = None

    def resume_model_if_exist(self, directory) -> int:
        self.agg_params, self.opt_state, start_epoch = (
            ckpt.resume_from_checkpoint(
                directory, "prompt_learner", self.agg_params, self.opt_state,
                backend=self.cfg.TPU.CHECKPOINT_BACKEND,
            )
        )
        return start_epoch

    # ---- training -----------------------------------------------------
    @property
    def train_loader(self):
        if not self.cfg.TPU.DEVICE_AUGS:
            return self.dm.train_loader_x
        if self._cached_train_loader is None:
            from ovmr_tpu.data.cache import CachedClassBatchLoader, ImageArrayCache
            from ovmr_tpu.data.samplers import build_sampler

            cfg = self.cfg
            cache = ImageArrayCache(
                self.dm.dataset.train_x, side=cfg.TPU.CACHE_SIDE
            )
            sampler = build_sampler(
                cfg.DATALOADER.TRAIN_X.SAMPLER,
                self.dm.dataset.train_x,
                cfg.DATALOADER.TRAIN_X.BATCH_SIZE,
                cfg.DATALOADER.TRAIN_X.N_INS,
            )
            self._cached_train_loader = CachedClassBatchLoader(
                cache, sampler, cfg.DATALOADER.TRAIN_X.BATCH_SIZE,
                seed=max(cfg.SEED, 0),
            )
        return self._cached_train_loader

    def before_epoch(self):
        self.opt_state = set_lr(self.opt_state, self.lr_table[self.epoch])

    def forward_backward(self, batch):
        cfg = self.cfg
        # K_TRANSFORMS>1 expands every instance into K adjacent augmented
        # copies, scaling the per-class group size
        n_ins = cfg.DATALOADER.TRAIN_X.N_INS * max(cfg.DATALOADER.K_TRANSFORMS, 1)
        images = batch["img_u8"] if "img_u8" in batch else batch["img"]
        labels = batch["label"]
        num_cls = images.shape[0] // n_ins
        if num_cls == 0:
            return None
        usable = num_cls * n_ins
        images = images[:usable].reshape(num_cls, n_ins, *images.shape[1:])
        label_group = labels[:usable].reshape(num_cls, n_ins)
        exemplar_label = label_group[:, 0]

        split_point = sample_split_point(self.py_rng, n_ins)
        self.rng, sub = jax.random.split(self.rng)

        # multi-host sliced batches: this process decoded only its class
        # block; the loader guarantees the assembled GLOBAL class count
        # divides the data axis (local_multiple = n_ins * data axis).
        # Everything assembles from HOST arrays (no device round trips).
        local = bool(batch.get("_local", False)) and jax.process_count() > 1
        step = self.train_step
        if local:
            from ovmr_tpu.parallel import place_local_batch

            if not hasattr(self, "_host_prompt_cache"):
                self._host_prompt_cache = (
                    np.asarray(self.prompt_tokens),
                    np.asarray(self.eot_idx),
                )
            ptok_np, eot_np = self._host_prompt_cache
            images_np = (
                images if images.dtype == np.uint8
                else np.asarray(images, self.dtype)
            )
            images_dev, ptok, eot = place_local_batch(
                self.mesh, images_np, ptok_np[exemplar_label],
                eot_np[exemplar_label],
            )
            if self.train_step_sharded is not None:
                step = self.train_step_sharded
            return self._run_train_step(
                step, images_dev, ptok, eot, sub, split_point
            )
        ptok = self.prompt_tokens[jnp.asarray(exemplar_label)]
        eot = self.eot_idx[jnp.asarray(exemplar_label)]
        # uint8 batches stay uint8 (the step augments + normalizes on device)
        images_dev = (
            jnp.asarray(images)
            if images.dtype == np.uint8
            else jnp.asarray(images, self.dtype)
        )
        if self.mesh is not None:
            if num_cls % dict(self.mesh.shape)["data"] == 0:
                from ovmr_tpu.parallel import shard_batch

                images_dev = shard_batch(self.mesh, images_dev)
                ptok = shard_batch(self.mesh, ptok)
                eot = shard_batch(self.mesh, eot)
                # model>1 has no shard_map step (Pallas has no SPMD rule);
                # the plain-jit step runs under GSPMD with TP-placed towers
                if self.train_step_sharded is not None:
                    step = self.train_step_sharded
            elif not getattr(self, "_warned_unsharded", False):
                # tail batches with a ragged class count fall back to the
                # single-program step — loud, not silent (padding the class
                # axis would corrupt the arange-label CE loss)
                self._warned_unsharded = True
                print(
                    f"WARNING: batch with {num_cls} classes not divisible by "
                    f"the data axis ({dict(self.mesh.shape)['data']}) runs "
                    "replicated; choose BATCH_SIZE so classes-per-batch "
                    "divides the mesh"
                )

        return self._run_train_step(
            step, images_dev, ptok, eot, sub, split_point
        )

    def _run_train_step(self, step, images_dev, ptok, eot, sub, split_point):
        self.agg_params, self.opt_state, loss = step(
            self.agg_params,
            self.opt_state,
            self.clip_params,
            images_dev,
            ptok,
            eot,
            self.vis_tokens,
            sub,
            split_point,
        )
        # generator weights changed: any cached classifiers are stale
        # (matters for best-val testing between epochs)
        self.classifiers = None
        return {"loss": float(loss), "lr": self.lr_table[self.epoch]}

    def save_model(self, epoch, model_name=""):
        ckpt.save_checkpoint(
            self.output_dir,
            "prompt_learner",
            epoch,
            self.agg_params,
            self.opt_state,
            model_name=model_name,
            backend=self.cfg.TPU.CHECKPOINT_BACKEND,
        )
        ckpt.save_torch_checkpoint(
            self.output_dir, "prompt_learner", epoch, self.agg_params,
            model_name=model_name,
        )

    def load_model(self, directory, epoch=None):
        if not directory:
            print("Note that load_model() is skipped as no pretrained model is given")
            return
        params, _, ep = ckpt.load_checkpoint(
            directory, "prompt_learner", self.agg_params, None, epoch=epoch,
            backend=self.cfg.TPU.CHECKPOINT_BACKEND,
        )
        self.agg_params = jax.tree_util.tree_map(jnp.asarray, params)
        self.classifiers = None  # invalidate any cache from previous weights
        print(f'Loaded prompt_learner weights from "{directory}" (epoch = {ep})')

    # ---- evaluation -----------------------------------------------------
    @property
    def serving_params(self):
        """CLIP params used by eval paths: int8-quantized (lazily, once)
        when TPU.INT8 is set, else the float training params."""
        if self._fp_clip_params_np is None:
            return self.clip_params
        if self._serving_params_cache is None:
            from ovmr_tpu.ops.quant import quantize_params

            print("Quantizing frozen tower block matmuls to int8 (serving)")
            self._serving_params_cache = jclip.cast_params(
                jax.tree_util.tree_map(
                    jnp.asarray, quantize_params(self._fp_clip_params_np)
                ),
                self.dtype,
            )
        return self._serving_params_cache

    def generate_classifiers(self):
        """Collect exemplar features from eval_set_loader, then run ONE
        compiled classifier-generation program over the padded class set
        (replaces the reference's per-batch scatter loop, ``mm_…:214-292``)."""
        cfg = self.cfg
        shots = max(cfg.DATASET.NUM_SHOTS, 1)
        n_cls = self.n_cls
        dim = self.clip_cfg.embed_dim

        feats = collect_exemplar_features(
            self.dm.eval_set_loader, self._features, self.serving_params,
            n_cls, shots, dim,
        )

        # chunked classifier heads: pad to a multiple of the chunk size and
        # run one compiled program per chunk (bounds text-tower activations
        # at ImageNet-21k scale); fusion then runs once over the full set
        chunk = min(
            int(cfg.TPU.CLASS_CHUNK),
            pad_to_multiple(n_cls, cfg.TPU.CLASS_PAD_MULTIPLE),
        )
        if self.mesh is not None:
            # chunks shard their class axis over 'data' (shard_map keeps the
            # fused Pallas kernels per-chip) — the chunk must divide evenly
            chunk = pad_to_multiple(chunk, dict(self.mesh.shape)["data"])
        include_text = n_cls < int(cfg.TPU.TEXT_CLS_MAX_CLASSES)
        if not include_text:
            # the reference skips the frozen text classifier at >=5000
            # classes (``mm_…:118-126``; training never needs it) — and
            # cannot eval/export at all at that scale. We skip text AND the
            # fusion that depends on it; raise TPU.TEXT_CLS_MAX_CLASSES to
            # force the full artifact (the 21k capability run does).
            print(
                f"Skipping frozen text classifier: {n_cls} classes >= "
                f"TPU.TEXT_CLS_MAX_CLASSES ({cfg.TPU.TEXT_CLS_MAX_CLASSES}, "
                "the reference >=5000-class guard). text/fusion eval modes "
                "are unavailable; mm_classifiers.pt will omit "
                "text_classifier and fusion_weight."
            )

        # one host->device transfer for the whole exemplar set (the
        # dominant transfer at 21k scale); chunks are device slices and
        # fusion reads the same copy. Rounding fusion inputs through the
        # compute dtype also mirrors the reference, whose cross-validation
        # features are stored half precision (``mm_…:224``).
        feats_dev = jnp.asarray(feats, self.dtype)
        out = ovmr.generate_classifiers_chunked(
            feats_dev,
            np.asarray(self.prompt_tokens),
            np.asarray(self.eot_idx),
            np.asarray(self.vis_tokens),
            chunk,
            jit_heads=lambda f, pt, et: self._jit_heads(
                self.serving_params, self.agg_params, f, pt, et
            ),
            jit_text=(
                (lambda pt: self._jit_text_classifier(self.serving_params, pt))
                if include_text
                else None
            ),
            place=self._place_classes,
            feats_dtype=self.dtype,
        )

        if include_text:
            logit_scale = np.exp(
                np.asarray(self.clip_params["logit_scale"], np.float32)
            )
            # feats stay in the compute dtype: every fusion path casts to
            # fp32 per row chunk (bf16->fp32 is exact), so an eager full-
            # tensor cast would only double peak HBM at 21k scale
            out["fusion_weight"] = np.asarray(
                ovmr.fusion_from_classifiers(
                    feats_dev,
                    jnp.asarray(out["mm_classifier"]),
                    jnp.asarray(out["vision_classifier"]),
                    jnp.asarray(out["text_classifier"]),
                    logit_scale,
                    float(cfg.EVAL_TAU),
                    # rows shard over 'data', counts psum — same bits,
                    # per-chip FLOPs / axis size (only engages above the
                    # streaming row_chunk threshold)
                    mesh=self.mesh,
                ),
                np.float32,
            )

        self.classifiers = out
        ckpt.export_classifiers_torch(out, self.output_dir)
        return out

    def _shard_over_classes(self, fn, n_replicated: int):
        """jit `fn`, sharding every arg past the first `n_replicated` over
        the mesh 'data' axis (class-axis parallelism for the generation
        chunks; shard_map — not plain jit — keeps the Pallas kernels
        per-chip, same rationale as make_feature_extractor). Arg 0 is
        always the CLIP params: under TP-pallas they enter with their
        split-layout 'model' shards and `fn` must use the per-chip TP
        block (self._seam_block_fn)."""
        if self.mesh is None:
            return jax.jit(fn)
        tp = dict(self.mesh.shape).get("model", 1) > 1
        if tp and self._tp != "pallas":
            # legacy gspmd TP: towers are GSPMD-partitioned over 'model'
            # (params TP-placed in build_model, block_fn gated to the XLA
            # path); plain jit lets XLA shard the class chunks over 'data'
            # from the operand placement (_place_classes)
            return jax.jit(fn)
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        clip_spec = self._clip_specs if tp else P()

        def wrapper(*args):
            n_data = len(args) - n_replicated
            return shard_map(
                fn,
                mesh=self.mesh,
                in_specs=tuple(
                    [clip_spec]
                    + [P()] * (n_replicated - 1)
                    + [P("data")] * n_data
                ),
                out_specs=P("data"),
                check_vma=False,
            )(*args)

        return jax.jit(wrapper)

    def _place_classes(self, x):
        from ovmr_tpu.parallel import shard_batch

        return shard_batch(self.mesh, x) if self.mesh is not None else x

    @property
    def _seam_block_fn(self):
        """Block fn for code INSIDE the shard_map seams: the per-chip TP
        block under TP-pallas (params arrive as 'model' shards there),
        else the regular block_fn."""
        return self._tp_block_fn if self._tp == "pallas" else self.block_fn

    @property
    def _jit_text_classifier(self):
        if not hasattr(self, "_jit_text_classifier_fn"):
            self._jit_text_classifier_fn = self._shard_over_classes(
                lambda p, tok: ovmr.text_classifier(
                    p, self.clip_cfg, tok, attn_fn=self.attn_fn,
                    block_fn=self._seam_block_fn,
                ),
                n_replicated=1,
            )
        return self._jit_text_classifier_fn

    @property
    def _jit_heads(self):
        if not hasattr(self, "_jit_heads_fn"):

            def heads(clip_p, agg_p, feats, ptok, eot):
                n = feats.shape[0]
                prompt_embeds = jclip.embed_tokens(clip_p, ptok).astype(feats.dtype)
                vis_embeds = jnp.broadcast_to(
                    jclip.embed_tokens(clip_p, self.vis_tokens[None]).astype(
                        feats.dtype
                    ),
                    (n, self.vis_tokens.shape[0], feats.shape[-1]),
                )
                return ovmr.classifier_heads(
                    clip_p,
                    self.clip_cfg,
                    agg_p,
                    feats,
                    prompt_embeds,
                    vis_embeds,
                    eot,
                    attn_fn=self.attn_fn,
                    block_fn=self._seam_block_fn,
                )

            self._jit_heads_fn = self._shard_over_classes(heads, n_replicated=2)
        return self._jit_heads_fn

    def prepare_test(self):
        cfg = self.cfg
        if cfg.EVAL_MODE not in ("text", "vision", "multimodal", "fusion"):
            # validate before the (expensive) classifier generation
            raise ValueError(
                f"unknown EVAL_MODE {cfg.EVAL_MODE!r}; expected "
                "text | vision | multimodal | fusion"
            )
        if self.classifiers is None:
            self.generate_classifiers()
        if (
            cfg.EVAL_MODE in ("text", "fusion")
            and "text_classifier" not in self.classifiers
        ):
            raise ValueError(
                f"EVAL_MODE {cfg.EVAL_MODE!r} needs the frozen text "
                f"classifier, which was skipped at {self.n_cls} classes "
                "(the reference >=5000-class guard; the reference itself "
                "cannot eval at this scale at all). Use vision/multimodal, "
                "or raise TPU.TEXT_CLS_MAX_CLASSES to force the text head."
            )
        print(f"(eval mode: {cfg.EVAL_MODE})")

    def model_inference(self, batch, scale_no=0):
        # scale_no accepted-and-ignored, like the reference model (mm_…:294)
        logit_scale = float(np.exp(np.asarray(self.clip_params["logit_scale"])))
        feats = self._features(self.serving_params, batch["img"])
        # classifier matmul + softmax on host: tiny vs a device dispatch
        return ovmr.eval_logits_np(
            feats, self.classifiers, logit_scale, self.cfg.EVAL_MODE
        )
