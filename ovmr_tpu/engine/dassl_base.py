"""Generic backbone+head trainers (reference ``dassl/engine/trainer.py``:
``SimpleNet``/``SimpleTrainer``/``TrainerX``/``TrainerXU``).

These power the DA/DG/SSL trainer families (``ovmr_tpu.engine.{da,dg,ssl}``)
the reference vendors but never exercises from OVMR — here they are live:
each trainer compiles ONE jitted train step over pytree state
``{"params", "batch_stats", "opt_state"}`` (BatchNorm statistics thread
functionally through the step; no host round-trips besides the loss
fetch), reuses the epoch loop / checkpoint / eval machinery of
:class:`ovmr_tpu.engine.trainer.TrainerBase`, and the npz checkpoint
format of :mod:`ovmr_tpu.engine.checkpoint` (one subdir per registered
model, pointer files — ``torchtools.py`` semantics).

Host images arrive NCHW float32 (the data layer's reference-shaped
batches) and are transposed once to NHWC — the TPU conv layout every
``ovmr_tpu.modeling`` backbone uses.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ovmr_tpu.engine import checkpoint as ckpt
from ovmr_tpu.engine.optimizers import build_optimizer, set_lr
from ovmr_tpu.engine.schedule import lr_schedule_from_cfg
from ovmr_tpu.engine.trainer import TrainerBase
from ovmr_tpu.modeling import build_backbone, build_head
from ovmr_tpu.modeling import ops as F
from ovmr_tpu.data.prefetch import prefetch_batches
from ovmr_tpu.parallel import (batch_sharding, build_mesh, from_host,
                               replicate, replicated, to_host)


class SimpleNet(nn.Module):
    """Backbone (+ optional mlp head) (+ optional linear classifier)
    (reference ``dassl/engine/trainer.py:22-74``)."""

    backbone: nn.Module
    head: Optional[nn.Module]
    num_classes: int

    @property
    def fdim(self) -> int:
        return (self.head or self.backbone).out_features

    @nn.compact
    def __call__(self, x, train: bool = False, return_feature: bool = False):
        f = self.backbone(x, train=train)
        if self.head is not None:
            f = self.head(f, train=train)
        if self.num_classes <= 0:
            return f
        y = nn.Dense(self.num_classes, name="classifier")(f)
        if return_feature:
            return y, f
        return y


def build_simplenet(cfg, model_cfg, num_classes: int, **kwargs) -> SimpleNet:
    backbone = build_backbone(
        model_cfg.BACKBONE.NAME,
        verbose=cfg.VERBOSE,
        pretrained=model_cfg.BACKBONE.PRETRAINED,
        **kwargs,
    )
    head = None
    if model_cfg.HEAD.NAME and model_cfg.HEAD.HIDDEN_LAYERS:
        head = build_head(
            model_cfg.HEAD.NAME,
            verbose=cfg.VERBOSE,
            in_features=backbone.out_features,
            hidden_layers=model_cfg.HEAD.HIDDEN_LAYERS,
            activation=model_cfg.HEAD.ACTIVATION,
            bn=model_cfg.HEAD.BN,
            dropout=model_cfg.HEAD.DROPOUT,
        )
    return SimpleNet(backbone, head, num_classes)


def nchw_to_nhwc(img: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(img, (0, 2, 3, 1)))


class LinearHead(nn.Module):
    """A bare linear classifier registered as its own model (MCD's C1/C2)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.Dense(self.num_classes, name="fc")(x)


class Critic(nn.Module):
    """Domain critic: mlp body + scalar logit head (reference DANN/ADDA
    ``build_critic``)."""

    fdim: int
    hidden: tuple

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ovmr_tpu.modeling.layers import TorchBatchNorm

        for i, dim in enumerate(self.hidden):
            x = nn.Dense(dim, name=f"fc{i}")(x)
            x = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.leaky_relu(x, 0.01)
        return nn.Dense(1, name="logit")(x)


class Prototypes(nn.Module):
    """Temperature-scaled cosine classifier (reference MME/CDAC
    ``Prototypes``); ``reverse`` applies the GRL before normalization."""

    fdim: int
    num_classes: int
    temp: float = 0.05

    @nn.compact
    def __call__(self, x, reverse: bool = False, grad_scaling: float = 1.0,
                 train: bool = False):
        if reverse:
            x = F.reverse_grad(x, grad_scaling)
        # torch F.normalize semantics: eps clamp keeps an all-zero row
        # (dead ReLU features early in training) a zero vector instead
        # of NaN-ing the whole batch
        norm = jnp.linalg.norm(x, axis=1, keepdims=True)
        x = x / jnp.maximum(norm, 1e-12)
        return nn.Dense(self.num_classes, use_bias=False,
                        name="prototypes")(x) / self.temp


class StackedLinears(nn.Module):
    """K per-domain linear classifiers as stacked parameters ``[K, fdim,
    C]`` so a traced domain index selects an expert without recompiling
    (the reference's ``nn.ModuleList`` indexes with a host int; on TPU a
    gather over the stacked weights keeps ONE compiled step for any
    domain order)."""

    n_source: int
    fdim: int
    num_classes: int
    softmax: bool = False

    @nn.compact
    def __call__(self, i, x):
        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.n_source, self.fdim, self.num_classes),
        )
        b = self.param(
            "bias", nn.initializers.zeros,
            (self.n_source, self.num_classes),
        )
        out = x @ w[i] + b[i]
        return nn.softmax(out, axis=1) if self.softmax else out


def load_init_weights(state: dict, path: str):
    """Load ``MODEL.INIT_WEIGHTS`` (an npz written by
    :func:`ovmr_tpu.engine.checkpoint.save_checkpoint`) into a model state
    (reference ``load_pretrained_weights``)."""
    data = np.load(path)
    sep = ckpt.SEP
    flat = {
        k[len("params" + sep):]: data[k]
        for k in data.files
        if k.startswith("params" + sep)
    }
    tree = ckpt._unflatten_like(
        {"params": state["params"], "batch_stats": state["batch_stats"]},
        flat,
    )
    state["params"] = tree["params"]
    state["batch_stats"] = tree["batch_stats"]
    print(f"Loaded init weights from {path}")
    return state


def setup_dassl_mesh(cfg, label=""):
    """Data-parallel mesh policy for the SimpleNet trainer families.

    The reference's only parallelism here is single-process
    ``nn.DataParallel`` (``dassl/engine/trainer.py`` SimpleTrainer). The
    TPU-native equivalent: batches shard over the mesh 'data' axis, model
    states replicate, and every jitted multi-phase step partitions under
    GSPMD — the gradient all-reduce and GLOBAL BatchNorm statistics come
    out of the compiler, so numerics are identical to the single-device
    program (unlike DataParallel's per-replica BN). ``TPU.MESH.DATA == 1``
    opts out; ``MODEL > 1`` has no tensor-parallel meaning for these small
    CNN backbones and only warns.
    """
    if jax.device_count() <= 1 or cfg.TPU.MESH.DATA == 1:
        return None
    if cfg.TPU.MESH.MODEL > 1:
        print(
            f"WARNING: TPU.MESH.MODEL={cfg.TPU.MESH.MODEL} has no "
            "tensor-parallel meaning for SimpleNet backbones; using the "
            "data axis only"
        )
    mesh = build_mesh(cfg.TPU.MESH.DATA, 1)
    print(f"{label}data-parallel mesh: {dict(mesh.shape)}")
    return mesh


RNG_STREAMS = ("dropout", "mixstyle")


def apply_train(net, params, batch_stats, x, rng, **kwargs):
    """Train-mode apply with threaded BN stats; returns (out, new_stats)."""
    ks = jax.random.split(rng, len(RNG_STREAMS))
    out, new_state = net.apply(
        {"params": params, "batch_stats": batch_stats},
        x,
        train=True,
        rngs=dict(zip(RNG_STREAMS, ks)),
        mutable=["batch_stats"],
        **kwargs,
    )
    return out, new_state["batch_stats"]


def apply_eval(net, state, x, **kwargs):
    return net.apply(
        {"params": state["params"], "batch_stats": state["batch_stats"]},
        x,
        train=False,
        **kwargs,
    )


class DasslTrainer(TrainerBase):
    """Base for SimpleNet-family trainers. Subclasses implement
    ``forward_backward(batch)`` (TrainerX) or ``forward_backward(batch_x,
    batch_u)`` semantics via :class:`TrainerXU`'s epoch loop."""

    # multi-host: this trainer consumes train batches row-wise, so each
    # process may decode only its slice of the global batch (the sliced
    # loader marks batches "_local" and `_shard` re-assembles them).
    # Trainers whose HOST-side logic needs the whole batch opt out.
    SUPPORTS_LOCAL_BATCHES = True

    def build_data_manager(self):
        from ovmr_tpu.data.manager import DataManager

        return DataManager(
            self.cfg,
            allow_local_batches=type(self).SUPPORTS_LOCAL_BATCHES,
        )

    def __init__(self, cfg):
        self.check_cfg(cfg)
        self._models: Dict[str, dict] = {}  # name -> state pytree dict
        self._nets: Dict[str, nn.Module] = {}
        self._txs: Dict[str, optax.GradientTransformation] = {}
        self._infer_cache = {}
        seed = max(cfg.SEED, 0)
        self._rng = jax.random.PRNGKey(seed)
        self._step_count = 0
        self.mesh = setup_dassl_mesh(cfg, label=f"{type(self).__name__}: ")
        super().__init__(cfg)

    # -- hooks ------------------------------------------------------------
    def check_cfg(self, cfg):
        pass

    @property
    def num_classes(self):
        return self.dm.num_classes

    @property
    def num_source_domains(self):
        return self.dm.num_source_domains

    # -- model registry (reference TrainerBase.register_model) ------------
    def register_model(self, name, net, state, tx=None):
        assert name not in self._models, "Found duplicate model names"
        if self.mesh is not None:
            # replicate the whole state pytree (params/batch_stats/
            # opt_state) so every jitted step sees committed replicated
            # arrays and GSPMD partitions along the sharded batch inputs
            state = replicate(self.mesh, state)
        self._models[name] = state
        self._nets[name] = net
        self._txs[name] = tx

    def _shard(self, x, axis: int = 0, local: bool = False):
        """Host batch array -> device. With a mesh: shard ``axis`` over
        'data' when divisible (otherwise replicate — still correct, just
        not distributed, e.g. a ragged final eval batch). Placement rides
        the multi-process-aware helpers (`from_host`), never raw
        device_put — device_put cannot reach non-addressable devices on
        a multi-host mesh. ``local=True`` means ``x`` holds only THIS
        process's rows (sliced loader) and the global array is assembled
        cross-process."""
        if local and jax.process_count() > 1:
            from ovmr_tpu.parallel import place_local_batch

            # raises loudly when mesh is None (shared guard)
            return place_local_batch(self.mesh, np.asarray(x), axis=axis)[0]
        if self.mesh is None:
            return jnp.asarray(x)
        x = np.asarray(x)
        n = self.mesh.shape["data"]
        if x.ndim and x.shape[axis] % n == 0 and x.shape[axis] > 0:
            return from_host(x, batch_sharding(self.mesh, x.ndim, axis))
        return from_host(x, replicated(self.mesh))

    def get_model_names(self):
        return list(self._models)

    def init_net(self, net, input_shape=None, train: bool = False) -> dict:
        """Initialize a flax net -> ``{"params", "batch_stats"}`` (empty
        batch_stats dict when the net has none)."""
        if input_shape is None:
            h, w = self.cfg.INPUT.SIZE
            input_shape = (2, h, w, 3)
        rngs = {"params": self._next_rng()}
        variables = net.init(rngs, jnp.zeros(input_shape, jnp.float32),
                             train=train)
        return {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }

    def _next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def step_rng(self):
        """Per-step PRNG key (folded over the global step counter so
        resumed runs continue the stream deterministically)."""
        self._step_count += 1
        return jax.random.fold_in(self._rng, self._step_count)

    # -- default build: one SimpleNet + optimizer + schedule ---------------
    def build_model(self):
        cfg = self.cfg
        print("Building model")
        self.net = build_simplenet(cfg, cfg.MODEL, self.dm.num_classes)
        state = self.init_net(self.net)
        if cfg.MODEL.INIT_WEIGHTS:
            load_init_weights(state, cfg.MODEL.INIT_WEIGHTS)
        n_params = sum(
            int(np.prod(np.shape(p))) for p in jax.tree_util.tree_leaves(state["params"])
        )
        print(f"# params: {n_params:,}")
        self.tx = build_optimizer(cfg.OPTIM)
        state["opt_state"] = self.tx.init(state["params"])
        self.register_model("model", self.net, state, self.tx)
        self.lr_table = lr_schedule_from_cfg(cfg.OPTIM)
        self._build_steps()

    def _build_steps(self):
        """Compile the trainer's jitted step function(s). The default is a
        plain supervised CE step (reference TrainerX/Vanilla)."""
        self.train_step = self.make_supervised_step()

    @property
    def state(self) -> dict:
        return self._models["model"]

    @state.setter
    def state(self, value: dict):
        self._models["model"] = value

    # -- generic jitted steps ----------------------------------------------
    def make_supervised_step(self, label_smooth: float = 0.0):
        net, tx = self.net, self.tx

        @jax.jit
        def step(state, img, label, rng):
            def loss_fn(params):
                out, bs = apply_train(net, params, state["batch_stats"], img, rng)
                loss = F.cross_entropy(out, label, label_smooth)
                return loss, (out, bs)

            (loss, (out, bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state["params"])
            updates, opt_state = tx.update(
                grads, state["opt_state"], state["params"]
            )
            params = optax.apply_updates(state["params"], updates)
            acc = (out.argmax(1) == label).mean() * 100.0  # percent (reference compute_accuracy)
            new_state = {
                "params": params, "batch_stats": bs, "opt_state": opt_state
            }
            return new_state, {"loss": loss, "acc": acc}

        return step

    # -- epoch/step plumbing ----------------------------------------------
    def before_epoch(self):
        for name in self._models:
            st = self._models[name]
            if st.get("opt_state") is not None:
                st["opt_state"] = set_lr(
                    st["opt_state"], self.lr_table[self.epoch]
                )

    def parse_batch_train(self, batch):
        local = bool(batch.get("_local", False))
        img = self._shard(nchw_to_nhwc(batch["img"]), local=local)
        label = self._shard(batch["label"], local=local)
        domain = self._shard(
            batch.get("domain", np.zeros_like(batch["label"])), local=local
        )
        return img, label, domain

    def forward_backward(self, batch):
        img, label, _ = self.parse_batch_train(batch)
        self.state, metrics = self.train_step(
            self.state, img, label, self.step_rng()
        )
        return {k: float(v) for k, v in metrics.items()}

    # -- inference / eval --------------------------------------------------
    def eval_images(self, batch):
        """Eval batches arrive either NCHW float (host-normalized) or HWC
        uint8 (``TPU.EVAL_UINT8_TRANSFER`` ships raw bytes; normalize on
        device — 4x smaller transfers, identical numerics)."""
        img = batch["img"]
        if img.dtype == np.uint8:
            x = self._shard(img).astype(jnp.float32) / 255.0
            if "normalize" in self.cfg.INPUT.TRANSFORMS:
                mean = jnp.asarray(self.cfg.INPUT.PIXEL_MEAN)
                std = jnp.asarray(self.cfg.INPUT.PIXEL_STD)
                x = (x - mean) / std
            return x
        return self._shard(nchw_to_nhwc(img))

    def model_inference(self, batch, scale_no=0):
        # default: infer with the FIRST registered model (the label
        # net — "model", or "F" for the F/D/G-style trainers); ensemble
        # trainers (MCD, MME, M3SDA, DAEL...) override
        x = self.eval_images(batch)
        name = next(iter(self._models))
        if name not in self._infer_cache:
            net = self._nets[name]
            self._infer_cache[name] = jax.jit(
                lambda st, xx: apply_eval(net, st, xx)
            )
        out = self._infer_cache[name](
            {k: self._models[name][k] for k in ("params", "batch_stats")}, x
        )
        return to_host(out)

    # -- checkpointing (npz subdir-per-model + pointer) --------------------
    def _model_state_tree(self, name):
        st = self._models[name]
        return {"params": st["params"], "batch_stats": st["batch_stats"]}

    def save_model(self, epoch, model_name=""):
        for name in self._models:
            ckpt.save_checkpoint(
                self.output_dir,
                name,
                epoch,
                self._model_state_tree(name),
                opt_state=self._models[name].get("opt_state"),
                model_name=model_name,
                backend=self.cfg.TPU.CHECKPOINT_BACKEND,
            )

    def resume_model_if_exist(self, directory) -> int:
        start = 0
        for name in self._models:
            tree, opt_state, epoch = ckpt.resume_from_checkpoint(
                directory,
                name,
                self._model_state_tree(name),
                self._models[name].get("opt_state"),
                backend=self.cfg.TPU.CHECKPOINT_BACKEND,
            )
            self._models[name]["params"] = tree["params"]
            self._models[name]["batch_stats"] = tree["batch_stats"]
            if opt_state is not None:
                self._models[name]["opt_state"] = opt_state
            if self.mesh is not None:
                self._models[name] = replicate(self.mesh, self._models[name])
            start = max(start, epoch)
        return start

    def load_model(self, directory, epoch=None):
        if not directory:
            print(
                "Note that load_model() is skipped as no pretrained "
                "model is given (ignore this if it's done on purpose)"
            )
            return
        for name in self._models:
            tree, _, ep = ckpt.load_checkpoint(
                directory,
                name,
                self._model_state_tree(name),
                epoch=epoch,
            )
            self._models[name]["params"] = tree["params"]
            self._models[name]["batch_stats"] = tree["batch_stats"]
            if self.mesh is not None:
                self._models[name] = replicate(self.mesh, self._models[name])
            print(f"Load model '{name}' from {directory} (epoch={ep})")


class TrainerX(DasslTrainer):
    """Labeled-only epoch loop — inherited from TrainerBase unchanged
    (reference ``dassl/engine/trainer.py:620-674``)."""


class TrainerXU(DasslTrainer):
    """Dual labeled/unlabeled epoch loop (reference
    ``dassl/engine/trainer.py:530-617``): iterate ``TRAIN.COUNT_ITER``
    batches per epoch, restarting whichever loader exhausts first.
    Subclasses implement ``forward_backward_xu(batch_x, batch_u)``."""

    def forward_backward_xu(self, batch_x, batch_u):
        raise NotImplementedError

    def run_epoch(self):
        import datetime
        import time

        from ovmr_tpu.utils.meters import AverageMeter, MetricMeter

        cfg = self.cfg
        loader_x = self.dm.train_loader_x
        loader_u = self.dm.train_loader_u
        if loader_u is None:
            raise RuntimeError(
                f"{type(self).__name__} needs an unlabeled split "
                "(dataset.train_u is empty)"
            )
        len_x, len_u = len(loader_x), len(loader_u)
        if cfg.TRAIN.COUNT_ITER == "train_x":
            num_batches = len_x
        elif cfg.TRAIN.COUNT_ITER == "train_u":
            num_batches = len_u
        elif cfg.TRAIN.COUNT_ITER == "smaller_one":
            num_batches = min(len_x, len_u)
        else:
            raise ValueError(cfg.TRAIN.COUNT_ITER)
        self.num_batches = num_batches

        losses = MetricMeter()
        batch_time = AverageMeter()
        data_time = AverageMeter()

        iter_x = iter(prefetch_batches(loader_x))
        iter_u = iter(prefetch_batches(loader_u))
        end = time.time()
        for self.batch_idx in range(num_batches):
            try:
                batch_x = next(iter_x)
            except StopIteration:
                iter_x = iter(prefetch_batches(loader_x))
                batch_x = next(iter_x)
            try:
                batch_u = next(iter_u)
            except StopIteration:
                iter_u = iter(prefetch_batches(loader_u))
                batch_u = next(iter_u)
            data_time.update(time.time() - end)
            loss_summary = self.forward_backward_xu(batch_x, batch_u)
            batch_time.update(time.time() - end)
            if loss_summary:
                loss_val = loss_summary.get("loss")
                if loss_val is not None and not np.isfinite(loss_val):
                    raise FloatingPointError(
                        f"non-finite loss {loss_val} at epoch {self.epoch} "
                        f"batch {self.batch_idx}"
                    )
                losses.update(loss_summary)
                step = self.epoch * num_batches + self.batch_idx
                for k, v in loss_summary.items():
                    self.write_scalar(f"train/{k}", v, step)
            if (
                (self.batch_idx + 1) % cfg.TRAIN.PRINT_FREQ == 0
                or num_batches < cfg.TRAIN.PRINT_FREQ
            ):
                nb_remain = (num_batches - self.batch_idx - 1) + (
                    self.max_epoch - self.epoch - 1
                ) * num_batches
                eta = datetime.timedelta(
                    seconds=int(batch_time.avg * nb_remain)
                )
                print(
                    f"epoch [{self.epoch + 1}/{self.max_epoch}]"
                    f"[{self.batch_idx + 1}/{num_batches}]\t"
                    f"time {batch_time.val:.3f} ({batch_time.avg:.3f})\t"
                    f"data {data_time.val:.3f} ({data_time.avg:.3f})\t"
                    f"{losses}\teta {eta}"
                )
            end = time.time()

    def forward_backward(self, batch):  # pragma: no cover - XU loop only
        raise RuntimeError("TrainerXU drives forward_backward_xu")
