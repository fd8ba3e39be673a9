"""CoOp trainer with frozen pretrained vokens — OVMR's stage-2 ("OVMR†").

Re-implements the reference ``trainers/coop_mm_classifier.py``:

- learnable context vectors (generic or class-specific), optionally
  initialized from CTX_INIT words;
- per-class FROZEN visual tokens loaded from a stage-1 ``visual_tokens.pt``;
- three prompt variants built by concatenating embeddings
  (``coop_…:158-219``):
    mm = [prefix, ctx, vokens, suffix[:-2]]
    v  = [prefix, ctx, vokens, vis_template[1+n_ctx:-2]]
    t  = [prefix, ctx, suffix]
  with EOT gather at ``argmax+2`` for mm/v (the two inserted vokens shift
  EOT) and ``argmax`` for t;
- train loss CE(mm)+CE(v)+CE(t), or CE of ONE random prompt when the class
  count exceeds 400 (``coop_…:317-337``);
- eval is always preference fusion with tau hard-coded to 10
  (``coop_…:299``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ovmr_tpu.data.prefetch import prefetch_batches
from ovmr_tpu.engine import checkpoint as ckpt
from ovmr_tpu.engine.optimizers import build_optimizer, set_lr
from ovmr_tpu.engine.schedule import lr_schedule_from_cfg
from ovmr_tpu.engine.trainer import (
    TRAINER_REGISTRY,
    TrainerBase,
    _dtype_from_cfg,
    load_or_init_clip,
)
from ovmr_tpu.models import clip as jclip
from ovmr_tpu.ops.attention import make_attn_fn
from ovmr_tpu.ops.fusion import fusion_weights_from_f1, multiclass_f1
from ovmr_tpu.ops.layers import l2_normalize
from ovmr_tpu.text import tokenize


@TRAINER_REGISTRY.register()
class CoOp(TrainerBase):
    def build_data_manager(self):
        from ovmr_tpu.data.manager import DataManager

        # multi-host: stage-2 batches are plain image rows — eligible
        # for per-host sliced decode
        return DataManager(
            self.cfg,
            allow_local_batches=True,
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
        dim = self.clip_cfg.transformer_width

        classnames = [c.replace("_", " ") for c in self.dm.dataset.classnames]
        self.n_cls = len(classnames)
        n_ctx = cfg.TRAINER.COOP.N_CTX
        ctx_init = cfg.TRAINER.COOP.CTX_INIT

        key = jax.random.PRNGKey(max(cfg.SEED, 0))
        if ctx_init:
            ctx_init = ctx_init.replace("_", " ").strip()
            n_ctx = len(ctx_init.split(" "))
            init_tokens = jnp.asarray(tokenize([ctx_init]))
            emb = jclip.embed_tokens(self.clip_params, init_tokens)
            ctx = emb[0, 1 : 1 + n_ctx, :].astype(jnp.float32)
            prompt_prefix = ctx_init
        else:
            shape = (self.n_cls, n_ctx, dim) if cfg.TRAINER.COOP.CSC else (n_ctx, dim)
            ctx = 0.02 * jax.random.normal(key, shape, jnp.float32)
            prompt_prefix = " ".join(["X"] * n_ctx)
        self.n_ctx = n_ctx
        print(f'Initial context: "{prompt_prefix}" (n_ctx={n_ctx})')

        prompts = [f"{prompt_prefix} {name}." for name in classnames]
        tokenized = tokenize(prompts)
        self.tokenized_prompts = tokenized
        self.eot_idx = jnp.asarray(tokenized.argmax(-1).astype(np.int32))
        emb = jclip.embed_tokens(self.clip_params, jnp.asarray(tokenized))
        self.token_prefix = emb[:, :1, :]
        self.token_suffix = emb[:, 1 + n_ctx :, :]

        vis_tokenized = tokenize([f"{prompt_prefix}."])
        vis_emb = jclip.embed_tokens(self.clip_params, jnp.asarray(vis_tokenized))
        # tail of the visual template after [SOT, ctx...]: [".", EOT, pad...]
        self.vis_tail = vis_emb[:, 1 + n_ctx : vis_emb.shape[1] - 2, :]

        # frozen stage-1 vokens
        vt_path = cfg.TRAINER.COOP.VISUAL_TOKEN_PATH
        if vt_path:
            import torch

            vt = torch.load(vt_path, map_location="cpu", weights_only=False)[
                "visual_tokens"
            ]
            self.visual_tokens = jnp.asarray(np.asarray(vt.float()))
        else:
            print("WARNING: no VISUAL_TOKEN_PATH; using zero vokens (CoOp-only mode)")
            self.visual_tokens = jnp.zeros((self.n_cls, 2, dim), jnp.float32)
        self.voken_len = int(self.visual_tokens.shape[1])

        self.params = {"ctx": ctx}
        self.optimizer = build_optimizer(cfg.OPTIM)
        self.opt_state = self.optimizer.init(self.params)
        self.lr_table = lr_schedule_from_cfg(cfg.OPTIM)
        self.rng = jax.random.PRNGKey(max(cfg.SEED, 0) + 7)
        self.py_rng = np.random.default_rng(max(cfg.SEED, 0))
        self.classifiers = None
        self._build_steps()

    def resume_model_if_exist(self, directory) -> int:
        self.params, self.opt_state, start_epoch = ckpt.resume_from_checkpoint(
            directory, "prompt_learner", self.params, self.opt_state,
            backend=self.cfg.TPU.CHECKPOINT_BACKEND,
        )
        return start_epoch

    # ------------------------------------------------------------------
    def _expand_ctx(self, ctx):
        if ctx.ndim == 2:
            ctx = jnp.broadcast_to(ctx[None], (self.n_cls,) + ctx.shape)
        return ctx.astype(self.dtype)

    def _build_prompts(self, params):
        """Returns (mm, v, t) prompt embedding tensors, each [n_cls, 77, D]."""
        ctx = self._expand_ctx(params["ctx"])
        prefix = self.token_prefix.astype(self.dtype)
        suffix = self.token_suffix.astype(self.dtype)
        vokens = self.visual_tokens.astype(self.dtype)
        vis_tail = jnp.broadcast_to(
            self.vis_tail.astype(self.dtype),
            (self.n_cls,) + self.vis_tail.shape[1:],
        )
        mm = jnp.concatenate([prefix, ctx, vokens, suffix[:, :-2]], axis=1)
        v = jnp.concatenate([prefix, ctx, vokens, vis_tail], axis=1)
        t = jnp.concatenate([prefix, ctx, suffix], axis=1)
        return mm, v, t

    def _text_features(self, params, clip_params=None, block_fn=None):
        from ovmr_tpu.engine.train_step import _text_tower_block_fn

        mm, v, t = self._build_prompts(params)
        # differentiated tower: fused VJP remats by construction; the XLA
        # fallback gets per-layer jax.checkpoint (1000-class 3-prompt CoOp
        # would otherwise save 86 GB of scan intermediates for backward).
        # clip_params threads through from the train step so the step's
        # operand is the single source of truth for BOTH towers.
        # `block_fn` overrides for shard_map contexts (the per-chip TP
        # block, whose custom VJP remats by construction).
        enc = partial(
            jclip.encode_text_embeds,
            self.clip_params if clip_params is None else clip_params,
            self.clip_cfg,
            attn_fn=self.attn_fn,
            block_fn=(
                block_fn
                if block_fn is not None
                else _text_tower_block_fn(self.block_fn, self.attn_fn)
            ),
        )
        shift = self.voken_len
        mm_f = l2_normalize(enc(mm, self.eot_idx + shift))
        v_f = l2_normalize(enc(v, self.eot_idx + shift))
        t_f = l2_normalize(enc(t, self.eot_idx))
        return mm_f, v_f, t_f

    def _build_steps(self):
        optimizer = self.optimizer
        ce = optax.softmax_cross_entropy_with_integer_labels
        big = self.n_cls > 400

        def local_step(params, opt_state, clip_params, images, labels,
                       prompt_ind, axis=None, block_fn=None):
            feats = l2_normalize(
                jclip.encode_image(
                    clip_params, self.clip_cfg, images, attn_fn=self.attn_fn,
                    block_fn=block_fn if block_fn is not None else self.block_fn,
                )
            ).astype(jnp.float32)
            scale = jnp.exp(clip_params["logit_scale"]).astype(jnp.float32)

            def loss_fn(p):
                mm_f, v_f, t_f = self._text_features(
                    p, clip_params, block_fn=block_fn
                )
                fs = [mm_f, v_f, t_f]
                if big:
                    f = fs[prompt_ind]
                    logits = scale * feats @ f.astype(jnp.float32).T
                    return ce(logits, labels).mean(), logits
                total = 0.0
                acc_logits = None
                for f in fs:
                    logits = scale * feats @ f.astype(jnp.float32).T
                    if acc_logits is None:
                        acc_logits = logits  # mm: the reference's acc basis
                    total = total + ce(logits, labels).mean()
                return total, acc_logits

            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            # percent, over the logits the reference feeds compute_accuracy
            # (mm logits, or the chosen prompt's in the >400-class regime —
            # coop_…:427-430)
            acc = (logits.argmax(1) == labels).mean() * 100.0
            if axis is not None:
                # image batch shards over 'data' (the reference wraps this
                # trainer in nn.DataParallel, coop_…:402-405); text features
                # replicate, so only loss/grads need the mean
                loss = jax.lax.pmean(loss, axis)
                acc = jax.lax.pmean(acc, axis)
                grads = jax.lax.pmean(grads, axis)
            updates, new_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_state, loss, acc

        step = partial(jax.jit, static_argnames=("prompt_ind",))(local_step)

        # shared mesh/TP policy with MM_CLS_OP: TP (model>1) is the
        # plain-jit GSPMD route — tower params TP-place (Megatron-style
        # MLP split), Pallas block AND attention kernels gate off loudly
        # (no SPMD rule); the differentiated text tower keeps per-layer
        # remat on the XLA path (_text_tower_block_fn), so memory stays
        # feasible
        from ovmr_tpu.engine.trainer import setup_trainer_mesh, tp_seam_tools

        (self.mesh, self._tp, self.clip_params, self.block_fn,
         self.attn_fn) = setup_trainer_mesh(
            self.cfg, self.clip_params, self.block_fn, self.attn_fn,
            label="CoOp", clip_cfg=self.clip_cfg,
        )
        self._tp_block_fn, self._clip_specs = tp_seam_tools(
            self.mesh, self._tp, self.clip_params
        )
        if self.mesh is not None and self._tp != "gspmd":
            from jax.sharding import PartitionSpec as P
            from jax import shard_map

            # TP-pallas: same shard_map region manual over BOTH axes —
            # tower shards enter per clip_specs and the per-chip TP block
            # (fused kernels on each head/hidden shard, fp32 psum over
            # 'model') replaces the single-chip block
            clip_in = self._clip_specs if self._tp == "pallas" else P()
            smap_block = self._tp_block_fn  # None on the data-only mesh

            @partial(jax.jit, static_argnames=("prompt_ind",))
            def sharded_step(params, opt_state, clip_params, images,
                             labels, prompt_ind):
                fn = shard_map(
                    partial(local_step, prompt_ind=prompt_ind,
                            axis="data", block_fn=smap_block),
                    mesh=self.mesh,
                    in_specs=(P(), P(), clip_in, P("data"), P("data")),
                    out_specs=(P(), P(), P(), P()),
                    check_vma=False,
                )
                return fn(params, opt_state, clip_params, images, labels)

            self._step_sharded = sharded_step

        self._step = step
        self._jit_text_features = jax.jit(self._text_features)
        from ovmr_tpu.engine.trainer import make_feature_extractor

        self._features = make_feature_extractor(
            self.clip_cfg, self.attn_fn, self.dtype,
            self.cfg.INPUT.PIXEL_MEAN, self.cfg.INPUT.PIXEL_STD,
            self.cfg.DATALOADER.TEST.BATCH_SIZE,
            # the TP route needs the mesh so eval encode partitions over
            # 'model' too; the data-only mesh keeps the single-program
            # encode (stage-2 eval sets are small — cheap path)
            mesh=self.mesh if self._tp else None,
            block_fn=self.block_fn,
            u8_normalize=("normalize" in self.cfg.INPUT.TRANSFORMS),
            tp_block_fn=self._tp_block_fn,
            clip_specs=self._clip_specs,
        )

    # ------------------------------------------------------------------
    def before_epoch(self):
        self.opt_state = set_lr(self.opt_state, self.lr_table[self.epoch])

    def forward_backward(self, batch):
        prompt_ind = int(self.py_rng.integers(0, 3)) if self.n_cls > 400 else 0
        # multi-host sliced batch: this process decoded only its rows —
        # assemble the global batch straight from the HOST arrays (no
        # device round trip)
        local = bool(batch.get("_local", False)) and jax.process_count() > 1
        step = self._step
        if local:
            from ovmr_tpu.parallel import place_local_batch

            images, labels = place_local_batch(
                self.mesh,
                np.asarray(batch["img"], self.dtype),
                batch["label"].astype(np.int32),
            )
            if self._tp != "gspmd":
                step = self._step_sharded
            self.params, self.opt_state, loss, acc = step(
                self.params, self.opt_state, self.clip_params, images,
                labels, prompt_ind,
            )
            return {
                "loss": float(loss), "acc": float(acc),
                "lr": self.lr_table[self.epoch],
            }
        images = jnp.asarray(batch["img"], self.dtype)
        labels = jnp.asarray(batch["label"].astype(np.int32))
        if self.mesh is not None:
            # the batch shards over 'data' only — divisibility by the data
            # axis is the requirement, not the full device count. Ragged
            # tail batches run replicated (loudly). The step differs by
            # route: TP keeps the plain-jit GSPMD program (TP-placed
            # params travel with their shardings); data-parallel switches
            # to the shard_map step.
            data_size = dict(self.mesh.shape)["data"]
            if images.shape[0] % data_size == 0:
                from ovmr_tpu.parallel import shard_batch

                images = shard_batch(self.mesh, images)
                labels = shard_batch(self.mesh, labels)
                if self._tp != "gspmd":
                    step = self._step_sharded
            elif not getattr(self, "_warned_unsharded", False):
                self._warned_unsharded = True
                print(
                    f"WARNING: CoOp batch {images.shape[0]} not divisible "
                    f"by the data axis ({data_size}) runs replicated over "
                    "'data'; choose BATCH_SIZE divisible by the mesh"
                )
        self.params, self.opt_state, loss, acc = step(
            self.params, self.opt_state, self.clip_params, images, labels,
            prompt_ind,
        )
        return {
            "loss": float(loss), "acc": float(acc),
            "lr": self.lr_table[self.epoch],
        }

    def save_model(self, epoch, model_name=""):
        ckpt.save_checkpoint(
            self.output_dir, "prompt_learner", epoch, self.params,
            self.opt_state, model_name=model_name,
            backend=self.cfg.TPU.CHECKPOINT_BACKEND,
        )

    def load_model(self, directory, epoch=None):
        if not directory:
            return
        params, _, ep = ckpt.load_checkpoint(
            directory, "prompt_learner", self.params, None, epoch=epoch,
            torch_converter=_ctx_from_torch,
            backend=self.cfg.TPU.CHECKPOINT_BACKEND,
        )
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        print(f'Loaded ctx vectors from "{directory}" (epoch = {ep})')

    # ------------------------------------------------------------------
    def get_fusion_weight(self, mm_f, v_f, t_f):
        """Per-class F1 on the exemplar set -> softmax(10 * F1)
        (reference ``coop_…:235-305``; tau hard-coded 10).

        Groups by the loader's actual per-class group size (DATASET.NUM_SHOTS,
        the eval_set_loader contract) rather than the reference's
        TEST.N_INS — the two are equal in every shipped config, and using
        the loader's size avoids silently mixing classes when they differ."""
        cfg = self.cfg
        shots = max(cfg.DATASET.NUM_SHOTS, 1)
        dim = self.clip_cfg.embed_dim
        from ovmr_tpu.engine.trainer import collect_exemplar_features

        feats = collect_exemplar_features(
            self.dm.eval_set_loader, self._features, self.clip_params,
            self.n_cls, shots, dim,
        )
        # round the cross-validation features through the compute dtype —
        # the reference stores them half precision (``mm_…:224``); same
        # policy as MM_CLS_OP.generate_classifiers
        feats = np.asarray(jnp.asarray(feats, self.dtype), np.float32)

        scale = float(np.exp(np.asarray(self.clip_params["logit_scale"])))
        flat = feats.reshape(-1, dim)
        labels = np.repeat(np.arange(self.n_cls), shots)
        f1s = []
        for cls in (mm_f, v_f, t_f):
            logits = scale * flat @ np.asarray(cls, np.float32).T
            f1s.append(
                np.asarray(
                    multiclass_f1(jnp.asarray(logits), jnp.asarray(labels), self.n_cls)
                )
            )
        return np.asarray(
            fusion_weights_from_f1(
                jnp.asarray(f1s[0]), jnp.asarray(f1s[1]), jnp.asarray(f1s[2]), 10.0
            )
        )

    def prepare_test(self):
        mm_f, v_f, t_f = (
            np.asarray(f, np.float32)
            for f in self._jit_text_features(self.params)
        )
        # the reference computes the fusion weight ONCE and reuses it for
        # every later eval (``coop_…:348-349`` `if self.fusion_weight is
        # None`); the classifiers themselves refresh with the current ctx
        if getattr(self, "_fusion_weight_cache", None) is None:
            self._fusion_weight_cache = self.get_fusion_weight(mm_f, v_f, t_f)
        self.classifiers = {
            "mm_classifier": mm_f,
            "vision_classifier": v_f,
            "text_classifier": t_f,
            "fusion_weight": self._fusion_weight_cache,
        }
        print("(eval mode: CoOp fusion)")

    def model_inference(self, batch, scale_no=0):
        # scale_no accepted-and-ignored, like the reference (coop_…:307)
        from ovmr_tpu.models.ovmr import eval_logits_np

        scale = float(np.exp(np.asarray(self.clip_params["logit_scale"])))
        feats = self._features(self.clip_params, batch["img"])
        return eval_logits_np(feats, self.classifiers, scale, "fusion")


# reachable under the reference's config-directory name too: scripts that
# pair TRAINER=MM_CLS with configs/trainers/MM_CLS/*.yaml resolve here
TRAINER_REGISTRY.register_alias("MM_CLS", CoOp)


def _ctx_from_torch(path):
    """Reference CoOp ``model.pth.tar-*`` -> our {"ctx"} param pytree."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload.get("state_dict", payload)
    return {"ctx": np.asarray(sd["ctx"].float().numpy(), np.float32)}, int(
        payload.get("epoch", 0)
    )
