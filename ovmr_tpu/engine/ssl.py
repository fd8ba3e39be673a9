"""Semi-supervised trainers (reference ``dassl/engine/ssl/``):
SupBaseline, EntMin, MeanTeacher, MixMatch, FixMatch.

Each compiles one jitted step over ``{"params", "batch_stats",
"opt_state"}`` plus any auxiliary state (MeanTeacher's EMA teacher). Loss
recipes match the reference files line for line; stochasticity (mixup
Beta draws, dropout) rides explicit PRNG keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ovmr_tpu.data.manager import DataManager
from ovmr_tpu.data.transforms import build_transform
from ovmr_tpu.engine.dassl_base import (
    TrainerXU,
    apply_train,
    nchw_to_nhwc,
)
from ovmr_tpu.engine.trainer import TRAINER_REGISTRY
from ovmr_tpu.modeling import ops as F


@TRAINER_REGISTRY.register()
class SupBaseline(TrainerXU):
    """Supervised baseline: labeled batch only (reference
    ``ssl/sup_baseline.py``)."""

    def forward_backward_xu(self, batch_x, batch_u):
        img, label, _ = self.parse_batch_train(batch_x)
        self.state, metrics = self.train_step(
            self.state, img, label, self.step_rng()
        )
        return {k: float(v) for k, v in metrics.items()}


@TRAINER_REGISTRY.register()
class EntMin(TrainerXU):
    """Entropy minimization on the unlabeled batch (reference
    ``ssl/entmin.py``; Grandvalet & Bengio, NeurIPS'04)."""

    def _build_steps(self):
        net, tx = self.net, self.tx
        lmda = float(self.cfg.TRAINER.ENTMIN.LMDA)

        @jax.jit
        def step(state, img_x, label_x, img_u, rng):
            def loss_fn(params):
                out_x, bs = apply_train(
                    net, params, state["batch_stats"], img_x, rng
                )
                loss_x = F.cross_entropy(out_x, label_x)
                logits_u, bs = apply_train(net, params, bs, img_u, rng)
                p_u = jax.nn.softmax(logits_u, axis=1)
                loss_u = (-p_u * jnp.log(p_u + 1e-5)).sum(1).mean()
                loss = loss_x + loss_u * lmda
                return loss, (out_x, loss_x, loss_u, bs)

            (_, (out_x, loss_x, loss_u, bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state["params"])
            updates, opt_state = tx.update(
                grads, state["opt_state"], state["params"]
            )
            params = optax.apply_updates(state["params"], updates)
            acc = (out_x.argmax(1) == label_x).mean() * 100.0  # percent (reference compute_accuracy)
            return (
                {"params": params, "batch_stats": bs, "opt_state": opt_state},
                {"loss_x": loss_x, "acc_x": acc, "loss_u": loss_u},
            )

        self.train_step = step

    def forward_backward_xu(self, batch_x, batch_u):
        img_x, label_x, _ = self.parse_batch_train(batch_x)
        img_u, _, _ = self.parse_batch_train(batch_u)
        self.state, metrics = self.train_step(
            self.state, img_x, label_x, img_u, self.step_rng()
        )
        out = {k: float(v) for k, v in metrics.items()}
        out["loss"] = out["loss_x"]  # for the NaN guard / meters headline
        return out


@TRAINER_REGISTRY.register()
class MeanTeacher(TrainerXU):
    """Mean-teacher consistency (reference ``ssl/mean_teacher.py``):
    student CE + MSE to an EMA teacher kept in TRAIN mode (live batch
    statistics, running stats updated by its own forwards — only the
    parameters are EMA'd, exactly like ``ema_model_update``)."""

    def build_model(self):
        super().build_model()
        self.teacher = {
            "params": jax.tree_util.tree_map(
                jnp.asarray, self.state["params"]
            ),
            "batch_stats": jax.tree_util.tree_map(
                jnp.asarray, self.state["batch_stats"]
            ),
        }

    def _build_steps(self):
        net, tx = self.net, self.tx
        t_cfg = self.cfg.TRAINER.MEANTEACHER
        weight_cap = float(t_cfg.WEIGHT_U)

        @jax.jit
        def step(state, teacher, img_x, label_x, img_u, weight_u,
                 ema_alpha, rng):
            rng_t, rng_s = jax.random.split(rng)
            target_u, t_bs = apply_train(
                net, teacher["params"], teacher["batch_stats"], img_u, rng_t
            )
            target_u = jax.nn.softmax(target_u, axis=1)

            def loss_fn(params):
                logit_x, bs = apply_train(
                    net, params, state["batch_stats"], img_x, rng_s
                )
                loss_x = F.cross_entropy(logit_x, label_x)
                logit_u, bs = apply_train(net, params, bs, img_u, rng_s)
                prob_u = jax.nn.softmax(logit_u, axis=1)
                loss_u = ((prob_u - target_u) ** 2).sum(1).mean()
                loss = loss_x + loss_u * weight_u
                return loss, (logit_x, loss_x, loss_u, bs)

            (_, (logit_x, loss_x, loss_u, bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state["params"])
            updates, opt_state = tx.update(
                grads, state["opt_state"], state["params"]
            )
            params = optax.apply_updates(state["params"], updates)
            new_teacher = {
                "params": F.ema_update(teacher["params"], params, ema_alpha),
                "batch_stats": t_bs,
            }
            acc = (logit_x.argmax(1) == label_x).mean() * 100.0  # percent (reference compute_accuracy)
            return (
                {"params": params, "batch_stats": bs, "opt_state": opt_state},
                new_teacher,
                {"loss_x": loss_x, "acc_x": acc, "loss_u": loss_u},
            )

        self._mt_step = step
        self._weight_cap = weight_cap

    def forward_backward_xu(self, batch_x, batch_u):
        t_cfg = self.cfg.TRAINER.MEANTEACHER
        img_x, label_x, _ = self.parse_batch_train(batch_x)
        img_u, _, _ = self.parse_batch_train(batch_u)
        weight_u = self._weight_cap * F.sigmoid_rampup(
            self.epoch, int(t_cfg.RAMPUP)
        )
        global_step = self.batch_idx + self.epoch * self.num_batches
        ema_alpha = min(1 - 1 / (global_step + 1), float(t_cfg.EMA_ALPHA))
        self.state, self.teacher, metrics = self._mt_step(
            self.state, self.teacher, img_x, label_x, img_u,
            jnp.float32(weight_u), jnp.float32(ema_alpha), self.step_rng(),
        )
        out = {k: float(v) for k, v in metrics.items()}
        out["loss"] = out["loss_x"]
        return out


@TRAINER_REGISTRY.register()
class MixMatch(TrainerXU):
    """MixMatch (reference ``ssl/mixmatch.py``): K-augmented pseudo-label
    guessing, sharpening, shuffled mixup of the joint batch."""

    def check_cfg(self, cfg):
        assert cfg.DATALOADER.K_TRANSFORMS > 1

    def _build_steps(self):
        net, tx = self.net, self.tx
        t_cfg = self.cfg.TRAINER.MIXMATCH
        temp = float(t_cfg.TEMP)
        beta = float(t_cfg.MIXUP_BETA)
        n_cls = self.dm.num_classes

        @jax.jit
        def step(state, img_x, label_x, imgs_u, weight_u, perm, lam_x,
                 lam_u, rng):
            # imgs_u: [K, B, H, W, C] — the K augmented views. The shuffle
            # permutation and the per-row mixup coefficients are DRAWN BY
            # THE CALLER (forward_backward_xu, from the same per-step key
            # stream as before) so the step is pure given its inputs and
            # the trajectory-parity test can inject the reference torch
            # draws.
            k_guess, _, _, _, k_net = jax.random.split(rng, 5)
            bs0 = state["batch_stats"]

            # pseudo-labels: average softmax over the K views, sharpened.
            # The reference guesses in train mode under no_grad — batch
            # statistics normalize AND the running stats advance per view,
            # so thread the BN state through the K guessing forwards
            def guess(carry, img_ui):
                p_acc, bs_c = carry
                logits, bs_c = apply_train(
                    net, state["params"], bs_c, img_ui, k_guess
                )
                return (p_acc + jax.nn.softmax(logits, axis=1), bs_c), None

            k = imgs_u.shape[0]
            (p_sum, bs0), _ = jax.lax.scan(
                guess, (jnp.zeros((imgs_u.shape[1], n_cls)), bs0), imgs_u
            )
            bs0 = jax.lax.stop_gradient(bs0)
            label_u = F.sharpen_prob(p_sum / k, temp)
            label_u = jax.lax.stop_gradient(label_u)

            input_u = imgs_u.reshape((-1,) + imgs_u.shape[2:])  # [K*B, ...]
            label_u_rep = jnp.tile(label_u, (k, 1))
            label_x_1h = F.create_onehot(label_x, n_cls)
            n_x = img_x.shape[0]

            input_xu = jnp.concatenate([img_x, input_u], 0)
            label_xu = jnp.concatenate([label_x_1h, label_u_rep], 0)
            input_xu, label_xu = input_xu[perm], label_xu[perm]

            mixed_x, mlabel_x = F.mixup(
                img_x, input_xu[:n_x], label_x_1h, label_xu[:n_x],
                beta, None, preserve_order=True, lam=lam_x,
            )
            mixed_u, mlabel_u = F.mixup(
                input_u, input_xu[n_x:], label_u_rep, label_xu[n_x:],
                beta, None, preserve_order=True, lam=lam_u,
            )

            def loss_fn(params):
                out_x, bs = apply_train(net, params, bs0, mixed_x, k_net)
                p_x = jax.nn.softmax(out_x, axis=1)
                loss_x = (-mlabel_x * jnp.log(p_x + 1e-5)).sum(1).mean()
                out_u, bs = apply_train(net, params, bs, mixed_u, k_net)
                p_u = jax.nn.softmax(out_u, axis=1)
                loss_u = ((mlabel_u - p_u) ** 2).mean()
                loss = loss_x + loss_u * weight_u
                return loss, (loss_x, loss_u, bs)

            (_, (loss_x, loss_u, bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state["params"])
            updates, opt_state = tx.update(
                grads, state["opt_state"], state["params"]
            )
            params = optax.apply_updates(state["params"], updates)
            return (
                {"params": params, "batch_stats": bs, "opt_state": opt_state},
                {"loss_x": loss_x, "loss_u": loss_u},
            )

        self.train_step = step

    def _split_k(self, batch):
        """[B*K, ...] adjacent-variant layout -> [K, B, ...] NHWC
        (batch dim 1 shards over the mesh 'data' axis). Sliced multi-host
        batches hold whole ITEMS (the loader slices the index stream
        before the K expansion), so the local reshape is exact and the
        global [K, B] assembles along dim 1."""
        k = self.cfg.DATALOADER.K_TRANSFORMS
        img = nchw_to_nhwc(batch["img"])
        bk = img.shape[0]
        img = img.reshape((bk // k, k) + img.shape[1:])
        return self._shard(
            np.moveaxis(img, 1, 0), axis=1,
            local=bool(batch.get("_local", False)),
        )

    def forward_backward_xu(self, batch_x, batch_u):
        k = self.cfg.DATALOADER.K_TRANSFORMS
        # labeled: first augmented view only (reference batch_x["img"][0])
        img_x = self._split_k(batch_x)[0]
        label_x = self._shard(
            batch_x["label"][::k], local=bool(batch_x.get("_local", False))
        )
        imgs_u = self._split_k(batch_u)
        global_step = self.batch_idx + self.epoch * self.num_batches
        weight_u = float(self.cfg.TRAINER.MIXMATCH.WEIGHT_U) * F.linear_rampup(
            global_step, int(self.cfg.TRAINER.MIXMATCH.RAMPUP)
        )
        # draw the shuffle + mixup randomness host-side from the same
        # per-step key (split indices preserved: guess/shuf/mix1/mix2/net)
        rng = self.step_rng()
        _, k_shuf, k_mix1, k_mix2, _ = jax.random.split(rng, 5)
        beta = float(self.cfg.TRAINER.MIXMATCH.MIXUP_BETA)
        n_x = int(img_x.shape[0])
        n_u = int(imgs_u.shape[0] * imgs_u.shape[1])
        perm = jax.random.permutation(k_shuf, n_x + n_u)
        lam_x = jax.random.beta(k_mix1, beta, beta, (n_x,))
        lam_x = jnp.maximum(lam_x, 1.0 - lam_x)
        lam_u = jax.random.beta(k_mix2, beta, beta, (n_u,))
        lam_u = jnp.maximum(lam_u, 1.0 - lam_u)
        self.state, metrics = self.train_step(
            self.state, img_x, label_x, imgs_u, jnp.float32(weight_u),
            perm, lam_x, lam_u, rng,
        )
        out = {k_: float(v) for k_, v in metrics.items()}
        out["loss"] = out["loss_x"]
        return out


@TRAINER_REGISTRY.register()
class FixMatch(TrainerXU):
    """FixMatch (reference ``ssl/fixmatch.py``): confident pseudo-labels
    from the weak view supervise the strong view; the labeled batch is
    concatenated into the unlabeled pass exactly like the reference."""

    def check_cfg(self, cfg):
        assert len(cfg.TRAINER.FIXMATCH.STRONG_TRANSFORMS) > 0

    def build_data_manager(self):
        cfg = self.cfg
        tfm_strong = build_transform(
            cfg, is_train=True, choices=cfg.TRAINER.FIXMATCH.STRONG_TRANSFORMS
        )
        # strong views slice per host like the weak ones: img2 rng is
        # keyed on the GLOBAL stream position, so local rows are
        # pixel-identical to a full decode
        return DataManager(
            cfg, tfm_train_strong=tfm_strong,
            allow_local_batches=type(self).SUPPORTS_LOCAL_BATCHES,
        )

    def _build_steps(self):
        net, tx = self.net, self.tx
        t_cfg = self.cfg.TRAINER.FIXMATCH
        conf_thre = float(t_cfg.CONF_THRE)
        weight_u = float(t_cfg.WEIGHT_U)

        @jax.jit
        def step(state, img_x, img_x2, label_x, img_u, img_u2, label_u, rng):
            n_x = img_x.shape[0]
            input_u = jnp.concatenate([img_x, img_u], 0)
            input_u2 = jnp.concatenate([img_x2, img_u2], 0)
            bs0 = state["batch_stats"]

            # pseudo-labels from the weak view (frozen params; the
            # reference's no_grad train forward still advances the BN
            # running stats, so keep the returned state)
            logits_w, bs0 = apply_train(
                net, state["params"], bs0, input_u, rng
            )
            bs0 = jax.lax.stop_gradient(bs0)
            prob_w = jax.nn.softmax(logits_w, axis=1)
            max_prob = prob_w.max(1)
            label_u_pred = prob_w.argmax(1)
            mask_u = (max_prob >= conf_thre).astype(jnp.float32)

            # pseudo-label quality diagnostics (reference
            # assess_y_pred_quality — all three over the UNLABELED slice)
            hit = (label_u_pred[n_x:] == label_u).astype(jnp.float32)
            acc_thre = (hit * mask_u[n_x:]).sum() / (mask_u[n_x:].sum() + 1e-5)
            acc_raw = hit.mean()
            keep_rate = mask_u[n_x:].mean()

            def loss_fn(params):
                out_x, bs = apply_train(net, params, bs0, img_x, rng)
                loss_x = F.cross_entropy(out_x, label_x)
                out_u, bs = apply_train(net, params, bs, input_u2, rng)
                loss_u = F.cross_entropy(
                    out_u, jax.lax.stop_gradient(label_u_pred),
                    reduction="none",
                )
                loss_u = (loss_u * mask_u).mean()
                loss = loss_x + loss_u * weight_u
                return loss, (out_x, loss_x, loss_u, bs)

            (_, (out_x, loss_x, loss_u, bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state["params"])
            updates, opt_state = tx.update(
                grads, state["opt_state"], state["params"]
            )
            params = optax.apply_updates(state["params"], updates)
            acc = (out_x.argmax(1) == label_x).mean() * 100.0  # percent (reference compute_accuracy)
            return (
                {"params": params, "batch_stats": bs, "opt_state": opt_state},
                {
                    "loss_x": loss_x,
                    "acc_x": acc,
                    "loss_u": loss_u,
                    "y_u_pred_acc_raw": acc_raw,
                    "y_u_pred_acc_thre": acc_thre,
                    "y_u_pred_keep": keep_rate,
                },
            )

        self.train_step = step

    def forward_backward_xu(self, batch_x, batch_u):
        loc_x = bool(batch_x.get("_local", False))
        loc_u = bool(batch_u.get("_local", False))
        img_x = self._shard(nchw_to_nhwc(batch_x["img"]), local=loc_x)
        img_x2 = self._shard(nchw_to_nhwc(batch_x["img2"]), local=loc_x)
        label_x = self._shard(batch_x["label"], local=loc_x)
        img_u = self._shard(nchw_to_nhwc(batch_u["img"]), local=loc_u)
        img_u2 = self._shard(nchw_to_nhwc(batch_u["img2"]), local=loc_u)
        label_u = self._shard(batch_u["label"], local=loc_u)
        self.state, metrics = self.train_step(
            self.state, img_x, img_x2, label_x, img_u, img_u2, label_u,
            self.step_rng(),
        )
        out = {k: float(v) for k, v in metrics.items()}
        out["loss"] = out["loss_x"]
        return out
