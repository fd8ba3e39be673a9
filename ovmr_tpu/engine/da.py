"""Domain-adaptation trainers (reference ``dassl/engine/da/``):
SourceOnly, DANN, ADDA, AdaBN, MCD, MME, SE, M3SDA, DAEL, CDAC.

Loss recipes and update schedules match the reference files; every
trainer compiles its whole multi-phase update (including MCD/M3SDA's
alternating A/B/C steps and DAEL's expert ensemble) into ONE jitted
program — domain indices ride as traced arrays over stacked expert
parameters (:class:`~ovmr_tpu.engine.dassl_base.StackedLinears`), so any
``RandomDomainSampler`` domain order reuses the same compilation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ovmr_tpu.data.manager import DataManager
from ovmr_tpu.data.transforms import build_transform
from ovmr_tpu.engine.dassl_base import (
    Critic,
    Prototypes,
    StackedLinears,
    TrainerXU,
    apply_eval,
    apply_train,
    build_simplenet,
    nchw_to_nhwc,
)
from ovmr_tpu.engine.optimizers import build_optimizer, set_lr
from ovmr_tpu.engine.trainer import TRAINER_REGISTRY
from ovmr_tpu.parallel import to_host
from ovmr_tpu.modeling import ops as F
from ovmr_tpu.utils.tools import check_isfile


def _bce_with_logits(logits, targets):
    """torch BCEWithLogitsLoss (mean reduction)."""
    return (
        jnp.maximum(logits, 0) - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    ).mean()


@TRAINER_REGISTRY.register()
class SourceOnly(TrainerXU):
    """Supervised training on source batches only (reference
    ``da/source_only.py``)."""

    def forward_backward_xu(self, batch_x, batch_u):
        img, label, _ = self.parse_batch_train(batch_x)
        self.state, metrics = self.train_step(
            self.state, img, label, self.step_rng()
        )
        return {k: float(v) for k, v in metrics.items()}


@TRAINER_REGISTRY.register()
class DANN(TrainerXU):
    """Domain-adversarial training (reference ``da/dann.py``): GRL with
    the annealed lambda, BCE domain critic; one loss updates model AND
    critic together (the reference's ``model_backward_and_update(loss)``
    steps every registered optimizer)."""

    def build_model(self):
        super().build_model()
        cfg = self.cfg
        fdim = self.net.fdim
        print("Building critic network")
        self.critic = Critic(fdim, (fdim, fdim))
        c_state = self.init_net(self.critic, input_shape=(2, fdim))
        self.tx_c = build_optimizer(cfg.OPTIM)
        c_state["opt_state"] = self.tx_c.init(c_state["params"])
        self.register_model("critic", self.critic, c_state, self.tx_c)
        self._build_dann_step()

    def _build_dann_step(self):
        net, tx = self.net, self.tx
        critic, tx_c = self.critic, self.tx_c

        @jax.jit
        def step(state, c_state, img_x, label_x, img_u, lmda, rng):
            def loss_fn(params, c_params):
                (logit_x, feat_x), bs = apply_train(
                    net, params, state["batch_stats"], img_x, rng,
                    return_feature=True,
                )
                (_, feat_u), bs = apply_train(
                    net, params, bs, img_u, rng, return_feature=True
                )
                loss_x = F.cross_entropy(logit_x, label_x)
                rf_x = F.reverse_grad(feat_x, lmda)
                rf_u = F.reverse_grad(feat_u, lmda)
                out_xd, c_bs = apply_train(
                    critic, c_params, c_state["batch_stats"], rf_x, rng
                )
                out_ud, c_bs = apply_train(critic, c_params, c_bs, rf_u, rng)
                loss_d = _bce_with_logits(
                    out_xd, jnp.ones_like(out_xd)
                ) + _bce_with_logits(out_ud, jnp.zeros_like(out_ud))
                loss = loss_x + loss_d
                return loss, (logit_x, loss_x, loss_d, bs, c_bs)

            grads_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
            (_, (logit_x, loss_x, loss_d, bs, c_bs)), (g_m, g_c) = grads_fn(
                state["params"], c_state["params"]
            )
            upd, opt = tx.update(g_m, state["opt_state"], state["params"])
            params = optax.apply_updates(state["params"], upd)
            upd_c, opt_c = tx_c.update(
                g_c, c_state["opt_state"], c_state["params"]
            )
            c_params = optax.apply_updates(c_state["params"], upd_c)
            acc = (logit_x.argmax(1) == label_x).mean() * 100.0  # percent (reference compute_accuracy)
            return (
                {"params": params, "batch_stats": bs, "opt_state": opt},
                {"params": c_params, "batch_stats": c_bs, "opt_state": opt_c},
                {"loss_x": loss_x, "acc_x": acc, "loss_d": loss_d},
            )

        self._dann_step = step

    def forward_backward_xu(self, batch_x, batch_u):
        img_x, label_x, _ = self.parse_batch_train(batch_x)
        img_u, _, _ = self.parse_batch_train(batch_u)
        global_step = self.batch_idx + self.epoch * self.num_batches
        progress = global_step / (self.max_epoch * self.num_batches)
        lmda = 2 / (1 + np.exp(-10 * progress)) - 1
        self.state, self._models["critic"], metrics = self._dann_step(
            self.state, self._models["critic"], img_x, label_x, img_u,
            jnp.float32(lmda), self.step_rng(),
        )
        out = {k: float(v) for k, v in metrics.items()}
        out["loss"] = out["loss_x"]
        return out


@TRAINER_REGISTRY.register()
class ADDA(TrainerXU):
    """Adversarial discriminative DA (reference ``da/adda.py``): frozen
    source model; critic and target model update alternately; the
    target model's classifier stays frozen (only backbone/head 'open')."""

    def check_cfg(self, cfg):
        assert check_isfile(cfg.MODEL.INIT_WEIGHTS), (
            "The weights of source model must be provided"
        )

    def build_model(self):
        super().build_model()
        cfg = self.cfg
        self.source_state = {
            "params": jax.tree_util.tree_map(jnp.asarray, self.state["params"]),
            "batch_stats": jax.tree_util.tree_map(
                jnp.asarray, self.state["batch_stats"]
            ),
        }
        fdim = self.net.fdim
        print("Building critic network")
        self.critic = Critic(fdim, (fdim, fdim // 2))
        c_state = self.init_net(self.critic, input_shape=(2, fdim))
        self.tx_c = build_optimizer(cfg.OPTIM)
        c_state["opt_state"] = self.tx_c.init(c_state["params"])
        self.register_model("critic", self.critic, c_state, self.tx_c)
        self._build_adda_step()

    def _build_adda_step(self):
        net, tx = self.net, self.tx
        critic, tx_c = self.critic, self.tx_c
        source_state = self.source_state

        def zero_classifier(tree):
            # open_specified_layers(["backbone", "head"]): classifier frozen.
            # Applied to the optimizer UPDATES (not just grads) — the chain
            # includes weight decay, which would otherwise keep shrinking
            # the frozen source-trained classifier every step (torch skips
            # requires_grad=False params entirely)
            return {
                k: (jax.tree_util.tree_map(jnp.zeros_like, v)
                    if k == "classifier" else v)
                for k, v in tree.items()
            }

        @jax.jit
        def step(state, c_state, img_x, img_u, rng):
            _, feat_x = apply_eval(net, source_state, img_x,
                                   return_feature=True)

            # critic update (target feats detached)
            def critic_loss(c_params):
                (_, feat_u), _ = apply_train(
                    net, state["params"], state["batch_stats"], img_u, rng,
                    return_feature=True,
                )
                feat_u = jax.lax.stop_gradient(feat_u)
                logit_xd, c_bs = apply_train(
                    critic, c_params, c_state["batch_stats"], feat_x, rng
                )
                logit_ud, c_bs = apply_train(
                    critic, c_params, c_bs, feat_u, rng
                )
                loss = _bce_with_logits(logit_xd, jnp.ones_like(logit_xd))
                loss += _bce_with_logits(logit_ud, jnp.zeros_like(logit_ud))
                return loss, c_bs

            (loss_critic, c_bs), g_c = jax.value_and_grad(
                critic_loss, has_aux=True
            )(c_state["params"])
            upd_c, opt_c = tx_c.update(
                g_c, c_state["opt_state"], c_state["params"]
            )
            c_params = optax.apply_updates(c_state["params"], upd_c)

            # model update: fool the (new) critic. The critic's forward
            # here runs in train mode in the reference, so its BN
            # running-stat update is kept too
            def model_loss(params):
                (_, feat_u), bs = apply_train(
                    net, params, state["batch_stats"], img_u, rng,
                    return_feature=True,
                )
                logit_ud, c_bs2 = apply_train(
                    critic, c_params, c_bs, feat_u, rng
                )
                loss = _bce_with_logits(logit_ud, jnp.ones_like(logit_ud))
                return loss, (bs, c_bs2)

            (loss_model, (bs, c_bs)), g_m = jax.value_and_grad(
                model_loss, has_aux=True
            )(state["params"])
            c_bs = jax.lax.stop_gradient(c_bs)
            g_m = zero_classifier(g_m)
            upd, opt = tx.update(g_m, state["opt_state"], state["params"])
            upd = zero_classifier(upd)
            params = optax.apply_updates(state["params"], upd)
            return (
                {"params": params, "batch_stats": bs, "opt_state": opt},
                {"params": c_params, "batch_stats": c_bs, "opt_state": opt_c},
                {"loss_critic": loss_critic, "loss_model": loss_model},
            )

        self._adda_step = step

    def forward_backward_xu(self, batch_x, batch_u):
        img_x, _, _ = self.parse_batch_train(batch_x)
        img_u, _, _ = self.parse_batch_train(batch_u)
        self.state, self._models["critic"], metrics = self._adda_step(
            self.state, self._models["critic"], img_x, img_u, self.step_rng()
        )
        out = {k: float(v) for k, v in metrics.items()}
        out["loss"] = out["loss_model"]
        return out


@TRAINER_REGISTRY.register()
class AdaBN(TrainerXU):
    """Adaptive BN (reference ``da/adabn.py``): reset the source model's
    BN running statistics once, then re-estimate them with target-domain
    forwards — no gradient updates at all."""

    def check_cfg(self, cfg):
        assert check_isfile(cfg.MODEL.INIT_WEIGHTS), (
            "The weights of source model must be provided"
        )

    def build_model(self):
        super().build_model()
        self.done_reset_bn_stats = False
        net = self.net

        @jax.jit
        def bn_step(state, img_u, rng):
            _, bs = apply_train(
                net, state["params"], state["batch_stats"], img_u, rng
            )
            return bs

        self._bn_step = bn_step

    def before_epoch(self):
        super().before_epoch()
        if not self.done_reset_bn_stats:
            # zero means / unit vars for every BN collection entry
            def reset(leaf_path, leaf):
                name = leaf_path[-1].key if hasattr(leaf_path[-1], "key") else ""
                if name == "mean":
                    return jnp.zeros_like(leaf)
                if name == "var":
                    return jnp.ones_like(leaf)
                return leaf

            flat = jax.tree_util.tree_flatten_with_path(
                self.state["batch_stats"]
            )
            leaves = [reset(p, l) for p, l in flat[0]]
            self.state["batch_stats"] = jax.tree_util.tree_unflatten(
                flat[1], leaves
            )
            self.done_reset_bn_stats = True

    def forward_backward_xu(self, batch_x, batch_u):
        img_u, _, _ = self.parse_batch_train(batch_u)
        self.state["batch_stats"] = self._bn_step(
            self.state, img_u, self.step_rng()
        )
        return None


@TRAINER_REGISTRY.register()
class MCD(TrainerXU):
    """Maximum classifier discrepancy (reference ``da/mcd.py``): shared
    feature extractor F, twin classifiers C1/C2, three alternating
    updates per batch fused into one compiled step."""

    def build_model(self):
        cfg = self.cfg
        print("Building F")
        self.net = build_simplenet(cfg, cfg.MODEL, 0)
        state = self.init_net(self.net)
        self.tx = build_optimizer(cfg.OPTIM)
        state["opt_state"] = self.tx.init(state["params"])
        self.register_model("F", self.net, state, self.tx)
        fdim = self.net.fdim

        from ovmr_tpu.engine.dassl_base import LinearHead

        for name in ("C1", "C2"):
            print(f"Building {name}")
            head = LinearHead(self.num_classes)
            h_state = self.init_net(head, input_shape=(2, fdim))
            tx = build_optimizer(cfg.OPTIM)
            h_state["opt_state"] = tx.init(h_state["params"])
            self.register_model(name, head, h_state, tx)

        from ovmr_tpu.engine.schedule import lr_schedule_from_cfg

        self.lr_table = lr_schedule_from_cfg(cfg.OPTIM)
        self._build_mcd_step()

    @property
    def state(self):
        return self._models["F"]

    @state.setter
    def state(self, v):
        self._models["F"] = v

    def _build_mcd_step(self):
        netF = self.net
        c1, c2 = self._nets["C1"], self._nets["C2"]
        txF = self._txs["F"]
        tx1, tx2 = self._txs["C1"], self._txs["C2"]
        n_step_F = int(self.cfg.TRAINER.MCD.N_STEP_F)

        def discrepancy(y1, y2):
            return jnp.abs(y1 - y2).mean()

        def apply_F(params, bs, x, rng):
            return apply_train(netF, params, bs, x, rng)

        @jax.jit
        def step(sF, s1, s2, img_x, label_x, img_u, rng):
            # ---- step A: F + C1 + C2 on source CE -------------------
            def loss_A(pF, p1, p2):
                feat_x, bs = apply_F(pF, sF["batch_stats"], img_x, rng)
                l1 = c1.apply({"params": p1}, feat_x)
                l2 = c2.apply({"params": p2}, feat_x)
                loss = F.cross_entropy(l1, label_x) + F.cross_entropy(l2, label_x)
                return loss, bs

            (loss_a, bsF), grads = jax.value_and_grad(
                loss_A, argnums=(0, 1, 2), has_aux=True
            )(sF["params"], s1["params"], s2["params"])
            gF, g1, g2 = grads
            updF, optF = txF.update(gF, sF["opt_state"], sF["params"])
            pF = optax.apply_updates(sF["params"], updF)
            upd1, opt1 = tx1.update(g1, s1["opt_state"], s1["params"])
            p1 = optax.apply_updates(s1["params"], upd1)
            upd2, opt2 = tx2.update(g2, s2["opt_state"], s2["params"])
            p2 = optax.apply_updates(s2["params"], upd2)

            # ---- step B: C1/C2 maximize discrepancy on target -------
            feat_x, bsF = apply_F(pF, bsF, img_x, rng)
            feat_x = jax.lax.stop_gradient(feat_x)
            feat_u, bsF = apply_F(pF, bsF, img_u, rng)
            feat_u = jax.lax.stop_gradient(feat_u)

            def loss_B(p1, p2):
                l1 = c1.apply({"params": p1}, feat_x)
                l2 = c2.apply({"params": p2}, feat_x)
                loss_x = F.cross_entropy(l1, label_x) + F.cross_entropy(l2, label_x)
                pr1 = jax.nn.softmax(c1.apply({"params": p1}, feat_u), 1)
                pr2 = jax.nn.softmax(c2.apply({"params": p2}, feat_u), 1)
                return loss_x - discrepancy(pr1, pr2)

            loss_b, (g1, g2) = jax.value_and_grad(loss_B, argnums=(0, 1))(p1, p2)
            upd1, opt1 = tx1.update(g1, opt1, p1)
            p1 = optax.apply_updates(p1, upd1)
            upd2, opt2 = tx2.update(g2, opt2, p2)
            p2 = optax.apply_updates(p2, upd2)

            # ---- step C: F minimizes discrepancy (n_step_F times) ---
            loss_c = jnp.float32(0)
            for _ in range(n_step_F):
                def loss_C(pF_, bs_):
                    feat_u, bs2 = apply_F(pF_, bs_, img_u, rng)
                    pr1 = jax.nn.softmax(c1.apply({"params": p1}, feat_u), 1)
                    pr2 = jax.nn.softmax(c2.apply({"params": p2}, feat_u), 1)
                    return discrepancy(pr1, pr2), bs2

                (loss_c, bsF), gF = jax.value_and_grad(
                    lambda pF_: loss_C(pF_, bsF), has_aux=True
                )(pF)
                updF, optF = txF.update(gF, optF, pF)
                pF = optax.apply_updates(pF, updF)

            return (
                {"params": pF, "batch_stats": bsF, "opt_state": optF},
                {"params": p1, "batch_stats": s1["batch_stats"], "opt_state": opt1},
                {"params": p2, "batch_stats": s2["batch_stats"], "opt_state": opt2},
                {"loss_step_A": loss_a, "loss_step_B": loss_b,
                 "loss_step_C": loss_c},
            )

        self._mcd_step = step

    def forward_backward_xu(self, batch_x, batch_u):
        img_x, label_x, _ = self.parse_batch_train(batch_x)
        img_u, _, _ = self.parse_batch_train(batch_u)
        sF, s1, s2, metrics = self._mcd_step(
            self._models["F"], self._models["C1"], self._models["C2"],
            img_x, label_x, img_u, self.step_rng(),
        )
        self._models["F"], self._models["C1"], self._models["C2"] = sF, s1, s2
        out = {k: float(v) for k, v in metrics.items()}
        out["loss"] = out["loss_step_A"]
        return out

    def model_inference(self, batch, scale_no=0):
        x = self.eval_images(batch)
        if "infer" not in self._infer_cache:
            netF, c1 = self.net, self._nets["C1"]

            def infer(sF, s1, xx):
                feat = apply_eval(netF, sF, xx)
                return c1.apply({"params": s1["params"]}, feat)

            self._infer_cache["infer"] = jax.jit(infer)
        out = self._infer_cache["infer"](
            {k: self._models["F"][k] for k in ("params", "batch_stats")},
            self._models["C1"], x,
        )
        return to_host(out)


@TRAINER_REGISTRY.register()
class MME(TrainerXU):
    """Minimax entropy (reference ``da/mme.py``): cosine-prototype
    classifier; supervised update then adversarial entropy update through
    the GRL."""

    def build_model(self):
        cfg = self.cfg
        print("Building F")
        self.net = build_simplenet(cfg, cfg.MODEL, 0)
        state = self.init_net(self.net)
        self.tx = build_optimizer(cfg.OPTIM)
        state["opt_state"] = self.tx.init(state["params"])
        self.register_model("F", self.net, state, self.tx)

        print("Building C")
        self.C = Prototypes(self.net.fdim, self.num_classes)
        c_state = self.init_net(self.C, input_shape=(2, self.net.fdim))
        self.tx_c = build_optimizer(cfg.OPTIM)
        c_state["opt_state"] = self.tx_c.init(c_state["params"])
        self.register_model("C", self.C, c_state, self.tx_c)

        from ovmr_tpu.engine.schedule import lr_schedule_from_cfg

        self.lr_table = lr_schedule_from_cfg(cfg.OPTIM)
        self._build_mme_step()

    @property
    def state(self):
        return self._models["F"]

    @state.setter
    def state(self, v):
        self._models["F"] = v

    def _build_mme_step(self):
        netF, protC = self.net, self.C
        txF, txC = self.tx, self.tx_c
        lmda = float(self.cfg.TRAINER.MME.LMDA)

        @jax.jit
        def step(sF, sC, img_x, label_x, img_u, rng):
            # supervised update
            def loss_sup(pF, pC):
                feat_x, bs = apply_train(
                    netF, pF, sF["batch_stats"], img_x, rng
                )
                logit_x = protC.apply({"params": pC}, feat_x)
                return F.cross_entropy(logit_x, label_x), (logit_x, bs)

            (loss_x, (logit_x, bsF)), (gF, gC) = jax.value_and_grad(
                loss_sup, argnums=(0, 1), has_aux=True
            )(sF["params"], sC["params"])
            updF, optF = txF.update(gF, sF["opt_state"], sF["params"])
            pF = optax.apply_updates(sF["params"], updF)
            updC, optC = txC.update(gC, sC["opt_state"], sC["params"])
            pC = optax.apply_updates(sC["params"], updC)

            # adversarial entropy update (GRL inside the prototypes)
            def loss_ent(pF_, pC_):
                feat_u, bs = apply_train(netF, pF_, bsF, img_u, rng)
                logit_u = protC.apply(
                    {"params": pC_}, feat_u, reverse=True
                )
                prob_u = jax.nn.softmax(logit_u, 1)
                ent = -(-prob_u * jnp.log(prob_u + 1e-5)).sum(1).mean()
                return ent * lmda, (ent, bs)

            (_, (loss_u, bsF)), (gF, gC) = jax.value_and_grad(
                loss_ent, argnums=(0, 1), has_aux=True
            )(pF, pC)
            updF, optF = txF.update(gF, optF, pF)
            pF = optax.apply_updates(pF, updF)
            updC, optC = txC.update(gC, optC, pC)
            pC = optax.apply_updates(pC, updC)

            acc = (logit_x.argmax(1) == label_x).mean() * 100.0  # percent (reference compute_accuracy)
            return (
                {"params": pF, "batch_stats": bsF, "opt_state": optF},
                {"params": pC, "batch_stats": sC["batch_stats"],
                 "opt_state": optC},
                {"loss_x": loss_x, "acc_x": acc, "loss_u": loss_u},
            )

        self._mme_step = step

    def forward_backward_xu(self, batch_x, batch_u):
        img_x, label_x, _ = self.parse_batch_train(batch_x)
        img_u, _, _ = self.parse_batch_train(batch_u)
        sF, sC, metrics = self._mme_step(
            self._models["F"], self._models["C"], img_x, label_x, img_u,
            self.step_rng(),
        )
        self._models["F"], self._models["C"] = sF, sC
        out = {k: float(v) for k, v in metrics.items()}
        out["loss"] = out["loss_x"]
        return out

    def model_inference(self, batch, scale_no=0):
        x = self.eval_images(batch)
        if "infer" not in self._infer_cache:
            netF, protC = self.net, self.C

            def infer(sF, sC, xx):
                return protC.apply(
                    {"params": sC["params"]}, apply_eval(netF, sF, xx)
                )

            self._infer_cache["infer"] = jax.jit(infer)
        out = self._infer_cache["infer"](
            {k: self._models["F"][k] for k in ("params", "batch_stats")},
            self._models["C"], x,
        )
        return to_host(out)


@TRAINER_REGISTRY.register()
class SE(TrainerXU):
    """Self-ensembling (reference ``da/se.py``): EMA teacher consistency
    on two augmented target views (K_TRANSFORMS == 2)."""

    def check_cfg(self, cfg):
        assert cfg.DATALOADER.K_TRANSFORMS == 2

    def build_model(self):
        super().build_model()
        self.teacher = {
            "params": jax.tree_util.tree_map(jnp.asarray, self.state["params"]),
            "batch_stats": jax.tree_util.tree_map(
                jnp.asarray, self.state["batch_stats"]
            ),
        }
        self._build_se_step()

    def _build_se_step(self):
        net, tx = self.net, self.tx
        conf_thre = float(self.cfg.TRAINER.SE.CONF_THRE)

        @jax.jit
        def step(state, teacher, img_x, label_x, img_u1, img_u2, weight_u,
                 ema_alpha, rng):
            rng_t, rng_s = jax.random.split(rng)
            t_logit, t_bs = apply_train(
                net, teacher["params"], teacher["batch_stats"], img_u2, rng_t
            )
            t_prob_u = jax.nn.softmax(t_logit, 1)

            def loss_fn(params):
                logit_x, bs = apply_train(
                    net, params, state["batch_stats"], img_x, rng_s
                )
                loss_x = F.cross_entropy(logit_x, label_x)
                logit_u, bs = apply_train(net, params, bs, img_u1, rng_s)
                prob_u = jax.nn.softmax(logit_u, 1)
                per = ((prob_u - t_prob_u) ** 2).sum(1)
                if conf_thre:
                    mask = (t_prob_u.max(1) > conf_thre).astype(jnp.float32)
                    loss_u = (per * mask).mean()
                else:
                    loss_u = per.mean() * weight_u
                return loss_x + loss_u, (logit_x, loss_x, loss_u, bs)

            (_, (logit_x, loss_x, loss_u, bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state["params"])
            upd, opt = tx.update(grads, state["opt_state"], state["params"])
            params = optax.apply_updates(state["params"], upd)
            new_teacher = {
                "params": F.ema_update(teacher["params"], params, ema_alpha),
                "batch_stats": t_bs,
            }
            acc = (logit_x.argmax(1) == label_x).mean() * 100.0  # percent (reference compute_accuracy)
            return (
                {"params": params, "batch_stats": bs, "opt_state": opt},
                new_teacher,
                {"loss_x": loss_x, "acc_x": acc, "loss_u": loss_u},
            )

        self._se_step = step

    def _split_k(self, batch):
        k = self.cfg.DATALOADER.K_TRANSFORMS
        img = nchw_to_nhwc(batch["img"])
        img = img.reshape((img.shape[0] // k, k) + img.shape[1:])
        return img  # host-side [B, k, ...]; callers shard the views used

    def forward_backward_xu(self, batch_x, batch_u):
        t_cfg = self.cfg.TRAINER.SE
        global_step = self.batch_idx + self.epoch * self.num_batches
        # labeled: only the FIRST weak view is consumed — don't transfer
        # the unused second view. Sliced multi-host batches hold whole
        # items, so the host-side [B, k] view split is exact per slice.
        loc_x = bool(batch_x.get("_local", False))
        loc_u = bool(batch_u.get("_local", False))
        img_x = self._shard(self._split_k(batch_x)[:, 0], local=loc_x)
        k = self.cfg.DATALOADER.K_TRANSFORMS
        label_x = self._shard(batch_x["label"][::k], local=loc_x)
        views_u = self._split_k(batch_u)
        img_u1 = self._shard(views_u[:, 0], local=loc_u)
        img_u2 = self._shard(views_u[:, 1], local=loc_u)
        # reference evaluates the rampup only when CONF_THRE is unset
        # (the thresholded branch never uses weight_u)
        weight_u = (
            0.0 if float(t_cfg.CONF_THRE)
            else F.sigmoid_rampup(global_step, int(t_cfg.RAMPUP))
        )
        ema_alpha = min(1 - 1 / (global_step + 1), float(t_cfg.EMA_ALPHA))
        self.state, self.teacher, metrics = self._se_step(
            self.state, self.teacher, img_x, label_x, img_u1, img_u2,
            jnp.float32(weight_u), jnp.float32(ema_alpha), self.step_rng(),
        )
        out = {k_: float(v) for k_, v in metrics.items()}
        out["loss"] = out["loss_x"]
        return out


@TRAINER_REGISTRY.register()
class M3SDA(TrainerXU):
    """Moment matching for multi-source DA (reference ``da/m3sda.py``):
    per-domain pair classifiers + first/second-moment alignment, with the
    MCD-style three-phase update."""

    def check_cfg(self, cfg):
        assert cfg.DATALOADER.TRAIN_X.SAMPLER == "RandomDomainSampler"
        assert not cfg.DATALOADER.TRAIN_U.SAME_AS_X

    def build_model(self):
        cfg = self.cfg
        n_domain = cfg.DATALOADER.TRAIN_X.N_DOMAIN
        if n_domain <= 0:
            n_domain = self.num_source_domains
        self.n_domain = n_domain
        self.split_batch = cfg.DATALOADER.TRAIN_X.BATCH_SIZE // n_domain

        print("Building F")
        self.net = build_simplenet(cfg, cfg.MODEL, 0)
        state = self.init_net(self.net)
        self.tx = build_optimizer(cfg.OPTIM)
        state["opt_state"] = self.tx.init(state["params"])
        self.register_model("F", self.net, state, self.tx)
        fdim = self.net.fdim

        print("Building C")
        self.C1 = StackedLinears(self.num_source_domains, fdim, self.num_classes)
        self.C2 = StackedLinears(self.num_source_domains, fdim, self.num_classes)
        c_state = {
            "params": {
                "c1": self.init_net_pair(self.C1, fdim),
                "c2": self.init_net_pair(self.C2, fdim),
            },
            "batch_stats": {},
        }
        self.tx_c = build_optimizer(cfg.OPTIM)
        c_state["opt_state"] = self.tx_c.init(c_state["params"])
        self.register_model("C", None, c_state, self.tx_c)

        from ovmr_tpu.engine.schedule import lr_schedule_from_cfg

        self.lr_table = lr_schedule_from_cfg(cfg.OPTIM)
        self._build_m3sda_step()

    def init_net_pair(self, mod, fdim):
        vs = mod.init(
            {"params": self._next_rng()}, jnp.int32(0), jnp.zeros((2, fdim))
        )
        return vs["params"]

    @property
    def state(self):
        return self._models["F"]

    @state.setter
    def state(self, v):
        self._models["F"] = v

    def _pair_apply(self, params, i, x):
        z1 = self.C1.apply({"params": params["c1"]}, i, x)
        z2 = self.C2.apply({"params": params["c2"]}, i, x)
        return z1, z2

    def _build_m3sda_step(self):
        netF, txF, txC = self.net, self.tx, self.tx_c
        pair_apply = self._pair_apply
        n_domain = self.n_domain
        split = self.split_batch
        lmda = float(self.cfg.TRAINER.M3SDA.LMDA)
        n_step_F = int(self.cfg.TRAINER.M3SDA.N_STEP_F)

        def euclidean(a, b):
            return jnp.sqrt(((a - b) ** 2).sum())

        def moment_distance(feats, feat_u):
            # feats: [D, B, F]
            def pairwise(vs, u):  # vs: [D, F], u: [F]
                dist = sum(euclidean(vs[i], u) for i in range(n_domain))
                count = n_domain
                for i in range(n_domain - 1):
                    for j in range(i + 1, n_domain):
                        dist += euclidean(vs[i], vs[j])
                        count += 1
                return dist / count

            d1 = pairwise(feats.mean(1), feat_u.mean(0))
            d2 = pairwise(feats.var(1, ddof=1), feat_u.var(0, ddof=1))
            return (d1 + d2) / 2

        def ce_pair(params, doms, feats, labels):
            # feats: [D, B, F]; labels: [D, B]
            loss = jnp.float32(0)
            for g in range(n_domain):
                z1, z2 = pair_apply(params, doms[g], feats[g])
                loss += F.cross_entropy(z1, labels[g]) + F.cross_entropy(
                    z2, labels[g]
                )
            return loss / n_domain

        def dis_pair(params, doms, feat_u):
            loss = jnp.float32(0)
            for g in range(n_domain):
                z1, z2 = pair_apply(params, doms[g], feat_u)
                p1 = jax.nn.softmax(z1, 1)
                p2 = jax.nn.softmax(z2, 1)
                loss += jnp.abs(p1 - p2).mean()
            return loss / n_domain

        @jax.jit
        def step(sF, sC, img_x, label_x, domain_x, img_u, rng):
            imgs = img_x.reshape((n_domain, split) + img_x.shape[1:])
            labels = label_x.reshape(n_domain, split)
            # per-group domain ids from the GLOBAL (sharded) domain vector
            # — computed in-step so sliced multi-host batches never need
            # the full vector host-side (RandomDomainSampler groups rows
            # [n_domain, split]; any row of a group carries its id)
            doms = domain_x.reshape(n_domain, split)[:, 0]

            # ---- step A ------------------------------------------------
            # the reference forwards F once PER DOMAIN (train-mode BN
            # normalizes each domain sub-batch with its own statistics —
            # a single concatenated forward would mix them), then the
            # target batch
            def loss_A(pF, pC):
                bs = sF["batch_stats"]
                fs = []
                for g in range(n_domain):
                    f, bs = apply_train(netF, pF, bs, imgs[g], rng)
                    fs.append(f)
                feats = jnp.stack(fs)
                loss_x = ce_pair(pC, doms, feats, labels)
                feat_u, bs = apply_train(netF, pF, bs, img_u, rng)
                loss_msda = moment_distance(feats, feat_u)
                return loss_x + loss_msda * lmda, bs

            (loss_a, bsF), (gF, gC) = jax.value_and_grad(
                loss_A, argnums=(0, 1), has_aux=True
            )(sF["params"], sC["params"])
            updF, optF = txF.update(gF, sF["opt_state"], sF["params"])
            pF = optax.apply_updates(sF["params"], updF)
            updC, optC = txC.update(gC, sC["opt_state"], sC["params"])
            pC = optax.apply_updates(sC["params"], updC)

            # ---- step B: classifiers maximize target discrepancy -------
            # reference order: target forward FIRST, then per-domain
            # source forwards (all no_grad)
            feat_u, bsF = apply_train(netF, pF, bsF, img_u, rng)
            feat_u = jax.lax.stop_gradient(feat_u)
            fs = []
            for g in range(n_domain):
                f, bsF = apply_train(netF, pF, bsF, imgs[g], rng)
                fs.append(f)
            feats = jax.lax.stop_gradient(jnp.stack(fs))

            def loss_B(pC):
                return ce_pair(pC, doms, feats, labels) - dis_pair(
                    pC, doms, feat_u
                )

            loss_b, gC = jax.value_and_grad(loss_B)(pC)
            updC, optC = txC.update(gC, optC, pC)
            pC = optax.apply_updates(pC, updC)

            # ---- step C: F minimizes discrepancy -----------------------
            loss_c = jnp.float32(0)
            for _ in range(n_step_F):
                def loss_C(pF_):
                    feat_u, bs2 = apply_train(netF, pF_, bsF, img_u, rng)
                    return dis_pair(pC, doms, feat_u), bs2

                (loss_c, bsF), gF = jax.value_and_grad(
                    loss_C, has_aux=True
                )(pF)
                updF, optF = txF.update(gF, optF, pF)
                pF = optax.apply_updates(pF, updF)

            return (
                {"params": pF, "batch_stats": bsF, "opt_state": optF},
                {"params": pC, "batch_stats": {}, "opt_state": optC},
                {"loss_step_A": loss_a, "loss_step_B": loss_b,
                 "loss_step_C": loss_c},
            )

        self._m3sda_step = step

    def forward_backward_xu(self, batch_x, batch_u):
        img_x, label_x, domain_x = self.parse_batch_train(batch_x)
        img_u, _, _ = self.parse_batch_train(batch_u)
        sF, sC, metrics = self._m3sda_step(
            self._models["F"], self._models["C"], img_x, label_x, domain_x,
            img_u, self.step_rng(),
        )
        self._models["F"], self._models["C"] = sF, sC
        out = {k: float(v) for k, v in metrics.items()}
        out["loss"] = out["loss_step_A"]
        return out

    def model_inference(self, batch, scale_no=0):
        x = self.eval_images(batch)
        if "infer" not in self._infer_cache:
            netF = self.net
            pair_apply = self._pair_apply
            n_src = self.num_source_domains

            def infer(sF, sC, xx):
                f = apply_eval(netF, sF, xx)
                p = jnp.zeros((xx.shape[0], self.num_classes))
                for k in range(n_src):
                    z1, _ = pair_apply(sC["params"], jnp.int32(k), f)
                    p = p + jax.nn.softmax(z1, 1)
                return p / n_src

            self._infer_cache["infer"] = jax.jit(infer)
        out = self._infer_cache["infer"](
            {k: self._models["F"][k] for k in ("params", "batch_stats")},
            self._models["C"], x,
        )
        return to_host(out)


@TRAINER_REGISTRY.register()
class DAEL(TrainerXU):
    """Domain-adaptive ensemble learning (reference ``da/dael.py``):
    per-source-domain experts over a shared extractor; weak/strong view
    consistency + most-confident-expert pseudo-labels on target."""

    def check_cfg(self, cfg):
        assert cfg.DATALOADER.TRAIN_X.SAMPLER == "RandomDomainSampler"
        assert not cfg.DATALOADER.TRAIN_U.SAME_AS_X
        assert len(cfg.TRAINER.DAEL.STRONG_TRANSFORMS) > 0

    def build_data_manager(self):
        cfg = self.cfg
        tfm_strong = build_transform(
            cfg, is_train=True, choices=cfg.TRAINER.DAEL.STRONG_TRANSFORMS
        )
        # strong views and domain-grouped batches both slice per host:
        # rows are globally seeded and the domain-group reshape happens
        # in-step on the re-assembled global array
        return DataManager(
            cfg, tfm_train_strong=tfm_strong,
            allow_local_batches=type(self).SUPPORTS_LOCAL_BATCHES,
        )

    def build_model(self):
        cfg = self.cfg
        n_domain = cfg.DATALOADER.TRAIN_X.N_DOMAIN
        if n_domain <= 0:
            n_domain = self.num_source_domains
        self.n_domain = n_domain
        self.split_batch = cfg.DATALOADER.TRAIN_X.BATCH_SIZE // n_domain

        print("Building F")
        self.net = build_simplenet(cfg, cfg.MODEL, 0)
        state = self.init_net(self.net)
        self.tx = build_optimizer(cfg.OPTIM)
        state["opt_state"] = self.tx.init(state["params"])
        self.register_model("F", self.net, state, self.tx)

        print("Building E")
        self.E = StackedLinears(
            self.num_source_domains, self.net.fdim, self.num_classes,
            softmax=True,
        )
        e_vs = self.E.init(
            {"params": self._next_rng()}, jnp.int32(0),
            jnp.zeros((2, self.net.fdim)),
        )
        e_state = {"params": e_vs["params"], "batch_stats": {}}
        self.tx_e = build_optimizer(cfg.OPTIM)
        e_state["opt_state"] = self.tx_e.init(e_state["params"])
        self.register_model("E", self.E, e_state, self.tx_e)

        from ovmr_tpu.engine.schedule import lr_schedule_from_cfg

        self.lr_table = lr_schedule_from_cfg(cfg.OPTIM)
        self._build_dael_step()

    @property
    def state(self):
        return self._models["F"]

    @state.setter
    def state(self, v):
        self._models["F"] = v

    def _build_dael_step(self):
        netF, expertE = self.net, self.E
        txF, txE = self.tx, self.tx_e
        n_domain = self.n_domain
        n_src = self.num_source_domains
        split = self.split_batch
        n_cls = self.num_classes
        conf_thre = float(self.cfg.TRAINER.DAEL.CONF_THRE)
        weight_u = float(self.cfg.TRAINER.DAEL.WEIGHT_U)

        def expert(params, i, x):
            return expertE.apply({"params": params}, i, x)

        def all_experts(params, x):  # -> [K, B, C]
            return jnp.stack([expert(params, k, x) for k in range(n_src)])

        @jax.jit
        def step(sF, sE, img_x, img_x2, label_x1h, domain_x, img_u, img_u2,
                 rng):
            # per-group domain ids computed in-step from the global
            # (sharded) vector — sliced multi-host hosts never need the
            # full vector host-side
            doms = domain_x.reshape(n_domain, split)[:, 0]
            # pseudo-labels from the most confident expert (frozen nets;
            # the reference's no_grad train forward still advances F's BN
            # running stats — keep them for the update forwards below)
            feat_u0, bs_pseudo = apply_train(
                netF, sF["params"], sF["batch_stats"], img_u, rng
            )
            bs_pseudo = jax.lax.stop_gradient(bs_pseudo)
            pred_u = all_experts(sE["params"], feat_u0)  # [K, B, C]
            experts_max_p = pred_u.max(2)  # [K, B]
            experts_max_idx = pred_u.argmax(2)  # [K, B]
            max_expert_idx = experts_max_p.argmax(0)  # [B]
            b_idx = jnp.arange(pred_u.shape[1])
            pseudo = experts_max_idx[max_expert_idx, b_idx]
            pseudo_1h = F.create_onehot(pseudo, n_cls)
            mask_u = (
                experts_max_p.max(0) >= conf_thre
            ).astype(jnp.float32)
            pseudo_1h = jax.lax.stop_gradient(pseudo_1h)
            mask_u = jax.lax.stop_gradient(mask_u)

            imgs = img_x.reshape((n_domain, split) + img_x.shape[1:])
            imgs2 = img_x2.reshape((n_domain, split) + img_x2.shape[1:])
            labels = label_x1h.reshape(n_domain, split, n_cls)

            def loss_fn(pF, pE):
                loss_x = jnp.float32(0)
                loss_cr = jnp.float32(0)
                acc_x = jnp.float32(0)
                # reference forward order after the pseudo forward: ALL
                # weak source views, ALL strong source views, then the
                # strong target view (BN stats are order-dependent)
                bs = bs_pseudo
                feats, feats2 = [], []
                for g in range(n_domain):
                    f, bs = apply_train(netF, pF, bs, imgs[g], rng)
                    feats.append(f)
                for g in range(n_domain):
                    f2, bs = apply_train(netF, pF, bs, imgs2[g], rng)
                    feats2.append(f2)
                feat_u2, bs = apply_train(netF, pF, bs, img_u2, rng)
                for g in range(n_domain):
                    pred_i = expert(pE, doms[g], feats[g])
                    loss_x += (
                        -labels[g] * jnp.log(pred_i + 1e-5)
                    ).sum(1).mean()
                    expert_label = jax.lax.stop_gradient(pred_i)
                    acc_x += (
                        pred_i.argmax(1) == labels[g].argmax(1)
                    ).mean() * 100.0  # percent (reference compute_accuracy)
                    # consistency: mean of the OTHER domains' experts on
                    # the strong view (h == g skipped outright)
                    cr = jnp.zeros_like(pred_i)
                    for h in range(n_domain):
                        if h == g:
                            continue
                        cr = cr + expert(pE, doms[h], feats2[g])
                    cr = cr / (n_domain - 1)
                    loss_cr += ((cr - expert_label) ** 2).sum(1).mean()

                loss_x /= n_domain
                loss_cr /= n_domain
                acc_x /= n_domain

                pred_u2 = all_experts(pE, feat_u2).mean(0)
                l_u = (-pseudo_1h * jnp.log(pred_u2 + 1e-5)).sum(1)
                loss_u = (l_u * mask_u).mean()
                loss = loss_x + loss_cr + loss_u * weight_u
                return loss, (loss_x, loss_cr, loss_u, acc_x, bs)

            (_, (loss_x, loss_cr, loss_u, acc_x, bs)), (gF, gE) = (
                jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                    sF["params"], sE["params"]
                )
            )
            updF, optF = txF.update(gF, sF["opt_state"], sF["params"])
            pF = optax.apply_updates(sF["params"], updF)
            updE, optE = txE.update(gE, sE["opt_state"], sE["params"])
            pE = optax.apply_updates(sE["params"], updE)
            return (
                {"params": pF, "batch_stats": bs, "opt_state": optF},
                {"params": pE, "batch_stats": {}, "opt_state": optE},
                {"loss_x": loss_x, "acc_x": acc_x, "loss_cr": loss_cr,
                 "loss_u": loss_u},
            )

        self._dael_step = step

    def forward_backward_xu(self, batch_x, batch_u):
        loc_x = bool(batch_x.get("_local", False))
        loc_u = bool(batch_u.get("_local", False))
        img_x = self._shard(nchw_to_nhwc(batch_x["img"]), local=loc_x)
        img_x2 = self._shard(nchw_to_nhwc(batch_x["img2"]), local=loc_x)
        label_1h = F.create_onehot(
            self._shard(batch_x["label"], local=loc_x), self.num_classes
        )
        domain_x = self._shard(
            np.asarray(batch_x["domain"], np.int32), local=loc_x
        )
        img_u = self._shard(nchw_to_nhwc(batch_u["img"]), local=loc_u)
        img_u2 = self._shard(nchw_to_nhwc(batch_u["img2"]), local=loc_u)
        sF, sE, metrics = self._dael_step(
            self._models["F"], self._models["E"], img_x, img_x2, label_1h,
            domain_x, img_u, img_u2, self.step_rng(),
        )
        self._models["F"], self._models["E"] = sF, sE
        out = {k: float(v) for k, v in metrics.items()}
        out["loss"] = out["loss_x"]
        return out

    def model_inference(self, batch, scale_no=0):
        x = self.eval_images(batch)
        if "infer" not in self._infer_cache:
            netF, expertE = self.net, self.E
            n_src = self.num_source_domains

            def infer(sF, sE, xx):
                f = apply_eval(netF, sF, xx)
                p = jnp.stack([
                    expertE.apply({"params": sE["params"]}, k, f)
                    for k in range(n_src)
                ])
                return p.mean(0)

            self._infer_cache["infer"] = jax.jit(infer)
        out = self._infer_cache["infer"](
            {k: self._models["F"][k] for k in ("params", "batch_stats")},
            self._models["E"], x,
        )
        return to_host(out)


@TRAINER_REGISTRY.register()
class CDAC(TrainerXU):
    """Cross-domain adaptive clustering (reference ``da/cdac.py``):
    adversarial pairwise clustering + pseudo-labels + strong-view
    consistency, with the paper's per-iteration LR annealing."""

    def check_cfg(self, cfg):
        assert len(cfg.TRAINER.CDAC.STRONG_TRANSFORMS) > 0, (
            "Strong augmentations are necessary to run CDAC"
        )
        assert cfg.DATALOADER.K_TRANSFORMS == 2, (
            "CDAC needs two strong augmentations of the same image."
        )

    def build_data_manager(self):
        cfg = self.cfg
        tfm_strong = build_transform(
            cfg, is_train=True, choices=cfg.TRAINER.CDAC.STRONG_TRANSFORMS
        )
        # K-pair + strong views slice per host (whole items, globally
        # seeded streams)
        return DataManager(
            cfg, tfm_train_strong=tfm_strong,
            allow_local_batches=type(self).SUPPORTS_LOCAL_BATCHES,
        )

    def build_model(self):
        cfg = self.cfg
        print("Building F")
        self.net = build_simplenet(cfg, cfg.MODEL, 0)
        state = self.init_net(self.net)
        self.tx = build_optimizer(cfg.OPTIM)
        state["opt_state"] = self.tx.init(state["params"])
        self.register_model("F", self.net, state, self.tx)

        print("Building C")
        self.C = Prototypes(self.net.fdim, self.num_classes)
        c_state = self.init_net(self.C, input_shape=(2, self.net.fdim))
        self.tx_c = build_optimizer(cfg.OPTIM)
        c_state["opt_state"] = self.tx_c.init(c_state["params"])
        self.register_model("C", self.C, c_state, self.tx_c)

        # the CDAC lr rides custom per-iteration annealing, not the epoch
        # table (reference custom_scheduler)
        self.lr_table = [cfg.OPTIM.LR] * cfg.OPTIM.MAX_EPOCH
        self._build_cdac_step()

    @property
    def state(self):
        return self._models["F"]

    @state.setter
    def state(self, v):
        self._models["F"] = v

    def before_epoch(self):
        pass  # per-iteration LR (set in forward_backward_xu)

    @staticmethod
    def _anneal(iter_, max_iter, alpha=10, beta=0.75):
        return (1 + (iter_ / max_iter) * alpha) ** (-beta)

    def _build_cdac_step(self):
        netF, protC = self.net, self.C
        txF, txC = self.tx, self.tx_c
        topk = int(self.cfg.TRAINER.CDAC.TOPK_MATCH)
        p_thresh = float(self.cfg.TRAINER.CDAC.P_THRESH)

        def similarity_matrix(feat):
            # rows match when their top-k feature-index SETS are equal
            feat = jax.lax.stop_gradient(feat)
            top = jnp.sort(
                jnp.argsort(feat, axis=1)[:, ::-1][:, :topk], axis=1
            )
            return (top[:, None, :] == top[None, :, :]).all(-1).astype(
                jnp.float32
            )

        def aac(sim_mat, prob_u, prob_us):
            p = prob_u @ prob_us.T
            loss = -(
                sim_mat * jnp.log(p + 1e-7)
                + (1.0 - sim_mat) * jnp.log(1.0 - p + 1e-7)
            )
            return loss.mean()

        @jax.jit
        def step(sF, sC, img_x, label_x, img_u, img_us, img_us2, label_u,
                 cons_multi, rng):
            # ---- supervised update ------------------------------------
            def loss_sup(pF, pC):
                feat_x, bs = apply_train(
                    netF, pF, sF["batch_stats"], img_x, rng
                )
                logit_x = protC.apply({"params": pC}, feat_x)
                return F.cross_entropy(logit_x, label_x), (logit_x, bs)

            (loss_x, (logit_x, bsF)), (gF, gC) = jax.value_and_grad(
                loss_sup, argnums=(0, 1), has_aux=True
            )(sF["params"], sC["params"])
            updF, optF = txF.update(gF, sF["opt_state"], sF["params"])
            pF = optax.apply_updates(sF["params"], updF)
            updC, optC = txC.update(gC, sC["opt_state"], sC["params"])
            pC = optax.apply_updates(sC["params"], updC)

            # ---- unsupervised update ----------------------------------
            def loss_unsup(pF_, pC_):
                bs = bsF
                feat_u, bs = apply_train(netF, pF_, bs, img_u, rng)
                feat_us, bs = apply_train(netF, pF_, bs, img_us, rng)
                feat_us2, bs = apply_train(netF, pF_, bs, img_us2, rng)

                logit_u_r = protC.apply({"params": pC_}, feat_u, reverse=True)
                logit_us_r = protC.apply({"params": pC_}, feat_us, reverse=True)
                prob_u_r = jax.nn.softmax(logit_u_r, 1)
                prob_us_r = jax.nn.softmax(logit_us_r, 1)
                sim_mat = similarity_matrix(feat_u)
                aac_loss = -1.0 * aac(sim_mat, prob_u_r, prob_us_r)

                logit_u = protC.apply({"params": pC_}, feat_u)
                logit_us = protC.apply({"params": pC_}, feat_us)
                logit_us2 = protC.apply({"params": pC_}, feat_us2)
                prob_u = jax.lax.stop_gradient(jax.nn.softmax(logit_u, 1))
                prob_us = jax.nn.softmax(logit_us, 1)
                prob_us2 = jax.nn.softmax(logit_us2, 1)
                max_probs = prob_u.max(1)
                max_idx = prob_u.argmax(1)
                mask = (max_probs >= p_thresh).astype(jnp.float32)
                pl_loss = (
                    F.cross_entropy(logit_us2, max_idx, reduction="none")
                    * mask
                ).mean()
                cons_loss = cons_multi * ((prob_us - prob_us2) ** 2).mean()
                loss_u = aac_loss + pl_loss + cons_loss
                hit = (max_idx == label_u).astype(jnp.float32)
                stats = (
                    (hit * mask).sum() / (mask.sum() + 1e-5),
                    hit.mean(),
                    mask.mean(),
                )
                return loss_u, (aac_loss, pl_loss, cons_loss, stats, bs)

            (loss_u, (aac_loss, pl_loss, cons_loss, stats, bsF2)), (gF, gC) = (
                jax.value_and_grad(loss_unsup, argnums=(0, 1), has_aux=True)(
                    pF, pC
                )
            )
            updF, optF = txF.update(gF, optF, pF)
            pF = optax.apply_updates(pF, updF)
            updC, optC = txC.update(gC, optC, pC)
            pC = optax.apply_updates(pC, updC)

            acc = (logit_x.argmax(1) == label_x).mean() * 100.0  # percent (reference compute_accuracy)
            return (
                {"params": pF, "batch_stats": bsF2, "opt_state": optF},
                {"params": pC, "batch_stats": sC["batch_stats"],
                 "opt_state": optC},
                {"loss_x": loss_x, "acc_x": acc, "loss_u": loss_u,
                 "aac_loss": aac_loss, "pl_loss": pl_loss,
                 "cons_loss": cons_loss, "p_u_pred_acc_thre": stats[0],
                 "p_u_pred_acc": stats[1], "p_u_pred_keep": stats[2]},
            )

        self._cdac_step = step

    def _first_variant(self, arr, k):
        """[B*K, ...] adjacent layout -> variant ``i`` as [B, ...]."""
        x = nchw_to_nhwc(arr)
        return x.reshape((x.shape[0] // k, k) + x.shape[1:])

    def forward_backward_xu(self, batch_x, batch_u):
        cfg = self.cfg
        k = cfg.DATALOADER.K_TRANSFORMS
        lr_multi = float(cfg.TRAINER.CDAC.CLASS_LR_MULTI)
        current_itr = self.epoch * self.num_batches + self.batch_idx
        max_iter = self.max_epoch * self.num_batches
        factor = self._anneal(current_itr, max_iter)
        self._models["F"]["opt_state"] = set_lr(
            self._models["F"]["opt_state"], cfg.OPTIM.LR * factor
        )
        self._models["C"]["opt_state"] = set_lr(
            self._models["C"]["opt_state"], cfg.OPTIM.LR * lr_multi * factor
        )

        # sliced multi-host batches hold whole items: the [B, k] variant
        # splits are exact per slice, and the strong stream (img2) is
        # keyed on global positions — pixel-identical to a full decode
        loc_x = bool(batch_x.get("_local", False))
        loc_u = bool(batch_u.get("_local", False))
        xs = self._first_variant(batch_x["img"], k)
        img_x = self._shard(xs[:, 0], local=loc_x)
        label_x = self._shard(batch_x["label"][::k], local=loc_x)
        us = self._first_variant(batch_u["img"], k)
        img_u = self._shard(us[:, 0], local=loc_u)
        uss = self._first_variant(batch_u["img2"], k)
        img_us = self._shard(uss[:, 0], local=loc_u)
        img_us2 = self._shard(uss[:, 1], local=loc_u)
        label_u = self._shard(batch_u["label"][::k], local=loc_u)

        cons_multi = (
            F.sigmoid_rampup(current_itr, int(cfg.TRAINER.CDAC.RAMPUP_ITRS))
            * float(cfg.TRAINER.CDAC.RAMPUP_COEF)
        )
        sF, sC, metrics = self._cdac_step(
            self._models["F"], self._models["C"], img_x, label_x, img_u,
            img_us, img_us2, label_u, jnp.float32(cons_multi),
            self.step_rng(),
        )
        self._models["F"], self._models["C"] = sF, sC
        out = {k_: float(v) for k_, v in metrics.items()}
        out["loss"] = out["loss_x"]
        return out

    def model_inference(self, batch, scale_no=0):
        x = self.eval_images(batch)
        if "infer" not in self._infer_cache:
            netF, protC = self.net, self.C

            def infer(sF, sC, xx):
                return protC.apply(
                    {"params": sC["params"]}, apply_eval(netF, sF, xx)
                )

            self._infer_cache["infer"] = jax.jit(infer)
        out = self._infer_cache["infer"](
            {k: self._models["F"][k] for k in ("params", "batch_stats")},
            self._models["C"], x,
        )
        return to_host(out)
