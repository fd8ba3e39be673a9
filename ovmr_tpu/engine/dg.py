"""Domain-generalization trainers (reference ``dassl/engine/dg/``):
Vanilla, CrossGrad, DDAIG, DAELDG, DomainMix.

CrossGrad differentiates the losses w.r.t. the INPUT batch (jax.grad on
the image argument — the reference uses ``input.requires_grad``); DDAIG
alternates generator/label-net/domain-net updates inside one compiled
step; DomainMix builds its cross-domain permutation host-side (the
counts are data-dependent) and jits the mixed supervised update.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ovmr_tpu.data.manager import DataManager
from ovmr_tpu.data.transforms import build_transform
from ovmr_tpu.engine.dassl_base import (
    StackedLinears,
    TrainerX,
    apply_eval,
    apply_train,
    build_simplenet,
    nchw_to_nhwc,
)
from ovmr_tpu.engine.optimizers import build_optimizer
from ovmr_tpu.engine.trainer import TRAINER_REGISTRY
from ovmr_tpu.parallel import to_host
from ovmr_tpu.modeling import build_network
from ovmr_tpu.modeling import ops as F


@TRAINER_REGISTRY.register()
class Vanilla(TrainerX):
    """Empirical risk minimization (reference ``dg/vanilla.py``) — the
    default supervised step of :class:`DasslTrainer`."""


@TRAINER_REGISTRY.register()
class CrossGrad(TrainerX):
    """Cross-gradient training (reference ``dg/crossgrad.py``): label and
    domain nets perturb each other's inputs with clipped input-gradients."""

    def build_model(self):
        cfg = self.cfg
        print("Building F")
        self.netF = build_simplenet(cfg, cfg.MODEL, self.num_classes)
        sF = self.init_net(self.netF)
        self.txF = build_optimizer(cfg.OPTIM)
        sF["opt_state"] = self.txF.init(sF["params"])
        self.register_model("F", self.netF, sF, self.txF)

        print("Building D")
        self.netD = build_simplenet(cfg, cfg.MODEL, self.num_source_domains)
        sD = self.init_net(self.netD)
        self.txD = build_optimizer(cfg.OPTIM)
        sD["opt_state"] = self.txD.init(sD["params"])
        self.register_model("D", self.netD, sD, self.txD)

        from ovmr_tpu.engine.schedule import lr_schedule_from_cfg

        self.lr_table = lr_schedule_from_cfg(cfg.OPTIM)
        self._build_cg_step()

    @property
    def state(self):
        return self._models["F"]

    @state.setter
    def state(self, v):
        self._models["F"] = v

    def _build_cg_step(self):
        netF, netD = self.netF, self.netD
        txF, txD = self.txF, self.txD
        t = self.cfg.TRAINER.CROSSGRAD
        eps_f, eps_d = float(t.EPS_F), float(t.EPS_D)
        alpha_f, alpha_d = float(t.ALPHA_F), float(t.ALPHA_D)

        @jax.jit
        def step(sF, sD, img, label, domain, rng):
            # input-gradients of each net's loss (params frozen). The
            # reference runs these forwards in train mode, so their BN
            # running-stat updates are kept (has_aux) and thread into the
            # parameter updates below
            def d_loss_wrt_input(x):
                out, bs = apply_train(
                    netD, sD["params"], sD["batch_stats"], x, rng
                )
                return F.cross_entropy(out, domain), bs

            def f_loss_wrt_input(x):
                out, bs = apply_train(
                    netF, sF["params"], sF["batch_stats"], x, rng
                )
                return F.cross_entropy(out, label), bs

            grad_d, bsD0 = jax.grad(d_loss_wrt_input, has_aux=True)(img)
            input_d = img + eps_f * jnp.clip(grad_d, -0.1, 0.1)
            grad_f, bsF0 = jax.grad(f_loss_wrt_input, has_aux=True)(img)
            input_f = img + eps_d * jnp.clip(grad_f, -0.1, 0.1)
            bsD0 = jax.lax.stop_gradient(bsD0)
            bsF0 = jax.lax.stop_gradient(bsF0)

            # update label net on (x, x_d)
            def loss_F(params):
                out1, bs = apply_train(netF, params, bsF0, img, rng)
                out2, bs = apply_train(netF, params, bs, input_d, rng)
                loss = (1 - alpha_f) * F.cross_entropy(out1, label) + (
                    alpha_f * F.cross_entropy(out2, label)
                )
                return loss, bs

            (loss_f, bsF), gF = jax.value_and_grad(loss_F, has_aux=True)(
                sF["params"]
            )
            updF, optF = txF.update(gF, sF["opt_state"], sF["params"])
            pF = optax.apply_updates(sF["params"], updF)

            # update domain net on (x, x_f)
            def loss_D(params):
                out1, bs = apply_train(netD, params, bsD0, img, rng)
                out2, bs = apply_train(netD, params, bs, input_f, rng)
                loss = (1 - alpha_d) * F.cross_entropy(out1, domain) + (
                    alpha_d * F.cross_entropy(out2, domain)
                )
                return loss, bs

            (loss_d, bsD), gD = jax.value_and_grad(loss_D, has_aux=True)(
                sD["params"]
            )
            updD, optD = txD.update(gD, sD["opt_state"], sD["params"])
            pD = optax.apply_updates(sD["params"], updD)

            return (
                {"params": pF, "batch_stats": bsF, "opt_state": optF},
                {"params": pD, "batch_stats": bsD, "opt_state": optD},
                {"loss_f": loss_f, "loss_d": loss_d},
            )

        self._cg_step = step

    def forward_backward(self, batch):
        img, label, domain = self.parse_batch_train(batch)
        sF, sD, metrics = self._cg_step(
            self._models["F"], self._models["D"], img, label, domain,
            self.step_rng(),
        )
        self._models["F"], self._models["D"] = sF, sD
        out = {k: float(v) for k, v in metrics.items()}
        out["loss"] = out["loss_f"]
        return out

    # inference: DasslTrainer.model_inference on the first registered
    # model ("F"), matching the reference's `return self.F(input)`


@TRAINER_REGISTRY.register()
class DDAIG(TrainerX):
    """Deep domain-adversarial image generation (reference
    ``dg/ddaig.py``): the FCN generator perturbs inputs to fool the
    domain net while preserving the label net."""

    def build_model(self):
        cfg = self.cfg
        print("Building F")
        self.netF = build_simplenet(cfg, cfg.MODEL, self.num_classes)
        sF = self.init_net(self.netF)
        self.txF = build_optimizer(cfg.OPTIM)
        sF["opt_state"] = self.txF.init(sF["params"])
        self.register_model("F", self.netF, sF, self.txF)

        print("Building D")
        self.netD = build_simplenet(cfg, cfg.MODEL, self.num_source_domains)
        sD = self.init_net(self.netD)
        self.txD = build_optimizer(cfg.OPTIM)
        sD["opt_state"] = self.txD.init(sD["params"])
        self.register_model("D", self.netD, sD, self.txD)

        print("Building G")
        self.netG = build_network(
            cfg.TRAINER.DDAIG.G_ARCH, verbose=cfg.VERBOSE,
            image_size=cfg.INPUT.SIZE[0],
        )
        sG = self.init_net(self.netG)
        self.txG = build_optimizer(cfg.OPTIM)
        sG["opt_state"] = self.txG.init(sG["params"])
        self.register_model("G", self.netG, sG, self.txG)

        from ovmr_tpu.engine.schedule import lr_schedule_from_cfg

        self.lr_table = lr_schedule_from_cfg(cfg.OPTIM)
        self._build_ddaig_step()

    @property
    def state(self):
        return self._models["F"]

    @state.setter
    def state(self, v):
        self._models["F"] = v

    def _build_ddaig_step(self):
        netF, netD, netG = self.netF, self.netD, self.netG
        txF, txD, txG = self.txF, self.txD, self.txG
        t = self.cfg.TRAINER.DDAIG
        lmda, alpha = float(t.LMDA), float(t.ALPHA)
        clamp = bool(t.CLAMP)
        cmin, cmax = float(t.CLAMP_MIN), float(t.CLAMP_MAX)

        def perturb(g_params, g_bs, x):
            out = netG.apply(
                {"params": g_params, "batch_stats": g_bs}, x, lmda=lmda,
                train=True, mutable=["batch_stats"],
            )
            x_p, new_bs = out
            if clamp:
                x_p = jnp.clip(x_p, cmin, cmax)
            return x_p, new_bs["batch_stats"]

        from functools import partial

        @partial(jax.jit, static_argnums=(6,))
        def step(sF, sD, sG, img, label, domain, apply_pert, rng):
            # ---- update G -------------------------------------------
            # the G-phase F/D forwards run in train mode in the
            # reference, so their BN running-stat updates carry into the
            # F/D updates below (has_aux)
            def loss_G(gp):
                x_p, g_bs = perturb(gp, sG["batch_stats"], img)
                out_f, f_bs = apply_train(
                    netF, sF["params"], sF["batch_stats"], x_p, rng
                )
                out_d, d_bs = apply_train(
                    netD, sD["params"], sD["batch_stats"], x_p, rng
                )
                loss = F.cross_entropy(out_f, label)
                loss -= F.cross_entropy(out_d, domain)
                return loss, (g_bs, f_bs, d_bs)

            (loss_g, (g_bs, bsF0, bsD0)), gG = jax.value_and_grad(
                loss_G, has_aux=True
            )(sG["params"])
            bsF0 = jax.lax.stop_gradient(bsF0)
            bsD0 = jax.lax.stop_gradient(bsD0)
            updG, optG = txG.update(gG, sG["opt_state"], sG["params"])
            pG = optax.apply_updates(sG["params"], updG)

            # perturb with the NEW generator (no grad)
            x_p, g_bs = perturb(pG, g_bs, img)
            x_p = jax.lax.stop_gradient(x_p)

            # ---- update F -------------------------------------------
            # apply_pert is STATIC: during warmup the reference never
            # runs the perturbed forward at all (no BN update from it)
            def loss_Fm(params):
                out, bs = apply_train(netF, params, bsF0, img, rng)
                loss = F.cross_entropy(out, label)
                if apply_pert:
                    out_p, bs = apply_train(netF, params, bs, x_p, rng)
                    loss = (1 - alpha) * loss + alpha * F.cross_entropy(
                        out_p, label
                    )
                return loss, bs

            (loss_f, bsF), gF = jax.value_and_grad(loss_Fm, has_aux=True)(
                sF["params"]
            )
            updF, optF = txF.update(gF, sF["opt_state"], sF["params"])
            pF = optax.apply_updates(sF["params"], updF)

            # ---- update D -------------------------------------------
            def loss_Dm(params):
                out, bs = apply_train(netD, params, bsD0, img, rng)
                return F.cross_entropy(out, domain), bs

            (loss_d, bsD), gD = jax.value_and_grad(loss_Dm, has_aux=True)(
                sD["params"]
            )
            updD, optD = txD.update(gD, sD["opt_state"], sD["params"])
            pD = optax.apply_updates(sD["params"], updD)

            return (
                {"params": pF, "batch_stats": bsF, "opt_state": optF},
                {"params": pD, "batch_stats": bsD, "opt_state": optD},
                {"params": pG, "batch_stats": g_bs, "opt_state": optG},
                {"loss_g": loss_g, "loss_f": loss_f, "loss_d": loss_d},
            )

        self._ddaig_step = step

    def forward_backward(self, batch):
        img, label, domain = self.parse_batch_train(batch)
        apply_pert = (self.epoch + 1) > int(self.cfg.TRAINER.DDAIG.WARMUP)
        sF, sD, sG, metrics = self._ddaig_step(
            self._models["F"], self._models["D"], self._models["G"],
            img, label, domain, bool(apply_pert), self.step_rng(),
        )
        self._models["F"] = sF
        self._models["D"] = sD
        self._models["G"] = sG
        out = {k: float(v) for k, v in metrics.items()}
        out["loss"] = out["loss_f"]
        return out

    # inference: DasslTrainer.model_inference on the first registered
    # model ("F"), matching the reference's `return self.F(input)`


@TRAINER_REGISTRY.register()
class DAELDG(TrainerX):
    """DAEL for DG — labeled sources only (reference ``dg/daeldg.py``):
    per-domain experts + cross-expert consistency on the strong view."""

    def check_cfg(self, cfg):
        assert cfg.DATALOADER.TRAIN_X.SAMPLER == "RandomDomainSampler"
        assert len(cfg.TRAINER.DAELDG.STRONG_TRANSFORMS) > 0

    def build_data_manager(self):
        cfg = self.cfg
        tfm_strong = build_transform(
            cfg, is_train=True, choices=cfg.TRAINER.DAELDG.STRONG_TRANSFORMS
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
        self._build_daeldg_step()

    @property
    def state(self):
        return self._models["F"]

    @state.setter
    def state(self, v):
        self._models["F"] = v

    def _build_daeldg_step(self):
        netF, expertE = self.net, self.E
        txF, txE = self.tx, self.tx_e
        n_domain = self.n_domain
        split = self.split_batch
        n_cls = self.num_classes

        def expert(params, i, x):
            return expertE.apply({"params": params}, i, x)

        @jax.jit
        def step(sF, sE, img, img2, label_1h, domain, rng):
            # per-group domain ids computed in-step from the global
            # (sharded) vector — sliced multi-host hosts never need the
            # full vector host-side
            doms = domain.reshape(n_domain, split)[:, 0]
            imgs = img.reshape((n_domain, split) + img.shape[1:])
            imgs2 = img2.reshape((n_domain, split) + img2.shape[1:])
            labels = label_1h.reshape(n_domain, split, n_cls)

            def loss_fn(pF, pE):
                loss_x = jnp.float32(0)
                loss_cr = jnp.float32(0)
                acc = jnp.float32(0)
                bs = sF["batch_stats"]
                # reference forward order: ALL weak views, then ALL strong
                # views (BN running stats are order-dependent)
                feats, feats2 = [], []
                for g in range(n_domain):
                    f, bs = apply_train(netF, pF, bs, imgs[g], rng)
                    feats.append(f)
                for g in range(n_domain):
                    f2, bs = apply_train(netF, pF, bs, imgs2[g], rng)
                    feats2.append(f2)
                for g in range(n_domain):
                    pred_i = expert(pE, doms[g], feats[g])
                    loss_x += (
                        -labels[g] * jnp.log(pred_i + 1e-5)
                    ).sum(1).mean()
                    expert_label = jax.lax.stop_gradient(pred_i)
                    acc += (pred_i.argmax(1) == labels[g].argmax(1)).mean() * 100.0  # percent (reference compute_accuracy)
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
                acc /= n_domain
                return loss_x + loss_cr, (loss_x, loss_cr, acc, bs)

            (_, (loss_x, loss_cr, acc, bs)), (gF, gE) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(sF["params"], sE["params"])
            updF, optF = txF.update(gF, sF["opt_state"], sF["params"])
            pF = optax.apply_updates(sF["params"], updF)
            updE, optE = txE.update(gE, sE["opt_state"], sE["params"])
            pE = optax.apply_updates(sE["params"], updE)
            return (
                {"params": pF, "batch_stats": bs, "opt_state": optF},
                {"params": pE, "batch_stats": {}, "opt_state": optE},
                {"loss_x": loss_x, "acc": acc, "loss_cr": loss_cr},
            )

        self._daeldg_step = step

    def forward_backward(self, batch):
        loc = bool(batch.get("_local", False))
        img = self._shard(nchw_to_nhwc(batch["img"]), local=loc)
        img2 = self._shard(nchw_to_nhwc(batch["img2"]), local=loc)
        label_1h = F.create_onehot(
            self._shard(batch["label"], local=loc), self.num_classes
        )
        domain = self._shard(
            np.asarray(batch["domain"], np.int32), local=loc
        )
        sF, sE, metrics = self._daeldg_step(
            self._models["F"], self._models["E"], img, img2, label_1h,
            domain, self.step_rng(),
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
class DomainMix(TrainerX):
    """DomainMix (reference ``dg/domain_mix.py``): mixup across samples
    ('random') or across domains ('crossdomain'); the permutation is
    data-dependent so it is built host-side."""

    # the host-side mix permutes across the WHOLE batch — every process
    # must decode it fully (no multi-host sliced loading)
    SUPPORTS_LOCAL_BATCHES = False

    def _build_steps(self):
        net, tx = self.net, self.tx

        @jax.jit
        def step(state, img, label_a, label_b, lam, rng):
            def loss_fn(params):
                out, bs = apply_train(
                    net, params, state["batch_stats"], img, rng
                )
                loss = lam * F.cross_entropy(out, label_a) + (
                    1 - lam
                ) * F.cross_entropy(out, label_b)
                return loss, (out, bs)

            (loss, (out, bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state["params"])
            upd, opt = tx.update(grads, state["opt_state"], state["params"])
            params = optax.apply_updates(state["params"], upd)
            acc = (out.argmax(1) == label_a).mean() * 100.0  # percent (reference compute_accuracy)
            return (
                {"params": params, "batch_stats": bs, "opt_state": opt},
                {"loss": loss, "acc": acc},
            )

        self.train_step = step
        self._np_rng = np.random.default_rng(max(self.cfg.SEED, 0))

    def _domain_mix(self, x, target, domain):
        t = self.cfg.TRAINER.DOMAINMIX
        alpha, beta = float(t.ALPHA), float(t.BETA)
        lam = (
            float(self._np_rng.beta(alpha, beta)) if alpha > 0 else 1.0
        )
        b = x.shape[0]
        perm = self._np_rng.permutation(b)
        if t.TYPE == "crossdomain":
            domain_list = np.unique(domain)
            if len(domain_list) > 1:
                for idx in domain_list:
                    # pair each sample of domain idx with one drawn from
                    # the OTHER domains (with replacement iff needed)
                    cnt_a = int((domain == idx).sum())
                    idx_b = np.flatnonzero(domain != idx)
                    perm_b = self._np_rng.choice(
                        len(idx_b), size=cnt_a,
                        replace=bool(cnt_a > len(idx_b)),
                    )
                    perm[domain == idx] = idx_b[perm_b]
        elif t.TYPE != "random":
            raise NotImplementedError(
                f"Chooses {'random', 'crossdomain'}, but got {t.TYPE}."
            )
        mixed = lam * x + (1 - lam) * x[perm]
        return mixed, target, target[perm], lam

    def forward_backward(self, batch):
        img = nchw_to_nhwc(batch["img"])
        target = np.asarray(batch["label"])
        domain = np.asarray(batch["domain"])
        mixed, label_a, label_b, lam = self._domain_mix(img, target, domain)
        self.state, metrics = self.train_step(
            self.state, self._shard(mixed), self._shard(label_a),
            self._shard(label_b), jnp.float32(lam), self.step_rng(),
        )
        return {k: float(v) for k, v in metrics.items()}
