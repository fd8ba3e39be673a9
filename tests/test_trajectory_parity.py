"""Joint N-step training-trajectory parity vs the REFERENCE trainers.

Twenty-one pins, twenty trainers — the COMPLETE runnable roster:
MM_CLS_OP (this docstring's recipe), CoOp stage-2 (both loss regimes),
FixMatch, DANN, MCD, MeanTeacher (on the fixed rmsprop), DDAIG,
CrossGrad (on the fixed amsgrad), MME, M3SDA, DAEL, CDAC, SE, ADDA,
EntMin (on adamw's decoupled decay), AdaBN, DAELDG, MixMatch and
DomainMix (reference torch draws recorded + injected), Vanilla/ERM (on
the vendored radam; SourceOnly/SupBaseline reuse its composition
verbatim) — every engine family (flagship, SSL, DA, DG) and EVERY
reference optimizer end-to-end (adam, amsgrad, adamw, sgd, sgd+nesterov,
rmsprop, radam; custom_adam is flagship-side, pinned per-op in
test_optim_extra.py), across warmup types (constant, linear, none) x
schedulers (cosine, single_step, CDAC's per-iteration LambdaLR). See the per-section comments below and
tools/gen_trajectory_golden*.py.

Methodology note on tolerances: several compositions are measurably
CHAOTIC in fp32 (rmsprop sign-normalization, moment-distance sqrt,
adversarial coupling) — each generator's lr was chosen by perturbing the
reference's OWN inputs by 1e-6 and requiring its self-sensitivity to
stay ~1e-5. Final states are read FRESH through trainer.state /
trainer._models (the jitted steps REBIND those entries; a pre-training
local alias would silently compare the init state) and pinned as raw
params plus, for the EMA trainers, probe-batch logits (the
gauge-invariant function).

The fixture (tools/gen_trajectory_golden.py) ran the actual reference
``MM_CLS_OP.forward_backward`` (``trainers/mm_classifier_one_prompt.py:421-452``)
for 3 epochs x 3 batches on torch CPU through the real Dassl adam +
constant-warmup->cosine scheduler (``dassl/optim/optimizer.py:88-147``,
``lr_scheduler.py:83-152``), with recorded split points and dropout off.

Here the SAME weights/batches/splits drive our composition exactly as
``engine/trainer.py`` wires it — ``build_optimizer`` + ``lr_for_epoch``/
``set_lr`` at epoch start + ``make_train_step`` — and we pin:

- the lr the optimizer uses at every step (exact),
- the per-step loss trajectory (the sensitive instrument: any drift in
  update order / decay coupling / bias correction moves step k>1),
- the final aggregator params.

This is the composition evidence VERDICT r4 item 1 asked for: per-op
goldens (test_grad_parity, test_optim_extra) pin the pieces; this pins the
product over 9 consecutive optimizer updates.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ovmr_tpu.engine.optimizers import build_optimizer, set_lr
from ovmr_tpu.engine.schedule import lr_for_epoch
from ovmr_tpu.engine.train_step import make_train_step
from ovmr_tpu.models.import_torch import (
    clip_params_from_state_dict,
    prompt_learner_params_from_state_dict,
)
from ovmr_tpu.utils.defaults import get_cfg_default
from tests.helpers import npz_state_dict

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_golden.npz"
)

N_CLS, N_INS = 4, 8
EPOCHS, BATCHES_PER_EPOCH = 3, 3


@pytest.mark.quick
def test_nine_step_trajectory_matches_reference_trainer():
    data = np.load(FIXTURE)
    clip_params, ccfg = clip_params_from_state_dict(npz_state_dict(data, "clip"))
    agg = prompt_learner_params_from_state_dict(
        npz_state_dict(data, "agg_init"), n_layers=4
    )
    agg = jax.tree_util.tree_map(jnp.asarray, agg)

    base_lr, cons_lr, wd, b1, b2 = data["optim_scalars"]
    cfg = get_cfg_default()
    cfg.OPTIM.NAME = "adam"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.ADAM_BETA1 = float(b1)
    cfg.OPTIM.ADAM_BETA2 = float(b2)
    cfg.OPTIM.MAX_EPOCH = EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = float(cons_lr)

    optimizer = build_optimizer(cfg.OPTIM)
    opt_state = optimizer.init(agg)
    step_fn = make_train_step(ccfg, optimizer, dropout=0.0)

    images = np.asarray(data["images"], np.float32)  # [2, 32, 3, 64, 64]
    class_orders = data["class_orders"]
    ptok_all = jnp.asarray(data["ptok"])
    eot_all = jnp.asarray(data["eot"])
    vtok = jnp.asarray(data["vtok"])
    splits = data["splits"]
    batch_order = data["batch_order"]
    ref_losses = data["losses"]
    ref_lrs = data["lrs"]

    from ovmr_tpu.engine.schedule import lr_schedule_from_cfg

    lr_table = lr_schedule_from_cfg(cfg.OPTIM)
    rng = jax.random.PRNGKey(0)  # unused: dropout=0

    losses = []
    step = 0
    for epoch in range(EPOCHS):
        opt_state = set_lr(opt_state, lr_table[epoch])  # before_epoch
        for _ in range(BATCHES_PER_EPOCH):
            # the lr actually used this step must equal torch's param-group lr
            assert lr_table[epoch] == pytest.approx(ref_lrs[step], rel=1e-12)
            i = int(batch_order[step])
            order = class_orders[i]
            imgs = jnp.asarray(
                images[i].reshape(N_CLS, N_INS, *images.shape[2:])
            )
            agg, opt_state, loss = step_fn(
                agg,
                opt_state,
                clip_params,
                imgs,
                ptok_all[order],
                eot_all[order],
                vtok,
                rng,
                int(splits[step]),
            )
            losses.append(float(loss))
            step += 1

    np.testing.assert_allclose(losses, ref_losses, rtol=2e-5, atol=2e-5)

    final_ref = prompt_learner_params_from_state_dict(
        npz_state_dict(data, "agg_final"), n_layers=4
    )
    flat_ours = jax.tree_util.tree_leaves_with_path(agg)
    flat_ref = dict(jax.tree_util.tree_leaves_with_path(final_ref))
    assert len(flat_ours) == len(flat_ref)
    for path, ours in flat_ours:
        ref = flat_ref[path]
        diff = np.abs(np.asarray(ours) - ref)
        name = jax.tree_util.keystr(path)
        # adam normalizes: noise-gradient elements step +-lr with a sign that
        # is not reproducible across frameworks, so bound the BULK tightly
        # and the tail by a few lr-sized steps
        assert float(np.median(diff)) < 3e-6, name
        assert float(np.mean(diff)) < 2e-5, name
        assert float(diff.max()) < 12 * float(base_lr), name

    # trajectory moved far enough to be a real pin (not a frozen no-op)
    init = prompt_learner_params_from_state_dict(
        npz_state_dict(data, "agg_init"), n_layers=4
    )
    moved = np.abs(np.asarray(agg["cls_token"]) - init["cls_token"]).max()
    assert moved > 1e-4


# ---------------------------------------------------------------------------
# CoOp stage-2 (tools/gen_trajectory_golden_coop.py): 3-prompt loss at 4
# classes; >400-class single-random-prompt loss at 401 classes
# (coop_mm_classifier.py:317-337, 455-478)
# ---------------------------------------------------------------------------

COOP_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_coop_golden.npz"
)
COOP_EPOCHS, COOP_BATCHES = 3, 2


def _build_coop_trainer(data, classnames, vt, tmp_path, monkeypatch):
    import torch

    from ovmr_tpu.engine.coop import CoOp
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    base_lr, cons_lr, wd, b1, b2 = data["optim_scalars"]
    clip_path = str(tmp_path / "tiny_clip.pt")
    if not os.path.exists(clip_path):
        sd = {
            k[len("clip."):]: torch.from_numpy(np.asarray(data[k]))
            for k in data.files
            if k.startswith("clip.")
        }
        torch.save(sd, clip_path)
    vt_path = str(tmp_path / f"visual_tokens_{len(classnames)}.pt")
    torch.save({"visual_tokens": torch.from_numpy(vt)}, vt_path)
    monkeypatch.setenv("OVMR_CLIP_CKPT", clip_path)

    cfg = our_cfg()
    cfg.TRAINER.NAME = "CoOp"
    cfg.TRAINER.COOP.N_CTX = 2
    cfg.TRAINER.COOP.CTX_INIT = ""
    cfg.TRAINER.COOP.VISUAL_TOKEN_PATH = vt_path
    cfg.INPUT.SIZE = (64, 64)
    cfg.TPU.DTYPE = "float32"
    cfg.OPTIM.NAME = "adam"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.ADAM_BETA1 = float(b1)
    cfg.OPTIM.ADAM_BETA2 = float(b2)
    cfg.OPTIM.MAX_EPOCH = COOP_EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = float(cons_lr)
    cfg.SEED = 1

    trainer = CoOp.__new__(CoOp)
    trainer.cfg = cfg

    class _DS:
        pass

    class _DM:
        pass

    _DS.classnames = list(classnames)
    _DM.dataset = _DS()
    trainer.dm = _DM()
    trainer.build_model()
    # identical starting point: the reference ctx was randn-initialized and
    # recorded; everything else (prefix/suffix/vis_tail/eot) derives from
    # the same clip weights + tokenizer, which are parity-pinned elsewhere
    trainer.params = {"ctx": jnp.asarray(data["ctx_init"])}
    trainer.opt_state = trainer.optimizer.init(trainer.params)
    return trainer


@pytest.mark.parametrize("scenario", ["a", "b"])
def test_coop_stage2_trajectory_matches_reference_trainer(
    scenario, tmp_path, monkeypatch
):
    data = np.load(COOP_FIXTURE)
    classnames = data[f"classnames_{scenario}"]
    vt = np.asarray(data[f"vt_{scenario}"], np.float32)
    trainer = _build_coop_trainer(data, classnames, vt, tmp_path, monkeypatch)

    np.testing.assert_allclose(
        np.asarray(trainer.visual_tokens), vt, atol=1e-6
    )

    images = np.asarray(data["images"], np.float32)
    labels = data[f"labels_{scenario}"]
    ref_losses = data[f"losses_{scenario}"]
    ref_lrs = data["lrs"]
    prompt_inds = (
        data["prompt_inds_b"] if scenario == "b" else [0] * len(ref_losses)
    )

    losses = []
    step = 0
    params, opt_state = trainer.params, trainer.opt_state
    for epoch in range(COOP_EPOCHS):
        from ovmr_tpu.engine.optimizers import set_lr as _set_lr

        opt_state = _set_lr(opt_state, trainer.lr_table[epoch])
        for _ in range(COOP_BATCHES):
            assert trainer.lr_table[epoch] == pytest.approx(
                ref_lrs[step], rel=1e-12
            )
            i = step % 2
            params, opt_state, loss, _acc = trainer._step(
                params,
                opt_state,
                trainer.clip_params,
                jnp.asarray(images[i]),
                jnp.asarray(labels[i].astype(np.int32)),
                int(prompt_inds[step]),
            )
            losses.append(float(loss))
            step += 1

    np.testing.assert_allclose(losses, ref_losses, rtol=3e-5, atol=3e-5)

    ref_ctx = data[f"ctx_final_{scenario}"]
    diff = np.abs(np.asarray(params["ctx"]) - ref_ctx)
    assert float(np.median(diff)) < 3e-6
    assert float(diff.max()) < 12 * float(data["optim_scalars"][0])
    assert np.abs(ref_ctx - data["ctx_init"]).max() > 1e-5  # it really moved


# ---------------------------------------------------------------------------
# Dassl FixMatch (tools/gen_trajectory_golden_fixmatch.py): pseudo-label
# masking + 3 train-mode forwards per step (BN stat ordering) + SGD(momentum)
# + linear-warmup->cosine (dassl/engine/ssl/fixmatch.py:52-95)
# ---------------------------------------------------------------------------

FM_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_fixmatch_golden.npz"
)
FM_EPOCHS, FM_BATCHES = 3, 2


def _transplant(tree, data, prefix):
    """Replace leaves of `tree` in place from npz keys `{prefix}/{path}`."""
    n = 0
    for k in data.files:
        if not k.startswith(prefix + "/"):
            continue
        node = tree
        parts = k[len(prefix) + 1:].split("/")
        for p in parts[:-1]:
            node = node[p]
        assert parts[-1] in node, k
        assert tuple(node[parts[-1]].shape) == tuple(data[k].shape), k
        node[parts[-1]] = jnp.asarray(data[k])
        n += 1
    return n


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def test_fixmatch_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.optimizers import set_lr as _set_lr
    from ovmr_tpu.engine.ssl import FixMatch
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(FM_FIXTURE)
    base_lr, min_lr, wd, momentum, weight_u, conf_thre = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.TRAINER.FIXMATCH.WEIGHT_U = float(weight_u)
    cfg.TRAINER.FIXMATCH.CONF_THRE = float(conf_thre)
    cfg.TRAINER.FIXMATCH.STRONG_TRANSFORMS = ["random_flip"]
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.MOMENTUM = float(momentum)
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.SGD_NESTEROV = False
    cfg.OPTIM.MAX_EPOCH = FM_EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "linear"
    cfg.OPTIM.WARMUP_MIN_LR = float(min_lr)
    cfg.SEED = 1

    trainer = FixMatch.__new__(FixMatch)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg

    class _DM:
        num_classes = 4

    trainer.dm = _DM()
    trainer.build_model()

    state = trainer.state
    assert _transplant(state["params"], data, "init/params") == 14
    assert _transplant(state["batch_stats"], data, "init/batch_stats") == 2
    state["opt_state"] = trainer.tx.init(state["params"])

    imgs = {k: np.asarray(data[k], np.float32)
            for k in ("imgs_x", "imgs_x2", "imgs_u", "imgs_u2")}
    rng = jax.random.PRNGKey(0)  # no dropout anywhere in this net

    losses_x, losses_u, keeps = [], [], []
    step = 0
    for epoch in range(FM_EPOCHS):
        state["opt_state"] = _set_lr(state["opt_state"], trainer.lr_table[epoch])
        for _ in range(FM_BATCHES):
            assert trainer.lr_table[epoch] == pytest.approx(
                data["lrs"][step], rel=1e-12
            )
            i = step % 2
            state, metrics = trainer.train_step(
                state,
                _nhwc(imgs["imgs_x"][i]),
                _nhwc(imgs["imgs_x2"][i]),
                jnp.asarray(data["labels_x"][i].astype(np.int32)),
                _nhwc(imgs["imgs_u"][i]),
                _nhwc(imgs["imgs_u2"][i]),
                jnp.asarray(data["labels_u"][i].astype(np.int32)),
                rng,
            )
            losses_x.append(float(metrics["loss_x"]))
            losses_u.append(float(metrics["loss_u"]))
            keeps.append(float(metrics["y_u_pred_keep"]))
            step += 1

    np.testing.assert_allclose(losses_x, data["loss_x"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(losses_u, data["loss_u"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(keeps, data["keep"], atol=1e-6)
    assert any(0.0 < k < 1.0 for k in keeps)  # the mask path really fires

    # final params + BN running stats (the 3-forward ordering inside the
    # step is part of the pin)
    final_p = jax.tree_util.tree_map(lambda x: np.array(x), state["params"])
    _assert_tree_close(final_p, data, "final/params", atol=5e-5)
    final_s = jax.tree_util.tree_map(lambda x: np.array(x), state["batch_stats"])
    _assert_tree_close(final_s, data, "final/batch_stats", atol=5e-5)


def _assert_tree_close(tree, data, prefix, atol):
    n = 0
    for k in data.files:
        if not k.startswith(prefix + "/"):
            continue
        node = tree
        for p in k[len(prefix) + 1:].split("/"):
            node = node[p]
        np.testing.assert_allclose(node, data[k], atol=atol, rtol=1e-3, err_msg=k)
        n += 1
    assert n > 0


# ---------------------------------------------------------------------------
# Dassl DANN (tools/gen_trajectory_golden_dann.py): adversarial two-optimizer
# scheduling — GRL lambda ramp per global step, BCE critic with BN, BOTH
# optimizers stepped by one loss, warmup->single_step decay
# (dassl/engine/da/dann.py:45-77)
# ---------------------------------------------------------------------------

DANN_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_dann_golden.npz"
)
DANN_EPOCHS, DANN_BATCHES = 4, 2


def test_dann_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.da import DANN
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(DANN_FIXTURE)
    base_lr, cons_lr, wd, step_size, gamma = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.INPUT.SIZE = (32, 32)
    cfg.OPTIM.NAME = "adam"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = DANN_EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "single_step"
    cfg.OPTIM.STEPSIZE = (int(step_size),)
    cfg.OPTIM.GAMMA = float(gamma)
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = float(cons_lr)
    cfg.SEED = 1

    trainer = DANN.__new__(DANN)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg
    trainer.max_epoch = DANN_EPOCHS

    class _DM:
        num_classes = 4

    trainer.dm = _DM()
    trainer.build_model()

    assert _transplant(trainer.state["params"], data, "init/m/params") == 10
    cstate = trainer._models["critic"]
    assert _transplant(cstate["params"], data, "init/c/params") == 10
    assert _transplant(cstate["batch_stats"], data, "init/c/batch_stats") == 4
    trainer.state["opt_state"] = trainer.tx.init(trainer.state["params"])
    cstate["opt_state"] = trainer.tx_c.init(cstate["params"])

    imgs_x = np.asarray(data["imgs_x"], np.float32)
    imgs_u = np.asarray(data["imgs_u"], np.float32)
    labels_x = data["labels_x"]

    losses_x, losses_d = [], []
    step = 0
    trainer.num_batches = DANN_BATCHES
    for epoch in range(DANN_EPOCHS):
        trainer.epoch = epoch
        trainer.before_epoch()  # set_lr on BOTH registered states
        for b in range(DANN_BATCHES):
            trainer.batch_idx = b
            assert trainer.lr_table[epoch] == pytest.approx(
                data["lrs"][step], rel=1e-12
            )
            i = step % 2
            batch_x = {
                "img": imgs_x[i],
                "label": labels_x[i].astype(np.int64),
            }
            batch_u = {
                "img": imgs_u[i],
                "label": np.zeros(imgs_u.shape[1], np.int64),
            }
            out = trainer.forward_backward_xu(batch_x, batch_u)
            losses_x.append(out["loss_x"])
            losses_d.append(out["loss_d"])
            step += 1

    # adam at lr 1e-3 amplifies fp32 noise (sign-sensitive moment
    # normalization) and the adversarial coupling feeds it back through the
    # critic: steps 1-3 agree to ~1e-6, step 8 to ~3e-4 relative. A real
    # composition drift (wrong lr/decay/lambda/update order) moves step 2+
    # at the percent level.
    np.testing.assert_allclose(losses_x, data["loss_x"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(losses_d, data["loss_d"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        losses_x[:3], data["loss_x"][:3], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        losses_d[:3], data["loss_d"][:3], rtol=1e-5, atol=1e-5
    )

    final_m = jax.tree_util.tree_map(lambda x: np.array(x), trainer.state["params"])
    _assert_tree_close(final_m, data, "final/m/params", atol=8 * float(base_lr))
    final_c = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["critic"]["params"]
    )
    _assert_tree_close(final_c, data, "final/c/params", atol=8 * float(base_lr))
    final_cs = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["critic"]["batch_stats"]
    )
    # critic BN inputs inherit the adam-noise drift of the fc params;
    # stats are O(1), so an absolute band is the right instrument
    _assert_tree_close(final_cs, data, "final/c/batch_stats", atol=5e-3)


# ---------------------------------------------------------------------------
# Dassl MCD (tools/gen_trajectory_golden_mcd.py): three-phase alternating
# scheduling — step A updates F+C1+C2, step B updates C1/C2 against frozen-F
# features (whose no-grad forwards still advance BN), step C updates F
# N_STEP_F times; SGD(momentum, nesterov) x3 + linear-warmup->cosine
# (dassl/engine/da/mcd.py:50-98)
# ---------------------------------------------------------------------------

MCD_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_mcd_golden.npz"
)
MCD_EPOCHS, MCD_BATCHES = 3, 2


def test_mcd_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.da import MCD
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(MCD_FIXTURE)
    base_lr, min_lr, wd, momentum, n_step_f = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.TRAINER.MCD.N_STEP_F = int(n_step_f)
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.MOMENTUM = float(momentum)
    cfg.OPTIM.SGD_NESTEROV = True
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = MCD_EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "linear"
    cfg.OPTIM.WARMUP_MIN_LR = float(min_lr)
    cfg.SEED = 1

    trainer = MCD.__new__(MCD)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg

    class _DM:
        num_classes = 4

    trainer.dm = _DM()
    trainer.build_model()

    sF = trainer._models["F"]
    assert _transplant(sF["params"], data, "init/F/params") == 12
    assert _transplant(sF["batch_stats"], data, "init/F/batch_stats") == 2
    sF["opt_state"] = trainer._txs["F"].init(sF["params"])
    for name in ("C1", "C2"):
        s = trainer._models[name]
        assert _transplant(s["params"], data, f"init/{name}/params") == 2
        s["opt_state"] = trainer._txs[name].init(s["params"])

    imgs_x = np.asarray(data["imgs_x"], np.float32)
    imgs_u = np.asarray(data["imgs_u"], np.float32)
    labels_x = data["labels_x"]

    losses_a, losses_b, losses_c = [], [], []
    step = 0
    trainer.num_batches = MCD_BATCHES
    for epoch in range(MCD_EPOCHS):
        trainer.epoch = epoch
        trainer.before_epoch()  # set_lr on ALL THREE registered states
        for b in range(MCD_BATCHES):
            trainer.batch_idx = b
            assert trainer.lr_table[epoch] == pytest.approx(
                data["lrs"][step], rel=1e-12
            )
            i = step % 2
            batch_x = {
                "img": imgs_x[i],
                "label": labels_x[i].astype(np.int64),
            }
            batch_u = {
                "img": imgs_u[i],
                "label": np.zeros(imgs_u.shape[1], np.int64),
            }
            out = trainer.forward_backward_xu(batch_x, batch_u)
            losses_a.append(out["loss_step_A"])
            losses_b.append(out["loss_step_B"])
            losses_c.append(out["loss_step_C"])
            step += 1

    # SGD trajectories are fp32-stable; any drift in the A/B/C phase
    # ordering, the no-grad BN advancement, or the per-phase optimizer
    # gating moves step 2+ at the percent level
    np.testing.assert_allclose(losses_a, data["loss_step_A"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(losses_b, data["loss_step_B"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(losses_c, data["loss_step_C"], rtol=1e-4, atol=1e-5)

    final_F = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["F"]["params"]
    )
    _assert_tree_close(final_F, data, "final/F/params", atol=5e-5)
    final_bs = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["F"]["batch_stats"]
    )
    # the 1+2+N_STEP_F train-mode forwards per step are part of this pin
    _assert_tree_close(final_bs, data, "final/F/batch_stats", atol=5e-5)
    for name in ("C1", "C2"):
        final = jax.tree_util.tree_map(
            lambda x: np.array(x), trainer._models[name]["params"]
        )
        _assert_tree_close(final, data, f"final/{name}/params", atol=5e-5)


# ---------------------------------------------------------------------------
# Dassl MeanTeacher (tools/gen_trajectory_golden_mt.py): EMA-teacher
# scheduling — sigmoid_rampup(epoch) weight, min(1-1/(g+1), alpha) decay
# with the cap crossover inside the run, teacher BN advancing on its own
# train-mode forwards while only params are EMA'd — on RMSprop(momentum),
# the end-to-end witness for the eps-outside-the-root denominator
# (dassl/engine/ssl/mean_teacher.py:27-54, torch optimizer.py:116-122)
# ---------------------------------------------------------------------------

MT_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_mt_golden.npz"
)
MT_EPOCHS, MT_BATCHES = 3, 2


def test_mean_teacher_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.ssl import MeanTeacher
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(MT_FIXTURE)
    (base_lr, min_lr, wd, momentum, rms_alpha, step_size, gamma,
     weight_u, ema_alpha, rampup) = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.TRAINER.MEANTEACHER.WEIGHT_U = float(weight_u)
    cfg.TRAINER.MEANTEACHER.EMA_ALPHA = float(ema_alpha)
    cfg.TRAINER.MEANTEACHER.RAMPUP = int(rampup)
    cfg.OPTIM.NAME = "rmsprop"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.MOMENTUM = float(momentum)
    cfg.OPTIM.RMSPROP_ALPHA = float(rms_alpha)
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = MT_EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "single_step"
    cfg.OPTIM.STEPSIZE = (int(step_size),)
    cfg.OPTIM.GAMMA = float(gamma)
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "linear"
    cfg.OPTIM.WARMUP_MIN_LR = float(min_lr)
    cfg.SEED = 1

    trainer = MeanTeacher.__new__(MeanTeacher)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg

    class _DM:
        num_classes = 4

    trainer.dm = _DM()
    trainer.build_model()

    state = trainer.state
    assert _transplant(state["params"], data, "init/s/params") == 14
    assert _transplant(state["batch_stats"], data, "init/s/batch_stats") == 2
    state["opt_state"] = trainer.tx.init(state["params"])
    # the teacher starts as an exact copy of the (transplanted) student
    trainer.teacher = {
        "params": jax.tree_util.tree_map(jnp.asarray, state["params"]),
        "batch_stats": jax.tree_util.tree_map(
            jnp.asarray, state["batch_stats"]
        ),
    }

    imgs_x = np.asarray(data["imgs_x"], np.float32)
    imgs_u = np.asarray(data["imgs_u"], np.float32)
    labels_x = data["labels_x"]

    losses_x, losses_u = [], []
    step = 0
    trainer.num_batches = MT_BATCHES
    for epoch in range(MT_EPOCHS):
        trainer.epoch = epoch
        trainer.before_epoch()
        for b in range(MT_BATCHES):
            trainer.batch_idx = b
            assert trainer.lr_table[epoch] == pytest.approx(
                data["lrs"][step], rel=1e-12
            )
            i = step % 2
            batch_x = {
                "img": imgs_x[i],
                "label": labels_x[i].astype(np.int64),
            }
            batch_u = {
                "img": imgs_u[i],
                "label": np.zeros(imgs_u.shape[1], np.int64),
            }
            out = trainer.forward_backward_xu(batch_x, batch_u)
            losses_x.append(out["loss_x"])
            losses_u.append(out["loss_u"])
            step += 1

    # steps 0-1 have loss_u EXACTLY 0 (alpha ramp starts at 0, so the
    # teacher tracks the student until g>=1) — part of the pin
    np.testing.assert_allclose(losses_x, data["loss_x"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(losses_u, data["loss_u"], rtol=1e-3, atol=1e-6)
    assert losses_u[0] == 0.0 and losses_u[1] == 0.0
    assert losses_u[3] > 1e-3  # the consistency term really engages

    # Final state: read FRESH through trainer.state/.teacher — the jitted
    # step REBINDS self._models entries, so a pre-training local alias
    # would silently compare the init state. Pin raw params (rmsprop
    # sign-normalization leaves a few tiny-gradient leaves at the ~1e-3
    # level; everything else is ~1e-5) AND probe-batch logits (the
    # gauge-invariant function — BN absorbs upstream rescalings).
    def probe_logits(params, batch_stats):
        return np.asarray(
            trainer.net.apply(
                {"params": params, "batch_stats": batch_stats},
                jnp.asarray(imgs_x[0]).transpose(0, 2, 3, 1),
                train=False,
            )
        )

    for tag, ours in (
        ("s", trainer.state),
        ("t", trainer.teacher),
    ):
        ref_p = jax.tree_util.tree_map(lambda x: np.array(x), ours["params"])
        ref_bs = jax.tree_util.tree_map(
            lambda x: np.array(x), ours["batch_stats"]
        )
        assert _transplant(ref_p, data, f"final/{tag}/params") == 14
        assert _transplant(ref_bs, data, f"final/{tag}/batch_stats") == 2
        np.testing.assert_allclose(
            probe_logits(ours["params"], ours["batch_stats"]),
            probe_logits(ref_p, ref_bs),
            rtol=2e-3, atol=2e-3, err_msg=f"final {tag} function",
        )
        final = jax.tree_util.tree_map(lambda x: np.array(x), ours["params"])
        _assert_tree_close(final, data, f"final/{tag}/params", atol=2e-3)
        final_bs = jax.tree_util.tree_map(
            lambda x: np.array(x), ours["batch_stats"]
        )
        _assert_tree_close(
            final_bs, data, f"final/{tag}/batch_stats", atol=1e-3
        )


# ---------------------------------------------------------------------------
# Dassl DDAIG (tools/gen_trajectory_golden_ddaig.py): adversarial-generator
# scheduling — G updated on CE(F(G(x))) - CE(D(G(x))) with train-mode F/D
# forwards advancing BN, re-perturb with the UPDATED G (+clamp), F blends
# the perturbed CE only past WARMUP (the branch flips inside this run), D
# on domain CE; three SGD(momentum) optimizers + constant-warmup->cosine.
# Also the only torch-parity pin for the fcn_3x32_gctx generator fwd+bwd
# (dassl/engine/dg/ddaig.py:54-104, ddaig_fcn.py:163-288)
# ---------------------------------------------------------------------------

DDAIG_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_ddaig_golden.npz"
)
DDAIG_EPOCHS, DDAIG_BATCHES = 3, 2


def test_ddaig_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.dg import DDAIG
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(DDAIG_FIXTURE)
    (base_lr, cons_lr, wd, momentum, lmda, alpha, warmup,
     clamp_min, clamp_max) = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.TRAINER.DDAIG.G_ARCH = "fcn_3x32_gctx"
    cfg.TRAINER.DDAIG.LMDA = float(lmda)
    cfg.TRAINER.DDAIG.ALPHA = float(alpha)
    cfg.TRAINER.DDAIG.WARMUP = int(warmup)
    cfg.TRAINER.DDAIG.CLAMP = True
    cfg.TRAINER.DDAIG.CLAMP_MIN = float(clamp_min)
    cfg.TRAINER.DDAIG.CLAMP_MAX = float(clamp_max)
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.MOMENTUM = float(momentum)
    cfg.OPTIM.SGD_NESTEROV = False
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = DDAIG_EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = float(cons_lr)
    cfg.SEED = 1

    trainer = DDAIG.__new__(DDAIG)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg

    class _DM:
        num_classes = 4
        num_source_domains = 2

    trainer.dm = _DM()
    trainer.build_model()

    for name, n_params in (("F", 14), ("D", 14), ("G", 10)):
        s = trainer._models[name]
        assert _transplant(s["params"], data, f"init/{name}/params") == n_params
        if name != "G":  # the FCN's instance norms carry no running stats
            assert _transplant(
                s["batch_stats"], data, f"init/{name}/batch_stats"
            ) == 2
        s["opt_state"] = trainer._txs[name].init(s["params"])

    imgs = np.asarray(data["imgs"], np.float32)
    labels = data["labels"]
    domains = data["domains"]

    losses_g, losses_f, losses_d = [], [], []
    step = 0
    trainer.num_batches = DDAIG_BATCHES
    for epoch in range(DDAIG_EPOCHS):
        trainer.epoch = epoch
        trainer.before_epoch()  # set_lr on F, D AND G
        for b in range(DDAIG_BATCHES):
            trainer.batch_idx = b
            assert trainer.lr_table[epoch] == pytest.approx(
                data["lrs"][step], rel=1e-12
            )
            i = step % 2
            batch = {
                "img": imgs[i],
                "label": labels[i].astype(np.int64),
                "domain": domains[i].astype(np.int64),
            }
            out = trainer.forward_backward(batch)
            losses_g.append(out["loss_g"])
            losses_f.append(out["loss_f"])
            losses_d.append(out["loss_d"])
            step += 1

    # any drift in the G/F/D phase ordering, the warmup branch, the
    # clamp, or the no-grad re-perturb moves step 2+ at the percent level
    np.testing.assert_allclose(losses_g, data["loss_g"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(losses_f, data["loss_f"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(losses_d, data["loss_d"], rtol=2e-4, atol=2e-5)

    for name in ("F", "D", "G"):
        final = jax.tree_util.tree_map(
            lambda x: np.array(x), trainer._models[name]["params"]
        )
        _assert_tree_close(final, data, f"final/{name}/params", atol=1e-4)
        if name != "G":
            final_bs = jax.tree_util.tree_map(
                lambda x: np.array(x), trainer._models[name]["batch_stats"]
            )
            _assert_tree_close(
                final_bs, data, f"final/{name}/batch_stats", atol=1e-4
            )


# ---------------------------------------------------------------------------
# Dassl CrossGrad (tools/gen_trajectory_golden_crossgrad.py): input-gradient
# perturbation scheduling — clipped (+-0.1) input-grads from TRAIN-mode
# forwards whose BN updates carry into the parameter steps, the eps_f/eps_d
# cross-application quirk, F on the (x, x_d) blend, D on the (x, x_f)
# blend — on torch Adam(amsgrad=True): the end-to-end witness for the
# torch-exact AMSGrad transform (raw-moment max, bias-corrected after)
# (dassl/engine/dg/crossgrad.py:43-80, optimizer.py:96-103)
# ---------------------------------------------------------------------------

CG_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_crossgrad_golden.npz"
)
CG_EPOCHS, CG_BATCHES = 3, 2


def test_crossgrad_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.dg import CrossGrad
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(CG_FIXTURE)
    base_lr, cons_lr, wd, eps_f, eps_d, alpha_f, alpha_d = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.TRAINER.CROSSGRAD.EPS_F = float(eps_f)
    cfg.TRAINER.CROSSGRAD.EPS_D = float(eps_d)
    cfg.TRAINER.CROSSGRAD.ALPHA_F = float(alpha_f)
    cfg.TRAINER.CROSSGRAD.ALPHA_D = float(alpha_d)
    cfg.OPTIM.NAME = "amsgrad"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = CG_EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = float(cons_lr)
    cfg.SEED = 1

    trainer = CrossGrad.__new__(CrossGrad)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg

    class _DM:
        num_classes = 4
        num_source_domains = 2

    trainer.dm = _DM()
    trainer.build_model()

    for name in ("F", "D"):
        s = trainer._models[name]
        assert _transplant(s["params"], data, f"init/{name}/params") == 14
        assert _transplant(
            s["batch_stats"], data, f"init/{name}/batch_stats"
        ) == 2
        s["opt_state"] = trainer._txs[name].init(s["params"])

    imgs = np.asarray(data["imgs"], np.float32)
    labels = data["labels"]
    domains = data["domains"]

    losses_f, losses_d = [], []
    step = 0
    trainer.num_batches = CG_BATCHES
    for epoch in range(CG_EPOCHS):
        trainer.epoch = epoch
        trainer.before_epoch()
        for b in range(CG_BATCHES):
            trainer.batch_idx = b
            assert trainer.lr_table[epoch] == pytest.approx(
                data["lrs"][step], rel=1e-12
            )
            i = step % 2
            batch = {
                "img": imgs[i],
                "label": labels[i].astype(np.int64),
                "domain": domains[i].astype(np.int64),
            }
            out = trainer.forward_backward(batch)
            losses_f.append(out["loss_f"])
            losses_d.append(out["loss_d"])
            step += 1

    # adam-family noise amplification applies (see the DANN comment); the
    # small fixture lr keeps fp32 trajectories on the same branch, so pin
    # tightly throughout — a perturbation-direction or eps-swap drift
    # moves step 1+ at the percent level
    np.testing.assert_allclose(losses_f, data["loss_f"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(losses_d, data["loss_d"], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        losses_f[:3], data["loss_f"][:3], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        losses_d[:3], data["loss_d"][:3], rtol=1e-5, atol=1e-5
    )

    for name in ("F", "D"):
        final = jax.tree_util.tree_map(
            lambda x: np.array(x), trainer._models[name]["params"]
        )
        _assert_tree_close(final, data, f"final/{name}/params",
                           atol=8 * float(base_lr))
        final_bs = jax.tree_util.tree_map(
            lambda x: np.array(x), trainer._models[name]["batch_stats"]
        )
        _assert_tree_close(
            final_bs, data, f"final/{name}/batch_stats", atol=5e-3
        )


# ---------------------------------------------------------------------------
# Dassl MME (tools/gen_trajectory_golden_mme.py): minimax-entropy scheduling
# — two full backward_and_update rounds per step (supervised CE, then
# lmda-weighted negative entropy with the GRL at the feature boundary of
# the temp-0.05 cosine prototype classifier), round 2 consuming round 1's
# updated params and BN stats (dassl/engine/da/mme.py:59-83)
# ---------------------------------------------------------------------------

MME_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_mme_golden.npz"
)
MME_EPOCHS, MME_BATCHES = 3, 2


def test_mme_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.da import MME
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(MME_FIXTURE)
    base_lr, cons_lr, wd, momentum, lmda = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.TRAINER.MME.LMDA = float(lmda)
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.MOMENTUM = float(momentum)
    cfg.OPTIM.SGD_NESTEROV = False
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = MME_EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = float(cons_lr)
    cfg.SEED = 1

    trainer = MME.__new__(MME)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg

    class _DM:
        num_classes = 4

    trainer.dm = _DM()
    trainer.build_model()

    sF = trainer._models["F"]
    assert _transplant(sF["params"], data, "init/F/params") == 12
    assert _transplant(sF["batch_stats"], data, "init/F/batch_stats") == 2
    sF["opt_state"] = trainer.tx.init(sF["params"])
    sC = trainer._models["C"]
    assert _transplant(sC["params"], data, "init/C/params") == 1
    sC["opt_state"] = trainer.tx_c.init(sC["params"])

    imgs_x = np.asarray(data["imgs_x"], np.float32)
    imgs_u = np.asarray(data["imgs_u"], np.float32)
    labels_x = data["labels_x"]

    losses_x, losses_u = [], []
    step = 0
    trainer.num_batches = MME_BATCHES
    for epoch in range(MME_EPOCHS):
        trainer.epoch = epoch
        trainer.before_epoch()
        for b in range(MME_BATCHES):
            trainer.batch_idx = b
            assert trainer.lr_table[epoch] == pytest.approx(
                data["lrs"][step], rel=1e-12
            )
            i = step % 2
            out = trainer.forward_backward_xu(
                {"img": imgs_x[i], "label": labels_x[i].astype(np.int64)},
                {"img": imgs_u[i],
                 "label": np.zeros(imgs_u.shape[1], np.int64)},
            )
            losses_x.append(out["loss_x"])
            losses_u.append(out["loss_u"])
            step += 1

    # loss_u is NEGATIVE entropy: sign and the GRL boundary are part of
    # the pin (a GRL placed after the normalize flips step 2+ visibly)
    np.testing.assert_allclose(losses_x, data["loss_x"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(losses_u, data["loss_u"], rtol=2e-4, atol=2e-5)
    assert all(lu < 0 for lu in losses_u)

    final_F = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["F"]["params"]
    )
    _assert_tree_close(final_F, data, "final/F/params", atol=1e-4)
    final_bs = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["F"]["batch_stats"]
    )
    _assert_tree_close(final_bs, data, "final/F/batch_stats", atol=1e-4)
    final_C = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["C"]["params"]
    )
    _assert_tree_close(final_C, data, "final/C/params", atol=1e-4)


# ---------------------------------------------------------------------------
# Dassl M3SDA (tools/gen_trajectory_golden_m3sda.py): multi-source moment
# matching — per-DOMAIN train-mode F forwards (separate BN statistics per
# source sub-batch), per-domain pair-classifier CE + pairwise first/second
# moment distance to the target, then the MCD-style B/C phases; per-model
# SGD(momentum) + a WARMUP-FREE cosine schedule
# (dassl/engine/da/m3sda.py:74-151)
# ---------------------------------------------------------------------------

M3SDA_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_m3sda_golden.npz"
)
M3SDA_EPOCHS, M3SDA_BATCHES = 3, 2


def test_m3sda_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.da import M3SDA
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(M3SDA_FIXTURE)
    base_lr, wd, momentum, n_step_f, lmda = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.DATALOADER.TRAIN_X.N_DOMAIN = 2
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
    cfg.TRAINER.M3SDA.N_STEP_F = int(n_step_f)
    cfg.TRAINER.M3SDA.LMDA = float(lmda)
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.MOMENTUM = float(momentum)
    cfg.OPTIM.SGD_NESTEROV = False
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = M3SDA_EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 0  # warmup-free composition is part of the pin
    cfg.SEED = 1

    trainer = M3SDA.__new__(M3SDA)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg

    class _DM:
        num_classes = 4
        num_source_domains = 2

    trainer.dm = _DM()
    trainer.build_model()

    sF = trainer._models["F"]
    assert _transplant(sF["params"], data, "init/F/params") == 12
    assert _transplant(sF["batch_stats"], data, "init/F/batch_stats") == 2
    sF["opt_state"] = trainer.tx.init(sF["params"])
    sC = trainer._models["C"]
    assert _transplant(sC["params"], data, "init/C/params") == 4
    sC["opt_state"] = trainer.tx_c.init(sC["params"])

    imgs_x = np.asarray(data["imgs_x"], np.float32)
    imgs_u = np.asarray(data["imgs_u"], np.float32)
    labels_x = data["labels_x"]
    domains_x = data["domains_x"]

    losses_a, losses_b, losses_c = [], [], []
    step = 0
    trainer.num_batches = M3SDA_BATCHES
    for epoch in range(M3SDA_EPOCHS):
        trainer.epoch = epoch
        trainer.before_epoch()
        for b in range(M3SDA_BATCHES):
            trainer.batch_idx = b
            assert trainer.lr_table[epoch] == pytest.approx(
                data["lrs"][step], rel=1e-12
            )
            i = step % 2
            out = trainer.forward_backward_xu(
                {
                    "img": imgs_x[i],
                    "label": labels_x[i].astype(np.int64),
                    "domain": domains_x[i].astype(np.int64),
                },
                {"img": imgs_u[i],
                 "label": np.zeros(imgs_u.shape[1], np.int64)},
            )
            losses_a.append(out["loss_step_A"])
            losses_b.append(out["loss_step_B"])
            losses_c.append(out["loss_step_C"])
            step += 1

    # any drift in the per-domain BN separation, the moment-distance
    # normalization (1/count pairwise, unbiased var), or the A/B/C
    # optimizer gating moves step 2+ at the percent level
    np.testing.assert_allclose(losses_a, data["loss_step_A"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(losses_b, data["loss_step_B"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(losses_c, data["loss_step_C"], rtol=5e-4, atol=2e-5)

    final_F = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["F"]["params"]
    )
    _assert_tree_close(final_F, data, "final/F/params", atol=1e-4)
    final_bs = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["F"]["batch_stats"]
    )
    # the (2+3+N_STEP_F) train-mode F forwards per step are part of the pin
    _assert_tree_close(final_bs, data, "final/F/batch_stats", atol=1e-4)
    final_C = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["C"]["params"]
    )
    _assert_tree_close(final_C, data, "final/C/params", atol=1e-4)


# ---------------------------------------------------------------------------
# Dassl DAEL (tools/gen_trajectory_golden_dael.py): the most composite DA
# update — no-grad most-confident-expert pseudo-labels with confidence
# mask (F's BN advancing first), the reference forward order (weak source
# views per domain, strong source views, strong target view), per-domain
# expert CE + cross-expert consistency regularization against the detached
# own-expert label + masked pseudo-label CE, ONE backward through F and
# the expert bank; SGD(momentum) + linear-warmup->cosine
# (dassl/engine/da/dael.py:89-181)
# ---------------------------------------------------------------------------

DAEL_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_dael_golden.npz"
)
DAEL_EPOCHS, DAEL_BATCHES = 3, 2


def test_dael_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.da import DAEL
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(DAEL_FIXTURE)
    base_lr, min_lr, wd, momentum, weight_u, conf_thre = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.DATALOADER.TRAIN_X.N_DOMAIN = 2
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
    cfg.TRAINER.DAEL.WEIGHT_U = float(weight_u)
    cfg.TRAINER.DAEL.CONF_THRE = float(conf_thre)
    cfg.TRAINER.DAEL.STRONG_TRANSFORMS = ["random_flip"]
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.MOMENTUM = float(momentum)
    cfg.OPTIM.SGD_NESTEROV = False
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = DAEL_EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "linear"
    cfg.OPTIM.WARMUP_MIN_LR = float(min_lr)
    cfg.SEED = 1

    trainer = DAEL.__new__(DAEL)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg

    class _DM:
        num_classes = 4
        num_source_domains = 2

    trainer.dm = _DM()
    trainer.build_model()

    sF = trainer._models["F"]
    assert _transplant(sF["params"], data, "init/F/params") == 12
    assert _transplant(sF["batch_stats"], data, "init/F/batch_stats") == 2
    sF["opt_state"] = trainer.tx.init(sF["params"])
    sE = trainer._models["E"]
    assert _transplant(sE["params"], data, "init/E/params") == 2
    sE["opt_state"] = trainer.tx_e.init(sE["params"])

    imgs = {k: np.asarray(data[k], np.float32)
            for k in ("imgs_x", "imgs_x2", "imgs_u", "imgs_u2")}
    labels_x = data["labels_x"]
    domains_x = data["domains_x"]

    losses_x, losses_cr, losses_u = [], [], []
    step = 0
    trainer.num_batches = DAEL_BATCHES
    for epoch in range(DAEL_EPOCHS):
        trainer.epoch = epoch
        trainer.before_epoch()
        for b in range(DAEL_BATCHES):
            trainer.batch_idx = b
            assert trainer.lr_table[epoch] == pytest.approx(
                data["lrs"][step], rel=1e-12
            )
            i = step % 2
            out = trainer.forward_backward_xu(
                {
                    "img": imgs["imgs_x"][i],
                    "img2": imgs["imgs_x2"][i],
                    "label": labels_x[i].astype(np.int64),
                    "domain": domains_x[i].astype(np.int64),
                },
                {
                    "img": imgs["imgs_u"][i],
                    "img2": imgs["imgs_u2"][i],
                    "label": np.zeros(8, np.int64),
                },
            )
            losses_x.append(out["loss_x"])
            losses_cr.append(out["loss_cr"])
            losses_u.append(out["loss_u"])
            step += 1

    # a drift in the pseudo-label argmax chain, the mask threshold, the
    # cross-expert CR pairing, or the forward order moves step 1+ visibly
    np.testing.assert_allclose(losses_x, data["loss_x"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(losses_cr, data["loss_cr"], rtol=5e-4, atol=2e-5)
    np.testing.assert_allclose(losses_u, data["loss_u"], rtol=5e-4, atol=2e-5)

    final_F = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["F"]["params"]
    )
    _assert_tree_close(final_F, data, "final/F/params", atol=1e-4)
    final_bs = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["F"]["batch_stats"]
    )
    # the 1+2+2+1 train-mode F forwards per step are part of the pin
    _assert_tree_close(final_bs, data, "final/F/batch_stats", atol=1e-4)
    final_E = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["E"]["params"]
    )
    _assert_tree_close(final_E, data, "final/E/params", atol=1e-4)


# ---------------------------------------------------------------------------
# Dassl CDAC (tools/gen_trajectory_golden_cdac.py): adaptive-clustering
# scheduling with the one-of-a-kind lr regime — per-ITERATION LambdaLR
# annealing (1 + 10*iter/max_iter)^-0.75 stepped inside forward_backward,
# classifier base lr premultiplied by CLASS_LR_MULTI; two backward rounds
# per step, top-k feature-index similarity, p_thresh mask, per-iteration
# sigmoid rampup on the consistency term
# (dassl/engine/da/cdac.py:100-138, 152-224)
# ---------------------------------------------------------------------------

CDAC_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_cdac_golden.npz"
)
CDAC_EPOCHS, CDAC_BATCHES = 3, 2


def _interleave(v0, v1):
    """[B,...] x2 -> adjacent-variant layout [B*2,...] (item0_v0, item0_v1,
    item1_v0, ...) as HostDataLoader emits for K_TRANSFORMS=2."""
    return np.stack([v0, v1], axis=1).reshape((-1,) + v0.shape[1:])


def test_cdac_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.da import CDAC
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(CDAC_FIXTURE)
    (base_lr, wd, momentum, rampup_coef, rampup_itrs,
     lr_multi, topk, p_thresh) = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.DATALOADER.K_TRANSFORMS = 2
    cfg.TRAINER.CDAC.RAMPUP_COEF = float(rampup_coef)
    cfg.TRAINER.CDAC.RAMPUP_ITRS = int(rampup_itrs)
    cfg.TRAINER.CDAC.CLASS_LR_MULTI = float(lr_multi)
    cfg.TRAINER.CDAC.TOPK_MATCH = int(topk)
    cfg.TRAINER.CDAC.P_THRESH = float(p_thresh)
    cfg.TRAINER.CDAC.STRONG_TRANSFORMS = ["random_flip"]
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.MOMENTUM = float(momentum)
    cfg.OPTIM.SGD_NESTEROV = False
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = CDAC_EPOCHS
    cfg.SEED = 1

    trainer = CDAC.__new__(CDAC)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg
    trainer.max_epoch = CDAC_EPOCHS

    class _DM:
        num_classes = 4

    trainer.dm = _DM()
    trainer.build_model()

    sF = trainer._models["F"]
    assert _transplant(sF["params"], data, "init/F/params") == 12
    assert _transplant(sF["batch_stats"], data, "init/F/batch_stats") == 2
    sF["opt_state"] = trainer.tx.init(sF["params"])
    sC = trainer._models["C"]
    assert _transplant(sC["params"], data, "init/C/params") == 1
    sC["opt_state"] = trainer.tx_c.init(sC["params"])

    imgs = {k: np.asarray(data[k], np.float32)
            for k in ("imgs_x", "imgs_u", "imgs_us", "imgs_us2")}
    labels_x = data["labels_x"]
    labels_u = data["labels_u"]

    losses_x, aacs, pls, conss, keeps = [], [], [], [], []
    step = 0
    trainer.num_batches = CDAC_BATCHES
    for epoch in range(CDAC_EPOCHS):
        trainer.epoch = epoch
        trainer.before_epoch()  # CDAC override: a no-op (per-iteration lr)
        for b in range(CDAC_BATCHES):
            trainer.batch_idx = b
            i = step % 2
            batch_x = {
                "img": _interleave(imgs["imgs_x"][i], imgs["imgs_x"][i]),
                "label": np.repeat(labels_x[i].astype(np.int64), 2),
            }
            batch_u = {
                "img": _interleave(imgs["imgs_u"][i], imgs["imgs_u"][i]),
                "img2": _interleave(imgs["imgs_us"][i], imgs["imgs_us2"][i]),
                "label": np.repeat(labels_u[i].astype(np.int64), 2),
            }
            out = trainer.forward_backward_xu(batch_x, batch_u)
            # the lr actually INSTALLED for this step must equal torch's
            # per-iteration LambdaLR value, for BOTH param groups
            assert float(
                trainer._models["F"]["opt_state"].hyperparams["lr"]
            ) == pytest.approx(data["lrs_f"][step], rel=1e-6)
            assert float(
                trainer._models["C"]["opt_state"].hyperparams["lr"]
            ) == pytest.approx(data["lrs_c"][step], rel=1e-6)
            losses_x.append(out["loss_x"])
            aacs.append(out["aac_loss"])
            pls.append(out["pl_loss"])
            conss.append(out["cons_loss"])
            keeps.append(out["p_u_pred_keep"])
            step += 1

    np.testing.assert_allclose(losses_x, data["loss_x"], rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(aacs, data["aac_loss"], rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(pls, data["pl_loss"], rtol=1e-3, atol=5e-5)
    np.testing.assert_allclose(conss, data["cons_loss"], rtol=1e-3, atol=5e-5)
    # the confidence mask trajectory (0.125 -> 1.0) is EXACT: a threshold
    # or argmax drift flips a row
    np.testing.assert_allclose(keeps, data["keep"], atol=1e-6)

    final_F = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["F"]["params"]
    )
    _assert_tree_close(final_F, data, "final/F/params", atol=2e-4)
    final_bs = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["F"]["batch_stats"]
    )
    _assert_tree_close(final_bs, data, "final/F/batch_stats", atol=2e-4)
    final_C = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["C"]["params"]
    )
    _assert_tree_close(final_C, data, "final/C/params", atol=2e-4)


# ---------------------------------------------------------------------------
# Dassl SE (tools/gen_trajectory_golden_se.py): self-ensembling with
# K_TRANSFORMS=2 view pairs — student on view 1, train-mode EMA teacher on
# view 2, the CONF_THRE mask branch on the summed squared error, one
# backward, then the min(1-1/(g+1), alpha) parameter EMA with the cap
# crossover inside the run (dassl/engine/da/se.py:30-65)
# ---------------------------------------------------------------------------

SE_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_se_golden.npz"
)
SE_EPOCHS, SE_BATCHES = 3, 2


def test_se_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.da import SE
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(SE_FIXTURE)
    (base_lr, min_lr, wd, momentum, ema_alpha, conf_thre,
     rampup) = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.DATALOADER.K_TRANSFORMS = 2
    cfg.TRAINER.SE.EMA_ALPHA = float(ema_alpha)
    cfg.TRAINER.SE.CONF_THRE = float(conf_thre)
    cfg.TRAINER.SE.RAMPUP = int(rampup)
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.MOMENTUM = float(momentum)
    cfg.OPTIM.SGD_NESTEROV = False
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = SE_EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "linear"
    cfg.OPTIM.WARMUP_MIN_LR = float(min_lr)
    cfg.SEED = 1

    trainer = SE.__new__(SE)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg

    class _DM:
        num_classes = 4

    trainer.dm = _DM()
    trainer.build_model()

    state = trainer.state
    assert _transplant(state["params"], data, "init/s/params") == 14
    assert _transplant(state["batch_stats"], data, "init/s/batch_stats") == 2
    state["opt_state"] = trainer.tx.init(state["params"])
    trainer.teacher = {
        "params": jax.tree_util.tree_map(jnp.asarray, state["params"]),
        "batch_stats": jax.tree_util.tree_map(
            jnp.asarray, state["batch_stats"]
        ),
    }

    imgs_x = np.asarray(data["imgs_x"], np.float32)
    imgs_u1 = np.asarray(data["imgs_u1"], np.float32)
    imgs_u2 = np.asarray(data["imgs_u2"], np.float32)
    labels_x = data["labels_x"]

    losses_x, losses_u = [], []
    step = 0
    trainer.num_batches = SE_BATCHES
    for epoch in range(SE_EPOCHS):
        trainer.epoch = epoch
        trainer.before_epoch()
        for b in range(SE_BATCHES):
            trainer.batch_idx = b
            assert trainer.lr_table[epoch] == pytest.approx(
                data["lrs"][step], rel=1e-12
            )
            i = step % 2
            out = trainer.forward_backward_xu(
                {
                    "img": _interleave(imgs_x[i], imgs_x[i]),
                    "label": np.repeat(labels_x[i].astype(np.int64), 2),
                },
                {
                    "img": _interleave(imgs_u1[i], imgs_u2[i]),
                    "label": np.zeros(16, np.int64),
                },
            )
            losses_x.append(out["loss_x"])
            losses_u.append(out["loss_u"])
            step += 1

    np.testing.assert_allclose(losses_x, data["loss_x"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(losses_u, data["loss_u"], rtol=1e-3, atol=2e-5)
    assert all(lu > 1e-6 for lu in losses_u)  # the masked term really fires

    # Final state: read FRESH through trainer.state/.teacher (the jitted
    # step rebinds self._models entries). Probe-batch logits pin the
    # function; raw params pin the SGD trajectory tightly.
    def probe_logits(params, batch_stats):
        return np.asarray(
            trainer.net.apply(
                {"params": params, "batch_stats": batch_stats},
                jnp.asarray(imgs_x[0]).transpose(0, 2, 3, 1),
                train=False,
            )
        )

    for tag, ours in (("s", trainer.state), ("t", trainer.teacher)):
        ref_p = jax.tree_util.tree_map(lambda x: np.array(x), ours["params"])
        ref_bs = jax.tree_util.tree_map(
            lambda x: np.array(x), ours["batch_stats"]
        )
        assert _transplant(ref_p, data, f"final/{tag}/params") == 14
        assert _transplant(ref_bs, data, f"final/{tag}/batch_stats") == 2
        np.testing.assert_allclose(
            probe_logits(ours["params"], ours["batch_stats"]),
            probe_logits(ref_p, ref_bs),
            rtol=2e-3, atol=2e-3, err_msg=f"final {tag} function",
        )
        final = jax.tree_util.tree_map(lambda x: np.array(x), ours["params"])
        _assert_tree_close(final, data, f"final/{tag}/params", atol=2e-4)
        final_bs = jax.tree_util.tree_map(
            lambda x: np.array(x), ours["batch_stats"]
        )
        _assert_tree_close(
            final_bs, data, f"final/{tag}/batch_stats", atol=2e-4
        )


# ---------------------------------------------------------------------------
# Dassl ADDA (tools/gen_trajectory_golden_adda.py): adversarial
# discriminative DA — EVAL-mode frozen source model (running-stat BN) on
# the labeled batch, train-mode target model on the unlabeled batch,
# critic BCE(source->1, detached target->0), target model fooling the
# UPDATED critic, classifier frozen via open_specified_layers (no decay
# reaches it); adam x2 + constant-warmup->cosine
# (dassl/engine/da/adda.py:57-85)
# ---------------------------------------------------------------------------

ADDA_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_adda_golden.npz"
)
ADDA_EPOCHS, ADDA_BATCHES = 3, 2


def test_adda_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.da import ADDA
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(ADDA_FIXTURE)
    base_lr, cons_lr, wd = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.OPTIM.NAME = "adam"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = ADDA_EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = float(cons_lr)
    cfg.SEED = 1

    trainer = ADDA.__new__(ADDA)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg

    class _DM:
        num_classes = 4

    trainer.dm = _DM()
    trainer.build_model()

    state = trainer.state
    assert _transplant(state["params"], data, "init/m/params") == 14
    assert _transplant(state["batch_stats"], data, "init/m/batch_stats") == 2
    state["opt_state"] = trainer.tx.init(state["params"])
    # the frozen source model is the init-time copy; the jitted step
    # closes over trainer.source_state, so mutate the SAME dict in place
    trainer.source_state["params"] = jax.tree_util.tree_map(
        jnp.asarray, state["params"]
    )
    trainer.source_state["batch_stats"] = jax.tree_util.tree_map(
        jnp.asarray, state["batch_stats"]
    )
    cstate = trainer._models["critic"]
    assert _transplant(cstate["params"], data, "init/c/params") == 10
    assert _transplant(cstate["batch_stats"], data, "init/c/batch_stats") == 4
    cstate["opt_state"] = trainer.tx_c.init(cstate["params"])

    imgs_x = np.asarray(data["imgs_x"], np.float32)
    imgs_u = np.asarray(data["imgs_u"], np.float32)

    losses_c, losses_m = [], []
    step = 0
    trainer.num_batches = ADDA_BATCHES
    for epoch in range(ADDA_EPOCHS):
        trainer.epoch = epoch
        trainer.before_epoch()
        for b in range(ADDA_BATCHES):
            trainer.batch_idx = b
            assert trainer.lr_table[epoch] == pytest.approx(
                data["lrs"][step], rel=1e-12
            )
            i = step % 2
            out = trainer.forward_backward_xu(
                {"img": imgs_x[i],
                 "label": data["labels_x"][i].astype(np.int64)},
                {"img": imgs_u[i], "label": np.zeros(8, np.int64)},
            )
            losses_c.append(out["loss_critic"])
            losses_m.append(out["loss_model"])
            step += 1

    np.testing.assert_allclose(
        losses_c, data["loss_critic"], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        losses_m, data["loss_model"], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        losses_c[:3], data["loss_critic"][:3], rtol=1e-5, atol=1e-5
    )

    # Final state: read FRESH (the jitted step rebinds self._models
    # entries — a pre-training alias would compare the init state).
    fstate = trainer.state
    fcstate = trainer._models["critic"]

    # the classifier must be EXACTLY frozen (open_specified_layers: no
    # gradient, no decay)
    np.testing.assert_array_equal(
        np.asarray(fstate["params"]["classifier"]["kernel"]),
        data["init/m/params/classifier/kernel"],
    )

    final_m = jax.tree_util.tree_map(lambda x: np.array(x), fstate["params"])
    # adam sign-normalizes the tiny adversarial conv gradients, so a few
    # leaves sit at the ~5e-4 level; the BN running stats (the EVAL-mode
    # source / train-mode target distinction) pin much tighter
    _assert_tree_close(final_m, data, "final/m/params", atol=2e-3)
    final_mbs = jax.tree_util.tree_map(
        lambda x: np.array(x), fstate["batch_stats"]
    )
    _assert_tree_close(final_mbs, data, "final/m/batch_stats", atol=1e-3)
    final_c = jax.tree_util.tree_map(
        lambda x: np.array(x), fcstate["params"]
    )
    _assert_tree_close(final_c, data, "final/c/params", atol=2e-3)
    final_cbs = jax.tree_util.tree_map(
        lambda x: np.array(x), fcstate["batch_stats"]
    )
    _assert_tree_close(final_cbs, data, "final/c/batch_stats", atol=1e-3)


# ---------------------------------------------------------------------------
# Dassl EntMin on AdamW (tools/gen_trajectory_golden_misc.py): CE +
# lmda-weighted unlabeled entropy through ONE backward, on torch AdamW —
# the only end-to-end witness for the DECOUPLED weight-decay composition
# (dassl/engine/ssl/entmin.py:19-41, optimizer.py:105-112)
# ---------------------------------------------------------------------------

ENTMIN_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_entmin_golden.npz"
)


def test_entmin_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.ssl import EntMin
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(ENTMIN_FIXTURE)
    base_lr, min_lr, wd, lmda = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.TRAINER.ENTMIN.LMDA = float(lmda)
    cfg.OPTIM.NAME = "adamw"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = 3
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "linear"
    cfg.OPTIM.WARMUP_MIN_LR = float(min_lr)
    cfg.SEED = 1

    trainer = EntMin.__new__(EntMin)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg

    class _DM:
        num_classes = 4

    trainer.dm = _DM()
    trainer.build_model()

    state = trainer.state
    assert _transplant(state["params"], data, "init/params") == 14
    assert _transplant(state["batch_stats"], data, "init/batch_stats") == 2
    state["opt_state"] = trainer.tx.init(state["params"])

    imgs_x = np.asarray(data["imgs_x"], np.float32)
    imgs_u = np.asarray(data["imgs_u"], np.float32)
    labels_x = data["labels_x"]

    losses_x, losses_u = [], []
    step = 0
    trainer.num_batches = 2
    for epoch in range(3):
        trainer.epoch = epoch
        trainer.before_epoch()
        for b in range(2):
            trainer.batch_idx = b
            assert trainer.lr_table[epoch] == pytest.approx(
                data["lrs"][step], rel=1e-12
            )
            i = step % 2
            out = trainer.forward_backward_xu(
                {"img": imgs_x[i], "label": labels_x[i].astype(np.int64)},
                {"img": imgs_u[i],
                 "label": np.zeros(imgs_u.shape[1], np.int64)},
            )
            losses_x.append(out["loss_x"])
            losses_u.append(out["loss_u"])
            step += 1

    np.testing.assert_allclose(losses_x, data["loss_x"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(losses_u, data["loss_u"], rtol=2e-4, atol=2e-5)

    fstate = trainer.state  # the jitted step rebinds self._models entries
    final = jax.tree_util.tree_map(lambda x: np.array(x), fstate["params"])
    # the WD=5e-2 decoupled decay moves params by ~lr*wd*|p| per step —
    # a coupled-decay drift would shear every leaf visibly
    _assert_tree_close(final, data, "final/params", atol=2e-3)
    final_bs = jax.tree_util.tree_map(
        lambda x: np.array(x), fstate["batch_stats"]
    )
    _assert_tree_close(final_bs, data, "final/batch_stats", atol=1e-3)


# ---------------------------------------------------------------------------
# Dassl AdaBN (tools/gen_trajectory_golden_misc.py): BN-statistics-only
# adaptation — reset_running_stats on the FIRST before_epoch only, then
# no-grad train-mode target forwards re-estimating the statistics; params
# bit-frozen (dassl/engine/da/adabn.py:23-38)
# ---------------------------------------------------------------------------

ADABN_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_adabn_golden.npz"
)


def test_adabn_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.da import AdaBN
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = 1e-3
    cfg.OPTIM.MAX_EPOCH = 3
    cfg.SEED = 1

    data = np.load(ADABN_FIXTURE)
    trainer = AdaBN.__new__(AdaBN)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg

    class _DM:
        num_classes = 4

    trainer.dm = _DM()
    trainer.build_model()

    state = trainer.state
    # init fixture stats are WARMED (pre-reset): the reset must discard them
    assert _transplant(state["params"], data, "init/params") == 14
    assert _transplant(state["batch_stats"], data, "init/batch_stats") == 2
    assert float(np.abs(np.asarray(
        state["batch_stats"]["head"]["bn0"]["mean"]
    )).max()) > 0.01  # really warmed

    imgs_u = np.asarray(data["imgs_u"], np.float32)
    step = 0
    trainer.num_batches = 2
    for epoch in range(3):
        trainer.epoch = epoch
        trainer.before_epoch()  # resets stats ONCE (first epoch only)
        for b in range(2):
            trainer.batch_idx = b
            i = step % 2
            trainer.forward_backward_xu(
                {"img": np.zeros((1, 3, 32, 32), np.float32),
                 "label": np.zeros(1, np.int64)},
                {"img": imgs_u[i], "label": np.zeros(8, np.int64)},
            )
            step += 1

    fstate = trainer.state
    # params bit-frozen (no optimizer ever steps)
    np.testing.assert_array_equal(
        np.asarray(fstate["params"]["backbone"]["conv1"]["kernel"]),
        data["init/params/backbone/conv1/kernel"],
    )
    final_bs = jax.tree_util.tree_map(
        lambda x: np.array(x), fstate["batch_stats"]
    )
    # reset-to-(0,1) + six momentum-0.1 blends of the target batches
    _assert_tree_close(final_bs, data, "final/batch_stats", atol=1e-4)


# ---------------------------------------------------------------------------
# Dassl DAELDG (tools/gen_trajectory_golden_misc.py): the DG ensemble —
# domain-grouped weak/strong views, per-domain expert CE + cross-expert
# consistency regularization, no unlabeled branch; SGD(momentum) +
# linear-warmup->cosine (dassl/engine/dg/daeldg.py:90-143)
# ---------------------------------------------------------------------------

DAELDG_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_daeldg_golden.npz"
)


def test_daeldg_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.dg import DAELDG
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(DAELDG_FIXTURE)
    base_lr, min_lr, wd, momentum = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.DATALOADER.TRAIN_X.N_DOMAIN = 2
    cfg.DATALOADER.TRAIN_X.BATCH_SIZE = 8
    cfg.TRAINER.DAELDG.CONF_THRE = 0.95
    cfg.TRAINER.DAELDG.STRONG_TRANSFORMS = ["random_flip"]
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.MOMENTUM = float(momentum)
    cfg.OPTIM.SGD_NESTEROV = False
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = 3
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "linear"
    cfg.OPTIM.WARMUP_MIN_LR = float(min_lr)
    cfg.SEED = 1

    trainer = DAELDG.__new__(DAELDG)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg

    class _DM:
        num_classes = 4
        num_source_domains = 2

    trainer.dm = _DM()
    trainer.build_model()

    sF = trainer._models["F"]
    assert _transplant(sF["params"], data, "init/F/params") == 12
    assert _transplant(sF["batch_stats"], data, "init/F/batch_stats") == 2
    sF["opt_state"] = trainer.tx.init(sF["params"])
    sE = trainer._models["E"]
    assert _transplant(sE["params"], data, "init/E/params") == 2
    sE["opt_state"] = trainer.tx_e.init(sE["params"])

    imgs = np.asarray(data["imgs"], np.float32)
    imgs2 = np.asarray(data["imgs2"], np.float32)
    labels = data["labels"]
    domains = data["domains"]

    losses_x, losses_cr = [], []
    step = 0
    trainer.num_batches = 2
    for epoch in range(3):
        trainer.epoch = epoch
        trainer.before_epoch()
        for b in range(2):
            trainer.batch_idx = b
            assert trainer.lr_table[epoch] == pytest.approx(
                data["lrs"][step], rel=1e-12
            )
            i = step % 2
            out = trainer.forward_backward({
                "img": imgs[i],
                "img2": imgs2[i],
                "label": labels[i].astype(np.int64),
                "domain": domains[i].astype(np.int64),
            })
            losses_x.append(out["loss_x"])
            losses_cr.append(out["loss_cr"])
            step += 1

    np.testing.assert_allclose(losses_x, data["loss_x"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(losses_cr, data["loss_cr"], rtol=5e-4, atol=2e-5)

    final_F = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["F"]["params"]
    )
    _assert_tree_close(final_F, data, "final/F/params", atol=1e-4)
    final_bs = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["F"]["batch_stats"]
    )
    _assert_tree_close(final_bs, data, "final/F/batch_stats", atol=1e-4)
    final_E = jax.tree_util.tree_map(
        lambda x: np.array(x), trainer._models["E"]["params"]
    )
    _assert_tree_close(final_E, data, "final/E/params", atol=1e-4)


# ---------------------------------------------------------------------------
# Dassl MixMatch (tools/gen_trajectory_golden_mixmatch.py): K-view
# pseudo-label guessing with per-view BN advancement, temperature
# sharpening, joint shuffle + per-row preserve_order Beta mixup, soft-CE +
# linear_rampup-weighted Brier loss. MixMatch is RNG-coupled, so the
# reference torch draws (randperm + Beta lambdas) were RECORDED and are
# injected here through the step's perm/lam_x/lam_u arguments
# (dassl/engine/ssl/mixmatch.py:28-87)
# ---------------------------------------------------------------------------

MM_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_mixmatch_golden.npz"
)
MM_EPOCHS, MM_BATCHES = 3, 2


def test_mixmatch_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.ssl import MixMatch
    from ovmr_tpu.modeling import ops as F
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(MM_FIXTURE)
    (base_lr, min_lr, wd, momentum, weight_u, temp, beta, rampup,
     k) = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.DATALOADER.K_TRANSFORMS = int(k)
    cfg.TRAINER.MIXMATCH.WEIGHT_U = float(weight_u)
    cfg.TRAINER.MIXMATCH.TEMP = float(temp)
    cfg.TRAINER.MIXMATCH.MIXUP_BETA = float(beta)
    cfg.TRAINER.MIXMATCH.RAMPUP = int(rampup)
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.MOMENTUM = float(momentum)
    cfg.OPTIM.SGD_NESTEROV = False
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = MM_EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "linear"
    cfg.OPTIM.WARMUP_MIN_LR = float(min_lr)
    cfg.SEED = 1

    trainer = MixMatch.__new__(MixMatch)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg

    class _DM:
        num_classes = 4

    trainer.dm = _DM()
    trainer.build_model()

    state = trainer.state
    assert _transplant(state["params"], data, "init/params") == 14
    assert _transplant(state["batch_stats"], data, "init/batch_stats") == 2
    state["opt_state"] = trainer.tx.init(state["params"])

    imgs_x = np.asarray(data["imgs_x"], np.float32)
    imgs_u = np.asarray(data["imgs_u"], np.float32)  # [2, K, B, 3, H, W]
    labels_x = data["labels_x"]
    rng = jax.random.PRNGKey(0)  # dropout is off everywhere in this net

    losses_x, losses_u = [], []
    step = 0
    from ovmr_tpu.engine.optimizers import set_lr as _set_lr
    for epoch in range(MM_EPOCHS):
        state["opt_state"] = _set_lr(state["opt_state"], trainer.lr_table[epoch])
        for b in range(MM_BATCHES):
            assert trainer.lr_table[epoch] == pytest.approx(
                data["lrs"][step], rel=1e-12
            )
            i = step % 2
            # the per-step weight the trainer would compute must equal the
            # reference's linear_rampup value
            w = float(weight_u) * F.linear_rampup(
                b + epoch * MM_BATCHES, int(rampup)
            )
            assert w == pytest.approx(data["weight_u"][step], rel=1e-12)
            state, metrics = trainer.train_step(
                state,
                _nhwc(imgs_x[i]),
                jnp.asarray(labels_x[i].astype(np.int32)),
                jnp.stack([_nhwc(imgs_u[i, v]) for v in range(int(k))]),
                jnp.float32(w),
                jnp.asarray(data["perms"][step].astype(np.int32)),
                jnp.asarray(data["lams_x"][step], jnp.float32),
                jnp.asarray(data["lams_u"][step], jnp.float32),
                rng,
            )
            losses_x.append(float(metrics["loss_x"]))
            losses_u.append(float(metrics["loss_u"]))
            step += 1

    np.testing.assert_allclose(losses_x, data["loss_x"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(losses_u, data["loss_u"], rtol=1e-3, atol=2e-6)

    final = jax.tree_util.tree_map(lambda x: np.array(x), state["params"])
    _assert_tree_close(final, data, "final/params", atol=1e-4)
    final_bs = jax.tree_util.tree_map(
        lambda x: np.array(x), state["batch_stats"]
    )
    # the K guessing forwards + the two mixed-batch forwards per step are
    # part of this pin
    _assert_tree_close(final_bs, data, "final/batch_stats", atol=1e-4)


# ---------------------------------------------------------------------------
# Dassl DomainMix (tools/gen_trajectory_golden_domainmix.py): crossdomain
# mixing — scalar Beta lam, base randperm overwritten per domain with
# multinomial draws from the OTHER domains, lam-blended double-CE. The
# reference torch draws are recorded and replayed through OUR _domain_mix
# via a replay RNG, so the product's data-dependent pairing surgery is
# what runs (dassl/engine/dg/domain_mix.py:26-83)
# ---------------------------------------------------------------------------

DM_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_domainmix_golden.npz"
)
DM_EPOCHS, DM_BATCHES = 3, 2


class _ReplayRng:
    """np.random.Generator stand-in replaying recorded torch draws."""

    def __init__(self, lam, perm, multinomials):
        self._lam = float(lam)
        self._perm = np.asarray(perm)
        self._mn = list(multinomials)
        self._mn_i = 0

    def beta(self, a, b):
        return self._lam

    def permutation(self, n):
        assert n == len(self._perm)
        return self._perm.copy()

    def choice(self, n, size, replace):
        out = self._mn[self._mn_i]
        self._mn_i += 1
        assert len(out) == size
        return np.asarray(out)


def test_domainmix_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.dg import DomainMix
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(DM_FIXTURE)
    base_lr, min_lr, wd, momentum, alpha, beta_p = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.TRAINER.DOMAINMIX.TYPE = "crossdomain"
    cfg.TRAINER.DOMAINMIX.ALPHA = float(alpha)
    cfg.TRAINER.DOMAINMIX.BETA = float(beta_p)
    cfg.OPTIM.NAME = "sgd"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.MOMENTUM = float(momentum)
    cfg.OPTIM.SGD_NESTEROV = False
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = DM_EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "linear"
    cfg.OPTIM.WARMUP_MIN_LR = float(min_lr)
    cfg.SEED = 1

    trainer = DomainMix.__new__(DomainMix)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg

    class _DM_:
        num_classes = 4
        num_source_domains = 2

    trainer.dm = _DM_()
    trainer.build_model()

    state = trainer.state
    assert _transplant(state["params"], data, "init/params") == 14
    assert _transplant(state["batch_stats"], data, "init/batch_stats") == 2
    state["opt_state"] = trainer.tx.init(state["params"])

    imgs = np.asarray(data["imgs"], np.float32)
    labels = data["labels"]
    domains = data["domains"]

    losses = []
    step = 0
    trainer.num_batches = DM_BATCHES
    for epoch in range(DM_EPOCHS):
        trainer.epoch = epoch
        trainer.before_epoch()
        for b in range(DM_BATCHES):
            trainer.batch_idx = b
            assert trainer.lr_table[epoch] == pytest.approx(
                data["lrs"][step], rel=1e-12
            )
            i = step % 2
            trainer._np_rng = _ReplayRng(
                data["lams"][step], data["perms"][step],
                data["multinomials"][step],
            )
            out = trainer.forward_backward({
                "img": imgs[i],
                "label": labels[i].astype(np.int64),
                "domain": domains[i].astype(np.int64),
            })
            losses.append(out["loss"])
            step += 1

    np.testing.assert_allclose(losses, data["loss"], rtol=2e-4, atol=2e-5)

    fstate = trainer.state  # the jitted step rebinds self._models entries
    final = jax.tree_util.tree_map(lambda x: np.array(x), fstate["params"])
    _assert_tree_close(final, data, "final/params", atol=1e-4)
    final_bs = jax.tree_util.tree_map(
        lambda x: np.array(x), fstate["batch_stats"]
    )
    _assert_tree_close(final_bs, data, "final/batch_stats", atol=1e-4)


# ---------------------------------------------------------------------------
# Dassl Vanilla/ERM on RAdam (tools/gen_trajectory_golden_misc.py): the
# shared default supervised composition (reused verbatim by SourceOnly and
# SupBaseline) on the vendored RAdam — its degenerated-to-SGD warmup steps
# AND the N_sma>=5 rectified regime both land inside the 6-step run
# (dassl/engine/dg/vanilla.py:14-28, dassl/optim/radam.py:50-130)
# ---------------------------------------------------------------------------

VAN_FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "trajectory_vanilla_golden.npz"
)


def test_vanilla_trajectory_matches_reference_trainer():
    from ovmr_tpu.engine.dg import Vanilla
    from ovmr_tpu.utils.defaults import get_cfg_default as our_cfg

    data = np.load(VAN_FIXTURE)
    base_lr, cons_lr, wd = data["optim_scalars"]

    cfg = our_cfg()
    cfg.MODEL.BACKBONE.NAME = "cnn_digitsdg"
    cfg.MODEL.HEAD.NAME = "mlp"
    cfg.MODEL.HEAD.HIDDEN_LAYERS = [64]
    cfg.MODEL.HEAD.ACTIVATION = "relu"
    cfg.MODEL.HEAD.BN = True
    cfg.MODEL.HEAD.DROPOUT = 0.0
    cfg.INPUT.SIZE = (32, 32)
    cfg.OPTIM.NAME = "radam"
    cfg.OPTIM.LR = float(base_lr)
    cfg.OPTIM.WEIGHT_DECAY = float(wd)
    cfg.OPTIM.MAX_EPOCH = 3
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = float(cons_lr)
    cfg.SEED = 1

    trainer = Vanilla.__new__(Vanilla)
    trainer._models, trainer._nets, trainer._txs = {}, {}, {}
    trainer._infer_cache = {}
    trainer._rng = jax.random.PRNGKey(0)
    trainer._step_count = 0
    trainer.mesh = None
    trainer.cfg = cfg

    class _DM:
        num_classes = 4

    trainer.dm = _DM()
    trainer.build_model()

    state = trainer.state
    assert _transplant(state["params"], data, "init/params") == 14
    assert _transplant(state["batch_stats"], data, "init/batch_stats") == 2
    state["opt_state"] = trainer.tx.init(state["params"])

    imgs = np.asarray(data["imgs"], np.float32)
    labels = data["labels"]

    losses = []
    step = 0
    trainer.num_batches = 2
    for epoch in range(3):
        trainer.epoch = epoch
        trainer.before_epoch()
        for b in range(2):
            trainer.batch_idx = b
            assert trainer.lr_table[epoch] == pytest.approx(
                data["lrs"][step], rel=1e-12
            )
            i = step % 2
            out = trainer.forward_backward(
                {"img": imgs[i], "label": labels[i].astype(np.int64)}
            )
            losses.append(out["loss"])
            step += 1

    # torch computes the RAdam rectifier scalars in float64; the traced
    # version is fp32 (see test_optim_extra) — hence the slightly wider
    # band than the sgd/adam trajectories
    np.testing.assert_allclose(losses, data["loss"], rtol=5e-4, atol=5e-5)

    fstate = trainer.state  # the jitted step rebinds self._models entries
    final = jax.tree_util.tree_map(lambda x: np.array(x), fstate["params"])
    _assert_tree_close(final, data, "final/params", atol=2e-4)
    final_bs = jax.tree_util.tree_map(
        lambda x: np.array(x), fstate["batch_stats"]
    )
    _assert_tree_close(final_bs, data, "final/batch_stats", atol=2e-4)
