"""Generate tests/fixtures/trajectory_coop_golden.npz: N-step training
trajectories of the REFERENCE CoOp stage-2 trainer (torch CPU, tiny towers).

Pins the stage-2 composition end-to-end: the actual reference
``CoOp.forward_backward`` (``trainers/coop_mm_classifier.py:455-478`` —
3-prompt CE(mm)+CE(v)+CE(t) loss, ``model_backward_and_update``, adam)
through the real Dassl optimizer + warmup->cosine scheduler, in BOTH loss
regimes:

- scenario A: 4 classes  -> the 3-prompt sum loss (``coop_…:330-337``);
- scenario B: 401 classes -> the >400-class single-random-prompt loss
  (``coop_…:319-325``), prompt indices recorded via a torch.randint patch.

3 epochs x 2 batches = 6 steps each. Same determinism knobs as
tools/gen_trajectory_golden.py (no dropout exists in this path; images
quantized to fp16 storage; fp32 throughout). Consumed by
tests/test_trajectory_parity.py.

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden_coop.py
"""

import os
import sys
import tempfile

sys.path.insert(0, ".")

from tools._reference_harness import install, sparsify_token_embedding  # noqa: E402

torch = install(".")

import numpy as np  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import TrainerBase  # noqa: E402

import trainers.coop_mm_classifier as coop  # noqa: E402
from clip import clip as ref_clip  # noqa: E402
from clip.model import CLIP  # noqa: E402

OUT = "tests/fixtures/trajectory_coop_golden.npz"
CLASSNAMES_A = ["golden retriever", "tabby cat", "sports car", "red panda"]
CLASSNAMES_B = [f"object {i:03d}" for i in range(401)]
N_CTX, VOK_LEN, DIM = 2, 2, 128
EPOCHS, BATCHES_PER_EPOCH, BATCH = 3, 2, 16
BASE_LR, CONS_LR, WD = 1e-4, 1e-5, 5e-4
PROMPT_INDS_B = [0, 2, 1, 0, 2, 1]

data = {}


def t2np(t):
    # copy: .numpy() on an fp32 CPU tensor SHARES storage with the live
    # params, so pre-training dumps would mutate as training proceeds
    return t.detach().cpu().float().numpy().copy()


def make_cfg(vt_path):
    cfg = get_cfg_default()
    cfg.TRAINER.COOP = type(cfg)()
    cfg.TRAINER.COOP.N_CTX = N_CTX
    cfg.TRAINER.COOP.CTX_INIT = ""
    cfg.TRAINER.COOP.PREC = "fp32"
    cfg.TRAINER.COOP.CSC = False
    cfg.TRAINER.COOP.CLASS_TOKEN_POSITION = "end"
    cfg.TRAINER.COOP.VISUAL_TOKEN_PATH = vt_path
    cfg.INPUT.SIZE = (64, 64)  # tiny tower input_resolution
    cfg.DATALOADER.TEST.N_INS = 4
    cfg.OPTIM.NAME = "adam"
    cfg.OPTIM.LR = BASE_LR
    cfg.OPTIM.WEIGHT_DECAY = WD
    cfg.OPTIM.MAX_EPOCH = EPOCHS
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.OPTIM.WARMUP_TYPE = "constant"
    cfg.OPTIM.WARMUP_CONS_LR = CONS_LR
    cfg.SEED = 1
    return cfg


# ---------------------------------------------------------------- tiny CLIP
torch.manual_seed(0)
clip_model = CLIP(
    embed_dim=DIM,
    image_resolution=64,
    vision_layers=2,
    vision_width=DIM,
    vision_patch_size=16,
    context_length=77,
    vocab_size=49408,
    transformer_width=DIM,
    transformer_heads=2,
    transformer_layers=2,
).float()

prefix = " ".join(["X"] * N_CTX)
prompts = [f"{prefix} {n}." for n in CLASSNAMES_A + CLASSNAMES_B] + [f"{prefix}."]
tok = torch.cat([ref_clip.tokenize(p) for p in prompts])
sparsify_token_embedding(clip_model, tok.flatten().tolist())
for k, v in clip_model.state_dict().items():
    data[f"clip.{k}"] = t2np(v)

# ------------------------------------------------------------ shared inputs
rng = np.random.default_rng(7)
images = (
    rng.standard_normal((2, BATCH, 3, 64, 64)).astype(np.float16).astype(np.float32)
)
labels_a = rng.integers(0, 4, (2, BATCH)).astype(np.int64)
labels_b = rng.integers(0, 401, (2, BATCH)).astype(np.int64)
ctx_init = (0.02 * rng.standard_normal((N_CTX, DIM))).astype(np.float32)
vt = {
    "a": (0.05 * rng.standard_normal((4, VOK_LEN, DIM))).astype(np.float32),
    "b": (0.05 * rng.standard_normal((401, VOK_LEN, DIM))).astype(np.float32),
}
data.update(
    images=images.astype(np.float16),
    labels_a=labels_a.astype(np.int32),
    labels_b=labels_b.astype(np.int32),
    ctx_init=ctx_init,
    vt_a=vt["a"],
    vt_b=vt["b"],
    classnames_a=np.asarray(CLASSNAMES_A),
    classnames_b=np.asarray(CLASSNAMES_B),
    prompt_inds_b=np.asarray(PROMPT_INDS_B, np.int32),
    optim_scalars=np.asarray([BASE_LR, CONS_LR, WD, 0.9, 0.999], np.float64),
)


def run_scenario(key, classnames, labels, prompt_inds=None):
    tmp = tempfile.mkdtemp()
    vt_path = os.path.join(tmp, "visual_tokens.pt")
    torch.save({"visual_tokens": torch.from_numpy(vt[key])}, vt_path)
    cfg = make_cfg(vt_path)

    trainer = coop.CoOp.__new__(coop.CoOp)
    TrainerBase.__init__(trainer)
    trainer.cfg = cfg
    trainer.device = torch.device("cpu")

    class _DS:
        pass

    class _DM:
        pass

    _DS.classnames = classnames
    _DM.dataset = _DS()
    trainer.dm = _DM()
    coop.load_clip_to_cpu = lambda cfg: clip_model
    trainer.build_model()
    with torch.no_grad():
        trainer.model.prompt_learner.ctx.copy_(torch.from_numpy(ctx_init))
    trainer.set_model_mode("train")

    orig_randint = torch.randint
    if prompt_inds is not None:
        it = iter(prompt_inds)
        torch.randint = lambda lo, hi, size, **k: torch.tensor([next(it)])
    losses, lrs = [], []
    try:
        trainer.num_batches = BATCHES_PER_EPOCH
        step = 0
        for epoch in range(EPOCHS):
            for b in range(BATCHES_PER_EPOCH):
                trainer.batch_idx = b
                i = step % 2
                batch = {
                    "img": torch.from_numpy(images[i]),
                    "label": torch.from_numpy(labels[i]),
                }
                lrs.append(trainer.optim.param_groups[0]["lr"])
                out = trainer.forward_backward(batch)
                losses.append(out["loss"])
                step += 1
    finally:
        torch.randint = orig_randint
    ctx_final = t2np(trainer.model.prompt_learner.ctx)
    return losses, lrs, ctx_final


losses_a, lrs, ctx_final_a = run_scenario("a", CLASSNAMES_A, labels_a)
losses_b, lrs_b, ctx_final_b = run_scenario(
    "b", CLASSNAMES_B, labels_b, PROMPT_INDS_B
)
assert lrs == lrs_b

data.update(
    losses_a=np.asarray(losses_a, np.float64),
    losses_b=np.asarray(losses_b, np.float64),
    lrs=np.asarray(lrs, np.float64),
    ctx_final_a=ctx_final_a,
    ctx_final_b=ctx_final_b,
)

np.savez_compressed(OUT, **data)
print("losses_a:", losses_a)
print("losses_b:", losses_b)
print("lrs:     ", lrs)
print("wrote", OUT)
