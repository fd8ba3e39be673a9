"""Generate tests/fixtures/trajectory_golden.npz: a joint N-step training
trajectory of the REFERENCE MM_CLS_OP trainer (torch CPU, tiny towers).

This pins the *composition* the per-op goldens can't: the real reference
``MM_CLS_OP.forward_backward`` (``trainers/mm_classifier_one_prompt.py:421-452``
— CustomCLIP train forward, CE(mm)+CE(v), loss.backward, adam step) driven
through the real Dassl ``build_optimizer`` + ``build_lr_scheduler``
(``dassl/optim/optimizer.py:88-147``, ``lr_scheduler.py:83-152``) with
``update_lr()`` after the last batch of each epoch, across a 1-epoch
constant warmup -> cosine handoff. 3 epochs x 3 batches = 9 steps.

Determinism knobs (recorded in the fixture, replayed by
``tests/test_trajectory_parity.py``):
- dropout zeroed everywhere (masks are not reproducible across frameworks);
- the random exemplar/query ``split_point`` (``mm_…:300``) is driven by a
  recorded sequence via a torch.randint patch;
- images are drawn once, quantized to fp16 storage, and BOTH sides consume
  the dequantized fp32 values;
- fp32 throughout (fp16 aliased; PREC="fp32").

Run from repo root with /root/reference mounted:
    python tools/gen_trajectory_golden.py
"""

import sys

sys.path.insert(0, ".")

from tools._reference_harness import (  # noqa: E402
    install,
    sparsify_token_embedding,
    zero_dropout,
)

torch = install(".")

import numpy as np  # noqa: E402
import torch.nn as nn  # noqa: E402

from dassl.config import get_cfg_default  # noqa: E402
from dassl.engine.trainer import TrainerBase  # noqa: E402

import trainers.mm_classifier_one_prompt as mm  # noqa: E402
from clip import clip as ref_clip  # noqa: E402
from clip.model import CLIP  # noqa: E402

OUT = "tests/fixtures/trajectory_golden.npz"
CLASSNAMES = ["golden retriever", "tabby cat", "sports car", "red panda"]
N_CLS, N_INS, N_CTX = 4, 8, 2
EPOCHS, BATCHES_PER_EPOCH = 3, 3
SPLITS = [2, 5, 3, 4, 2, 5, 4, 3, 2]  # U[2,6) draws, one per step
BATCH_ORDER = [0, 1, 0, 1, 0, 1, 0, 1, 0]
BASE_LR, CONS_LR, WD = 2e-4, 1e-5, 5e-4

data = {}


def t2np(t):
    # copy: .numpy() on an fp32 CPU tensor SHARES storage with the live
    # params, so pre-training dumps would mutate as training proceeds
    return t.detach().cpu().float().numpy().copy()


# ---------------------------------------------------------------- config
cfg = get_cfg_default()
cfg.TRAINER.COCOOP = type(cfg)()
cfg.TRAINER.COCOOP.N_CTX = N_CTX
cfg.TRAINER.COCOOP.CTX_INIT = " ?"
cfg.TRAINER.COCOOP.PREC = "fp32"
cfg.INPUT.SIZE = (224, 224)  # PromptLearner asserts ==224; tensors are 64px
cfg.DATALOADER.TRAIN_X.N_INS = N_INS
cfg.DATALOADER.TRAIN_X.BATCH_SIZE = N_CLS * N_INS
cfg.DATASET.NUM_SHOTS = N_INS
cfg.OPTIM.NAME = "adam"
cfg.OPTIM.LR = BASE_LR
cfg.OPTIM.WEIGHT_DECAY = WD
cfg.OPTIM.MAX_EPOCH = EPOCHS
cfg.OPTIM.LR_SCHEDULER = "cosine"
cfg.OPTIM.WARMUP_EPOCH = 1
cfg.OPTIM.WARMUP_TYPE = "constant"
cfg.OPTIM.WARMUP_CONS_LR = CONS_LR
cfg.SEED = 1

# ---------------------------------------------------------------- tiny CLIP
torch.manual_seed(0)
clip_model = CLIP(
    embed_dim=128,
    image_resolution=64,
    vision_layers=2,
    vision_width=128,
    vision_patch_size=16,
    context_length=77,
    vocab_size=49408,
    transformer_width=128,
    transformer_heads=2,
    transformer_layers=2,
).float()

prompts = ["a " + n + "." for n in CLASSNAMES] + ["a ."]
tok = torch.cat([ref_clip.tokenize(p) for p in prompts])
sparsify_token_embedding(clip_model, tok.flatten().tolist())

for k, v in clip_model.state_dict().items():
    data[f"clip.{k}"] = t2np(v)

# ---------------------------------------------------------------- trainer
trainer = mm.MM_CLS_OP.__new__(mm.MM_CLS_OP)
TrainerBase.__init__(trainer)
trainer.cfg = cfg
trainer.device = torch.device("cpu")


class _DS:
    classnames = CLASSNAMES


class _DM:
    dataset = _DS()


trainer.dm = _DM()
mm.load_clip_to_cpu = lambda cfg: clip_model
trainer.build_model()  # real build: CustomCLIP + optimizer + scheduler
zero_dropout(trainer.model)
trainer.set_model_mode("train")

pl_init = trainer.model.prompt_learner.state_dict()
for k, v in pl_init.items():
    data[f"agg_init.{k}"] = t2np(v).copy()

# ---------------------------------------------------------------- batches
rng = np.random.default_rng(42)
images = (
    rng.standard_normal((2, N_CLS * N_INS, 3, 64, 64))
    .astype(np.float16)
    .astype(np.float32)
)
class_orders = np.array([[0, 1, 2, 3], [2, 0, 3, 1]], np.int64)
labels = np.repeat(class_orders, N_INS, axis=1)  # class-grouped batches

data["images"] = images.astype(np.float16)
data["class_orders"] = class_orders.astype(np.int32)
data["ptok"] = trainer.model.prompt_learner.tokenized_prompts.numpy().astype(np.int32)
data["vtok"] = (
    ref_clip.tokenize(["a ."])[0].numpy().astype(np.int32)
)
data["eot"] = data["ptok"].argmax(-1).astype(np.int32)

# ---------------------------------------------------------------- run
split_iter = iter(SPLITS)
orig_randint = torch.randint
torch.randint = lambda lo, hi, size, **k: torch.tensor([next(split_iter)])

losses, lrs = [], []
try:
    step = 0
    trainer.num_batches = BATCHES_PER_EPOCH
    for epoch in range(EPOCHS):
        for b in range(BATCHES_PER_EPOCH):
            trainer.batch_idx = b
            i = BATCH_ORDER[step]
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

for k, v in trainer.model.prompt_learner.state_dict().items():
    data[f"agg_final.{k}"] = t2np(v)

data["losses"] = np.asarray(losses, np.float64)
data["lrs"] = np.asarray(lrs, np.float64)
data["splits"] = np.asarray(SPLITS, np.int32)
data["batch_order"] = np.asarray(BATCH_ORDER, np.int32)
data["optim_scalars"] = np.asarray(
    [BASE_LR, CONS_LR, WD, 0.9, 0.999], np.float64
)  # lr, cons, wd, beta1, beta2

np.savez_compressed(OUT, **data)
print("losses:", losses)
print("lrs:   ", lrs)
print("wrote", OUT)
