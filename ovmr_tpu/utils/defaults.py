"""Default configuration tree.

Key names match the reference so its yaml files merge unchanged
(``Dassl.pytorch/dassl/config/defaults.py:1-313`` + the OVMR extensions from
``train.py:100-132``), including the DA/DG/SSL trainer hyper-param families
consumed by ``ovmr_tpu.engine.{da,dg,ssl}``. A ``TPU`` section is added for
mesh/precision policy, which has no reference counterpart.
"""

from __future__ import annotations

from .config import CfgNode


def get_cfg_default() -> CfgNode:
    c = CfgNode()

    c.VERSION = 1
    c.OUTPUT_DIR = "./output"
    c.RESUME = ""
    c.SEED = -1
    c.USE_CUDA = True  # accepted for config compatibility; ignored on TPU
    c.VERBOSE = True
    c.TEXT_ONLY = False
    c.GPU_NUMS = -1
    c.TASK_ID = 0

    # ---- input -----------------------------------------------------------
    c.INPUT = CfgNode()
    c.INPUT.SIZE = (224, 224)
    c.INPUT.INTERPOLATION = "bilinear"
    c.INPUT.TRANSFORMS = ()
    c.INPUT.NO_TRANSFORM = False
    c.INPUT.PIXEL_MEAN = [0.485, 0.456, 0.406]
    c.INPUT.PIXEL_STD = [0.229, 0.224, 0.225]
    c.INPUT.CROP_PADDING = 4
    c.INPUT.RRCROP_SCALE = (0.08, 1.0)
    c.INPUT.CUTOUT_N = 1
    c.INPUT.CUTOUT_LEN = 16
    c.INPUT.GN_MEAN = 0.0
    c.INPUT.GN_STD = 0.15
    c.INPUT.RANDAUGMENT_N = 2
    c.INPUT.RANDAUGMENT_M = 10
    c.INPUT.COLORJITTER_B = 0.4
    c.INPUT.COLORJITTER_C = 0.4
    c.INPUT.COLORJITTER_S = 0.4
    c.INPUT.COLORJITTER_H = 0.1
    c.INPUT.RGS_P = 0.2
    c.INPUT.GB_P = 0.5
    c.INPUT.GB_K = 21

    # ---- dataset -----------------------------------------------------------
    c.DATASET = CfgNode()
    c.DATASET.ROOT = ""
    c.DATASET.REGION_AUG = False
    c.DATASET.REGION_SCALE = [224]
    c.DATASET.TEST_REGION_SCALE = [224]
    c.DATASET.NAME = ""
    c.DATASET.SOURCE_DOMAINS = ()
    c.DATASET.TARGET_DOMAINS = ()
    c.DATASET.NUM_LABELED = -1
    c.DATASET.NUM_SHOTS = -1
    c.DATASET.VAL_PERCENT = 0.1
    c.DATASET.STL10_FOLD = -1
    c.DATASET.CIFAR_C_TYPE = ""
    c.DATASET.CIFAR_C_LEVEL = 1
    c.DATASET.ALL_AS_UNLABELED = False
    c.DATASET.SUBSAMPLE_CLASSES = "all"  # all, base or new

    # ---- dataloader --------------------------------------------------------
    c.DATALOADER = CfgNode()
    c.DATALOADER.NUM_WORKERS = 4
    c.DATALOADER.K_TRANSFORMS = 1
    c.DATALOADER.RETURN_IMG0 = False
    # batch-level multi-resolution collate (reference data_manager.py:15-67
    # collate_fn_custom — defined there, never wired; opt-in here). Random
    # per-batch aspect ratio + short side, dims floored to patch multiples;
    # the ratio comes from a bounded grid so the XLA shape set stays finite
    # (data/multires.py). Replaces the per-image train transform pipeline.
    c.DATALOADER.MULTI_RES_COLLATE = False
    c.DATALOADER.COLLATE_FN = "none"
    c.DATALOADER.TRAIN_X = CfgNode()
    c.DATALOADER.TRAIN_X.SAMPLER = "RandomSampler"
    c.DATALOADER.TRAIN_X.BATCH_SIZE = 32
    c.DATALOADER.TRAIN_X.N_DOMAIN = 0
    c.DATALOADER.TRAIN_X.N_INS = 16
    c.DATALOADER.TRAIN_U = CfgNode()
    c.DATALOADER.TRAIN_U.SAME_AS_X = True
    c.DATALOADER.TRAIN_U.SAMPLER = "RandomSampler"
    c.DATALOADER.TRAIN_U.BATCH_SIZE = 32
    c.DATALOADER.TRAIN_U.N_DOMAIN = 0
    c.DATALOADER.TRAIN_U.N_INS = 16
    c.DATALOADER.TEST = CfgNode()
    c.DATALOADER.TEST.SAMPLER = "SequentialSampler"
    c.DATALOADER.TEST.BATCH_SIZE = 32
    c.DATALOADER.TEST.N_INS = 16

    # ---- model ---------------------------------------------------------------
    c.MODEL = CfgNode()
    c.MODEL.INIT_WEIGHTS = ""
    c.MODEL.BACKBONE = CfgNode()
    c.MODEL.BACKBONE.NAME = ""
    c.MODEL.BACKBONE.PRETRAINED = True
    c.MODEL.HEAD = CfgNode()
    c.MODEL.HEAD.NAME = ""
    c.MODEL.HEAD.HIDDEN_LAYERS = ()
    c.MODEL.HEAD.ACTIVATION = "relu"
    c.MODEL.HEAD.BN = True
    c.MODEL.HEAD.DROPOUT = 0.0

    # ---- optimization ----------------------------------------------------
    c.OPTIM = CfgNode()
    c.OPTIM.NAME = "adam"
    c.OPTIM.LR = 0.0003
    c.OPTIM.WEIGHT_DECAY = 5e-4
    c.OPTIM.MOMENTUM = 0.9
    c.OPTIM.SGD_DAMPNING = 0
    c.OPTIM.SGD_NESTEROV = False
    c.OPTIM.RMSPROP_ALPHA = 0.99
    c.OPTIM.ADAM_BETA1 = 0.9
    c.OPTIM.ADAM_BETA2 = 0.999
    c.OPTIM.STAGED_LR = False
    c.OPTIM.NEW_LAYERS = ()
    c.OPTIM.BASE_LR_MULT = 0.1
    c.OPTIM.LR_SCHEDULER = "single_step"
    c.OPTIM.STEPSIZE = (-1,)
    c.OPTIM.GAMMA = 0.1
    c.OPTIM.MAX_EPOCH = 10
    c.OPTIM.WARMUP_EPOCH = -1
    c.OPTIM.WARMUP_TYPE = "linear"
    c.OPTIM.WARMUP_CONS_LR = 1e-5
    c.OPTIM.WARMUP_MIN_LR = 1e-5
    c.OPTIM.WARMUP_RECOUNT = True

    # ---- train / test ------------------------------------------------------
    c.TRAIN = CfgNode()
    c.TRAIN.CHECKPOINT_FREQ = 0
    c.TRAIN.PRINT_FREQ = 10
    c.TRAIN.COUNT_ITER = "train_x"

    c.TEST = CfgNode()
    c.TEST.EVALUATOR = "Classification"
    c.TEST.PER_CLASS_RESULT = False
    c.TEST.COMPUTE_CMAT = False
    c.TEST.NO_TEST = False
    c.TEST.SPLIT = "test"
    c.TEST.FINAL_MODEL = "last_step"

    # ---- trainer specifics ---------------------------------------------------
    c.TRAINER = CfgNode()
    c.TRAINER.NAME = ""

    c.TRAINER.COOP = CfgNode()
    c.TRAINER.COOP.N_CTX = 16
    c.TRAINER.COOP.CSC = False
    c.TRAINER.COOP.CTX_INIT = ""
    c.TRAINER.COOP.PREC = "fp16"
    c.TRAINER.COOP.CLASS_TOKEN_POSITION = "end"
    c.TRAINER.COOP.VISUAL_TOKEN_PATH = ""

    c.TRAINER.COCOOP = CfgNode()
    c.TRAINER.COCOOP.N_CTX = 16
    c.TRAINER.COCOOP.CTX_INIT = ""
    c.TRAINER.COCOOP.PREC = "fp16"

    # ---- DA trainer hyper-params (reference defaults.py:230-260) ---------
    c.TRAINER.MCD = CfgNode()
    c.TRAINER.MCD.N_STEP_F = 4  # number of steps to train F
    c.TRAINER.MME = CfgNode()
    c.TRAINER.MME.LMDA = 0.1  # weight for the entropy loss
    c.TRAINER.CDAC = CfgNode()
    c.TRAINER.CDAC.CLASS_LR_MULTI = 10
    c.TRAINER.CDAC.RAMPUP_COEF = 30
    c.TRAINER.CDAC.RAMPUP_ITRS = 1000
    c.TRAINER.CDAC.TOPK_MATCH = 5
    c.TRAINER.CDAC.P_THRESH = 0.95
    c.TRAINER.CDAC.STRONG_TRANSFORMS = ()
    c.TRAINER.SE = CfgNode()
    c.TRAINER.SE.EMA_ALPHA = 0.999
    c.TRAINER.SE.CONF_THRE = 0.95
    c.TRAINER.SE.RAMPUP = 300
    c.TRAINER.M3SDA = CfgNode()
    c.TRAINER.M3SDA.LMDA = 0.5  # weight for the moment distance loss
    c.TRAINER.M3SDA.N_STEP_F = 4  # follow MCD
    c.TRAINER.DAEL = CfgNode()
    c.TRAINER.DAEL.WEIGHT_U = 0.5  # weight on the unlabeled loss
    c.TRAINER.DAEL.CONF_THRE = 0.95
    c.TRAINER.DAEL.STRONG_TRANSFORMS = ()

    # ---- DG trainer hyper-params (reference defaults.py:262-289) ---------
    c.TRAINER.CROSSGRAD = CfgNode()
    c.TRAINER.CROSSGRAD.EPS_F = 1.0
    c.TRAINER.CROSSGRAD.EPS_D = 1.0
    c.TRAINER.CROSSGRAD.ALPHA_F = 0.5
    c.TRAINER.CROSSGRAD.ALPHA_D = 0.5
    c.TRAINER.DDAIG = CfgNode()
    c.TRAINER.DDAIG.G_ARCH = ""  # generator architecture (NETWORK_REGISTRY)
    c.TRAINER.DDAIG.LMDA = 0.3  # perturbation weight
    c.TRAINER.DDAIG.CLAMP = False
    c.TRAINER.DDAIG.CLAMP_MIN = -1.0
    c.TRAINER.DDAIG.CLAMP_MAX = 1.0
    c.TRAINER.DDAIG.WARMUP = 0
    c.TRAINER.DDAIG.ALPHA = 0.5
    c.TRAINER.DAELDG = CfgNode()
    c.TRAINER.DAELDG.WEIGHT_U = 0.5
    c.TRAINER.DAELDG.CONF_THRE = 0.95
    c.TRAINER.DAELDG.STRONG_TRANSFORMS = ()
    c.TRAINER.DOMAINMIX = CfgNode()
    c.TRAINER.DOMAINMIX.TYPE = "crossdomain"
    c.TRAINER.DOMAINMIX.ALPHA = 1.0
    c.TRAINER.DOMAINMIX.BETA = 1.0

    # ---- SSL trainer hyper-params (reference defaults.py:291-312) --------
    c.TRAINER.ENTMIN = CfgNode()
    c.TRAINER.ENTMIN.LMDA = 1e-3
    c.TRAINER.MEANTEACHER = CfgNode()
    c.TRAINER.MEANTEACHER.WEIGHT_U = 1.0
    c.TRAINER.MEANTEACHER.EMA_ALPHA = 0.999
    c.TRAINER.MEANTEACHER.RAMPUP = 5  # epochs to ramp up loss_u
    c.TRAINER.MIXMATCH = CfgNode()
    c.TRAINER.MIXMATCH.WEIGHT_U = 100.0
    c.TRAINER.MIXMATCH.TEMP = 2.0
    c.TRAINER.MIXMATCH.MIXUP_BETA = 0.75
    c.TRAINER.MIXMATCH.RAMPUP = 20000  # steps to ramp up loss_u
    c.TRAINER.FIXMATCH = CfgNode()
    c.TRAINER.FIXMATCH.WEIGHT_U = 1.0
    c.TRAINER.FIXMATCH.CONF_THRE = 0.95
    c.TRAINER.FIXMATCH.STRONG_TRANSFORMS = ()

    # ---- OVMR top-level extensions (reference train.py:100-132) --------------
    c.FS_CLASSIFIER = "metaopt"
    c.CLASSIFIER_PARAMETERS = []
    c.STAGE_NUM = 1
    c.USE_CLIP_TEXT = False
    c.EVAL_MODE = "multimodal"  # text | vision | multimodal | fusion
    c.EVAL_TAU = 10

    # ---- TPU-native extensions (no reference counterpart) -------------------
    c.TPU = CfgNode()
    # compute dtype for the frozen towers: bfloat16 (TPU default),
    # float16 (mirrors the reference numerics) or float32
    c.TPU.DTYPE = "bfloat16"
    # mesh axis sizes; -1 on DATA means "all visible devices"
    c.TPU.MESH = CfgNode()
    c.TPU.MESH.DATA = -1
    c.TPU.MESH.MODEL = 1
    # multi-host: each process decodes only its slice of the global batch
    # (train loaders of row-wise trainers; see DataManager)
    c.TPU.MULTIHOST_SLICED_LOADER = True
    # pad per-dataset class counts up to multiples of this for static shapes
    c.TPU.CLASS_PAD_MULTIPLE = 8
    # classifier generation processes classes in chunks of this size when the
    # class count exceeds it (bounds text-tower activation memory at 21k
    # scale); 2048 measured fastest at 8192-class scale on chip — ~8% over
    # 1024 (fewer dispatches), while 4096 loses it back (docs/DESIGN.md)
    c.TPU.CLASS_CHUNK = 2048
    # use the Pallas fused attention kernel; default off — the XLA path
    # measured equal-or-faster inside full programs on v5e (docs/DESIGN.md)
    c.TPU.USE_PALLAS_ATTENTION = False
    # block-fused Pallas kernels (LN1+QKV+attention+proj and LN2+MLP
    # halves, ops/block_fused) for the CLIP towers. DEFAULT ON for TPU:
    # measured 62.5 ms vs 100.7 ms XLA at ViT-B/16 batch 256 bf16
    # (4095 vs 2542 img/s, ~74% MXU) with identical outputs; shapes whose
    # weights exceed the VMEM residency cutoffs fall back to XLA per-half
    c.TPU.USE_FUSED_BLOCK = True
    # training input path: stream decode-once uint8 caches and run the whole
    # augmentation recipe on device inside the train step (the host PIL
    # path stays the default for reference-faithful behavior)
    c.TPU.DEVICE_AUGS = False
    # cache side for the decode-once store (crop head-room above INPUT.SIZE)
    c.TPU.CACHE_SIDE = 256
    # eval batches ship as uint8 and normalize on device (4x smaller
    # host->device transfers; bit-identical numerics)
    c.TPU.EVAL_UINT8_TRANSFER = True
    # int8 weight+activation quantization of the frozen tower block matmuls
    # (serving only; feature cosine >0.995). Measured NOT faster on v5e at
    # ViT-B shapes (dynamic-quant overhead) — docs/DESIGN.md; default off
    c.TPU.INT8 = False
    # tensor parallelism (MESH.MODEL > 1): the split-QKV TP-pallas route
    # keeps the fused Pallas kernels per chip (head-padding any head count
    # onto the model axis). False forces the legacy plain-jit GSPMD route
    # (packed towers, Pallas kernels gated to XLA) — a debugging/layout
    # escape hatch, not a recommended mode
    c.TPU.TP_SPLIT_QKV = True
    # checkpoint backend for the epoch save/resume cycle: "npz" (default,
    # path-flattened arrays + pointer file, torch-interop) or "orbax"
    # (async-safe per-array chunking for very large/sharded states)
    c.TPU.CHECKPOINT_BACKEND = "npz"
    # skip the frozen zero-shot text classifier at or above this many
    # classes (the reference's hard-coded >=5000 guard, ``mm_…:118-126``;
    # at that scale the reference cannot eval/export at all). Classifier
    # generation then omits text_classifier/fusion_weight from the artifact
    # and the text/fusion eval modes refuse with a clear error. Raise this
    # to force the full artifact at ImageNet-21k scale (streaming fusion
    # makes that feasible here — docs/DESIGN.md).
    c.TPU.TEXT_CLS_MAX_CLASSES = 5000

    return c


def extend_cfg(cfg: CfgNode) -> CfgNode:
    """Kept for CLI parity with the reference; defaults already include the
    OVMR extensions, so this is a no-op hook."""
    return cfg
