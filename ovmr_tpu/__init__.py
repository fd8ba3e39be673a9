"""ovmr_tpu: a TPU-native (JAX/XLA/Pallas/pjit) open-vocabulary recognition framework.

Re-designed from scratch with the capabilities of OVMR (CVPR 2024,
reference: Zehong-Ma/OVMR): a fine-tuning-free, plug-and-play
classifier-generation system for CLIP. Given class names and a handful of
exemplar images per class it produces three open-vocabulary classifiers
(text / vision / multi-modal) plus a preference-based fusion of the three.

Layout
------
- ``ovmr_tpu.models``      functional CLIP towers + the visual token generator
- ``ovmr_tpu.ops``         Pallas TPU kernels and fused numerics
- ``ovmr_tpu.text``        BPE tokenizer, prompt templates, tokenize()
- ``ovmr_tpu.data``        dataset registry, samplers, transforms, loaders
- ``ovmr_tpu.engine``      trainers (MM_CLS_OP, CoOp, zero-shot), checkpointing
- ``ovmr_tpu.evaluation``  classification evaluator (accuracy / macro-F1 / CSVs)
- ``ovmr_tpu.parallel``    device mesh + sharding policy
- ``ovmr_tpu.utils``       config system, registry, logging, meters
"""

__version__ = "0.1.0"
