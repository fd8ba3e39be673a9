from .layers import (
    attention_xla,
    causal_mask,
    dense,
    l2_normalize,
    layer_norm,
    mlp_block,
    multi_head_attention,
    quick_gelu,
    residual_attention_block,
)

__all__ = [
    "attention_xla",
    "causal_mask",
    "dense",
    "l2_normalize",
    "layer_norm",
    "mlp_block",
    "multi_head_attention",
    "quick_gelu",
    "residual_attention_block",
]
