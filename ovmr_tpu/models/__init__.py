from . import clip
from .clip import CLIPConfig, CONFIGS, init_params, encode_image, encode_text

__all__ = [
    "clip",
    "CLIPConfig",
    "CONFIGS",
    "init_params",
    "encode_image",
    "encode_text",
]
