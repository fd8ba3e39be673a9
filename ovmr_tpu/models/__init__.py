from . import clip
from .clip import CLIPConfig, CONFIGS, init_params, encode_image, encode_text

# exploratory encode variants (reference clip/model.py:430-714 research
# forwards) live in .exploratory — imported lazily by consumers, not
# re-exported here (diagnostics surface, not the hot path)

__all__ = [
    "clip",
    "CLIPConfig",
    "CONFIGS",
    "init_params",
    "encode_image",
    "encode_text",
]
