"""Torch checkpoint ingestion.

Converts OpenAI-CLIP torch checkpoints (plain state_dicts or TorchScript
archives, reference ``clip/clip.py:117-126`` / ``clip/model.py:899-936``) and
OVMR prompt-learner checkpoints (``model.pth.tar-{epoch}`` pickles, reference
``dassl/utils/torchtools.py:77-115``) into this framework's parameter
pytrees. Torch is used CPU-only, at setup time; nothing torch touches the
device path.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from .clip import CLIPConfig


def _t(x) -> np.ndarray:
    """torch tensor -> float32 numpy (fp16 checkpoints upcast losslessly)."""
    import torch

    with torch.no_grad():
        return x.detach().cpu().float().numpy()


def load_torch_file(path: str) -> Dict:
    """Load a torch file: TorchScript archive or pickled state_dict/checkpoint."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        return model.state_dict()
    except RuntimeError:
        return torch.load(path, map_location="cpu", weights_only=False)


def clip_config_from_state_dict(sd: Dict) -> CLIPConfig:
    """Shape-sniff the architecture (reference ``clip/model.py:899-918``).
    Handles both ViT and ModifiedResNet towers."""
    if "visual.proj" in sd:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len(
            [
                k
                for k in sd
                if k.startswith("visual.") and k.endswith(".attn.in_proj_weight")
            ]
        )
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
        grid_size = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = vision_patch_size * grid_size
    else:
        counts = tuple(
            len({k.split(".")[2] for k in sd if k.startswith(f"visual.layer{b}")})
            for b in (1, 2, 3, 4)
        )
        vision_layers = counts
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        output_width = round(
            (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5
        )
        vision_patch_size = 0
        image_resolution = output_width * 32

    embed_dim = sd["text_projection"].shape[1]
    context_length = sd["positional_embedding"].shape[0]
    vocab_size = sd["token_embedding.weight"].shape[0]
    transformer_width = sd["ln_final.weight"].shape[0]
    transformer_heads = transformer_width // 64
    transformer_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks")}
    )
    return CLIPConfig(
        embed_dim=embed_dim,
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=context_length,
        vocab_size=vocab_size,
        transformer_width=transformer_width,
        transformer_heads=transformer_heads,
        transformer_layers=transformer_layers,
    )


def _blocks_from_sd(sd: Dict, prefix: str, n_layers: int) -> Dict[str, np.ndarray]:
    """Stack per-layer torch block weights into leading-layer-axis arrays,
    transposing linear weights to the [in, out] right-multiply layout."""
    out: Dict[str, list] = {
        k: []
        for k in (
            "w_qkv",
            "b_qkv",
            "w_out",
            "b_out",
            "ln_1_scale",
            "ln_1_bias",
            "c_fc_w",
            "c_fc_b",
            "c_proj_w",
            "c_proj_b",
            "ln_2_scale",
            "ln_2_bias",
        )
    }
    for i in range(n_layers):
        p = f"{prefix}.{i}."
        out["w_qkv"].append(_t(sd[p + "attn.in_proj_weight"]).T)
        out["b_qkv"].append(_t(sd[p + "attn.in_proj_bias"]))
        out["w_out"].append(_t(sd[p + "attn.out_proj.weight"]).T)
        out["b_out"].append(_t(sd[p + "attn.out_proj.bias"]))
        out["ln_1_scale"].append(_t(sd[p + "ln_1.weight"]))
        out["ln_1_bias"].append(_t(sd[p + "ln_1.bias"]))
        out["c_fc_w"].append(_t(sd[p + "mlp.c_fc.weight"]).T)
        out["c_fc_b"].append(_t(sd[p + "mlp.c_fc.bias"]))
        out["c_proj_w"].append(_t(sd[p + "mlp.c_proj.weight"]).T)
        out["c_proj_b"].append(_t(sd[p + "mlp.c_proj.bias"]))
        out["ln_2_scale"].append(_t(sd[p + "ln_2.weight"]))
        out["ln_2_bias"].append(_t(sd[p + "ln_2.bias"]))
    return {k: np.stack(v) for k, v in out.items()}


def clip_params_from_state_dict(sd: Dict) -> Tuple[dict, CLIPConfig]:
    """Full conversion: torch CLIP state_dict -> (param pytree fp32, config)."""
    cfg = clip_config_from_state_dict(sd)
    if cfg.is_resnet:
        from ovmr_tpu.models.resnet import resnet_visual_from_state_dict

        visual, _ = resnet_visual_from_state_dict(sd, _t)
    else:
        conv1 = _t(sd["visual.conv1.weight"])  # [W, 3, p, p]
        visual = {
            "patch_embed_w": conv1.reshape(conv1.shape[0], -1).T.copy(),
            "class_embedding": _t(sd["visual.class_embedding"]),
            "positional_embedding": _t(sd["visual.positional_embedding"]),
            "ln_pre_scale": _t(sd["visual.ln_pre.weight"]),
            "ln_pre_bias": _t(sd["visual.ln_pre.bias"]),
            "blocks": _blocks_from_sd(
                sd, "visual.transformer.resblocks", cfg.vision_layers
            ),
            "ln_post_scale": _t(sd["visual.ln_post.weight"]),
            "ln_post_bias": _t(sd["visual.ln_post.bias"]),
            "proj": _t(sd["visual.proj"]),
        }
    text = {
        "token_embedding": _t(sd["token_embedding.weight"]),
        "positional_embedding": _t(sd["positional_embedding"]),
        "blocks": _blocks_from_sd(sd, "transformer.resblocks", cfg.transformer_layers),
        "ln_final_scale": _t(sd["ln_final.weight"]),
        "ln_final_bias": _t(sd["ln_final.bias"]),
        "text_projection": _t(sd["text_projection"]),
    }
    params = {
        "visual": visual,
        "text": text,
        "logit_scale": _t(sd["logit_scale"]),
    }
    return params, cfg


def load_clip(path: str):
    """One-stop: torch file at `path` -> (params fp32 numpy pytree, CLIPConfig)."""
    sd = load_torch_file(path)
    if not isinstance(sd, dict) or "text_projection" not in sd:
        # a full checkpoint wrapper {"state_dict": ...}
        sd = sd.get("state_dict", sd)
    return clip_params_from_state_dict(sd)


# --------------------------------------------------------------------------
# OVMR prompt-learner (visual token generator) checkpoints
# --------------------------------------------------------------------------

def prompt_learner_params_from_state_dict(sd: Dict, n_layers: int = 4) -> dict:
    """Convert the reference prompt_learner state_dict
    (``aggregator.resblocks.{i}.*`` + ``cls_token``) to our aggregator pytree.
    Reference save format: ``torchtools.py:27-74`` checkpoints with keys like
    ``aggregator.resblocks.0.attn.in_proj_weight``."""
    blocks = _blocks_from_sd(sd, "aggregator.resblocks", n_layers)
    return {
        "blocks": blocks,
        "cls_token": _t(sd["cls_token"]),
    }


def load_prompt_learner(path: str, n_layers: int = 4) -> Tuple[dict, int]:
    """Load a reference ``model.pth.tar-{epoch}`` file. Returns (params, epoch).
    Drops the ``token_prefix``/``token_suffix`` buffers like the reference
    loader (``trainers/mm_classifier_one_prompt.py:484-489``)."""
    ckpt = load_torch_file(path)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v for k, v in sd.items() if k not in ("token_prefix", "token_suffix")}
    epoch = ckpt.get("epoch", 0) if isinstance(ckpt, dict) else 0
    n_layers = len({k.split(".")[2] for k in sd if k.startswith("aggregator.resblocks")})
    return prompt_learner_params_from_state_dict(sd, n_layers), epoch
