"""Generate tests/fixtures/exploratory_golden.npz from the REFERENCE
exploratory ViT forwards (torch CPU, /root/reference/clip/model.py —
study-only ground truth; requires the reference mount; run once from the
repo root).

The reference bodies hardcode the ViT-B/16@224 geometry (197-token
last-block mask in ``encode_exemplar``, grid-14 window arithmetic in
``build_multi_pos``), so the golden model is a TINY tower at the REAL
resolution: width 64, heads 2, layers 2, patch 16, res 224 (197 tokens),
embed 32. ``.cuda()`` calls are patched to no-ops (CPU-only environment).

Recorded per function: inputs, outputs, plus the full CLIP state_dict
under ``sd.*`` (consumed by ``clip_params_from_state_dict`` in the test,
same convention as clip_tiny_golden.npz).
"""

import importlib.util

import numpy as np
import torch
import torch.nn as nn

# CPU environment: the exploratory bodies call .cuda() on fresh tensors
torch.Tensor.cuda = lambda self, *a, **k: self

# load model.py directly — the clip package __init__ pulls torchvision,
# which this environment doesn't have
_spec = importlib.util.spec_from_file_location(
    "ref_clip_model", "/root/reference/clip/model.py"
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
CLIP = _mod.CLIP
ResidualAttentionBlock = _mod.ResidualAttentionBlock
TransformerDropout = _mod.TransformerDropout

OUT = "tests/fixtures/exploratory_golden.npz"

torch.manual_seed(0)
model = CLIP(
    embed_dim=32,
    image_resolution=224,
    vision_layers=2,
    vision_width=64,
    vision_patch_size=16,
    context_length=77,
    vocab_size=512,
    transformer_width=64,
    transformer_heads=2,
    transformer_layers=2,
).float().eval()

data = {}
for k, v in model.state_dict().items():
    data[f"sd.{k}"] = v.detach().numpy()

vis = model.visual
B, D, E = 2, 64, 32
g = torch.Generator().manual_seed(1)
images = torch.randn(B, 3, 224, 224, generator=g)
data["images"] = images.numpy()

with torch.no_grad():
    # 1. forward_with_embeds (model.py:468-486)
    new_embeds = 0.02 * torch.randn(197, D, generator=g)
    data["with_embeds.in"] = new_embeds.numpy()
    data["with_embeds.out"] = vis.forward_with_embeds(
        images, new_embeds
    ).numpy()

    # 2. forward_v (model.py:626-645)
    vprompt = 0.02 * torch.randn(4, D, generator=g)
    data["forward_v.in"] = vprompt.numpy()
    data["forward_v.out"] = vis.forward_v(images, vprompt).numpy()

    # 3. forward_new_cls (model.py:678-696)
    new_cls = 0.02 * torch.randn(D, generator=g)
    data["new_cls.in"] = new_cls.numpy()
    data["new_cls.out"] = vis.forward_new_cls(images, new_cls).numpy()

    # 4. forward_eTT (model.py:697-714) — prefix_token accepted, unused
    data["eTT.out"] = vis.forward_eTT(
        images, prefix_token=torch.randn(3, D, generator=g)
    ).numpy()

    # 5. forward_multi_cls (model.py:430-466)
    multi_cls = 0.02 * torch.randn(2, 3, D, generator=g)
    data["multi_cls.in"] = multi_cls.numpy()
    x0, x1 = vis.forward_multi_cls(images, multi_cls)
    data["multi_cls.out0"] = x0.numpy()
    data["multi_cls.out1"] = x1.numpy()

    # 6. encode_exemplar (model.py:657-676; 197-token last-block mask)
    cls_f, patch_f = vis.encode_exemplar(images)
    data["exemplar.cls"] = cls_f.numpy()
    data["exemplar.patches"] = patch_f.numpy()

    # 7. encode_exemplar_mmclassifier (model.py:488-515)
    #    (the last-block mask is already installed by 6 — same state the
    #    reference would reach; the mask is identical either way)
    mm_query = torch.randn(1, E, generator=g)
    mm_query = mm_query / mm_query.norm(dim=-1, keepdim=True)
    data["exemplar_mm.in"] = mm_query.numpy()
    data["exemplar_mm.out"] = vis.encode_exemplar_mmclassifier(
        images, mm_query
    ).numpy()

    # 8. forward_with_mmclassfier (model.py:517-537) — needs the UNMASKED
    #    last block; reset what 6 installed
    vis.transformer.resblocks[-1].attn_mask = None
    q2 = 0.5 * torch.randn(1, D, generator=g)
    data["with_mm.in"] = q2.numpy()
    data["with_mm.out"] = vis.forward_with_mmclassfier(images, q2).numpy()

    # 9. forward_multi_pos (model.py:539-592) — grid-14 arithmetic
    vis.multi_pos = None
    data["multi_pos.out"] = vis.forward_multi_pos(images).numpy()

    # 10. forward_with_qk on a standalone text-shaped block
    #     (model.py:196-212; requires a non-None attn_mask)
    L = 8
    causal = torch.full((L, L), float("-inf")).triu(1)
    blk = ResidualAttentionBlock(D, 2, attn_mask=causal).float().eval()
    torch.manual_seed(2)
    for p in blk.parameters():
        p.data = 0.05 * torch.randn_like(p)
    q_proj = nn.Linear(D, D)
    k_proj = nn.Linear(D, D)
    for m in (q_proj, k_proj):
        m.weight.data = 0.05 * torch.randn_like(m.weight)
        m.bias.data.zero_()
    xb = torch.randn(L, B, D, generator=g)  # reference blocks are LND
    data["qk.x"] = xb.numpy()
    data["qk.out"] = blk.forward_with_qk(xb, q_proj, k_proj).numpy()
    for k, v in blk.state_dict().items():
        data[f"qk.sd.{k}"] = v.detach().numpy()
    data["qk.q_w"] = q_proj.weight.detach().numpy()
    data["qk.q_b"] = q_proj.bias.detach().numpy()
    data["qk.k_w"] = k_proj.weight.detach().numpy()
    data["qk.k_b"] = k_proj.bias.detach().numpy()

    # 11. TransformerDropout.forward_with_attention (model.py:352-358)
    #     dropout=0 in eval mode; torch averages attention over heads
    td = TransformerDropout(D, 2, 2, attn_mask=None, dropout=0.0)
    td = td.float().eval()
    torch.manual_seed(3)
    for p in td.parameters():
        p.data = 0.05 * torch.randn_like(p)
    xt = torch.randn(L, B, D, generator=g)
    out, attn = td.forward_with_attention(xt)
    data["attn.x"] = xt.numpy()
    data["attn.out"] = out.numpy()
    data["attn.weights"] = attn.numpy()  # [layers, B, L, L] head-averaged
    for k, v in td.state_dict().items():
        data[f"attn.sd.{k}"] = v.detach().numpy()

np.savez_compressed(OUT, **data)
print(f"wrote {OUT}: {len(data)} arrays")
for k in sorted(data):
    if not k.startswith(("sd.", "qk.sd.", "attn.sd.")):
        print(f"  {k}: {data[k].shape}")
