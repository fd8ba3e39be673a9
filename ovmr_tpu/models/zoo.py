"""CLIP checkpoint zoo: canonical URLs, sha256-verified download, cache.

Mirrors the reference download surface (``clip/clip.py:29-70``): the same
8 published OpenAI checkpoints, cached under ``~/.cache/clip``, integrity-
checked against the sha256 embedded in each URL. In zero-egress
environments the download is skipped and only the cache/env lookup runs.
"""

from __future__ import annotations

import hashlib
import os
import os.path as osp
import urllib.request
import warnings
from typing import Optional

_MODELS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "RN50x64": "https://openaipublic.azureedge.net/clip/models/be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c/RN50x64.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
    "ViT-L/14@336px": "https://openaipublic.azureedge.net/clip/models/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt",
}


def available_models():
    return list(_MODELS)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download(name: str, root: Optional[str] = None) -> str:
    """Return a verified local path for checkpoint `name`, downloading into
    the cache when the environment permits network access."""
    if name not in _MODELS:
        raise KeyError(f"unknown model {name!r}; available: {available_models()}")
    url = _MODELS[name]
    expected = url.split("/")[-2]
    root = root or osp.expanduser("~/.cache/clip")
    os.makedirs(root, exist_ok=True)
    target = osp.join(root, osp.basename(url))

    if osp.exists(target):
        if _sha256(target) == expected:
            return target
        warnings.warn(f"{target} exists but sha256 mismatches; re-downloading")

    with urllib.request.urlopen(url, timeout=10) as src, open(target, "wb") as dst:
        while True:
            chunk = src.read(1 << 20)
            if not chunk:
                break
            dst.write(chunk)
    if _sha256(target) != expected:
        raise RuntimeError(f"downloaded {name} failed the sha256 integrity check")
    return target


def resolve(name: str, root: Optional[str] = None) -> Optional[str]:
    """Best-effort local lookup (env var > cache file), then download.
    Returns None when nothing is reachable (caller decides the fallback)."""
    env = os.environ.get("OVMR_CLIP_CKPT")
    if env and osp.exists(env):
        return env
    root = root or osp.expanduser("~/.cache/clip")
    if name in _MODELS:
        cached = osp.join(root, osp.basename(_MODELS[name]))
        if osp.exists(cached):
            return cached
    try:
        return download(name, root)
    except Exception:
        return None
