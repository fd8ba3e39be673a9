"""Checkpointing and artifact export.

Directory layout matches the reference trainer
(``dassl/utils/torchtools.py:27-74``): one subdir per registered model
(``prompt_learner/``), per-epoch files plus a ``checkpoint`` pointer file.
Native format is npz (path-flattened pytrees); the exported classifier
artifacts (``mm_classifiers.pt`` / ``visual_tokens.pt``) and an optional
torch-format generator checkpoint are written with torch-cpu for drop-in
compatibility with reference consumers
(``trainers/mm_classifier_one_prompt.py:276-291``).
"""

from __future__ import annotations

import os.path as osp
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ovmr_tpu.utils.tools import mkdir_if_missing

SEP = "//"


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = SEP.join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(p) -> str:
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return str(p.idx)
    return str(p)


def _unflatten_like(template, flat: Dict[str, np.ndarray]):
    paths_leaves = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_leaves[0]:
        key = SEP.join(_path_str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        loaded = flat[key]
        leaves.append(np.asarray(loaded, dtype=np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(paths_leaves[1], leaves)


def save_checkpoint(
    directory: str,
    name: str,
    epoch: int,
    params,
    opt_state=None,
    is_best: bool = False,
    model_name: str = "",
    backend: str = "npz",
) -> str:
    """Write ``{directory}/{name}/model-{epoch}.npz`` + pointer file.
    With ``model_name`` the file is ``{model_name}.npz`` instead (the
    reference's best-val save passes ``model-best.pth.tar``,
    ``dassl/engine/trainer.py:448-455``); the pointer always tracks the
    latest write, matching ``torchtools.py:65-69``.

    ``backend="orbax"`` (``TPU.CHECKPOINT_BACKEND``) routes the epoch-keyed
    save/resume cycle through :mod:`ovmr_tpu.engine.orbax_io` (async-safe,
    per-array chunking for very large states); named saves (best-val) stay
    npz — they are export artifacts with a filename contract.

    Multi-host: the npz path writes on process 0 only (states are
    replicated; concurrent identical writes to a shared FS would race).
    The orbax path runs on EVERY process — orbax saves are cross-process
    collectives (a non-primary early return would deadlock process 0 in
    the global sync barrier); orbax handles per-process write roles
    itself."""
    if backend == "orbax" and not model_name and not is_best:
        from ovmr_tpu.engine.orbax_io import save_orbax

        return save_orbax(directory, name, epoch, params, opt_state)
    import jax as _jax

    if _jax.process_count() > 1 and _jax.process_index() != 0:
        target = model_name or f"model-{epoch}.npz"
        return f"{directory}/{name}/{target}"  # written by process 0
    subdir = osp.join(directory, name)
    mkdir_if_missing(subdir)
    fname = f"{model_name}.npz" if model_name else f"model-{epoch}.npz"
    path = osp.join(subdir, fname)
    payload = {("params" + SEP + k): v for k, v in _flatten(params).items()}
    payload["__epoch__"] = np.asarray(epoch)
    if opt_state is not None:
        payload.update(
            {("opt" + SEP + k): v for k, v in _flatten(opt_state).items()}
        )
    np.savez(path, **payload)
    with open(osp.join(subdir, "checkpoint"), "w") as f:
        f.write(osp.basename(path))
    if is_best:
        np.savez(osp.join(subdir, "model-best.npz"), **payload)
    print(f"Checkpoint saved to {path}")
    return path


def _load_torch_fallback(path, torch_converter):
    if torch_converter is None:
        from ovmr_tpu.models.import_torch import load_prompt_learner

        torch_converter = load_prompt_learner
    params, ep = torch_converter(path)
    return params, None, ep


def load_checkpoint(
    directory: str,
    name: str,
    params_template,
    opt_state_template=None,
    epoch: Optional[int] = None,
    torch_converter=None,
    prefer: str = "best",
    backend: str = "npz",
) -> Tuple[Any, Any, int]:
    """Load by explicit epoch; else prefer ``model-best`` then the pointer
    file — the reference's ``load_model`` defaults to the best model
    (``mm_…:470-476``); its resume path follows the pointer only
    (``torchtools.py:118-157`` — pass ``prefer="pointer"``). Native npz
    and reference ``model.pth.tar`` formats both load (``torch_converter``
    maps a torch checkpoint to a param pytree; default: prompt_learner).
    Returns (params, opt_state_or_None, epoch)."""
    if backend == "orbax":
        from ovmr_tpu.engine.orbax_io import load_orbax

        try:
            return load_orbax(
                directory, name, params_template, opt_state_template,
                epoch=epoch,
            )
        except FileNotFoundError:
            pass  # interop: the directory may hold npz/torch checkpoints
    subdir = osp.join(directory, name)
    candidates = []
    if epoch is not None:
        candidates = [f"model-{epoch}.npz", f"model.pth.tar-{epoch}"]
    else:
        if prefer == "best":
            candidates = ["model-best.npz", "model-best.pth.tar"]
        pointer = osp.join(subdir, "checkpoint")
        if osp.exists(pointer):
            with open(pointer) as f:
                base = f.read().strip()
            if base and base not in candidates:
                candidates.append(base)
        if not candidates:
            raise FileNotFoundError(f"No checkpoint pointer at {pointer}")
    path = None
    for base in candidates:
        cand = osp.join(subdir, base)
        if osp.exists(cand):
            path = cand
            break
    if path is None:
        raise FileNotFoundError(
            f'Model not found under "{subdir}" (tried {candidates})'
        )
    if not path.endswith(".npz"):
        return _load_torch_fallback(path, torch_converter)

    data = np.load(path)
    flat = {k: data[k] for k in data.files}
    p_flat = {
        k[len("params" + SEP) :]: v
        for k, v in flat.items()
        if k.startswith("params" + SEP)
    }
    params = _unflatten_like(params_template, p_flat)
    opt_state = None
    if opt_state_template is not None:
        o_flat = {
            k[len("opt" + SEP) :]: v
            for k, v in flat.items()
            if k.startswith("opt" + SEP)
        }
        if o_flat:
            opt_state = _unflatten_like(opt_state_template, o_flat)
    ep = int(flat.get("__epoch__", epoch or 0))
    return params, opt_state, ep


def resume_from_checkpoint(
    directory, name, params_template, opt_state_template, backend: str = "npz"
):
    """Resume latest (pointer-tracked) if present, else return templates
    unchanged with epoch 0 (reference ``resume_from_checkpoint``,
    ``torchtools.py:118-157``)."""
    if backend == "orbax":
        from ovmr_tpu.engine.orbax_io import load_orbax

        try:
            params, opt_state, epoch = load_orbax(
                directory, name, params_template, opt_state_template
            )
            print(f"Resumed from epoch {epoch} (orbax)")
            if opt_state is None:
                opt_state = opt_state_template
            return params, opt_state, epoch
        except FileNotFoundError:
            pass  # fall through: interop with an npz/torch checkpoint dir
    try:
        params, opt_state, epoch = load_checkpoint(
            directory, name, params_template, opt_state_template,
            prefer="pointer",
        )
        print(f"Resumed from epoch {epoch}")
        if opt_state is None:
            opt_state = opt_state_template
        return params, opt_state, epoch
    except FileNotFoundError:
        return params_template, opt_state_template, 0


# --------------------------------------------------------------------------
# torch-compatible artifact export
# --------------------------------------------------------------------------

def export_classifiers_torch(classifiers: dict, output_dir: str) -> None:
    """Write ``mm_classifiers.pt`` + ``visual_tokens.pt`` with the exact key
    names and fp32 dtype the reference saves (``mm_…:276-291``).

    ``text_classifier``/``fusion_weight`` entries that are absent or None
    (the >=5000-class guard skipped the frozen text head, ``mm_…:118``) are
    omitted from the artifact — the reference cannot produce one at all at
    that scale (``forward_prompt`` dereferences the None classifier)."""
    import torch

    mkdir_if_missing(output_dir)
    # only the guard-skipped keys may legitimately be absent; a missing
    # mm/vision classifier or visual_tokens is an upstream bug — validate
    # ALL required keys before writing anything, so a bad dict never
    # leaves a half-written output dir
    for key in ("mm_classifier", "vision_classifier", "visual_tokens"):
        if classifiers.get(key) is None:
            raise KeyError(
                f"export_classifiers_torch: required key {key!r} missing"
            )
    artifact = {}
    for key in (
        "text_classifier", "vision_classifier", "mm_classifier", "fusion_weight"
    ):
        value = classifiers.get(key)
        if value is not None:
            artifact[key] = torch.tensor(np.asarray(value, np.float32))
    torch.save(artifact, osp.join(output_dir, "mm_classifiers.pt"))
    torch.save(
        {
            "visual_tokens": torch.tensor(
                np.asarray(classifiers["visual_tokens"], np.float32)
            )
        },
        osp.join(output_dir, "visual_tokens.pt"),
    )


def aggregator_to_torch_state_dict(agg_params: dict) -> dict:
    """Inverse of the importer: our aggregator pytree -> reference
    prompt_learner torch state_dict (``aggregator.resblocks.{i}.*`` +
    ``cls_token``), so generators trained here load in the reference."""
    import torch

    blocks = agg_params["blocks"]
    n_layers = np.asarray(blocks["w_qkv"]).shape[0]
    sd = {"cls_token": torch.tensor(np.asarray(agg_params["cls_token"], np.float32))}
    names = [
        ("attn.in_proj_weight", "w_qkv", True),
        ("attn.in_proj_bias", "b_qkv", False),
        ("attn.out_proj.weight", "w_out", True),
        ("attn.out_proj.bias", "b_out", False),
        ("ln_1.weight", "ln_1_scale", False),
        ("ln_1.bias", "ln_1_bias", False),
        ("mlp.c_fc.weight", "c_fc_w", True),
        ("mlp.c_fc.bias", "c_fc_b", False),
        ("mlp.c_proj.weight", "c_proj_w", True),
        ("mlp.c_proj.bias", "c_proj_b", False),
        ("ln_2.weight", "ln_2_scale", False),
        ("ln_2.bias", "ln_2_bias", False),
    ]
    for i in range(n_layers):
        for torch_name, ours, transpose in names:
            arr = np.asarray(blocks[ours][i], np.float32)
            if transpose:
                arr = arr.T
            sd[f"aggregator.resblocks.{i}.{torch_name}"] = torch.tensor(
                np.ascontiguousarray(arr)
            )
    return sd


def save_torch_checkpoint(
    directory: str, name: str, epoch: int, agg_params: dict, model_name: str = ""
):
    """Reference-format ``model.pth.tar-{epoch}`` file (or
    ``{model_name}.pth.tar`` for best-val saves)."""
    import torch

    subdir = osp.join(directory, name)
    mkdir_if_missing(subdir)
    fname = f"{model_name}.pth.tar" if model_name else f"model.pth.tar-{epoch}"
    path = osp.join(subdir, fname)
    torch.save(
        {"state_dict": aggregator_to_torch_state_dict(agg_params), "epoch": epoch},
        path,
    )
    return path
