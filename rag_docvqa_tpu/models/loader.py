"""Checkpoint loading: HF safetensors/torch dirs -> JAX param trees.

Closes the loop between the converters (models/convert.py and friends) and
the CLIs: the reference builds every model `from_pretrained`
(eval.py:443-570, src/VT5.py:63-77 loads model.safetensors non-strict); here
a local checkpoint directory is read into a numpy state dict and converted
into the engine's param tree, merging over a random-init tree so components
absent from the checkpoint (e.g. the visual branch in text-only checkpoints)
keep their initialization — the same semantics as the reference's
``load_state_dict(..., strict=False)``.

No network access is ever attempted: paths must be local directories or
files (safetensors / pytorch .bin).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np


# --------------------------------------------------------------------------- #
# raw state-dict reading
# --------------------------------------------------------------------------- #
def read_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read an HF checkpoint directory (or a single weights file) into a
    {name: np.ndarray} dict. Supports model.safetensors, sharded
    model.safetensors.index.json, and pytorch_model.bin (torch CPU)."""
    if os.path.isfile(path):
        return _read_weights_file(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"checkpoint path not found: {path}")

    index = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            shards = sorted(set(json.load(f)["weight_map"].values()))
        out: Dict[str, np.ndarray] = {}
        for shard in shards:
            out.update(_read_weights_file(os.path.join(path, shard)))
        return out
    for name in ("model.safetensors", "pytorch_model.bin", "adapter_model.safetensors"):
        p = os.path.join(path, name)
        if os.path.exists(p):
            return _read_weights_file(p)
    raise FileNotFoundError(f"no weights file (model.safetensors / pytorch_model.bin) in {path}")


def _read_weights_file(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        try:
            return load_file(path)
        except Exception:
            # bf16 tensors are not numpy-native; go through torch
            from safetensors.torch import load_file as load_torch

            return {k: v.float().numpy() for k, v in load_torch(path).items()}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.float().numpy() for k, v in sd.items()}


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x).T)


def _merge(base: Any, update: Any) -> Any:
    """Recursively overlay `update` onto `base` (non-strict load)."""
    if isinstance(base, dict) and isinstance(update, dict):
        out = dict(base)
        for k, v in update.items():
            out[k] = _merge(base[k], v) if k in base else v
        return out
    return update


# --------------------------------------------------------------------------- #
# VT5 (full rubentito/vt5-base-spdocvqa-style checkpoint)
# --------------------------------------------------------------------------- #
def convert_vt5_checkpoint(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """Convert a reference VT5 state dict (src/VT5.py:30-61 module layout:
    language_backbone / spatial_embedding / visual_embedding
    [/ layout_embedding]) into our VT5 param tree. Plain T5 state dicts
    (keys starting "encoder.block") are accepted too and yield only the
    "t5" subtree."""
    from rag_docvqa_tpu.models.convert import convert_t5_state_dict

    out: Dict[str, Any] = {}
    lb = strip_prefix(sd, "language_backbone.")
    if not lb and "shared.weight" in sd:
        lb = sd  # bare T5ForConditionalGeneration checkpoint
    if lb:
        out["t5"] = convert_t5_state_dict(lb, cfg.t5)

    sp = strip_prefix(sd, "spatial_embedding.")
    if sp:
        out["spatial"] = {
            "x_emb": np.asarray(sp["x_position_embeddings.weight"]),
            "y_emb": np.asarray(sp["y_position_embeddings.weight"]),
            "ln_w": np.asarray(sp["LayerNorm.weight"]),
            "ln_b": np.asarray(sp["LayerNorm.bias"]),
            "matcher": {
                "kernel": _t(sp["spatial_emb_matcher.layers.0.weight"]),
                "bias": np.asarray(sp["spatial_emb_matcher.layers.0.bias"]),
            },
        }

    vis = strip_prefix(sd, "visual_embedding.")
    if vis and getattr(cfg, "use_visual", False):
        from rag_docvqa_tpu.models.vit import convert_vit_state_dict

        out["visual"] = {
            "vit": convert_vit_state_dict(strip_prefix(vis, "image_model."), cfg.vit),
            "matcher": {
                "kernel": _t(vis["visual_emb_matcher.layers.0.weight"]),
                "bias": np.asarray(vis["visual_emb_matcher.layers.0.bias"]),
            },
        }

    # LayoutT5 extras (src/LayoutT5.py:23-24, src/VT5.py:31-35)
    if "language_backbone.layout_classifier.weight" in sd:
        out["layout_head"] = {
            "ln_w": np.asarray(sd["language_backbone.layout_norm.weight"]),
            "ln_b": np.asarray(sd["language_backbone.layout_norm.bias"]),
            "kernel": _t(sd["language_backbone.layout_classifier.weight"]),
            "bias": np.asarray(sd["language_backbone.layout_classifier.bias"]),
        }
    if "layout_embedding.weight" in sd:
        out["layout_emb"] = np.asarray(sd["layout_embedding.weight"])
        if "layout_embedding_scale" in sd:
            out["layout_scale"] = np.asarray(sd["layout_embedding_scale"])
    return out


def load_vt5_params(path: str, cfg, params_like: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Read + convert a VT5/T5 HF checkpoint dir; overlay onto `params_like`
    (random init) so missing components keep their initialization."""
    converted = convert_vt5_checkpoint(read_state_dict(path), cfg)
    if params_like is None:
        return converted
    return _merge(params_like, converted)


# --------------------------------------------------------------------------- #
# Hi-VT5 (rubentito/hivt5-base-mpdocvqa-style checkpoint)
# --------------------------------------------------------------------------- #
def load_hivt5_params(path: str, cfg, params_like: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Hi-VT5 checkpoints share the VT5 module layout plus the page-retrieval
    head (src/_modules.py:148-175: retrieval_module.page_retrieval.weight)."""
    sd = read_state_dict(path)
    out = convert_vt5_checkpoint(sd, cfg)
    rm = strip_prefix(sd, "retrieval_module.")
    if rm:
        key = "page_retrieval.weight" if "page_retrieval.weight" in rm else next(iter(rm))
        out["ret_head"] = {
            "kernel": _t(rm[key]),
            "bias": np.asarray(rm.get(key.replace("weight", "bias"), np.zeros(rm[key].shape[0], np.float32))),
        }
    if params_like is None:
        return out
    return _merge(params_like, out)


def load_params_for(kind: str, path: str, cfg, params_like: Optional[Dict[str, Any]] = None):
    """Kind-dispatched checkpoint load: vt5 | hivt5 | pix2struct | qwen."""
    kind = kind.lower()
    if kind in ("vt5", "layoutt5"):
        return load_vt5_params(path, cfg, params_like)
    if kind in ("hivt5", "hi-vt5"):
        return load_hivt5_params(path, cfg, params_like)
    sd = read_state_dict(path)
    if kind.startswith("pix2struct"):
        from rag_docvqa_tpu.models.pix2struct import convert_p2s_state_dict

        out = convert_p2s_state_dict(sd, cfg)
    elif kind.startswith("qwen"):
        from rag_docvqa_tpu.models.causal_lm import convert_qwen2_state_dict

        out = convert_qwen2_state_dict(sd, cfg)
    else:
        raise ValueError(f"unknown checkpoint kind: {kind}")
    return _merge(params_like, out) if params_like is not None else out


# --------------------------------------------------------------------------- #
# Orbax (our own training checkpoints)
# --------------------------------------------------------------------------- #
def load_orbax_params(path: str, params_like: Any) -> Any:
    """Restore params saved by training/checkpoint.py. Accepts either a
    bare save_params() export or a CheckpointManager directory (picks the
    best step, falling back to latest)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    # CheckpointManager layout: <dir>/<step>/default
    subdirs = [d for d in (os.listdir(path) if os.path.isdir(path) else []) if d.isdigit()]
    ckptr = ocp.StandardCheckpointer()
    if subdirs:
        from rag_docvqa_tpu.training.checkpoint import CheckpointManager

        mgr = CheckpointManager(path)
        step = mgr.best_step() if mgr.best_step() is not None else mgr.latest_step()
        mgr.close()
        # restore untyped (saved tree = {params, opt_state, step}), keep params
        restored = ckptr.restore(os.path.join(path, str(step), "default"))
        return _merge(params_like, restored["params"]) if params_like is not None else restored["params"]
    return ckptr.restore(path, params_like)
