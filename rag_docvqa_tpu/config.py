"""Declarative config system.

Replaces the reference's layered dict merging (src/utils.py:113-154: model
YAML + dataset YAML + training_parameters + CLI overrides) and the sweep
expansion of src/flatten_multi_yml.py with one schema:

  * `load_config(model_yml, dataset_yml, overrides)` — same merge order as
    the reference (dataset < model < training < overrides);
  * `check_config` — the validity rules of src/utils.py:82-111;
  * `expand_sweep` — list-valued keys expand to the cross product of runs
    (flatten_multi_yml.py:44-100), replacing the screen-based multi_eval.sh;
  * typed `build_*` helpers mapping a flat dict onto the frameworks' config
    dataclasses (reference build_utils.py).
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, Iterator, List, Optional, Sequence

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None

from rag_docvqa_tpu.data.contract import Caps
from rag_docvqa_tpu.engine.rag_vt5 import STRATEGIES, RAGConfig
from rag_docvqa_tpu.models import t5 as t5m
from rag_docvqa_tpu.models import vt5 as vt5m
from rag_docvqa_tpu.models.embeddings import SpatialConfig
from rag_docvqa_tpu.models.vit import ViTConfig
from rag_docvqa_tpu.ops.chunking import ChunkSpec

HIERARCHICAL_MODELS = ("hi-vt5", "hivt5", "hi-lt5", "hi-layoutlmv3")
_CHUNKED = tuple(s for s in STRATEGIES if s not in ("oracle", "none"))


def load_yaml(path: str) -> Dict[str, Any]:
    assert yaml is not None, "pyyaml not available"
    with open(path) as f:
        return yaml.safe_load(f) or {}


def load_config(
    model: Optional[str] = None,
    dataset: Optional[str] = None,
    overrides: Optional[Dict[str, Any]] = None,
    model_dict: Optional[Dict[str, Any]] = None,
    dataset_dict: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Merge order mirrors src/utils.py:126-135: dataset config, then model
    config, then its training_parameters sub-dict, then explicit overrides.
    A dataset name ending in "-Noise" selects the noise-injection dataset
    class while loading the base dataset config (src/utils.py:115-116)."""
    model_cfg = dict(model_dict or (load_yaml(model) if model else {}))
    dataset_name = None
    if dataset_dict is not None:
        dataset_cfg = dict(dataset_dict)
    elif dataset:
        base = dataset[: -len("-Noise")] if dataset.endswith("-Noise") else dataset
        if base.endswith((".yml", ".yaml")):
            dataset_cfg = load_yaml(base)
            # a file path is not a dataset name; keep the yaml's own
            # dataset_name, but honor a "-Noise" suffix on the arg
            if dataset.endswith("-Noise") and "dataset_name" in dataset_cfg:
                dataset_name = dataset_cfg["dataset_name"] + "-Noise"
        else:
            dataset_name = dataset
            dataset_cfg = load_yaml(f"configs/{base}.yml")
    else:
        dataset_cfg = {}
    training_cfg = model_cfg.pop("training_parameters", {}) or {}
    config = {**dataset_cfg, **model_cfg, **training_cfg}
    if dataset_name:
        config["dataset_name"] = dataset_name
    config.update({k: v for k, v in (overrides or {}).items() if v is not None})
    config.setdefault("seed", 42)
    config.setdefault("page_retrieval", "concat")
    check_config(config)
    return config


def check_config(config: Dict[str, Any]) -> bool:
    """Validity rules (src/utils.py:82-111)."""
    model_name = str(config.get("model_name", "vt5")).lower()
    pr = str(config.get("page_retrieval", "none")).lower()
    if model_name not in HIERARCHICAL_MODELS and pr == "custom":
        raise ValueError(f'"custom" retrieval is not allowed for {model_name}')
    if model_name in HIERARCHICAL_MODELS and pr in _CHUNKED and pr != "custom":
        raise ValueError(
            f'Hierarchical model {model_name} cannot run "{pr}" retrieval; only "oracle" and "custom" are allowed.'
        )
    if pr in _CHUNKED and config.get("max_pages") is not None:
        print(f"WARNING - max_pages ({config.get('max_pages')}) is ignored for {pr} page retrieval.")
    return True


def expand_sweep(config: Dict[str, Any], sweep_keys: Optional[Sequence[str]] = None) -> Iterator[Dict[str, Any]]:
    """Cross-product expansion of list-valued keys (flatten_multi_yml.py)."""
    keys = [k for k, v in config.items() if isinstance(v, list) and (sweep_keys is None or k in sweep_keys)]
    if not keys:
        yield dict(config)
        return
    for combo in itertools.product(*(config[k] for k in keys)):
        out = dict(config)
        out.update(dict(zip(keys, combo)))
        yield out


# --------------------------------------------------------------------------- #
# typed builders (reference build_utils.py)
# --------------------------------------------------------------------------- #
def build_rag_config(c: Dict[str, Any]) -> RAGConfig:
    return RAGConfig(
        page_retrieval=str(c.get("page_retrieval", "concat")).lower(),
        chunk_num=c.get("chunk_num", 10),
        include_surroundings=_scalar(c.get("include_surroundings", 0)),
        sep_token_id=c.get("sep_token_id", 0) if c.get("add_sep_token", False) else 0,
        max_source_length=c.get("max_source_length", 512),
        per_chunk_seq_len=c.get("per_chunk_seq_len", 256),
        max_new_tokens=c.get("max_new_tokens", 100),
        embed_backend=c.get("embed_model", "VT5"),
        reorder_chunks=bool(c.get("reorder_chunks", False)),
    )


def build_vt5_config(c: Dict[str, Any], vocab_size: int) -> vt5m.VT5Config:
    d = c.get("d_model", 768)
    return vt5m.VT5Config(
        t5=t5m.T5Config(
            vocab_size=vocab_size,
            d_model=d,
            d_kv=c.get("d_kv", 64),
            num_heads=c.get("num_heads", 12),
            d_ff=c.get("d_ff", d * 4),
            num_encoder_layers=c.get("num_layers", 12),
            num_decoder_layers=c.get("num_decoder_layers", c.get("num_layers", 12)),
            dropout_rate=c.get("dropout_rate", 0.1),
            decode_kv_int8=bool(c.get("decode_kv_int8", False)),
        ),
        spatial=SpatialConfig(
            max_2d_positions=c.get("max_2d_position_embeddings", 1024),
            hidden_size=d,
            dropout_rate=c.get("dropout_rate", 0.1),
        ),
        vit=ViTConfig(hidden_size=c.get("visual_hidden_size", 768)),
        use_layout_labels=c.get("use_layout_labels", "Default"),
        max_source_length=c.get("max_source_length", 512),
        use_visual=c.get("use_visual", False),
    )


def build_chunk_spec(c: Dict[str, Any]) -> ChunkSpec:
    return ChunkSpec(
        chunk_size=c.get("chunk_size", 60),
        chunk_size_tol=c.get("chunk_size_tol", 0.2),
        overlap=c.get("overlap", 10),
        mode="oracle" if str(c.get("page_retrieval", "")).lower() == "oracle" else "fixed",
        cluster_layouts=c.get("cluster_layouts", False),
    )


def build_caps(c: Dict[str, Any]) -> Caps:
    return Caps(
        max_pages=c.get("max_pages", 20) or 20,
        max_chunks=c.get("max_chunks", 128),
        max_slots=c.get("max_slots", 2048),
        tokens_per_word=c.get("tokens_per_word", 8),
        embed_tokens=c.get("embed_tokens", 96),
        question_tokens=c.get("question_tokens", 48),
        prompt_tokens=c.get("prompt_tokens", 64),
    )


def build_hivt5_config(c: Dict[str, Any], vocab_size: int):
    from rag_docvqa_tpu.models import hivt5 as hivt5m

    base = build_vt5_config(c, vocab_size)
    return hivt5m.HiVT5Config(
        t5=base.t5,
        spatial=base.spatial,
        page_tokens=c.get("page_tokens", 10),
        max_doc_pages=c.get("max_pages", 20) or 20,
        page_seq_len=c.get("max_text_tokens", c.get("max_source_length", 512)),
        retrieval_loss_weight=c.get("retrieval_loss_weight", 0.25),
        use_visual=c.get("use_visual", False),
        vit=ViTConfig(
            hidden_size=c.get("visual_hidden_size", 768),
            num_layers=c.get("visual_num_layers", 12),
            num_heads=c.get("visual_num_heads", 12),
            mlp_dim=c.get("visual_mlp_dim", 3072),
            patch_size=c.get("visual_patch_size", 16),
            image_size=c.get("visual_image_size", 224),
        ),
    )


def build_reranker(c: Dict[str, Any], tokenizer, seed: int = 0):
    """Reranker from config (reference Reranker ctor, src/_modules.py:1552-1558):
    "gemma" in the weight name selects the LLM pair reranker, anything else
    the BGE cross-encoder. Local weight dirs are converted; otherwise params
    are random-init (HF hubs are unreachable — same non-strict spirit as
    models/loader.py)."""
    import jax as _jax

    from rag_docvqa_tpu.engine.reranker import FlagLLMReranker, Reranker, RerankerConfig

    rcfg = RerankerConfig(
        filter_thresh=float(c.get("rerank_filter_tresh", 0.4)),
        max_chunk_num=c.get("rerank_max_chunk_num", 5),
        min_chunk_num=c.get("rerank_min_chunk_num", 1),
        pair_len=c.get("rerank_pair_len", 192),
        rerank_on_surroundings=bool(c.get("rerank_on_surroundings", False)),
        include_surroundings=_scalar(c.get("include_surroundings", 0)),
    )
    weights = str(c.get("reranker_weights", "") or "")
    key = _jax.random.PRNGKey(seed)

    if "gemma" in weights.lower():
        import os

        from rag_docvqa_tpu.models.causal_lm import (
            CausalLMConfig, convert_gemma_state_dict, init_causal_lm_params,
        )

        lm_cfg = CausalLMConfig(
            vocab_size=tokenizer.vocab_size,
            d_model=c.get("reranker_d_model", 64),
            num_layers=c.get("reranker_num_layers", 2),
            num_heads=c.get("reranker_num_heads", 4),
            num_kv_heads=c.get("reranker_num_kv_heads", 1),
            d_ff=c.get("reranker_d_ff", 128),
            qkv_bias=False,
            arch="gemma",
            head_dim_override=c.get("reranker_head_dim", 0),
        )
        if os.path.isdir(weights):
            import json

            from rag_docvqa_tpu.models.causal_lm import gemma_config_from_hf
            from rag_docvqa_tpu.models.loader import read_state_dict

            cfg_path = os.path.join(weights, "config.json")
            if os.path.exists(cfg_path):
                with open(cfg_path) as f:
                    lm_cfg = gemma_config_from_hf(json.load(f))
            params = convert_gemma_state_dict(read_state_dict(weights), lm_cfg)
        else:
            params = init_causal_lm_params(key, lm_cfg)
        return FlagLLMReranker(rcfg, lm_cfg, params, tokenizer)

    from rag_docvqa_tpu.models.bert import BertConfig, convert_bert_state_dict, init_bert_params

    bert_cfg = BertConfig(
        vocab_size=tokenizer.vocab_size,
        hidden_size=c.get("reranker_d_model", 64),
        num_layers=c.get("reranker_num_layers", 2),
        num_heads=c.get("reranker_num_heads", 4),
        intermediate_size=c.get("reranker_d_ff", 128),
        num_labels=1,
    )
    import os

    if weights and os.path.isdir(weights):
        from rag_docvqa_tpu.models.loader import read_state_dict

        params = convert_bert_state_dict(read_state_dict(weights), bert_cfg)
    else:
        params = init_bert_params(key, bert_cfg)
    return Reranker(rcfg, bert_cfg, params)


def build_p2s_config(c: Dict[str, Any], vocab_size: int):
    from rag_docvqa_tpu.models import pix2struct as p2s

    d = c.get("d_model", 768)
    return p2s.Pix2StructConfig(
        vision=p2s.P2SVisionConfig(
            hidden_size=d,
            num_layers=c.get("num_layers", 12),
            num_heads=c.get("num_heads", 12),
            d_ff=c.get("d_ff", d * 4),
        ),
        text=t5m.T5Config(
            vocab_size=vocab_size, d_model=d, d_kv=c.get("d_kv", 64),
            num_heads=c.get("num_heads", 12), d_ff=c.get("d_ff", d * 4),
            num_encoder_layers=0,
            num_decoder_layers=c.get("num_decoder_layers", c.get("num_layers", 12)),
            dropout_rate=c.get("dropout_rate", 0.0),
            gated_ffn=True,
            tie_word_embeddings=False,
            decode_kv_int8=bool(c.get("decode_kv_int8", False)),
        ),
    )


def build_qwen_config(c: Dict[str, Any], vocab_size: int):
    from rag_docvqa_tpu.models.causal_lm import CausalLMConfig

    return CausalLMConfig(
        vocab_size=vocab_size,
        d_model=c.get("d_model", 1024),
        num_layers=c.get("num_layers", 12),
        num_heads=c.get("num_heads", 16),
        num_kv_heads=c.get("num_kv_heads", 4),
        d_ff=c.get("d_ff", 2816),
    )


def build_engine(c: Dict[str, Any], params, tokenizer):
    """Model registry (reference build_model, build_utils.py:26-35:
    VT5 / Hi-VT5 / Pix2Struct, plus the Qwen weight-name path in RAGVT5's
    ctor src/RAGVT5.py:72-91), including the optional rerank + NAC stages
    (src/RAGVT5.py:101-115)."""
    name = str(c.get("model_name", "VT5")).lower()
    if name in ("hi-vt5", "hivt5"):
        from rag_docvqa_tpu.engine.hivt5_engine import HiVT5Engine

        return HiVT5Engine(
            build_hivt5_config(c, tokenizer.vocab_size), params, tokenizer,
            max_new_tokens=c.get("max_new_tokens", 32),
        )
    if name in ("pix2struct", "ragpix2struct"):
        from rag_docvqa_tpu.engine.rag_pix2struct import P2SRAGConfig, RAGPix2StructEngine

        return RAGPix2StructEngine(
            P2SRAGConfig(
                chunk_num=c.get("chunk_num", 10),
                include_surroundings=_scalar(c.get("include_surroundings", 0)),
                chunk_mode=c.get("chunk_mode", "horizontal"),
                max_new_tokens=c.get("max_new_tokens", 32),
                use_rag=c.get("page_retrieval", "concat") != "none",
            ),
            build_p2s_config(c, tokenizer.vocab_size), params, tokenizer,
        )
    if name in ("qwen", "qwen2", "qwen2.5-vl", "ragqwen"):
        from rag_docvqa_tpu.engine.rag_qwen import QwenRAGConfig, RAGQwenEngine

        use_visual = bool(c.get("use_visual", False))
        vision_cfg = None
        if use_visual:
            vision_cfg = build_qwen_vision_config(c)
            if isinstance(params, dict) and "vision" not in params:
                import warnings

                import jax as _jax

                from rag_docvqa_tpu.models.qwen_vision import init_qwen_vision_params

                if c.get("ckpt") or c.get("hf_weights"):
                    warnings.warn(
                        "use_visual=true but the loaded checkpoint has no "
                        "'vision' tower — running on RANDOM visual features. "
                        "Provide vision weights or set use_visual=false.",
                        stacklevel=2,
                    )
                params["vision"] = init_qwen_vision_params(
                    _jax.random.PRNGKey(c.get("seed", 0) + 2), vision_cfg
                )
        return RAGQwenEngine(
            QwenRAGConfig(
                chunk_num=c.get("chunk_num", 10),
                include_surroundings=_scalar(c.get("include_surroundings", 0)),
                max_prompt_tokens=c.get("max_prompt_tokens", c.get("max_source_length", 512)),
                max_new_tokens=c.get("max_new_tokens", 16),
                use_visual=use_visual,
                max_crops=c.get("max_crops", 4),
            ),
            build_qwen_config(c, tokenizer.vocab_size), params, tokenizer,
            vision_cfg=vision_cfg,
        )
    from rag_docvqa_tpu.engine.rag_vt5 import RAGVT5Engine

    reranker = build_reranker(c, tokenizer, seed=c.get("seed", 0)) if c.get("rerank", False) else None
    nac = None
    if c.get("use_not_answerable_classifier", False):
        import jax as _jax

        from rag_docvqa_tpu.models.nac import NACConfig, init_nac_params

        nac_params = params.get("nac") if isinstance(params, dict) else None
        if nac_params is None:
            nac_params = init_nac_params(
                _jax.random.PRNGKey(c.get("seed", 0) + 1),
                NACConfig(emb_dim=c.get("d_model", 768)),
            )
        nac = (nac_params, float(c.get("not_answerable_threshold", 0.5)))

    return RAGVT5Engine(
        build_rag_config(c), build_vt5_config(c, tokenizer.vocab_size), params, tokenizer,
        reranker=reranker, nac=nac,
    )


def _scalar(v):
    if isinstance(v, (list, tuple)):
        return v[0] if v else 0
    return v
