"""Converter key coverage vs the real checkpoints' state-dict key templates.

The build image has no network/weights, so real-weight ANLS parity
(BASELINE.md targets) cannot run here — what CAN be proven in-image is that
each weight converter consumes exactly the key set the published checkpoint
ships (tools/parity_manifest.json). HF key names are layer-index templates:
instantiating the architecture with the REAL layer counts but tiny widths
reproduces the real checkpoints' key names without downloading tensors.

Each test asserts:
  1. the converter raises no KeyError on the template state dict,
  2. every checkpoint key is consumed except an explicit allowlist
     (tied/duplicate embeddings, heads our models re-derive, etc.),
  3. the converted tree drops into the matching init_params tree
     (same paths => loadable by models/loader.py's overlay merge).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
pytestmark = pytest.mark.parity  # slow torch/HF instantiation; core suite runs -m 'not parity'


class RecordingSD(dict):
    """dict that records every key the converter reads."""

    def __init__(self, base):
        super().__init__(base)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)


def check_coverage(name, sd, convert, allowed_unconsumed=()):
    rec = RecordingSD(sd)
    out = convert(rec)
    unconsumed = set(sd) - rec.accessed
    extra = {
        k for k in unconsumed
        if not k.endswith("num_batches_tracked")  # BN step counters, not weights
        and not any(k == a or k.startswith(a) for a in allowed_unconsumed)
    }
    assert not extra, f"{name}: converter ignored checkpoint keys: {sorted(extra)[:10]}"
    return out


def tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        out = set()
        for k, v in tree.items():
            out |= tree_paths(v, f"{prefix}/{k}")
        return out
    if isinstance(tree, (list, tuple)):
        out = set()
        for i, v in enumerate(tree):
            out |= tree_paths(v, f"{prefix}/{i}")
        return out
    return {prefix}


def assert_subtree(converted, init, name):
    """Every converted leaf path must exist in the init tree with equal shape."""
    conv_leaves = dict(zip(tree_paths(converted), [None]))
    init_map = {}

    def walk(t, p=""):
        if isinstance(t, dict):
            for k, v in t.items():
                walk(v, f"{p}/{k}")
        elif isinstance(t, (list, tuple)):
            for i, v in enumerate(t):
                walk(v, f"{p}/{i}")
        else:
            init_map[p] = np.shape(t)

    conv_map = {}

    def walk2(t, p=""):
        if isinstance(t, dict):
            for k, v in t.items():
                walk2(v, f"{p}/{k}")
        elif isinstance(t, (list, tuple)):
            for i, v in enumerate(t):
                walk2(v, f"{p}/{i}")
        else:
            conv_map[p] = np.shape(t)

    walk(init)
    walk2(converted)
    for p, shape in conv_map.items():
        assert p in init_map, f"{name}: converted path {p} not in init tree"
        assert shape == init_map[p], f"{name}: {p} shape {shape} != init {init_map[p]}"


def _sd(model):
    return {k: v.numpy() for k, v in model.state_dict().items()}


# --------------------------------------------------------------------------- #
# rubentito/vt5-base-spdocvqa (t5-base backbone at real depth)
# --------------------------------------------------------------------------- #
def test_vt5_t5_base_keys():
    from rag_docvqa_tpu.models import t5 as t5m
    from rag_docvqa_tpu.models.convert import convert_t5_state_dict

    hf = transformers.T5ForConditionalGeneration(transformers.T5Config(
        vocab_size=64, d_model=16, d_kv=4, num_heads=4, d_ff=32,
        num_layers=12, num_decoder_layers=12, feed_forward_proj="relu",
        tie_word_embeddings=True,
    ))
    cfg = t5m.T5Config(vocab_size=64, d_model=16, d_kv=4, num_heads=4, d_ff=32)
    out = check_coverage(
        "t5-base", _sd(hf), lambda sd: convert_t5_state_dict(sd, cfg),
        allowed_unconsumed=(
            # tied duplicates of shared.weight / re-derived head
            "encoder.embed_tokens.weight",
            "decoder.embed_tokens.weight",
            "lm_head.weight",
        ),
    )
    assert_subtree(out, jax.tree.map(np.asarray, t5m.init_t5_params(jax.random.PRNGKey(0), cfg)), "t5-base")


# --------------------------------------------------------------------------- #
# Qwen/Qwen2.5-VL-7B-Instruct (28 text layers, 32 vision blocks)
# --------------------------------------------------------------------------- #
def test_qwen25_vl_7b_keys():
    from rag_docvqa_tpu.models import causal_lm as clm
    from rag_docvqa_tpu.models import qwen25_vision as q25

    cfg = transformers.Qwen2_5_VLConfig(
        text_config=dict(vocab_size=64, hidden_size=32, intermediate_size=64,
                         num_hidden_layers=28, num_attention_heads=4,
                         num_key_value_heads=2, tie_word_embeddings=False),
        vision_config=dict(depth=32, hidden_size=32, out_hidden_size=32,
                           intermediate_size=64, num_heads=4, patch_size=4,
                           temporal_patch_size=2, spatial_merge_size=2,
                           fullatt_block_indexes=[7, 15, 23, 31], window_size=16),
    )
    m = transformers.Qwen2_5_VLForConditionalGeneration(cfg)
    # transformers>=4.54 state_dict uses model.language_model./model.visual.;
    # hub checkpoints ship model.layers./visual. — test the ON-DISK template
    # (the converters accept both namings)
    sd = {}
    for k, v in _sd(m).items():
        if k.startswith("model.language_model."):
            k = "model." + k[len("model.language_model."):]
        elif k.startswith("model.visual."):
            k = k[len("model."):]
        sd[k] = v

    lm_cfg = clm.CausalLMConfig(vocab_size=64, d_model=32, num_layers=28, num_heads=4,
                                num_kv_heads=2, d_ff=64, tie_word_embeddings=False)
    text_sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}
    out = check_coverage(
        "qwen25-vl text", text_sd, lambda s: clm.convert_qwen2_state_dict(s, lm_cfg),
        allowed_unconsumed=(),
    )
    init = jax.tree.map(np.asarray, clm.init_causal_lm_params(jax.random.PRNGKey(0), lm_cfg))
    assert_subtree(out, init, "qwen25-vl text")

    vcfg = q25.Qwen25VisionConfig(depth=32, hidden_size=32, out_hidden_size=32,
                                  intermediate_size=64, num_heads=4, patch_size=4,
                                  temporal_patch_size=2, spatial_merge_size=2,
                                  fullatt_block_indexes=(7, 15, 23, 31), window_size=16)
    # strip the "visual." prefix here so the converter's own re-keying branch
    # stays dormant and the RecordingSD keeps seeing every access
    vis_sd = {k[len("visual."):]: v for k, v in sd.items() if k.startswith("visual.")}
    vout = check_coverage(
        "qwen25-vl vision", vis_sd, lambda s: q25.convert_qwen25_vision_state_dict(s, vcfg),
        allowed_unconsumed=(),
    )
    vinit = jax.tree.map(np.asarray, q25.init_qwen25_vision_params(jax.random.PRNGKey(0), vcfg))
    assert_subtree(vout, vinit, "qwen25-vl vision")


# --------------------------------------------------------------------------- #
# BAAI/bge-small-en-v1.5 (12-layer BertModel)
# --------------------------------------------------------------------------- #
def test_bge_small_keys():
    from rag_docvqa_tpu.models.bert import BertConfig, convert_bert_state_dict, init_bert_params

    hf = transformers.BertModel(transformers.BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=12, num_attention_heads=4,
        intermediate_size=64,
    ))
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=12, num_heads=4,
                     intermediate_size=64)
    out = check_coverage(
        "bge-small", _sd(hf), lambda s: convert_bert_state_dict(s, cfg),
        # CLS-pooling sentence embedding never uses the tanh pooler head
        allowed_unconsumed=("pooler.",),
    )
    assert_subtree(out, jax.tree.map(np.asarray, init_bert_params(jax.random.PRNGKey(0), cfg)), "bge-small")


# --------------------------------------------------------------------------- #
# BAAI/bge-reranker-v2-m3 (24-layer XLMRoberta + classifier)
# --------------------------------------------------------------------------- #
def test_bge_reranker_m3_keys():
    from rag_docvqa_tpu.models.bert import BertConfig, convert_bert_state_dict, init_bert_params

    hf = transformers.XLMRobertaForSequenceClassification(transformers.XLMRobertaConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=24, num_attention_heads=4,
        intermediate_size=64, num_labels=1,
    ))
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=24, num_heads=4,
                     intermediate_size=64, num_labels=1, position_offset=2)
    out = check_coverage(
        "bge-reranker-m3", _sd(hf),
        lambda s: convert_bert_state_dict(s, cfg, prefix="roberta."),
    )
    assert_subtree(out, jax.tree.map(np.asarray, init_bert_params(jax.random.PRNGKey(0), cfg)), "bge-reranker-m3")


# --------------------------------------------------------------------------- #
# BAAI/bge-reranker-v2-gemma (18-layer gemma-2b shape, MQA)
# --------------------------------------------------------------------------- #
def test_gemma_reranker_keys():
    from rag_docvqa_tpu.models import causal_lm as clm

    hf = transformers.GemmaForCausalLM(transformers.GemmaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_hidden_layers=18,
        num_attention_heads=8, num_key_value_heads=1, head_dim=8,
    ))
    cfg = clm.CausalLMConfig(vocab_size=64, d_model=32, num_layers=18, num_heads=8,
                             num_kv_heads=1, d_ff=64, head_dim_override=8,
                             arch="gemma", qkv_bias=False)
    out = check_coverage(
        "gemma-reranker", _sd(hf), lambda s: clm.convert_gemma_state_dict(s, cfg),
        allowed_unconsumed=("lm_head.weight",),  # tied to embed_tokens
    )
    assert_subtree(out, jax.tree.map(np.asarray, clm.init_causal_lm_params(jax.random.PRNGKey(0), cfg)), "gemma-reranker")


# --------------------------------------------------------------------------- #
# microsoft/dit-base-finetuned-rvlcdip (BEiT backbone, 12 layers)
# --------------------------------------------------------------------------- #
def test_dit_rvlcdip_keys():
    from rag_docvqa_tpu.models.vit import ViTConfig, convert_vit_state_dict, init_vit_params

    # DiT rvlcdip config: abs pos embeddings, per-layer rel-pos bias off,
    # layer scale 0.1, mean pooling (Identity final LN)
    hf = transformers.BeitModel(transformers.BeitConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=12, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=16,
        use_absolute_position_embeddings=True, use_relative_position_bias=False,
        layer_scale_init_value=0.1, use_mean_pooling=True, use_mask_token=True,
    ), add_pooling_layer=False)
    cfg = ViTConfig(hidden_size=32, num_layers=12, num_heads=4, mlp_dim=64,
                    image_size=32, patch_size=16, arch="beit", use_abs_pos=True,
                    use_rel_pos_bias=False, layer_scale_init=0.1,
                    use_final_layernorm=False)
    out = check_coverage(
        "dit-rvlcdip", _sd(hf), lambda s: convert_vit_state_dict(s, cfg),
        # MIM mask token is a pretraining artifact; unused at inference
        allowed_unconsumed=("embeddings.mask_token",),
    )
    assert_subtree(out, jax.tree.map(np.asarray, init_vit_params(jax.random.PRNGKey(0), cfg)), "dit-rvlcdip")


# --------------------------------------------------------------------------- #
# cmarkea/dit-base-layout-detection (BeitForSemanticSegmentation, 12 layers)
# --------------------------------------------------------------------------- #
def test_beit_seg_keys():
    from rag_docvqa_tpu.models.layout_seg import (
        BeitSegConfig,
        convert_beit_seg_state_dict,
        init_beit_seg_params,
    )
    from rag_docvqa_tpu.models.vit import ViTConfig

    hf = transformers.BeitForSemanticSegmentation(transformers.BeitConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=12, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=16,
        use_absolute_position_embeddings=False, use_relative_position_bias=True,
        layer_scale_init_value=0.1, use_mean_pooling=True, use_mask_token=True,
        num_labels=12, out_indices=[3, 5, 7, 11],
    ))
    cfg = BeitSegConfig(
        vit=ViTConfig(hidden_size=32, num_layers=12, num_heads=4, mlp_dim=64,
                      image_size=32, patch_size=16, arch="beit", use_abs_pos=False,
                      use_rel_pos_bias=True, layer_scale_init=0.1,
                      use_final_layernorm=False),
        num_labels=12,
    )
    out = check_coverage(
        "beit-seg", _sd(hf), lambda s: convert_beit_seg_state_dict(s, cfg),
        allowed_unconsumed=(
            # the backbone is re-keyed internally (strip "beit."), so its
            # accesses bypass the recorder; backbone key coverage is proven by
            # test_dit_rvlcdip_keys on convert_vit_state_dict directly
            "beit.",
            # FCN auxiliary head: training-only deep supervision — the
            # reference uses only decode_head logits (src/_modules.py:293-619)
            "auxiliary_head.",
        ),
    )
    init = jax.tree.map(np.asarray, init_beit_seg_params(jax.random.PRNGKey(0), cfg))
    assert_subtree(jax.tree.map(np.asarray, out), init, "beit-seg")


# --------------------------------------------------------------------------- #
# google/pix2struct-docvqa-base (12 vision + 12 text layers)
# --------------------------------------------------------------------------- #
def test_pix2struct_base_keys():
    from rag_docvqa_tpu.models import pix2struct as p2s
    from rag_docvqa_tpu.models import t5 as t5m

    hf = transformers.Pix2StructForConditionalGeneration(transformers.Pix2StructConfig(
        text_config=transformers.Pix2StructTextConfig(
            vocab_size=64, hidden_size=32, d_kv=8, num_heads=4, d_ff=64, num_layers=12,
        ).to_dict(),
        vision_config=transformers.Pix2StructVisionConfig(
            hidden_size=32, num_hidden_layers=12, num_attention_heads=4, d_ff=64,
            d_kv=8, patch_embed_hidden_size=768, seq_len=4096,
        ).to_dict(),
        tie_word_embeddings=False,
    ))
    cfg = p2s.Pix2StructConfig(
        # max_rows/cols mirror the checkpoint's seq_len=4096 2-D embedding tables
        vision=p2s.P2SVisionConfig(hidden_size=32, num_layers=12, num_heads=4, d_ff=64,
                                   patch_dim=768, max_rows=4096, max_cols=4096),
        text=t5m.T5Config(vocab_size=64, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                          num_encoder_layers=0, num_decoder_layers=12, gated_ffn=True,
                          tie_word_embeddings=False),
    )
    out = check_coverage(
        "pix2struct", _sd(hf), lambda s: p2s.convert_p2s_state_dict(s, cfg),
    )
    init = jax.tree.map(np.asarray, p2s.init_p2s_params(jax.random.PRNGKey(0), cfg))
    assert_subtree(out, init, "pix2struct")


# --------------------------------------------------------------------------- #
# reference-shaped VT5 checkpoint layout (spatial/visual/layout modules)
# --------------------------------------------------------------------------- #
def test_reference_vt5_module_keys():
    """rubentito/vt5-base-spdocvqa saves the reference VT5 module layout
    (src/VT5.py:30-61): language_backbone.* + spatial_embedding.* +
    visual_embedding.* — synthesize that key set around the HF T5 template
    and assert full consumption + init-tree compatibility."""
    from rag_docvqa_tpu.models import vt5 as vt5m
    from rag_docvqa_tpu.models import t5 as t5m
    from rag_docvqa_tpu.models.embeddings import SpatialConfig
    from rag_docvqa_tpu.models.loader import convert_vt5_checkpoint
    from rag_docvqa_tpu.models.vit import ViTConfig

    hf = transformers.T5ForConditionalGeneration(transformers.T5Config(
        vocab_size=64, d_model=16, d_kv=4, num_heads=4, d_ff=32,
        num_layers=12, num_decoder_layers=12, feed_forward_proj="relu",
        tie_word_embeddings=True,
    ))
    hf_vit = transformers.ViTModel(transformers.ViTConfig(
        hidden_size=32, num_hidden_layers=12, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=16,
    ), add_pooling_layer=False)
    sd = {f"language_backbone.{k}": v for k, v in _sd(hf).items()}
    rng = np.random.RandomState(0)
    sd.update({
        "spatial_embedding.x_position_embeddings.weight": rng.randn(1024, 16).astype(np.float32),
        "spatial_embedding.y_position_embeddings.weight": rng.randn(1024, 16).astype(np.float32),
        "spatial_embedding.LayerNorm.weight": np.ones(16, np.float32),
        "spatial_embedding.LayerNorm.bias": np.zeros(16, np.float32),
        "spatial_embedding.spatial_emb_matcher.layers.0.weight": rng.randn(16, 16).astype(np.float32),
        "spatial_embedding.spatial_emb_matcher.layers.0.bias": np.zeros(16, np.float32),
        "visual_embedding.visual_emb_matcher.layers.0.weight": rng.randn(16, 32).astype(np.float32),
        "visual_embedding.visual_emb_matcher.layers.0.bias": np.zeros(16, np.float32),
    })
    sd.update({f"visual_embedding.image_model.{k}": v for k, v in _sd(hf_vit).items()})

    cfg = vt5m.VT5Config(
        t5=t5m.T5Config(vocab_size=64, d_model=16, d_kv=4, num_heads=4, d_ff=32),
        spatial=SpatialConfig(hidden_size=16),
        vit=ViTConfig(hidden_size=32, num_layers=12, num_heads=4, mlp_dim=64,
                      image_size=32, patch_size=16),
        use_visual=True,
    )
    # convert_vt5_checkpoint re-keys module prefixes internally (bypassing
    # the recorder), so assert consumption by value: module leaves must
    # round-trip into the converted tree; T5/ViT sub-template coverage is
    # proven by test_vt5_t5_base_keys / test_dit_rvlcdip_keys
    out = convert_vt5_checkpoint(sd, cfg)
    assert set(out) == {"t5", "spatial", "visual"}
    np.testing.assert_array_equal(
        out["spatial"]["x_emb"], sd["spatial_embedding.x_position_embeddings.weight"]
    )
    np.testing.assert_array_equal(
        out["spatial"]["matcher"]["kernel"],
        sd["spatial_embedding.spatial_emb_matcher.layers.0.weight"].T,
    )
    np.testing.assert_array_equal(
        out["visual"]["matcher"]["kernel"],
        sd["visual_embedding.visual_emb_matcher.layers.0.weight"].T,
    )
    np.testing.assert_array_equal(out["t5"]["shared"], sd["language_backbone.shared.weight"])
    init = jax.tree.map(np.asarray, vt5m.init_vt5_params(jax.random.PRNGKey(0), cfg))
    assert_subtree(out, init, "vt5-reference-layout")
