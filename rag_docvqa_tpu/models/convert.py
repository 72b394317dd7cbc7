"""HF PyTorch checkpoint -> JAX param-tree conversion.

Covers the model families in SURVEY.md §2.9. Conversion is pure numpy (no
torch at call time: pass a {name: np.ndarray} state dict, e.g. from
safetensors or `{k: v.numpy() for k, v in model.state_dict().items()}`).

Layer-stacking: our stacks keep per-layer weights on a leading L axis, so each
HF per-layer tensor lands in `out[name][layer_idx]`.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from rag_docvqa_tpu.models.t5 import T5Config


def _t(x: np.ndarray) -> np.ndarray:
    """torch Linear stores (out, in); we use (in, out)."""
    return np.ascontiguousarray(x.T)


def _stack(sd: Dict[str, np.ndarray], fmt: str, n: int, transpose: bool = True) -> np.ndarray:
    mats = [sd[fmt.format(i)] for i in range(n)]
    if transpose:
        mats = [_t(m) for m in mats]
    return np.stack(mats)


def convert_t5_state_dict(sd: Dict[str, np.ndarray], cfg: T5Config) -> Dict:
    """Convert `T5ForConditionalGeneration.state_dict()` to our param tree."""
    Le, Ld = cfg.num_encoder_layers, cfg.num_decoder_layers
    e = "encoder.block.{}.layer."
    d = "decoder.block.{}.layer."

    def ffn(prefix_fmt: str, layer_idx_of_ffn: int, n: int) -> Dict:
        base = prefix_fmt + f"{layer_idx_of_ffn}.DenseReluDense."
        if cfg.gated_ffn:
            return {
                "wi_0": _stack(sd, base + "wi_0.weight", n),
                "wi_1": _stack(sd, base + "wi_1.weight", n),
                "wo": _stack(sd, base + "wo.weight", n),
            }
        return {
            "wi": _stack(sd, base + "wi.weight", n),
            "wo": _stack(sd, base + "wo.weight", n),
        }

    def attn(base: str, n: int) -> Dict:
        return {
            "q": _stack(sd, base + "q.weight", n),
            "k": _stack(sd, base + "k.weight", n),
            "v": _stack(sd, base + "v.weight", n),
            "o": _stack(sd, base + "o.weight", n),
        }

    params = {
        "shared": np.asarray(sd["shared.weight"]),
        "encoder": {
            "rel_bias": np.asarray(sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]),
            "attn": attn(e + "0.SelfAttention.", Le),
            "ffn": ffn(e, 1, Le),
            "ln0": _stack(sd, e + "0.layer_norm.weight", Le, transpose=False),
            "ln1": _stack(sd, e + "1.layer_norm.weight", Le, transpose=False),
            "final_ln": np.asarray(sd["encoder.final_layer_norm.weight"]),
        },
        "decoder": {
            "rel_bias": np.asarray(sd["decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]),
            "self_attn": attn(d + "0.SelfAttention.", Ld),
            "cross_attn": attn(d + "1.EncDecAttention.", Ld),
            "ffn": ffn(d, 2, Ld),
            "ln0": _stack(sd, d + "0.layer_norm.weight", Ld, transpose=False),
            "ln1": _stack(sd, d + "1.layer_norm.weight", Ld, transpose=False),
            "ln2": _stack(sd, d + "2.layer_norm.weight", Ld, transpose=False),
            "final_ln": np.asarray(sd["decoder.final_layer_norm.weight"]),
        },
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = _t(sd["lm_head.weight"])
    return params


def torch_state_dict_to_numpy(model) -> Dict[str, np.ndarray]:
    """Helper for tests / offline conversion scripts."""
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
