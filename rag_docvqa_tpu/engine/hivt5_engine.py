"""Hi-VT5 engine adapter: the standard inference interface over the
hierarchical model, so eval.py / evaluate() / the demo drive Hi-VT5 exactly
like the RAG engines (reference eval.py:247-256 special-cases Proxy_HiVT5;
here the interface is uniform)."""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from rag_docvqa_tpu.data.contract import ChunkedBatch
from rag_docvqa_tpu.models import hivt5 as hivt5m


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode_device(params, cfg, batch, page_visual=None, page_visual_valid=None):
    """Hierarchical encode + page-retrieval head (one program)."""
    import jax.numpy as jnp

    doc_emb, doc_mask = hivt5m.encode_document(params, cfg, batch, page_visual, page_visual_valid)
    ret_logits = hivt5m.page_retrieval_logits(params, cfg, doc_emb)
    page_valid = jnp.arange(cfg.max_doc_pages)[None, :] < batch.num_pages[:, None]
    pred_page = jnp.argmax(jnp.where(page_valid, ret_logits, -1e9), axis=-1)
    return doc_emb, doc_mask, pred_page


def _generate_device(params, cfg, batch, max_new_tokens, page_visual=None, page_visual_valid=None):
    """Split-dispatch hierarchical generation: encode (+ ret head) and the
    greedy decode loop as separate XLA programs (ops/decode.py::
    greedy_decode_split — the loop runs ~2.5x faster on TPU when the decode
    cache arrives as a program input). Same results as hivt5m.generate."""
    from rag_docvqa_tpu.ops.decode import greedy_decode_split

    doc_emb, doc_mask, pred_page = _encode_device(params, cfg, batch, page_visual, page_visual_valid)
    tokens, conf = greedy_decode_split(params["t5"], cfg.t5, doc_emb, doc_mask, max_new_tokens)
    return tokens, conf, pred_page


@functools.partial(jax.jit, static_argnames=("cfg",))
def _page_visual_device(params, cfg, pixels):
    """Jitted per-page ViT + matcher pass (one program, not op-by-op)."""
    return hivt5m.page_visual_features(params, cfg, pixels)


class HiVT5Engine:
    def __init__(self, cfg: hivt5m.HiVT5Config, params: Dict[str, Any], tokenizer, max_new_tokens: int = 32):
        # flash encoder attention for the per-page encode (shared gate)
        from rag_docvqa_tpu.ops.flash_attention import flash_wanted

        if not cfg.t5.flash_encoder and flash_wanted(256, cfg.page_seq_len):
            from dataclasses import replace as _replace

            cfg = _replace(cfg, t5=_replace(cfg.t5, flash_encoder=True))
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.max_new_tokens = max_new_tokens

    def _page_visual(self, batch: ChunkedBatch, aux: Optional[Dict[str, Any]]):
        """Per-page visual tokens (HiVT5.py:471-489): every page render goes
        through the ViT + matcher + visual-box spatial embedding. Returns
        ((B, P, 197, D), (B, P) validity) or (None, None) when the visual
        branch is off / no images. Pages without a real render are masked out
        downstream (mixed batches must not attend to zero-image features)."""
        if not (self.cfg.use_visual and "visual" in self.params):
            return None, None
        if aux is None or not aux.get("images") or all(
            imgs is None for imgs in aux["images"]
        ):
            return None, None
        import jax.numpy as jnp

        from rag_docvqa_tpu.ops.patches import resize_image

        B, P = batch.batch_size, self.cfg.max_doc_pages
        size = self.cfg.vit.image_size
        pixels = np.zeros((B * P, size, size, 3), np.float32)
        valid = np.zeros((B, P), bool)
        for b in range(B):
            page_imgs = aux["images"][b] or []
            for p in range(min(P, len(page_imgs))):
                if page_imgs[p] is None:
                    continue
                img = resize_image(np.asarray(page_imgs[p]), size, size) / 255.0
                pixels[b * P + p] = (img - 0.5) / 0.5
                valid[b, p] = True
        vis = _page_visual_device(self.params, self.cfg, jnp.asarray(pixels))
        return vis.reshape(B, P, vis.shape[1], vis.shape[2]), jnp.asarray(valid)

    def inference(self, batch: ChunkedBatch, aux: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        t0 = time.time()
        page_visual, page_visual_valid = self._page_visual(batch, aux)
        tokens, conf, pred_page = _generate_device(
            self.params, self.cfg, batch, self.max_new_tokens,
            page_visual=page_visual, page_visual_valid=page_visual_valid,
        )
        answers = self._decode(tokens)
        pages = [int(p) for p in np.asarray(pred_page)]
        return {
            "pred_answers": answers,
            "confidences": np.asarray(conf).tolist(),
            "pred_answer_pages": pages,
            "retrieval": {
                "page_indices": pages,
                "retrieval_time": 0.0,
                "generation_time": time.time() - t0,
            },
        }

    def _decode(self, tokens) -> List[str]:
        out = []
        for row in np.asarray(tokens):
            ids = []
            for t in row:
                if t == self.cfg.t5.eos_id:
                    break
                if t != self.cfg.t5.pad_id:
                    ids.append(int(t))
            out.append(self.tokenizer.decode(ids))
        return out
