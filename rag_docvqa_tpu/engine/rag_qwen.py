"""RAG + decoder-only generator (the reference's Qwen2.5-VL path).

Reference behavior (src/QwenVLInstruct.py + RAGVT5.py:72-82): the same
retrieval stack feeds a chat-style prompt — question + retrieved OCR context
(+ retrieved patch images) — to a decoder-only VLM; answers generate with
max_new_tokens=16 and an "assistant:" suffix strip; SFT masks prompt tokens
with -100 (:165-203).

Here the generator is models/causal_lm.py (Qwen2-family, HF-convertible, LoRA
via models/lora.py). Retrieval reuses the standard engine machinery; prompts
assemble on host from the retrieved chunk texts (chat template), generation
and SFT are jitted device programs.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rag_docvqa_tpu.data.contract import ChunkedBatch
from rag_docvqa_tpu.engine.rag_vt5 import retrieve_device
from rag_docvqa_tpu.models import causal_lm as clm
from rag_docvqa_tpu.ops.gather import compute_ownership


@dataclass(frozen=True)
class QwenRAGConfig:
    chunk_num: int = 10
    include_surroundings: int = 0
    max_prompt_tokens: int = 512
    max_new_tokens: int = 16  # QwenVLInstruct.py:246
    answer_max_tokens: int = 24
    # visual path: retrieved patch crops -> Qwen2-VL-shaped vision tower ->
    # spliced at <|image_pad|> positions (src/QwenVLInstruct.py:85-160)
    use_visual: bool = False
    max_crops: int = 4  # crops per sample fed to the tower


# ChatML (the Qwen2.5 chat template the reference applies via
# processor.apply_chat_template, src/QwenVLInstruct.py:143-146)
CHATML_SYSTEM = "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
CHATML_USER_OPEN = "<|im_start|>user\n"
CHATML_VISION_OPEN = "<|vision_start|>"
CHATML_VISION_CLOSE = "<|vision_end|>"
CHATML_IMAGE_PAD = "<|image_pad|>"
CHATML_USER_CLOSE = "<|im_end|>\n<|im_start|>assistant\n"
# instruction text mirrors src/QwenVLInstruct.py:126-131
USER_TEXT_TEMPLATE = (
    "question: {question}\n"
    "Directly provide only a short direct answer to the question. "
    "The answer appears in the following context. Context: {context}"
)


def build_prompt(question: str, context_chunks: Sequence[str]) -> str:
    """Text-only ChatML prompt (no images)."""
    return (
        CHATML_SYSTEM + CHATML_USER_OPEN
        + USER_TEXT_TEMPLATE.format(question=question, context=" ".join(context_chunks))
        + CHATML_USER_CLOSE
    )


class RAGQwenEngine:
    def __init__(
        self,
        cfg: QwenRAGConfig,
        lm_cfg: clm.CausalLMConfig,
        params: Dict[str, Any],
        tokenizer,
        embed_shared: Optional[jax.Array] = None,  # retrieval embedding table
        vision_cfg=None,  # models.qwen_vision.QwenVisionConfig; params["vision"]
    ):
        self.cfg = cfg
        self.lm_cfg = lm_cfg
        # inference-only variant: causal flash prefill on a single TPU chip
        # (self.lm_cfg stays pristine for SFT paths, which need the VJP)
        self.lm_cfg_infer = lm_cfg
        # measured on v5e with the group-folded GQA kernel: -6% generate at
        # Tp=512, 1.87x forward at Tp=2048 (shared gate)
        from rag_docvqa_tpu.ops.flash_attention import flash_wanted

        if not lm_cfg.flash_prefill and flash_wanted(512, cfg.max_prompt_tokens):
            from dataclasses import replace as _replace

            self.lm_cfg_infer = _replace(lm_cfg, flash_prefill=True)
        self.params = params
        self.tokenizer = tokenizer
        self.vision_cfg = vision_cfg
        # default: reuse the LM's own token embedding table as the bi-encoder.
        # SFT CAVEAT: training updates params["embed"], so retrieval drifts
        # from the contexts the SFT batch was built with — fine-tunes must
        # pass a FROZEN embed_shared (or a separate embedder); pinned by
        # tests/test_e2e_answer_quality.py::test_sft_qwen_answers_correctly
        self.embed_shared = embed_shared if embed_shared is not None else params["embed"]
        self.image_pad_id = tokenizer.encode(CHATML_IMAGE_PAD)[0]

    # ------------------------------------------------------------------ #
    def _retrieve(self, batch: ChunkedBatch, aux: Dict[str, Any]):
        ret = retrieve_device(self.embed_shared, batch, k=self.cfg.chunk_num)
        owner = compute_ownership(batch, ret.top_k_idx, ret.top_k_valid, self.cfg.include_surroundings)
        owner = np.asarray(owner)
        valid = np.asarray(ret.top_k_valid)
        pages = np.asarray(ret.top_k_page)
        texts, page_lists = [], []
        for b in range(batch.batch_size):
            words_b = aux["slot_words"][b]
            rows = []
            for r in range(self.cfg.chunk_num):
                if not valid[b, r]:
                    continue
                slots = np.where(owner[b] == r)[0]
                rows.append(" ".join(words_b[g] for g in slots if g < len(words_b)))
            texts.append(rows)
            page_lists.append(pages[b][valid[b]].tolist())
        return ret, texts, page_lists

    def retrieve_texts(self, batch: ChunkedBatch, aux: Dict[str, Any]) -> Tuple[List[List[str]], List[List[int]]]:
        _, texts, pages = self._retrieve(batch, aux)
        return texts, pages

    # ------------------------------------------------------------------ #
    def _encode_crops(self, batch: ChunkedBatch, aux: Dict[str, Any], ret) -> Optional[np.ndarray]:
        """Crop the top-k chunk boxes from their pages and run the vision
        tower (src/QwenVLInstruct.py:85-119: resized retrieved patch images).
        Returns ((B, max_crops, Tv, D) embeddings with zero rows for missing
        crops, (B, max_crops) crop validity), or (None, None) when the visual
        path is off / images unavailable."""
        if not (self.cfg.use_visual and self.vision_cfg is not None and "vision" in self.params):
            return None, None
        if not aux.get("images") or all(imgs is None for imgs in aux["images"]):
            return None, None
        from rag_docvqa_tpu.ops.patches import crop_box, resize_image

        # two towers: the faithful Qwen2.5-VL encoder (weight-convertible,
        # models/qwen25_vision.py) or the lightweight ViT+merger stand-in
        if hasattr(self.vision_cfg, "fullatt_block_indexes"):
            size = self.vision_cfg.image_size
        else:
            size = self.vision_cfg.vit.image_size
        encode = _encode_crops_device

        B = batch.batch_size
        M = self.cfg.max_crops
        boxes = np.asarray(ret.top_k_box)
        pages = np.asarray(ret.top_k_page)
        valid = np.asarray(ret.top_k_valid)
        pixels = np.zeros((B * M, size, size, 3), np.float32)
        crop_valid = np.zeros((B, M), bool)
        for b in range(B):
            page_imgs = aux["images"][b]
            if page_imgs is None:
                continue
            m = 0
            for r in range(boxes.shape[1]):
                if m >= M or not valid[b, r]:
                    continue
                img = page_imgs[pages[b, r]]
                if img is None:
                    continue
                crop = crop_box(np.asarray(img), boxes[b, r])
                if crop.size == 0:
                    continue
                pix = resize_image(crop, size, size) / 255.0
                pixels[b * M + m] = (pix - 0.5) / 0.5
                crop_valid[b, m] = True
                m += 1
        embeds = encode(self.params["vision"], self.vision_cfg, jnp.asarray(pixels))
        Tv = embeds.shape[1]
        return np.asarray(embeds).reshape(B, M, Tv, -1), crop_valid

    def _assemble_prompts(
        self,
        questions: List[str],
        texts: List[List[str]],
        crop_embeds: Optional[np.ndarray],  # (B, M, Tv, D) or None
        crop_valid: Optional[np.ndarray] = None,  # (B, M) bool
        total_len: Optional[int] = None,
    ):
        """ChatML prompt ids with <|image_pad|> placeholder spans; returns
        (ids, mask, visual_embeds, visual_mask, prompt_lens). Image blocks
        follow the text, matching the reference's message content order
        (src/QwenVLInstruct.py:122-140)."""
        tk = self.tokenizer
        B = len(questions)
        T = total_len or self.cfg.max_prompt_tokens
        ids = np.zeros((B, T), np.int32)
        mask = np.zeros((B, T), bool)
        vemb = None
        vmask = np.zeros((B, T), bool)
        if crop_embeds is not None:
            vemb = np.zeros((B, T, crop_embeds.shape[-1]), np.float32)
        lens = np.zeros((B,), np.int32)

        open_ids = tk.encode(CHATML_SYSTEM + CHATML_USER_OPEN)
        vopen = tk.encode(CHATML_VISION_OPEN)
        vclose = tk.encode(CHATML_VISION_CLOSE)
        close_ids = tk.encode(CHATML_USER_CLOSE)

        for b in range(B):
            seq: List[int] = list(open_ids)
            spans: List[Tuple[int, int]] = []  # (start position, crop index)
            seq += tk.encode(USER_TEXT_TEMPLATE.format(
                question=questions[b], context=" ".join(texts[b])
            ))
            if crop_embeds is not None:
                Tv = crop_embeds.shape[2]
                for m in range(crop_embeds.shape[1]):
                    # None validity = all crops valid (same default as
                    # hivt5.encode_document's page_visual_valid)
                    if crop_valid is not None and not crop_valid[b, m]:
                        continue
                    seq += vopen
                    spans.append((len(seq), m))
                    seq += [self.image_pad_id] * Tv
                    seq += vclose
            seq += close_ids
            seq = seq[: min(T, self.cfg.max_prompt_tokens)]
            ids[b, : len(seq)] = seq
            mask[b, : len(seq)] = True
            lens[b] = len(seq)
            if crop_embeds is not None:
                Tv = crop_embeds.shape[2]
                for start, m in spans:
                    # clip to the TRUNCATED prompt: a span past len(seq) would
                    # otherwise splice crop embeddings over answer tokens in
                    # the SFT layout (labels supervise those positions)
                    end = min(start + Tv, len(seq))
                    if end <= start:
                        continue
                    vemb[b, start:end] = crop_embeds[b, m, : end - start]
                    vmask[b, start:end] = True
        return ids, mask, vemb, vmask, lens

    def inference(self, batch: ChunkedBatch, aux: Dict[str, Any]) -> Dict[str, Any]:
        ret, texts, pages = self._retrieve(batch, aux)
        crop_embeds, crop_valid = self._encode_crops(batch, aux, ret)
        ids, mask, vemb, vmask, _ = self._assemble_prompts(
            aux["questions"], texts, crop_embeds, crop_valid
        )
        tokens, conf = _generate_device(
            self.params, self.lm_cfg_infer, jnp.asarray(ids), jnp.asarray(mask),
            self.cfg.max_new_tokens,
            visual_embeds=jnp.asarray(vemb) if vemb is not None else None,
            visual_mask=jnp.asarray(vmask) if vemb is not None else None,
        )
        answers = []
        for row in np.asarray(tokens):
            out_ids = []
            for t in row:
                if t == self.lm_cfg.eos_id:
                    break
                if t != self.lm_cfg.pad_id:
                    out_ids.append(int(t))
            text = self.tokenizer.decode(out_ids)
            # strip chat-template echoes (QwenVLInstruct.py:256-261)
            text = text.split("assistant:")[-1]
            answers.append(text.replace("<|im_end|>", "").strip())
        return {
            "pred_answers": answers,
            "confidences": np.asarray(conf).tolist(),
            "pred_answer_pages": pages,
            "retrieval": {"page_indices": pages, "text": texts},
        }

    # ------------------------------------------------------------------ #
    def build_sft_batch(
        self, batch: ChunkedBatch, aux: Dict[str, Any], seed: int = 0
    ):
        """(ids, mask, labels[, visual_embeds, visual_mask]) with -100 on
        prompt tokens (masked-label SFT, QwenVLInstruct.py:165-203). With the
        visual path on, prompts include <|image_pad|> placeholder spans and
        the matching visual embeddings are returned for the splice hook."""
        rng = np.random.RandomState(seed)
        ret, texts, _ = self._retrieve(batch, aux)
        crop_embeds, crop_valid = self._encode_crops(batch, aux, ret)
        T = self.cfg.max_prompt_tokens + self.cfg.answer_max_tokens
        B = batch.batch_size
        ids, mask, vemb, vmask, lens = self._assemble_prompts(
            aux["questions"], texts, crop_embeds, crop_valid, total_len=T
        )
        labels = np.full((B, T), -100, np.int32)
        for b in range(B):
            plen = min(int(lens[b]), self.cfg.max_prompt_tokens)
            answers = aux["answers"][b] or [""]
            ans = answers[rng.randint(len(answers))]
            ans_ids = self.tokenizer.encode(" " + ans)[: self.cfg.answer_max_tokens - 1] + [self.lm_cfg.eos_id]
            end = min(plen + len(ans_ids), T)
            ids[b, plen:end] = ans_ids[: end - plen]
            mask[b, plen:end] = True
            labels[b, plen:end] = ans_ids[: end - plen]
        if crop_embeds is not None:
            return (jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels),
                    jnp.asarray(vemb), jnp.asarray(vmask))
        return jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels)


@functools.partial(jax.jit, static_argnames=("lm_cfg",))
def sft_step_loss(params, lm_cfg: clm.CausalLMConfig, ids, mask, labels):
    return clm.sft_loss(params, lm_cfg, ids, mask, labels)


@functools.partial(jax.jit, static_argnames=("lm_cfg", "max_new_tokens"))
def _generate_device(params, lm_cfg, ids, mask, max_new_tokens, visual_embeds=None, visual_mask=None):
    """Jitted prefill + cached greedy decode as one program."""
    return clm.generate(params, lm_cfg, ids, mask, max_new_tokens=max_new_tokens,
                        visual_embeds=visual_embeds, visual_mask=visual_mask)


@functools.partial(jax.jit, static_argnames=("vision_cfg",))
def _encode_crops_device(vision_params, vision_cfg, pixels):
    """Jitted vision-tower pass over the crop pixel batch (one program;
    tower auto-dispatch on the static config type)."""
    if hasattr(vision_cfg, "fullatt_block_indexes"):
        from rag_docvqa_tpu.models.qwen25_vision import encode_image as _enc
    else:
        from rag_docvqa_tpu.models.qwen_vision import encode_images as _enc
    return _enc(vision_params, vision_cfg, pixels)
