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


PROMPT_TEMPLATE = "user: {question}\ncontext: {context}\nassistant:"


def build_prompt(question: str, context_chunks: Sequence[str]) -> str:
    return PROMPT_TEMPLATE.format(question=question, context=" ".join(context_chunks))


class RAGQwenEngine:
    def __init__(
        self,
        cfg: QwenRAGConfig,
        lm_cfg: clm.CausalLMConfig,
        params: Dict[str, Any],
        tokenizer,
        embed_shared: Optional[jax.Array] = None,  # retrieval embedding table
    ):
        self.cfg = cfg
        self.lm_cfg = lm_cfg
        self.params = params
        self.tokenizer = tokenizer
        # default: reuse the LM's own token embedding table as the bi-encoder
        self.embed_shared = embed_shared if embed_shared is not None else params["embed"]

    # ------------------------------------------------------------------ #
    def retrieve_texts(self, batch: ChunkedBatch, aux: Dict[str, Any]) -> Tuple[List[List[str]], List[List[int]]]:
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
        return texts, page_lists

    def _tokenize_prompts(self, prompts: List[str]) -> Tuple[jnp.ndarray, jnp.ndarray]:
        T = self.cfg.max_prompt_tokens
        ids = np.zeros((len(prompts), T), np.int32)
        mask = np.zeros((len(prompts), T), bool)
        for i, p in enumerate(prompts):
            tok = self.tokenizer.encode(p)[:T]
            ids[i, : len(tok)] = tok
            mask[i, : len(tok)] = True
        return jnp.asarray(ids), jnp.asarray(mask)

    def inference(self, batch: ChunkedBatch, aux: Dict[str, Any]) -> Dict[str, Any]:
        texts, pages = self.retrieve_texts(batch, aux)
        prompts = [build_prompt(q, t) for q, t in zip(aux["questions"], texts)]
        ids, mask = self._tokenize_prompts(prompts)
        tokens, conf = clm.generate(
            self.params, self.lm_cfg, ids, mask, max_new_tokens=self.cfg.max_new_tokens
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
            # strip a leading "assistant:" echo (QwenVLInstruct.py:256-261)
            answers.append(text.split("assistant:")[-1].strip())
        return {
            "pred_answers": answers,
            "confidences": np.asarray(conf).tolist(),
            "pred_answer_pages": pages,
            "retrieval": {"page_indices": pages, "text": texts},
        }

    # ------------------------------------------------------------------ #
    def build_sft_batch(
        self, batch: ChunkedBatch, aux: Dict[str, Any], seed: int = 0
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """(ids, mask, labels) with -100 on prompt tokens (masked-label SFT,
        QwenVLInstruct.py:165-203)."""
        rng = np.random.RandomState(seed)
        texts, _ = self.retrieve_texts(batch, aux)
        T = self.cfg.max_prompt_tokens + self.cfg.answer_max_tokens
        B = batch.batch_size
        ids = np.zeros((B, T), np.int32)
        mask = np.zeros((B, T), bool)
        labels = np.full((B, T), -100, np.int32)
        for b in range(B):
            prompt_ids = self.tokenizer.encode(build_prompt(aux["questions"][b], texts[b]))[: self.cfg.max_prompt_tokens]
            answers = aux["answers"][b] or [""]
            ans = answers[rng.randint(len(answers))]
            ans_ids = self.tokenizer.encode(" " + ans)[: self.cfg.answer_max_tokens - 1] + [self.lm_cfg.eos_id]
            seq = prompt_ids + ans_ids
            ids[b, : len(seq)] = seq
            mask[b, : len(seq)] = True
            labels[b, len(prompt_ids) : len(seq)] = ans_ids
        return jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels)


@functools.partial(jax.jit, static_argnames=("lm_cfg",))
def sft_step_loss(params, lm_cfg: clm.CausalLMConfig, ids, mask, labels):
    return clm.sft_loss(params, lm_cfg, ids, mask, labels)
