"""Hi-VT5 engine adapter: the standard inference interface over the
hierarchical model, so eval.py / evaluate() / the demo drive Hi-VT5 exactly
like the RAG engines (reference eval.py:247-256 special-cases Proxy_HiVT5;
here the interface is uniform)."""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import numpy as np

from rag_docvqa_tpu.data.contract import ChunkedBatch
from rag_docvqa_tpu.models import hivt5 as hivt5m


class HiVT5Engine:
    def __init__(self, cfg: hivt5m.HiVT5Config, params: Dict[str, Any], tokenizer, max_new_tokens: int = 32):
        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.max_new_tokens = max_new_tokens

    def inference(self, batch: ChunkedBatch, aux: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        t0 = time.time()
        tokens, conf, pred_page = hivt5m.generate(self.params, self.cfg, batch, self.max_new_tokens)
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
