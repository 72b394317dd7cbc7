"""Compute ops: host-side index computation + device (Pallas/XLA) kernels.

Host side (runs once at ingest; produces gather indices):
  * chunking — word-stride chunk span computation with tail merge
    (port of src/_modules.py:907-943 semantics).

Device side:
  * topk      — fused cosine-score + masked top-k (Pallas kernel + jnp ref)
  * gather    — retrieval-to-generator token assembly (surround expansion,
                dedup ownership, token flattening)
  * decode    — cached greedy decode loop with confidence product
"""
