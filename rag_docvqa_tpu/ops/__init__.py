"""Compute ops: host-side index computation + device (Pallas/XLA) kernels.

Host side (runs once at ingest; produces gather indices):
  * chunking — word-stride chunk span computation with tail merge
    (port of src/_modules.py:907-943 semantics).

Device side:
  * topk      — fused cosine-score + masked top-k (Pallas kernel + jnp ref)
  * gather    — retrieval-to-generator token assembly (surround expansion,
                dedup ownership, token flattening)
  * decode    — cached greedy decode loop with confidence product
  * flash_attention — fused online-softmax encoder/causal attention
                (in-kernel key masking, streamed T5 rel-pos bias, GQA,
                custom recompute-based VJP incl. the bias gradient)
  * decode_attention — fused single-query cross-attention for greedy
                decode (streams the int8/bf16 KV cache once per step,
                VMEM-local dequant)
  * late_interaction — ColBERT MaxSim scoring (jnp + fused Pallas)
  * quant     — int8 row-quantized index + bit-exact int8 top-k kernels
  * s2chunker — spectral layout-region clustering (numpy)
  * patches   — image patching / Pix2Struct flattened-patch extraction
"""
