"""Model zoo: pure-functional JAX implementations (params are plain pytrees).

Components (reference parity targets):
  * t5.py         — T5 encoder-decoder stack (HF t5-base weight compatible)
  * embeddings.py — SpatialEmbeddings / MLP / visual matcher
                    (src/_modules.py:48-144)
  * vit.py        — ViT/DiT image encoder (visual tokens for VT5)
  * vt5.py        — VT5ForConditionalGeneration equivalent (src/VT5.py)
  * bert.py       — BERT-style encoder for BGE bi-encoder + cross-encoder
  * embedder.py   — BiEncoder facade (src/_modules.py:1422-1477)
  * convert.py    — HF torch checkpoint -> JAX param tree conversion

All forward functions are jittable, shard-annotatable, and take params as the
first argument; layer weights are stacked on a leading axis and iterated with
lax.scan so compile time stays flat in depth.
"""
