"""Multi-chip parallelism: device meshes, sharded embedding index, collectives.

The reference has no real distributed stack (SURVEY.md §2.8); this package is
where the TPU build earns its scaling: document chunks are sharded across a
mesh axis, each chip scores its shard with the fused kernel, and the global
top-k is merged with one small all-gather over ICI.
"""

from rag_docvqa_tpu.parallel.mesh import create_mesh, default_mesh
from rag_docvqa_tpu.parallel.index import ShardedIndex

__all__ = ["create_mesh", "default_mesh", "ShardedIndex"]
