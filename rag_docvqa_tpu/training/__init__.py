"""Training: optimizer, sharded train step, checkpointing, eval loop.

Reference parity (src/train.py, src/build_utils.py:13-24): AdamW over
selectively-trainable parameter groups, linear warmup schedule, global grad
clip 3.0, metrics-in-the-loop. TPU-native additions: pjit-sharded train step
over a (data, model) mesh and Orbax checkpointing of params + optimizer state
(the reference checkpoints generator params only, src/checkpoint.py).
"""

from rag_docvqa_tpu.training.optimizer import build_optimizer, trainable_mask
from rag_docvqa_tpu.training.train_step import TrainState, make_train_step, vt5_param_spec

__all__ = [
    "build_optimizer",
    "trainable_mask",
    "TrainState",
    "make_train_step",
    "vt5_param_spec",
]
