"""Sharded training step: retrieve -> assemble -> teacher-forced loss -> update.

The whole step (including on-device retrieval and generator-input assembly)
jits as one program over a (data, model) mesh:
  * batch arrays sharded over "data",
  * generator tensor-parallel over "model" (attention heads + FFN hidden via
    the param spec below; GSPMD inserts the all-reduces),
  * retrieval/assembly is embarrassingly data-parallel.

The reference trains the generator with the retrieval stack frozen by default
(src/RAGVT5.py:61-69, src/build_utils.py:13-24); `trainable_mask` reproduces
the same selective trainability.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rag_docvqa_tpu.data.contract import ChunkedBatch
from rag_docvqa_tpu.engine.rag_vt5 import RAGConfig, retrieve_device
from rag_docvqa_tpu.models import vt5 as vt5m
from rag_docvqa_tpu.ops.gather import assemble_concat


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    @staticmethod
    def create(params, tx: optax.GradientTransformation) -> "TrainState":
        return TrainState(params=params, opt_state=tx.init(params), step=jnp.zeros((), jnp.int32))


# --------------------------------------------------------------------------- #
# param sharding rules
# --------------------------------------------------------------------------- #
def vt5_param_spec(params: Dict[str, Any], model_axis: str = "model") -> Dict[str, Any]:
    """Tensor-parallel PartitionSpecs for the VT5 param tree.

    Stacked layer weights are (L, in, out): shard attention inner dim (heads)
    and FFN hidden dim over the model axis; embeddings/vocab over the model
    axis on their big dim; everything else replicated.
    """

    def spec_for(path, leaf) -> P:
        keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        name = keys[-1] if keys else ""
        if "shared" in keys or name in ("x_emb", "y_emb", "layout_emb", "pos_embed"):
            return P(model_axis, None) if leaf.ndim == 2 else P()
        if name in ("q", "k", "v", "wi", "wi_0", "wi_1", "fc1"):
            if leaf.ndim == 3:  # (L, in, out)
                return P(None, None, model_axis)
            if leaf.ndim == 2:
                return P(None, model_axis)
        if name in ("o", "wo", "fc2"):
            if leaf.ndim == 3:  # (L, inner, d)
                return P(None, model_axis, None)
            if leaf.ndim == 2:
                return P(model_axis, None)
        if name == "kernel" and leaf.ndim >= 2 and "q" in keys + ["q"]:
            pass
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def batch_spec(batch: ChunkedBatch, data_axis: str = "data") -> ChunkedBatch:
    return jax.tree.map(lambda x: P(data_axis) if hasattr(x, "ndim") and x.ndim >= 1 else P(), batch)


# --------------------------------------------------------------------------- #
# the step
# --------------------------------------------------------------------------- #
def make_train_step(
    vt5_cfg: vt5m.VT5Config,
    rag_cfg: RAGConfig,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    use_nac: bool = False,
    nac_loss_weight: float = 1.0,
    nac_pos_weight: float = 1.0,
    nac_decode_len: int = 16,
    remat: Any = False,  # False | True (whole forward) | "layer" (per layer)
    bf16_compute: bool = False,
) -> Callable[..., Tuple[TrainState, Dict[str, jax.Array]]]:
    """Returns a jitted train_step(state, batch, labels[, nac_labels]) ->
    (state, metrics).

    labels: (B, Td) int32 target token ids with -100 padding (the reference
    tokenizes a randomly chosen gold answer, src/VT5.py:209-213; ingest does
    the same on host).

    With use_nac, nac_labels (B,) float32 {0,1} marks not-answerable samples
    and the step adds nac_loss_weight * BCE(NAC probs, nac_labels) — the
    reference's DUDE NAC term (train.py:72-86). The NAC sees the generator
    input embeddings and the embeddings of the *predicted* answer, so the
    step runs an on-device greedy decode (stop-gradient; only the NAC MLP
    receives this gradient), exactly like the reference's
    return_pred_answer=True training forward (src/RAGVT5.py:382-384).

    bf16_compute: standard mixed precision — f32 master weights, forward/
    backward matmuls in bf16 (params cast inside the loss; the cast's VJP
    accumulates gradients back to f32). ~2x MXU rate + half the activation
    HBM on TPU; losses/softmax still accumulate in f32 inside the models.

    remat: True checkpoints the WHOLE forward (keeps matmul outputs — the
    flash custom_vjp still saves every layer's residuals as stacked
    (L, B, H, T, dk) buffers, so peak memory stays O(L)); "layer"
    checkpoints each encoder/decoder layer individually
    (T5Config.remat_layers), capping the peak at one layer's residuals and
    roughly doubling the trainable batch per chip.
    """
    acfg = rag_cfg.assemble()
    if remat == "layer":
        import dataclasses

        vt5_cfg = dataclasses.replace(
            vt5_cfg, t5=dataclasses.replace(vt5_cfg.t5, remat_layers=True)
        )
        remat = False
    elif remat not in (False, True):
        raise ValueError(f"remat must be False, True, or 'layer'; got {remat!r}")

    def step_fn(state: TrainState, batch: ChunkedBatch, labels: jax.Array, nac_labels=None):
        def loss_fn(params):
            if bf16_compute:
                params = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
                    params,
                )
            ret = retrieve_device(
                jax.lax.stop_gradient(params["t5"]["shared"]),
                batch,
                k=rag_cfg.chunk_num,
                oracle=rag_cfg.page_retrieval == "oracle",
            )
            gen, _ = assemble_concat(batch, ret.top_k_idx, ret.top_k_valid, acfg)
            fwd = vt5m.forward_train
            if remat:
                # rematerialize the forward on the backward pass, keeping only
                # matmul outputs (jax.checkpoint dots_saveable policy): trades
                # ~1/3 extra FLOPs for activation memory — the standard lever
                # for scaling batch/sequence on HBM-bound chips.
                fwd = jax.checkpoint(
                    vt5m.forward_train,
                    policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                    static_argnums=(1,),
                )
            loss, logits = fwd(params, vt5_cfg, gen, labels)
            aux: Dict[str, jax.Array] = {}
            if use_nac:
                from rag_docvqa_tpu.models.embeddings import spatial_embed
                from rag_docvqa_tpu.models.nac import nac_bce_loss, nac_prob

                sg = jax.lax.stop_gradient
                frozen = sg(params)
                tokens, _ = vt5m.generate(frozen, vt5_cfg, gen, max_new_tokens=nac_decode_len)
                ans_emb = frozen["t5"]["shared"][tokens]
                ans_mask = (tokens != vt5_cfg.t5.pad_id) & (tokens != vt5_cfg.t5.eos_id)
                sem = frozen["t5"]["shared"][gen.input_ids]
                spa = spatial_embed(frozen["spatial"], vt5_cfg.spatial, gen.input_boxes)
                probs = nac_prob(params["nac"], sem + spa, ans_emb,
                                 input_mask=gen.attention_mask, answer_mask=ans_mask)
                nac_loss = nac_bce_loss(probs, nac_labels, pos_weight=nac_pos_weight)
                loss = loss + nac_loss_weight * nac_loss
                aux["nac_loss"] = nac_loss
                aux["nac_accuracy"] = jnp.mean(((probs > 0.5) == (nac_labels > 0.5)).astype(jnp.float32))
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **aux}
        # per-module grad norms (reference train.py:23-28,91-98)
        for name, sub in grads.items():
            metrics[f"grad_norm/{name}"] = optax.global_norm(sub)
        return new_state, metrics

    # Sharded execution: callers `jax.device_put` params with
    # NamedSharding(mesh, vt5_param_spec(...)) and the batch with
    # NamedSharding(mesh, P("data")); jit then propagates the shardings and
    # GSPMD inserts the collectives (see __graft_entry__.dryrun_multichip).
    return jax.jit(step_fn, donate_argnums=(0,))


def make_hivt5_train_step(
    hivt5_cfg,
    tx: optax.GradientTransformation,
    remat: Any = False,  # False | True (whole forward) | "layer" (per layer)
    bf16_compute: bool = False,
):
    """Hi-VT5 training step: LM CE + weighted page-retrieval CE
    (reference train.py:69 adds outputs.ret_loss). Returns
    step(state, batch, labels) -> (state, metrics).

    remat accepts the same values as make_train_step: "layer" checkpoints
    each encoder/decoder layer (T5Config.remat_layers); True checkpoints the
    whole forward. "layer" matters most here: the hierarchical encode runs
    with pages-in-batch (an effective batch of B * n_pages sequences), so the
    stacked per-layer flash residuals grow with page count.

    bf16_compute mirrors make_train_step: f32 master weights, forward/
    backward matmuls in bf16 (params cast inside the loss; the cast's VJP
    accumulates gradients back to f32). It is also what ENGAGES the fused
    whole-layer train kernels for the pages-in-batch encode — forward_train
    requests fused="train", and the kernel gate sizes VMEM from the
    activation itemsize, so f32 activations fall back to the flash fwd+bwd
    pair at roughly half the MXU rate."""
    from rag_docvqa_tpu.models import hivt5 as hivt5_mod

    if remat == "layer":
        import dataclasses

        hivt5_cfg = dataclasses.replace(
            hivt5_cfg, t5=dataclasses.replace(hivt5_cfg.t5, remat_layers=True)
        )
        remat = False
    elif remat not in (False, True):
        raise ValueError(f"remat must be False, True, or 'layer'; got {remat!r}")

    fwd = hivt5_mod.forward_train
    if remat:
        fwd = jax.checkpoint(
            hivt5_mod.forward_train,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            static_argnums=(1,),
        )

    def step_fn(state: TrainState, batch: ChunkedBatch, labels: jax.Array):
        def loss_fn(params):
            if bf16_compute:
                params = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
                    params,
                )
            loss, aux = fwd(params, hivt5_cfg, batch, labels)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        metrics = {
            "loss": loss,
            "lm_loss": aux["lm_loss"],
            "ret_loss": aux["ret_loss"],
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))
