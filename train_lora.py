#!/usr/bin/env python
"""LoRA SFT driver for the Qwen RAG engine (reference train_lora.py).

    python train_lora.py -m configs/Qwen_tiny.yml -d configs/Synthetic.yml \
        [--platform cpu] [k=v ...]

The reference fine-tunes Qwen2.5-VL with TRL's SFTTrainer: r=8 LoRA on the
q/v projections (train_lora.py:267-275), chat-template prompts with
masked-label SFT (:83-250), AdamW + bf16 (:284-324). Here the engine builds
ChatML SFT batches on the retrieved context (engine/rag_qwen.py), adapters
come from models/lora.py, and each step is one jitted loss+update over the
adapter tree only (base weights frozen, exactly PEFT semantics).
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description="rag_docvqa_tpu LoRA SFT")
    parser.add_argument("-m", "--model", required=True)
    parser.add_argument("-d", "--dataset", required=True)
    parser.add_argument("--ckpt", default=None, help="Orbax dir with base LM params")
    parser.add_argument("--save-dir", default=None, help="where to write the adapter tree")
    parser.add_argument("--platform", choices=("default", "cpu", "tpu"), default="default")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)

    import numpy as np
    import optax

    from train import build_docs, parse_overrides

    from rag_docvqa_tpu.config import build_caps, build_chunk_spec, load_config
    from rag_docvqa_tpu.data import DocVQAIngestor, load_tokenizer
    from rag_docvqa_tpu.engine.rag_qwen import QwenRAGConfig, RAGQwenEngine
    from rag_docvqa_tpu.models import causal_lm as clm
    from rag_docvqa_tpu.models.lora import init_lora, merge_lora

    config = load_config(model=args.model, dataset=args.dataset, overrides=parse_overrides(args.overrides))
    tokenizer = load_tokenizer(config.get("tokenizer"))
    lm_cfg = clm.CausalLMConfig(
        vocab_size=tokenizer.vocab_size,
        d_model=config.get("d_model", 1024),
        num_layers=config.get("num_layers", 12),
        num_heads=config.get("num_heads", 16),
        num_kv_heads=config.get("num_kv_heads", 4),
        d_ff=config.get("d_ff", 2816),
    )
    rag_cfg = QwenRAGConfig(
        chunk_num=config.get("chunk_num", 10),
        max_prompt_tokens=config.get("max_prompt_tokens", config.get("max_source_length", 512)),
        max_new_tokens=config.get("max_new_tokens", 16),
        answer_max_tokens=config.get("answer_max_tokens", 24),
    )
    params = clm.init_causal_lm_params(jax.random.PRNGKey(config["seed"]), lm_cfg)
    if config.get("ckpt") or args.ckpt:
        from rag_docvqa_tpu.models.loader import load_orbax_params

        params = load_orbax_params(args.ckpt or config["ckpt"], params)
    engine = RAGQwenEngine(rag_cfg, lm_cfg, params, tokenizer)
    ingestor = DocVQAIngestor(tokenizer, build_chunk_spec(config), build_caps(config))

    # r=8 on q/v projections (reference train_lora.py:267-275)
    lora = init_lora(
        jax.random.PRNGKey(config["seed"] + 1), params,
        targets=tuple(config.get("lora_targets", ("q", "v"))),
        rank=config.get("lora_rank", 8),
    )
    tx = optax.adamw(float(config.get("lr", 1e-4)), weight_decay=config.get("weight_decay", 0.0))
    opt_state = tx.init(lora)

    @jax.jit
    def step(lora, opt_state, ids, mask, labels):
        def loss_fn(l):
            return clm.sft_loss(merge_lora(params, l), lm_cfg, ids, mask, labels)

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = tx.update(grads, opt_state, lora)
        return optax.apply_updates(lora, updates), opt_state, loss

    train_docs = build_docs(config, "train")
    bs = config.get("batch_size", 4)
    epochs = config.get("train_epochs", 1)
    rng = np.random.RandomState(config["seed"])
    t0 = time.time()
    for epoch in range(epochs):
        order = rng.permutation(len(train_docs))
        losses = []
        for start in range(0, len(order) - bs + 1, bs):
            docs = [train_docs[i] for i in order[start : start + bs]]
            batch, aux = ingestor.ingest(docs)
            ids, mask, labels = engine.build_sft_batch(batch, aux, seed=int(rng.randint(1 << 30)))[:3]
            lora, opt_state, loss = step(lora, opt_state, ids, mask, labels)
            losses.append(float(loss))
        print(f"epoch={epoch} sft_loss={np.mean(losses):.4f} wall={time.time() - t0:.1f}s")

    if args.save_dir or config.get("save_dir"):
        from rag_docvqa_tpu.training.checkpoint import save_params

        out = args.save_dir or config["save_dir"]
        save_params(out, lora)
        print(f"adapters saved to {out}")
    return lora


if __name__ == "__main__":
    main()
