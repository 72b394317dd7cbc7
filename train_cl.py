#!/usr/bin/env python
"""Contrastive retriever fine-tuning driver (reference generate_CL_trainset.py
+ train_CL_embs.py).

    # stage 1: mine (question, chunk) positives via AnyConf inference
    python train_cl.py mine -m configs/VT5_tiny.yml -d configs/Synthetic.yml \
        --pairs /tmp/pairs.jsonl --platform cpu

    # stage 2: fine-tune the embedder on the mined pairs
    python train_cl.py train -m configs/VT5_tiny.yml --pairs /tmp/pairs.jsonl \
        --out /tmp/embedder_ckpt --platform cpu

Mining keeps retrieved chunks whose per-chunk answer reaches ANLS > 0.8
(generate_CL_trainset.py:61-72); training runs MultipleNegativesRankingLoss
(= in-batch InfoNCE at scale 20) or the CLIP-style symmetric variant
(train_CL_embs.py:15-50) over the VT5 shared-table embedder.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    parser = argparse.ArgumentParser(description="contrastive embedder fine-tune")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_mine = sub.add_parser("mine")
    p_mine.add_argument("-m", "--model", required=True)
    p_mine.add_argument("-d", "--dataset", required=True)
    p_mine.add_argument("--split", default="train")
    p_mine.add_argument("--pairs", required=True)
    p_mine.add_argument("--anls-threshold", type=float, default=0.8)
    p_mine.add_argument("overrides", nargs="*")

    p_train = sub.add_parser("train")
    p_train.add_argument("-m", "--model", required=True)
    p_train.add_argument("--pairs", required=True)
    p_train.add_argument("--out", default=None, help="Orbax dir for the tuned embedder params")
    p_train.add_argument("--loss", choices=("mnrl", "clip"), default="mnrl")
    p_train.add_argument("overrides", nargs="*")

    for p in (p_mine, p_train):
        p.add_argument("--platform", choices=("default", "cpu", "tpu"), default="default")
    args = parser.parse_args(argv)

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)

    from train import build_docs, parse_overrides

    from rag_docvqa_tpu.config import (
        build_caps, build_chunk_spec, build_rag_config, build_vt5_config, load_config,
    )
    from rag_docvqa_tpu.data import DocVQAIngestor, load_tokenizer
    from rag_docvqa_tpu.models import vt5 as vt5m
    from rag_docvqa_tpu.training.contrastive import (
        ContrastiveConfig, load_pairs, mine_positive_pairs, save_pairs, train_contrastive,
    )

    config = load_config(model=args.model,
                         dataset=getattr(args, "dataset", None),
                         overrides=parse_overrides(args.overrides))
    tokenizer = load_tokenizer(config.get("tokenizer"))
    vt5_cfg = build_vt5_config(config, tokenizer.vocab_size)
    params = vt5m.init_vt5_params(jax.random.PRNGKey(config["seed"]), vt5_cfg)

    if args.cmd == "mine":
        import dataclasses

        from rag_docvqa_tpu.engine.rag_vt5 import RAGVT5Engine

        # AnyConf produces one answer per retrieved chunk (the mining signal)
        rag_cfg = dataclasses.replace(build_rag_config(config), page_retrieval="anyconf")
        engine = RAGVT5Engine(rag_cfg, vt5_cfg, params, tokenizer)
        ingestor = DocVQAIngestor(tokenizer, build_chunk_spec(config), build_caps(config))
        docs = build_docs(config, args.split)
        pairs = mine_positive_pairs(engine, docs, ingestor,
                                    anls_threshold=args.anls_threshold,
                                    batch_size=config.get("batch_size", 8))
        save_pairs(args.pairs, pairs)
        print(json.dumps({"n_pairs": len(pairs), "n_docs": len(docs), "out": args.pairs}))
        return pairs

    pairs = load_pairs(args.pairs)
    from rag_docvqa_tpu.models.embedder import vt5_table_embed

    cl_cfg = ContrastiveConfig(
        lr=float(config.get("lr", 2e-5)),
        epochs=config.get("train_epochs", 15),
        batch_size=config.get("batch_size", 32),
        loss=args.loss,
        max_tokens=config.get("embed_tokens", 64),
        seed=config["seed"],
    )
    embed_params = {"shared": params["t5"]["shared"]}
    tuned, losses = train_contrastive(
        lambda p, ids, mask: vt5_table_embed(p["shared"], ids, mask),
        embed_params, tokenizer, pairs, cl_cfg,
    )
    print(json.dumps({"n_pairs": len(pairs), "loss_first": round(losses[0], 4) if losses else None,
                      "loss_last": round(losses[-1], 4) if losses else None}))
    if args.out:
        from rag_docvqa_tpu.training.checkpoint import save_params

        save_params(args.out, tuned)
        print(f"embedder saved to {args.out}")
    return tuned


if __name__ == "__main__":
    main()
