#!/usr/bin/env python
"""Evaluation CLI (reference eval.py:443-570).

    python eval.py -m configs/VT5_tiny.yml -d configs/Synthetic.yml [k=v ...]

Runs the engine over the validation split with the configured page-retrieval
strategy; reports accuracy/ANLS/retrieval-precision/chunk-score with timing
splits and writes a JSON results snapshot. Supports sweep configs via
list-valued keys (replaces multi_eval.sh + flatten_multi_yml.py).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description="rag_docvqa_tpu evaluation")
    parser.add_argument("-m", "--model", required=True)
    parser.add_argument("-d", "--dataset", required=True)
    parser.add_argument("--split", default="val")
    parser.add_argument("--ckpt", default=None, help="Orbax checkpoint dir (from train.py)")
    parser.add_argument("--hf-weights", default=None, help="local HF checkpoint dir (converted on load)")
    parser.add_argument("--save-path", default=None)
    parser.add_argument("--sweep", action="store_true", help="expand list-valued config keys into a sweep")
    parser.add_argument("--data-parallel", action="store_true",
                        help="shard eval batches over all devices (mesh 'data' axis)")
    parser.add_argument("--platform", choices=("default", "cpu", "tpu"), default="default",
                        help="force a JAX platform (cpu for smoke runs; the host may pin a TPU)")
    parser.add_argument("--ingest-workers", type=int, default=0,
                        help="shard host ingest over N worker processes "
                             "(data/ingest_mp.py; the reference's DataLoader "
                             "num_workers role). 0 = in-process ingest")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from train import (
        _default_tokenizer_from_ckpt,
        build_docs,
        parse_overrides,
        resolve_params,
        restore_hash_vocab,
    )

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)

    from rag_docvqa_tpu.config import (
        build_caps,
        build_chunk_spec,
        build_rag_config,
        build_vt5_config,
        expand_sweep,
        load_config,
    )
    from rag_docvqa_tpu.data import DocVQAIngestor, load_tokenizer
    from rag_docvqa_tpu.engine import RAGVT5Engine
    from rag_docvqa_tpu.engine.evaluate import evaluate
    from rag_docvqa_tpu.metrics import Evaluator
    from rag_docvqa_tpu.models import vt5 as vt5m

    overrides = parse_overrides(args.overrides)
    if args.ckpt:
        overrides["ckpt"] = args.ckpt
    if args.hf_weights:
        overrides["hf_weights"] = args.hf_weights
    base = load_config(model=args.model, dataset=args.dataset, overrides=overrides)
    configs = list(expand_sweep(base)) if args.sweep else [base]

    results = []
    for run_idx, config in enumerate(configs):
        _default_tokenizer_from_ckpt(config)
        tokenizer = load_tokenizer(config.get("tokenizer"))
        restore_hash_vocab(config, tokenizer)
        model_name = str(config.get("model_name", "VT5")).lower()
        is_hivt5 = model_name in ("hi-vt5", "hivt5")
        # "custom"/oracle windowing for hierarchical models lives in the
        # dataset/ingest layer; RAGConfig drives only the chunked engines
        from rag_docvqa_tpu.engine import RAGConfig as _RC

        rag_cfg = _RC() if is_hivt5 else build_rag_config(config)
        if args.ingest_workers > 0:
            from rag_docvqa_tpu.data.ingest_mp import MPIngestor

            ingestor = MPIngestor(tokenizer, build_chunk_spec(config), build_caps(config),
                                  num_workers=args.ingest_workers)
        else:
            ingestor = DocVQAIngestor(tokenizer, build_chunk_spec(config), build_caps(config))
        docs = build_docs(config, args.split)
        # long-doc datasets: size caps to the data so no page is dropped
        # (default on for MMLongBenchDoc; the reference retrieves over all
        # pages, src/MMLongBenchDoc.py:44-71)
        if config.get("auto_caps", config.get("dataset_name") == "MMLongBenchDoc"):
            ingestor.caps = ingestor.plan_caps(docs)
        key = jax.random.PRNGKey(config["seed"])
        if is_hivt5:
            from rag_docvqa_tpu.config import build_hivt5_config
            from rag_docvqa_tpu.models import hivt5 as hivt5m

            hivt5_cfg = build_hivt5_config(config, tokenizer.vocab_size)
            params = hivt5m.init_hivt5_params(key, hivt5_cfg)
            params = resolve_params(config, params, hivt5_cfg, kind="hivt5")
        elif model_name in ("pix2struct", "ragpix2struct"):
            from rag_docvqa_tpu.config import build_p2s_config
            from rag_docvqa_tpu.models import pix2struct as p2s

            p2s_cfg = build_p2s_config(config, tokenizer.vocab_size)
            params = p2s.init_p2s_params(key, p2s_cfg)
            params = resolve_params(config, params, p2s_cfg, kind="pix2struct")
        elif model_name in ("qwen", "qwen2", "qwen2.5-vl", "ragqwen"):
            from rag_docvqa_tpu.config import build_qwen_config
            from rag_docvqa_tpu.models import causal_lm as clm

            lm_cfg = build_qwen_config(config, tokenizer.vocab_size)
            params = clm.init_causal_lm_params(key, lm_cfg)
            params = resolve_params(config, params, lm_cfg, kind="qwen")
        else:
            vt5_cfg = build_vt5_config(config, tokenizer.vocab_size)
            params = vt5m.init_vt5_params(key, vt5_cfg)
            params = resolve_params(config, params, vt5_cfg)
        from rag_docvqa_tpu.config import build_engine

        engine = build_engine(config, params, tokenizer)

        save_path = args.save_path
        if save_path and len(configs) > 1:
            stem, ext = os.path.splitext(save_path)
            save_path = f"{stem}_{run_idx}{ext or '.json'}"

        mesh = None
        if args.data_parallel and len(jax.devices()) > 1:
            from rag_docvqa_tpu.parallel import create_mesh

            mesh = create_mesh((len(jax.devices()), 1), ("data", "model"))

        t0 = time.time()
        out = evaluate(
            engine, docs, ingestor, Evaluator(),
            batch_size=config.get("batch_size", 8),
            save_path=save_path, save_continuously=config.get("save_continuously", False),
            compute_stats=config.get("compute_stats", False),
            mesh=mesh,
        )
        summary = {k: out[k] for k in ("accuracy", "anls", "retrieval_precision", "chunk_score", "n_samples")}
        if "mmlongbench" in out:
            summary["mmlongbench"] = out["mmlongbench"]
        summary["page_retrieval"] = str(config.get("page_retrieval", rag_cfg.page_retrieval))
        summary["wall_time"] = round(time.time() - t0, 2)
        print(json.dumps(summary))
        results.append(summary)
        if hasattr(ingestor, "close"):  # MPIngestor: shut the worker pool down
            ingestor.close()
    return results


if __name__ == "__main__":
    main()
