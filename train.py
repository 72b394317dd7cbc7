#!/usr/bin/env python
"""Training CLI (reference train.py:194-305).

    python train.py -m configs/VT5_tiny.yml -d configs/Synthetic.yml [k=v ...]

Builds the VT5 engine + dataset from layered YAML configs, trains with AdamW/
linear-warmup/clip-3.0, evaluates each epoch, and checkpoints the best model.
`dataset_name: Synthetic` trains on the planted-fact corpus (no external data
needed); real datasets use the loaders in rag_docvqa_tpu.data.datasets.
"""

from __future__ import annotations

import argparse
import sys


def parse_overrides(pairs):
    """key=value CLI overrides (reference eval.py:517-536); values parse as
    Python literals when possible ("[2,3]" -> list, "0.5" -> float)."""
    import ast

    out = {}
    for kv in pairs:
        k, _, v = kv.partition("=")
        if v in ("true", "True"):
            v = True
        elif v in ("false", "False"):
            v = False
        else:
            try:
                v = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                pass  # keep as string
        out[k] = v
    return out


def build_docs(config, split):
    if config.get("dataset_name") == "Synthetic":
        from rag_docvqa_tpu.data.synthetic import make_corpus

        n = config.get("n_train_docs", 64) if split == "train" else config.get("n_val_docs", 16)
        docs = make_corpus(
            n,
            n_pages=config.get("n_pages", 4),
            words_per_page=config.get("words_per_page", 120),
            seed=0 if split == "train" else 1,
        )
        if config.get("synthetic_images"):
            # page renders for the OCR-free / visual engines
            import numpy as np

            rng = np.random.RandomState(0 if split == "train" else 1)
            size = config.get("synthetic_image_size", 256)
            for d in docs:
                d.images = [
                    rng.randint(0, 255, (size, size, 3)).astype(np.uint8) for _ in d.words
                ]
        return docs
    from rag_docvqa_tpu.data.datasets import build_dataset

    return list(build_dataset(config, split))


def resolve_params(config, params, model_cfg, hivt5: bool = False, kind: str = None):
    """Overlay checkpoint weights onto random-init params.

    Priority: `ckpt` (Orbax dir from our trainer) > `hf_weights` (local HF
    checkpoint dir, converted via models/loader.py). Mirrors the reference's
    from_pretrained-everything startup (eval.py:443-570)."""
    from rag_docvqa_tpu.models import loader

    if config.get("ckpt"):
        return loader.load_orbax_params(config["ckpt"], params)
    if config.get("hf_weights"):
        kind = kind or ("hivt5" if hivt5 else "vt5")
        return loader.load_params_for(kind, config["hf_weights"], model_cfg, params)
    return params


def restore_hash_vocab(config, tokenizer) -> None:
    """Reload the HashTokenizer reverse map the trainer saved next to an
    Orbax checkpoint, so decode works across the process boundary."""
    import os

    d = config.get("ckpt")
    if d and hasattr(tokenizer, "load_vocab"):
        vocab = os.path.join(d, "hash_tokenizer.json")
        if os.path.exists(vocab):
            tokenizer.load_vocab(vocab)


def _default_tokenizer_from_ckpt(config):
    """Derive defaults from an HF checkpoint dir: its tokenizer
    (src/checkpoint.py:21-28) and its architecture dims from config.json —
    the reference gets both implicitly via from_pretrained."""
    import json
    import os

    d = config.get("hf_weights")
    if not d:
        return
    if not config.get("tokenizer") and any(
        os.path.exists(os.path.join(d, f))
        for f in ("tokenizer_config.json", "tokenizer.json", "spiece.model")
    ):
        config["tokenizer"] = d
    cfg_path = os.path.join(d, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            hf = json.load(f)
        # T5-style keys first, decoder-only (Qwen/Gemma) aliases second
        text = hf.get("text_config", hf)  # Pix2Struct/VLM configs nest text dims
        dims = {
            "d_model": text.get("d_model", text.get("hidden_size")),
            "d_kv": text.get("d_kv"),
            "num_heads": text.get("num_heads", text.get("num_attention_heads")),
            "d_ff": text.get("d_ff", text.get("intermediate_size")),
            "num_layers": text.get("num_layers", text.get("num_hidden_layers")),
            "num_decoder_layers": text.get(
                "num_decoder_layers", text.get("num_layers", text.get("num_hidden_layers"))
            ),
            "num_kv_heads": text.get("num_key_value_heads"),
        }
        for k, v in dims.items():
            if v is not None:
                config[k] = v
        # without a shipped tokenizer, size the hash tokenizer to the
        # checkpoint's vocab so the shared table ids stay in range
        vocab = hf.get("vocab_size", hf.get("text_config", {}).get("vocab_size"))
        if vocab and config.get("tokenizer") in (None, "hash"):
            config["tokenizer"] = f"hash:{vocab}"


def main(argv=None):
    parser = argparse.ArgumentParser(description="rag_docvqa_tpu training")
    parser.add_argument("-m", "--model", required=True, help="model config yml")
    parser.add_argument("-d", "--dataset", required=True, help="dataset config yml")
    parser.add_argument("--ckpt", default=None, help="Orbax checkpoint dir to resume params from")
    parser.add_argument("--hf-weights", default=None, help="local HF checkpoint dir (converted on load)")
    parser.add_argument("--no-eval-start", action="store_false", dest="eval_start", default=True)
    parser.add_argument("--platform", choices=("default", "cpu", "tpu"), default="default",
                        help="force a JAX platform (cpu for smoke runs; the host may pin a TPU)")
    parser.add_argument("overrides", nargs="*", help="key=value config overrides")
    args = parser.parse_args(argv)

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)

    from rag_docvqa_tpu.config import (
        build_caps,
        build_chunk_spec,
        build_rag_config,
        build_vt5_config,
        load_config,
    )
    from rag_docvqa_tpu.data import DocVQAIngestor, load_tokenizer
    from rag_docvqa_tpu.models import vt5 as vt5m
    from rag_docvqa_tpu.training.logger import RunLogger
    from rag_docvqa_tpu.training.trainer import TrainLoopConfig, Trainer

    overrides = parse_overrides(args.overrides)
    if args.ckpt:
        overrides["ckpt"] = args.ckpt
    if args.hf_weights:
        overrides["hf_weights"] = args.hf_weights
    config = load_config(model=args.model, dataset=args.dataset, overrides=overrides)
    _default_tokenizer_from_ckpt(config)
    tokenizer = load_tokenizer(config.get("tokenizer"))
    restore_hash_vocab(config, tokenizer)
    ingestor = DocVQAIngestor(tokenizer, build_chunk_spec(config), build_caps(config))
    hivt5 = str(config.get("model_name", "VT5")).lower() in ("hi-vt5", "hivt5")
    from rag_docvqa_tpu.engine import RAGConfig

    # "custom"/oracle (Hi-VT5's page windowing) is handled by the dataset/
    # ingest layer; the RAGConfig drives only the VT5 retrieval engine
    rag_cfg = RAGConfig() if hivt5 else build_rag_config(config)
    if hivt5:
        from rag_docvqa_tpu.config import build_hivt5_config
        from rag_docvqa_tpu.models import hivt5 as hivt5m

        vt5_cfg = None
        hivt5_cfg = build_hivt5_config(config, tokenizer.vocab_size)
        params = hivt5m.init_hivt5_params(jax.random.PRNGKey(config["seed"]), hivt5_cfg)
        params = resolve_params(config, params, hivt5_cfg, hivt5=True)
    else:
        vt5_cfg = build_vt5_config(config, tokenizer.vocab_size)
        hivt5_cfg = None
        params = vt5m.init_vt5_params(jax.random.PRNGKey(config["seed"]), vt5_cfg)
        params = resolve_params(config, params, vt5_cfg)

    loop_cfg = TrainLoopConfig(
        epochs=config.get("train_epochs", 10),
        batch_size=config.get("batch_size", 8),
        lr=float(config.get("lr", 2e-4)),
        warmup_steps=config.get("warmup_iterations", 1000),
        save_dir=config.get("save_dir"),
        eval_start=args.eval_start,
        seed=config["seed"],
        train_metrics_every=config.get("train_metrics_every", 0),
        log_every=config.get("log_every", 10),
        remat=config.get("remat", False),
        use_nac=bool(config.get("use_not_answerable_classifier", False)
                     and config.get("train_not_answerable_classifier", True)),
        nac_loss_weight=float(config.get("nac_loss_weight", 1.0)),
        nac_threshold=float(config.get("not_answerable_threshold", 0.5)),
    )
    logger = RunLogger(name=config.get("experiment_name"), config=config,
                       use_wandb=config.get("use_wandb", False), log_dir=config.get("save_dir"))
    trainer = Trainer(vt5_cfg, rag_cfg, params, tokenizer, ingestor, loop_cfg,
                      logger=logger, hivt5_cfg=hivt5_cfg)

    train_docs = build_docs(config, "train")
    val_docs = build_docs(config, "val")
    result = trainer.fit(train_docs, val_docs)
    logger.log({"best_accuracy": result["best"]["accuracy"], "best_epoch": result["best"]["epoch"]})
    logger.finish()
    return result


if __name__ == "__main__":
    main()
