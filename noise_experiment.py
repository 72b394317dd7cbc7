#!/usr/bin/env python
"""Noise-robustness experiment (reference noise_experiment.py).

Sweeps noise_pages x seeds over a dataset wrapped in NoisePagesWrapper and
reports mean +/- std of accuracy/ANLS/retrieval-precision, broken down by the
document's seed page count (noise_experiment.py:96-175,272-275).

    python noise_experiment.py -m configs/VT5_tiny.yml -d configs/Synthetic.yml \
        --noise-pages 0 3 20 --seeds 0 1 --platform cpu
"""

from __future__ import annotations

import argparse
import json
from collections import defaultdict


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model", required=True)
    parser.add_argument("-d", "--dataset", required=True)
    parser.add_argument("--noise-pages", type=int, nargs="+", default=[0, 3, 20])
    parser.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    parser.add_argument("--split", default="val")
    parser.add_argument("--save-path", default=None)
    parser.add_argument("--platform", choices=("default", "cpu", "tpu"), default="default")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from train import build_docs, parse_overrides

    from rag_docvqa_tpu.config import (
        build_caps, build_chunk_spec, build_rag_config, build_vt5_config, load_config,
    )
    from rag_docvqa_tpu.data import DocVQAIngestor, load_tokenizer
    from rag_docvqa_tpu.data.datasets import NoisePagesWrapper
    from rag_docvqa_tpu.engine import RAGVT5Engine
    from rag_docvqa_tpu.engine.evaluate import evaluate
    from rag_docvqa_tpu.metrics import Evaluator
    from rag_docvqa_tpu.models import vt5 as vt5m

    config = load_config(model=args.model, dataset=args.dataset, overrides=parse_overrides(args.overrides))
    tokenizer = load_tokenizer(config.get("tokenizer"))
    vt5_cfg = build_vt5_config(config, tokenizer.vocab_size)
    rag_cfg = build_rag_config(config)
    params = vt5m.init_vt5_params(jax.random.PRNGKey(config["seed"]), vt5_cfg)
    engine = RAGVT5Engine(rag_cfg, vt5_cfg, params, tokenizer)
    base_docs = build_docs(config, args.split)

    # per-document seed page counts (reference breaks results down per
    # document's own page count, noise_experiment.py:96-175)
    qid_to_seed_pages = {d.question_id: len(d.words) for d in base_docs}

    results = {}
    for n_noise in args.noise_pages:
        per_seed = defaultdict(list)  # metric -> list over seeds
        by_pages = defaultdict(lambda: defaultdict(list))  # page count -> metric -> list
        for seed in args.seeds:
            # noise pool from the documents themselves (v2 semantics)
            class _ListDS:
                def __init__(self, docs):
                    self.docs = docs

                def __len__(self):
                    return len(self.docs)

                def __getitem__(self, i):
                    return self.docs[i]

                def __iter__(self):
                    return iter(self.docs)

            noisy = NoisePagesWrapper(_ListDS(base_docs), noise_pages=n_noise, mix=True, seed=seed)
            docs = [noisy[i] for i in range(len(noisy))]
            # caps must absorb the extra pages/chunks/slots the noise adds
            ingestor = DocVQAIngestor(tokenizer, build_chunk_spec(config), build_caps(config))
            ingestor.caps = ingestor.plan_caps(docs)
            out = evaluate(engine, docs, ingestor, Evaluator(), batch_size=config.get("batch_size", 8))
            for k in ("accuracy", "anls", "retrieval_precision", "chunk_score"):
                per_seed[k].append(out[k])
            for qid, s in out["scores_by_samples"].items():
                seed_pages = qid_to_seed_pages.get(qid, 0)
                by_pages[seed_pages]["anls"].append(s["anls"])
                by_pages[seed_pages]["retrieval_precision"].append(s["retrieval_precision"])

        results[n_noise] = {
            k: {"mean": float(np.mean(v)), "std": float(np.std(v))} for k, v in per_seed.items()
        }
        results[n_noise]["by_seed_pages"] = {
            str(p): {m: {"mean": float(np.mean(vals)), "std": float(np.std(vals))} for m, vals in metrics.items()}
            for p, metrics in by_pages.items()
        }
        print(json.dumps({"noise_pages": n_noise, **{k: results[n_noise][k] for k in ("accuracy", "anls", "retrieval_precision")}}))

    if args.save_path:
        with open(args.save_path, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
