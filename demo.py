#!/usr/bin/env python
"""Interactive demo (reference demo.py / demo2.py, terminal edition).

Loads a corpus (synthetic by default, or any configured dataset / a PDF via
--pdf), then answers questions interactively showing the retrieval steps:
top-k chunks with scores, pages, and the generated answer. A Gradio UI like
the reference's is intentionally out of scope for a headless image; this CLI
exposes the same `return_steps` introspection (src/RAGVT5.py:281-288).

    python demo.py -m configs/VT5_tiny.yml -d configs/Synthetic.yml --platform cpu
    python demo.py -m configs/VT5_tiny.yml --pdf some.pdf --platform cpu
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model", required=True)
    parser.add_argument("-d", "--dataset", default=None)
    parser.add_argument("--pdf", default=None, help="ad-hoc PDF ingestion (demo2.py path)")
    parser.add_argument("--doc", type=int, default=0, help="document index to query")
    parser.add_argument("--platform", choices=("default", "cpu", "tpu"), default="default")
    parser.add_argument("-q", "--question", default=None, help="one-shot question (else REPL)")
    parser.add_argument("--save-viz", default=None, metavar="DIR",
                        help="write per-page step-overlay PNGs (layout boxes green, "
                             "chunk boxes blue, retrieved regions red — the reference "
                             "demo's visualization, demo.py:68-178)")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)

    from train import build_docs, parse_overrides

    from rag_docvqa_tpu.config import (
        build_caps, build_chunk_spec, build_rag_config, build_vt5_config, load_config,
    )
    from rag_docvqa_tpu.data import DocVQAIngestor, load_tokenizer
    from rag_docvqa_tpu.data.contract import RawDocument
    from rag_docvqa_tpu.engine import RAGVT5Engine
    from rag_docvqa_tpu.models import vt5 as vt5m

    config = load_config(
        model=args.model,
        dataset=args.dataset,
        dataset_dict={} if args.dataset is None else None,
        overrides=parse_overrides(args.overrides),
    )
    tokenizer = load_tokenizer(config.get("tokenizer"))
    vt5_cfg = build_vt5_config(config, tokenizer.vocab_size)
    rag_cfg = build_rag_config(config)
    ingestor = DocVQAIngestor(tokenizer, build_chunk_spec(config), build_caps(config))
    params = vt5m.init_vt5_params(jax.random.PRNGKey(config["seed"]), vt5_cfg)
    engine = RAGVT5Engine(rag_cfg, vt5_cfg, params, tokenizer)

    if args.pdf:
        from rag_docvqa_tpu.data.pdf import load_pdf

        words, boxes, _ = load_pdf(args.pdf, render_images=False)
        base_doc = RawDocument(question="", words=words, boxes=boxes)
        print(f"Loaded PDF: {len(words)} pages, {sum(len(w) for w in words)} words")
    else:
        docs = build_docs(config, "val")
        base_doc = docs[args.doc]
        print(f"Loaded doc {args.doc}: {len(base_doc.words)} pages; "
              f"dataset question: {base_doc.question!r} (gt: {base_doc.answers})")

    def ask(question: str):
        doc = RawDocument(
            question=question, words=base_doc.words, boxes=base_doc.boxes,
            answers=base_doc.answers, answer_page_idx=base_doc.answer_page_idx,
            images=base_doc.images, layout=base_doc.layout,
        )
        batch, aux = ingestor.ingest([doc])
        out = engine.inference(batch, aux)
        print(f"\nQ: {question}")
        for r, (text, page) in enumerate(zip(out["retrieval"].get("text", [[]])[0],
                                             out["pred_answer_pages"][0])):
            snippet = text if len(text) < 100 else text[:97] + "..."
            print(f"  [chunk {r}] page {page}: {snippet}")
        print(f"A: {out['pred_answers'][0]!r}  (conf {out['confidences'][0]:.4f})")
        if args.save_viz:
            from rag_docvqa_tpu.utils_viz import save_step_overlays

            paths = save_step_overlays(doc, batch, out, args.save_viz)
            print(f"step overlays: {', '.join(paths)}")

    if args.question:
        ask(args.question)
        return
    print("Type a question (empty line to exit).")
    while True:
        try:
            q = input("> ").strip()
        except EOFError:
            break
        if not q:
            break
        ask(q)


if __name__ == "__main__":
    main()
