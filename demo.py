#!/usr/bin/env python
"""Interactive demo (reference demo.py / demo2.py).

Loads a corpus (synthetic by default, or any configured dataset / a PDF via
--pdf), then answers questions showing the retrieval steps: top-k chunks
with scores, pages, and the generated answer — the same `return_steps`
introspection the reference exposes (src/RAGVT5.py:281-288).

Three front-ends over one session:
  * one-shot (`-q`) and terminal REPL (default);
  * `--save-viz DIR` writes per-page step-overlay PNGs (layout boxes green,
    chunk boxes blue, retrieved regions red — reference demo.py:68-178);
  * `--serve PORT` runs a browser UI on the stdlib http.server — the
    reference's Gradio app (demo.py:24-66, demo2.py:160-192: question box,
    answer + confidence, retrieval gallery) without the gradio dependency,
    which this image doesn't ship. POST /ask {"question": ...} returns the
    same JSON the UI renders, so it doubles as a serving endpoint.

    python demo.py -m configs/VT5_tiny.yml -d configs/Synthetic.yml --platform cpu
    python demo.py -m configs/VT5_tiny.yml --pdf some.pdf --platform cpu
    python demo.py -m configs/VT5_tiny.yml -d configs/Synthetic.yml --platform cpu --serve 7860
"""

from __future__ import annotations

import argparse
import base64
import http.server
import json
import os
import tempfile
import threading

_INDEX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>rag_docvqa_tpu demo</title>
<style>
  body { font-family: system-ui, sans-serif; margin: 2rem auto; max-width: 60rem;
         color: #1a1a1a; }
  h1 { font-size: 1.3rem; }
  #qrow { display: flex; gap: .5rem; }
  #q { flex: 1; font-size: 1rem; padding: .5rem; }
  button { font-size: 1rem; padding: .5rem 1.2rem; cursor: pointer; }
  #answer { font-size: 1.15rem; margin: 1rem 0 .25rem; }
  #conf { color: #666; font-size: .9rem; }
  table { border-collapse: collapse; margin-top: 1rem; width: 100%; }
  td, th { border: 1px solid #ddd; padding: .35rem .6rem; font-size: .9rem;
           text-align: left; vertical-align: top; }
  th { background: #f5f5f5; }
  #pages { display: flex; flex-wrap: wrap; gap: .75rem; margin-top: 1rem; }
  #pages img { max-width: 18rem; border: 1px solid #ccc; }
  #status { color: #999; margin-top: .5rem; }
</style></head><body>
<h1>rag_docvqa_tpu &mdash; retrieve &rarr; answer demo</h1>
<div id="qrow">
  <input id="q" placeholder="Ask a question about the loaded document&hellip;"
         onkeydown="if(event.key==='Enter')ask()">
  <button onclick="ask()">Ask</button>
</div>
<div id="status"></div>
<div id="answer"></div><div id="conf"></div>
<div id="chunks"></div>
<div id="pages"></div>
<script>
async function ask() {
  const q = document.getElementById('q').value.trim();
  if (!q) return;
  document.getElementById('status').textContent = 'retrieving + generating…';
  try {
    const r = await fetch('/ask', {method: 'POST',
      headers: {'Content-Type': 'application/json'},
      body: JSON.stringify({question: q})});
    const d = await r.json();
    if (!r.ok) throw new Error(d.error || r.statusText);
    document.getElementById('status').textContent = '';
    document.getElementById('answer').textContent = 'A: ' + JSON.stringify(d.answer);
    document.getElementById('conf').textContent =
      d.confidence == null ? '' : 'confidence ' + Number(d.confidence).toFixed(4);
    let h = '';
    if (d.chunks && d.chunks.length) {
      h = '<table><tr><th>#</th><th>page</th><th>score</th><th>chunk text</th></tr>';
      for (const c of d.chunks)
        h += `<tr><td>${c.rank}</td><td>${c.page ?? ''}</td>` +
             `<td>${c.score == null ? '' : c.score.toFixed(4)}</td>` +
             `<td>${(c.text || '').replace(/</g, '&lt;')}</td></tr>`;
      h += '</table>';
    }
    document.getElementById('chunks').innerHTML = h;
    document.getElementById('pages').innerHTML = (d.viz_png_b64 || [])
      .map(b => `<img src="data:image/png;base64,${b}">`).join('');
  } catch (e) {
    document.getElementById('status').textContent = 'error: ' + e.message;
  }
}
</script></body></html>
"""


def build_session(args):
    """Build the engine + ingestor once; return (ask, describe) where
    ask(question, viz_dir=None) -> structured result dict."""
    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

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
        describe = (f"Loaded PDF: {len(words)} pages, "
                    f"{sum(len(w) for w in words)} words")
    else:
        docs = build_docs(config, "val")
        base_doc = docs[args.doc]
        describe = (f"Loaded doc {args.doc}: {len(base_doc.words)} pages; "
                    f"dataset question: {base_doc.question!r} (gt: {base_doc.answers})")

    def ask(question: str, viz_dir=None):
        doc = RawDocument(
            question=question, words=base_doc.words, boxes=base_doc.boxes,
            answers=base_doc.answers, answer_page_idx=base_doc.answer_page_idx,
            images=base_doc.images, layout=base_doc.layout,
        )
        batch, aux = ingestor.ingest([doc])
        out = engine.inference(batch, aux)
        ret = out.get("retrieval", {}) or {}
        pages = out["pred_answer_pages"][0]
        if not isinstance(pages, list):
            pages = [pages]
        sims = ret.get("similarities")
        chunks = []
        for r, text in enumerate(ret.get("text", [[]])[0]):
            chunks.append({
                "rank": r,
                "page": int(pages[r]) if r < len(pages) else None,
                "score": float(np.asarray(sims)[0][r]) if sims is not None else None,
                "text": text,
            })
        conf = out["confidences"][0]
        result = {
            "question": question,
            "answer": out["pred_answers"][0],
            "confidence": conf if conf is None or isinstance(conf, list) else float(conf),
            "chunks": chunks,
        }
        if viz_dir:
            from rag_docvqa_tpu.utils_viz import save_step_overlays

            result["viz_paths"] = save_step_overlays(doc, batch, out, viz_dir)
        return result

    return ask, describe


def make_server(ask, port: int, host: str = "127.0.0.1"):
    """stdlib HTTP server over ask(): GET / serves the UI, POST /ask runs a
    query (engine access serialized by a lock) and inlines the step-overlay
    PNGs as base64. Returns the (not yet running) ThreadingHTTPServer."""
    lock = threading.Lock()

    class Handler(http.server.BaseHTTPRequestHandler):
        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                self._send(200, _INDEX_HTML.encode(), "text/html; charset=utf-8")
            else:
                self._send(404, b'{"error": "not found"}', "application/json")

        def do_POST(self):
            if self.path != "/ask":
                return self._send(404, b'{"error": "not found"}', "application/json")
            try:
                n = int(self.headers.get("Content-Length") or 0)
                req = json.loads(self.rfile.read(n) or b"{}")
                question = str(req.get("question", "")).strip()
                if not question:
                    return self._send(
                        400, b'{"error": "empty question"}', "application/json")
                with lock, tempfile.TemporaryDirectory() as td:
                    result = ask(question, viz_dir=td)
                    pngs = []
                    for p in result.pop("viz_paths", []):
                        with open(p, "rb") as f:
                            pngs.append(base64.b64encode(f.read()).decode())
                result["viz_png_b64"] = pngs
                self._send(200, json.dumps(result).encode(), "application/json")
            except Exception as e:  # surface engine errors to the client
                self._send(500, json.dumps({"error": str(e)}).encode(),
                           "application/json")

        def log_message(self, *a):  # quiet access log
            pass

    return http.server.ThreadingHTTPServer((host, port), Handler)


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
    parser.add_argument("--serve", type=int, default=None, metavar="PORT",
                        help="browser UI on http://127.0.0.1:PORT (the reference's "
                             "Gradio demo on the stdlib http.server)")
    parser.add_argument("--host", default="127.0.0.1", help="--serve bind address")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    ask, describe = build_session(args)
    print(describe)

    if args.serve is not None:
        httpd = make_server(ask, args.serve, args.host)
        host, port = httpd.server_address[:2]
        print(f"Serving demo UI on http://{host}:{port} (Ctrl-C to stop)")
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            httpd.shutdown()
        return

    def show(question: str):
        if args.save_viz:
            os.makedirs(args.save_viz, exist_ok=True)
        result = ask(question, viz_dir=args.save_viz)
        print(f"\nQ: {question}")
        for c in result["chunks"]:
            snippet = c["text"] if len(c["text"]) < 100 else c["text"][:97] + "..."
            print(f"  [chunk {c['rank']}] page {c['page']}: {snippet}")
        conf = result["confidence"]
        conf_s = f"{conf:.4f}" if isinstance(conf, float) else repr(conf)
        print(f"A: {result['answer']!r}  (conf {conf_s})")
        if "viz_paths" in result:
            print(f"step overlays: {', '.join(result['viz_paths'])}")

    if args.question:
        show(args.question)
        return
    print("Type a question (empty line to exit).")
    while True:
        try:
            q = input("> ").strip()
        except EOFError:
            break
        if not q:
            break
        show(q)


if __name__ == "__main__":
    main()
