"""demo.py --serve: the stdlib browser UI answers over HTTP with the same
introspection payload the terminal REPL prints — the reference's Gradio
demo surface (reference demo.py:24-66, demo2.py:160-192) without the
gradio dependency. Drives the real server over a real socket: UI page,
query round-trip (answer + chunk introspection + per-page overlay PNGs),
and the error path."""

from __future__ import annotations

import base64
import json
import threading
import types
import urllib.error
import urllib.request

import pytest

pytestmark = pytest.mark.slow  # compiles a (tiny) engine


def test_demo_serve_roundtrip():
    import demo

    args = types.SimpleNamespace(
        model="configs/VT5_tiny.yml", dataset="configs/Synthetic.yml",
        pdf=None, doc=0, platform="cpu", overrides=["n_val_docs=2"],
    )
    ask, describe = demo.build_session(args)
    assert "Loaded doc 0" in describe

    httpd = demo.make_server(ask, 0)  # ephemeral port
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        html = urllib.request.urlopen(f"{base}/", timeout=30).read().decode()
        assert "rag_docvqa_tpu" in html and "/ask" in html

        req = urllib.request.Request(
            f"{base}/ask",
            data=json.dumps({"question": "what is the total?"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        out = json.loads(urllib.request.urlopen(req, timeout=300).read())
        assert set(out) >= {"question", "answer", "confidence", "chunks", "viz_png_b64"}
        assert isinstance(out["answer"], str)  # random weights decode to ""
        assert out["chunks"], "retrieval introspection missing"
        assert {"rank", "page", "score", "text"} <= set(out["chunks"][0])
        assert isinstance(out["chunks"][0]["score"], float)
        # one overlay per page, actual PNGs
        assert out["viz_png_b64"], "per-page step overlays missing"
        for b in out["viz_png_b64"]:
            assert base64.b64decode(b)[:8] == b"\x89PNG\r\n\x1a\n"

        # empty question -> 400 with a JSON error body
        bad = urllib.request.Request(
            f"{base}/ask", data=b"{}", headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
        assert json.loads(ei.value.read())["error"]

        # unknown path -> 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/nope", timeout=30)
        assert ei.value.code == 404
    finally:
        httpd.shutdown()
        httpd.server_close()
