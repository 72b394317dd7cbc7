"""demo.py --serve: the stdlib browser UI answers over HTTP with the same
introspection payload the terminal REPL prints — the reference's Gradio
demo surface (reference demo.py:24-66, demo2.py:160-192) without the
gradio dependency. Drives the real server over a real socket: UI page,
dataset browsing (/sample: prev/next with GT answers + overlay toggles,
reference demo.py:68-178), query round-trip (answer + chunk introspection +
per-page overlay PNGs), and the error path."""

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
    session = demo.build_session(args)
    assert "Loaded doc 0" in session.describe
    assert session.num_docs == 2

    httpd = demo.make_server(session, 0)  # ephemeral port
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        html = urllib.request.urlopen(f"{base}/", timeout=30).read().decode()
        assert "rag_docvqa_tpu" in html and "/ask" in html and "/sample" in html

        # dataset browser: sample 1 with both overlay layers on
        s1 = json.loads(urllib.request.urlopen(
            f"{base}/sample?idx=1&layout=1&chunks=1", timeout=120).read())
        assert s1["idx"] == 1 and s1["num_docs"] == 2
        assert s1["question"], "dataset question missing from browser payload"
        assert isinstance(s1["answers"], list) and s1["answers"], "GT answers missing"
        assert s1["num_pages"] >= 1
        assert len(s1["pages_png_b64"]) == s1["num_pages"]
        for b in s1["pages_png_b64"]:
            assert base64.b64decode(b)[:8] == b"\x89PNG\r\n\x1a\n"
        # toggles change the rendered overlays (layers off -> different pixels)
        s1_off = json.loads(urllib.request.urlopen(
            f"{base}/sample?idx=1&layout=0&chunks=0", timeout=120).read())
        assert s1_off["pages_png_b64"] != s1["pages_png_b64"]
        # prev/next wraps modulo num_docs
        s_wrap = json.loads(urllib.request.urlopen(
            f"{base}/sample?idx=-1&layout=0&chunks=0", timeout=120).read())
        assert s_wrap["idx"] == 1

        req = urllib.request.Request(
            f"{base}/ask",
            data=json.dumps({"question": "what is the total?", "doc": 1}).encode(),
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

        # engine/server errors come back generic (no exception detail leaked)
        broken = urllib.request.Request(
            f"{base}/ask",
            data=json.dumps({"question": "q", "doc": "not-an-int"}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(broken, timeout=30)
        assert ei.value.code == 500
        err = json.loads(ei.value.read())["error"]
        assert "invalid literal" not in err, "raw exception string leaked to client"

        # unknown path -> 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/nope", timeout=30)
        assert ei.value.code == 404
    finally:
        httpd.shutdown()
        httpd.server_close()
