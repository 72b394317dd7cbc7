"""The turnkey real-weights parity harness (tools/real_parity.py) must work
end-to-end with in-image pieces: tiny random-init HF checkpoint ->
--hf-weights converter -> engine eval -> metric comparison."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_real_parity_smoke():
    # subprocess: the harness drives eval.py's CLI surface, and the smoke
    # path asserts both the pass and the forced-drift branches
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "real_parity.py"), "--smoke"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "convert -> eval -> compare path works" in r.stdout


def test_expected_file_parses_and_manifest_kinds_covered():
    with open(os.path.join(REPO, "tools", "real_parity_expected.json")) as f:
        exp = json.load(f)
    assert isinstance(exp.get("_tolerance"), float)
    from tools.real_parity import KIND_MODEL_CFG, _manifest

    kinds = {c["kind"] for c in _manifest() if c.get("kind")}
    # every engine-backed manifest kind must map to a runnable model config
    for k in kinds & {"vt5", "hivt5", "pix2struct", "qwen"}:
        assert k in KIND_MODEL_CFG
        assert os.path.exists(os.path.join(REPO, KIND_MODEL_CFG[k]))
