#!/usr/bin/env python
"""Turnkey real-weights parity harness.

The BASELINE.md north star ("parity page recall@1/@5 and ANLS on MP-DocVQA
vs the reference") is mount-gated: this image has no weights and no network.
This harness makes the mount turnkey — ONE command converts each mounted
checkpoint, evaluates a frozen mini-split through the matching engine, and
diffs the metrics against a reference-expected JSON (exit nonzero on drift).
Mirrors the reference's from_pretrained-everything eval startup
(/root/reference/eval.py:443-570, src/build_utils.py:26-35).

Usage:
    python tools/real_parity.py <weights_dir> <data_dir> \
        [--out runs/real_parity.json] [--expected tools/real_parity_expected.json] \
        [--split val] [--size 0.02] [--only vt5,qwen]

    python tools/real_parity.py --smoke    # in-image self-test, no mounts

`weights_dir` holds one subdir per mounted HF repo, named like the tail of
the `repo` field in tools/parity_manifest.json (e.g. `vt5-base-spdocvqa`
for `rubentito/vt5-base-spdocvqa`). Each found checkpoint runs eval.py
in-process with `--hf-weights` (dims + tokenizer auto-derived from the
checkpoint's config.json) over MP-DocVQA at `data_dir` (expects imdb/ and
optionally images/), subsampled to a deterministic `--size` fraction — the
frozen mini-split. Metrics land in --out; entries present in --expected are
compared within tolerance.

Expected-file format (tools/real_parity_expected.json):
    {"_tolerance": 0.02,
     "vt5-base-spdocvqa": {"anls": 0.71, "retrieval_precision": 0.82}}
Populate it once by running the reference repo's eval.py on the same
mini-split (see parity_manifest.json repro lines); checkpoints without an
entry run in record-only mode (metrics written, no comparison, exit 0).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# manifest kind -> eval.py model config (dims are overridden per checkpoint
# by eval.py's config.json auto-derivation, so the tiny configs only pick
# the engine family)
KIND_MODEL_CFG = {
    "vt5": "configs/RAGVT5.yml",
    "hivt5": "configs/HiVT5_tiny.yml",
    "pix2struct": "configs/Pix2Struct_tiny.yml",
    "qwen": "configs/Qwen_tiny.yml",
}


def _manifest():
    with open(os.path.join(REPO, "tools", "parity_manifest.json")) as f:
        return json.load(f)["checkpoints"]


def _find_checkpoints(weights_dir: str):
    """Yield (dir_name, abs_path, kind) for mounted checkpoints that match a
    manifest entry by repo tail; unlisted dirs with a config.json are
    classified by model_type as a fallback."""
    by_tail = {c["repo"].split("/")[-1].lower(): c["kind"] for c in _manifest() if c.get("kind")}
    for name in sorted(os.listdir(weights_dir)):
        path = os.path.join(weights_dir, name)
        if not os.path.isdir(path) or not os.path.exists(os.path.join(path, "config.json")):
            continue
        kind = by_tail.get(name.lower())
        if kind is None:
            with open(os.path.join(path, "config.json")) as f:
                mt = json.load(f).get("model_type", "")
            kind = {"t5": "vt5", "vt5": "vt5", "pix2struct": "pix2struct",
                    "qwen2": "qwen", "qwen2_5_vl": "qwen"}.get(mt)
        if kind in KIND_MODEL_CFG:
            yield name, path, kind


def run_one(name: str, path: str, kind: str, data_args: list, extra: list):
    """Run eval.py in-process; returns its summary dict."""
    import eval as eval_cli

    argv = ["-m", os.path.join(REPO, KIND_MODEL_CFG[kind]), *data_args,
            "--hf-weights", path, *extra]
    print(f"[real_parity] {name} ({kind}): eval.py {' '.join(argv)}", flush=True)
    results = eval_cli.main(argv)
    return results[0]


def compare(observed: dict, expected: dict, tol: float):
    """Returns list of (metric, got, want) drifts."""
    drifts = []
    for metric, want in expected.items():
        got = observed.get(metric)
        if got is None or abs(float(got) - float(want)) > tol:
            drifts.append((metric, got, want))
    return drifts


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("weights_dir", nargs="?")
    ap.add_argument("data_dir", nargs="?")
    ap.add_argument("--out", default="runs/real_parity.json")
    ap.add_argument("--expected", default=os.path.join(REPO, "tools", "real_parity_expected.json"))
    ap.add_argument("--split", default="val")
    ap.add_argument("--size", type=float, default=0.02,
                    help="deterministic fraction of the split (the frozen mini-split)")
    ap.add_argument("--only", default=None, help="comma-separated kinds to run")
    ap.add_argument("--smoke", action="store_true",
                    help="in-image self-test: tiny random-init HF checkpoint + synthetic data")
    args = ap.parse_args(argv)

    if args.smoke:
        return smoke()
    if not args.weights_dir or not args.data_dir:
        ap.error("weights_dir and data_dir are required (or --smoke)")

    expected_all = {}
    if os.path.exists(args.expected):
        with open(args.expected) as f:
            expected_all = json.load(f)
    tol = float(expected_all.get("_tolerance", 0.02))

    data_args = ["-d", os.path.join(REPO, "configs", "MP-DocVQA.yml"),
                 "--split", args.split]
    overrides = [f"imdb_dir={os.path.join(args.data_dir, 'imdb')}",
                 f"images_dir={os.path.join(args.data_dir, 'images')}",
                 f"size={args.size}", "seed=42"]

    only = set(args.only.split(",")) if args.only else None
    found = [c for c in _find_checkpoints(args.weights_dir) if only is None or c[2] in only]
    if not found:
        print(f"[real_parity] no recognizable checkpoints under {args.weights_dir}", file=sys.stderr)
        return 2

    report, failures = {}, []
    for name, path, kind in found:
        summary = run_one(name, path, kind, data_args, overrides)
        report[name] = {"kind": kind, **summary}
        if name in expected_all:
            drifts = compare(summary, expected_all[name], tol)
            report[name]["parity"] = "ok" if not drifts else "DRIFT"
            for metric, got, want in drifts:
                failures.append(f"{name}.{metric}: got {got} want {want} (tol {tol})")
        else:
            report[name]["parity"] = "recorded (no expected entry)"

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"[real_parity] wrote {args.out}")
    for line in failures:
        print(f"[real_parity] PARITY DRIFT: {line}", file=sys.stderr)
    return 1 if failures else 0


def smoke():
    """Self-test with in-image pieces: a tiny random-init HF T5 checkpoint
    (transformers save_pretrained -> our converter reads it back through the
    exact --hf-weights path) over the synthetic dataset. Runs record mode,
    then compare mode against the recorded values (must pass), then compare
    against a perturbed expected (must fail)."""
    import tempfile

    import torch  # noqa: F401  (transformers needs it for save_pretrained)
    from transformers import T5Config, T5ForConditionalGeneration

    with tempfile.TemporaryDirectory() as td:
        ckpt = os.path.join(td, "vt5-tiny-smoke")
        hf_cfg = T5Config(vocab_size=512, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                          num_layers=2, num_decoder_layers=2, dropout_rate=0.0)
        T5ForConditionalGeneration(hf_cfg).save_pretrained(ckpt)

        data_args = ["-d", os.path.join(REPO, "configs", "Synthetic.yml"), "--platform", "cpu"]
        overrides = ["n_val_docs=4", "tokenizer=hash:512", "max_new_tokens=4", "seed=42"]
        summary = run_one("vt5-tiny-smoke", ckpt, "vt5", data_args, overrides)
        print(f"[real_parity smoke] metrics: {summary}")

        ok = compare(summary, {"retrieval_precision": summary["retrieval_precision"]}, 0.02)
        assert not ok, f"self-compare drifted: {ok}"
        bad = compare(summary, {"retrieval_precision": summary["retrieval_precision"] + 0.5}, 0.02)
        assert bad, "perturbed expected must drift"
        print("[real_parity smoke] OK: convert -> eval -> compare path works")
    return 0


if __name__ == "__main__":
    sys.exit(main())
