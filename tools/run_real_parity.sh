#!/usr/bin/env bash
# Turnkey real-weights parity run (BASELINE.md north star, mount-gated in
# this image): convert every mounted checkpoint, evaluate the frozen
# MP-DocVQA mini-split, diff against tools/real_parity_expected.json.
#
#   tools/run_real_parity.sh <weights_dir> <data_dir> [extra real_parity.py args]
#
# <weights_dir>: one subdir per HF repo (named like the repo tail in
#                tools/parity_manifest.json, e.g. vt5-base-spdocvqa)
# <data_dir>:    MP-DocVQA layout (imdb/ [+ images/])
#
# Exit codes: 0 parity ok (or record-only), 1 metric drift, 2 no checkpoints.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python tools/real_parity.py "$@"
