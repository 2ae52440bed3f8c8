#!/usr/bin/env bash
# Optional-dependency test lane (VERDICT r03 ask #3).
#
# Runs the environment-gated real-library tests (PyICU / jieba / Pillow)
# wherever those extras are installed, and the always-on stand-in suites
# beside them. In an environment WITHOUT the extras the lane still
# passes — the gated tests skip with explicit reasons (shown via -rs).
#
# On a cluster image with the extras baked in (or after
#   pip install PyICU jieba Pillow
# in a scratch venv) the same command exercises the REAL paths:
#   * ICU UAX#29 vs ASCII fast-path equivalence + non-ASCII divergence
#   * Jieba rank-identity through the CJK harness
#   * Pillow-backed decode_image(fake=False)
set -euo pipefail
cd "$(dirname "$0")/.."

python - <<'PY'
import importlib.util
for name, mod in (("PyICU", "icu"), ("jieba", "jieba"), ("Pillow", "PIL")):
    state = "present" if importlib.util.find_spec(mod) else "ABSENT (tests skip)"
    print(f"extras matrix: {name:7s} {state}")
PY

exec python -m pytest tests/test_optional_deps.py \
    tests/test_cjk_rank_identity.py tests/test_tokenizer.py \
    -rs -q "$@"
