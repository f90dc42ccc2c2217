#!/usr/bin/env bash
# Dependency-present verification lane (VERDICT r8 ask #6).
#
# The Pillow / pyav / protobuf code paths (operators/codecs.py
# decode_image, operators/mediabox.py extract_frames,
# streaming/ops.py session_summaries_tws) are implemented and
# contract-tested on BOTH sides of each optional-dependency boundary
# (FIXTURES.md §6), but the build container has no package index, so
# the deps-present side has never executed there. Run this script on
# any networked machine with the repo checked out to execute the
# real paths once and record the output.
#
#   bash tools/deps_lane.sh [path-to-repo]
#
# Exit code 0 == all three deps-present tests green.
set -euo pipefail
REPO="${1:-$(cd "$(dirname "$0")/.." && pwd)}"
VENV="$(mktemp -d)/deps_lane_venv"
python3 -m venv "$VENV"
# shellcheck disable=SC1091
source "$VENV/bin/activate"
pip install --quiet pyspark==4.1.2 pyarrow pandas numpy duckdb pytest \
    Pillow av protobuf
cd "$REPO"
python -m pytest \
    "tests/test_codecs.py::test_jpeg_via_pil_when_available" \
    "tests/test_mediabox.py::test_frame_extraction_real_with_pyav" \
    "tests/test_streaming.py::test_session_summaries_timer_based" \
    -v 2>&1 | tee /tmp/deps_lane_run.log
echo "deps-lane: record /tmp/deps_lane_run.log in FIXTURES.md §6"
