#!/bin/bash
# Post-queue doc regeneration: turn the /tmp/r5 sweep JSONs into the
# judge-facing docs. Idempotent; safe to run on partial queue output (the
# formatters render dashes / skip sections for missing inputs).
#
# Usage: bash scripts/r5_make_docs.sh [note]
set -eu
cd /root/repo
L=/tmp/r5
NOTE="${1:-**Round-5 status**: tables regenerated $(date +%F) with the round-4 safe 3-pass softmax core (see docs/TPU_NOTES.md round 5 for the session receipts).}"

# SUITE_RESULTS.json from the tpu_suite RESULTS_JSON line (anchored: a
# mid-line mention in interleaved/partial output must not pass the guard
# and then AttributeError the extraction under set -e)
if grep -q '^RESULTS_JSON ' "$L/suite.json" 2>/dev/null; then
  python - <<'EOF'
import json, re, sys
from pathlib import Path
text = Path("/tmp/r5/suite.json").read_text()
m = re.search(r"^RESULTS_JSON (.*)$", text, re.M)
if m is None:
    sys.exit("no RESULTS_JSON line despite grep hit")
Path("docs/SUITE_RESULTS.json").write_text(
    json.dumps(json.loads(m.group(1)), indent=2) + "\n")
print("wrote docs/SUITE_RESULTS.json")
EOF
fi

# BENCH_TABLES.md quant tables (base b64 dequant + fused)
if [ -s "$L/tables_dequant.json" ] && [ -s "$L/tables_fused.json" ]; then
  python scripts/make_bench_tables.py --dequant "$L/tables_dequant.json" \
    --fused "$L/tables_fused.json" --note "$NOTE"
fi

# REF_MIRROR.md full matrix (per-size mirror + registers + feat518 + ladder)
python scripts/make_ref_mirror.py --glob-dir "$L"

echo "doc regen done"
