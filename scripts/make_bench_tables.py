"""Regenerate the quant-sweep tables in docs/BENCH_TABLES.md from the
cli.benchmark --json outputs produced by scripts/r4_tpu_queue.sh step 3
(/tmp/r4_tables_dequant.json, /tmp/r4_tables_fused.json).

Only the two `| variant | ...` tables and the round-status header are
rewritten; the surrounding prose (methodology, routing explanation, torch
baseline) is preserved verbatim so the measured-context paragraphs stay
hand-auditable.

Usage: python scripts/make_bench_tables.py [--dequant PATH] [--fused PATH]
       [--doc docs/BENCH_TABLES.md] [--note "round-4 regen ..."]
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

VARIANTS_DEQUANT = ["f16", "q4_0", "q4_1", "q5_0", "q5_1", "q8_0"]
VARIANTS_FUSED = ["q4_0", "q4_1", "q5_0", "q5_1", "q8_0"]
HEADER = (
    "| variant | ms/batch (b64) | ms/image | img/s | weights MB | peak HBM MB | temps MB |\n"
    "|---------|---------------:|---------:|------:|-----------:|------------:|---------:|"
)


def _table(data: dict, variants: list[str], batch: int, bold_weights: str | None) -> str:
    rows = [HEADER]
    for v in variants:
        recs = [r for r in data.get(v, []) if r["batch"] == batch]
        if not recs:
            rows.append(f"| {v} | — | — | — | — | — | — |")
            continue
        r = recs[0]
        # cli/benchmark emits null MB fields on backends without memory
        # analysis (CPU jax) — render "—" instead of TypeError-ing the regen
        mb = lambda x: "—" if x is None else f"{x:.1f}"  # noqa: E731
        w = f"**{mb(r['hbm_weights_mb'])}**" if v == bold_weights else mb(r["hbm_weights_mb"])
        rows.append(
            f"| {v}    | {r['ms_per_batch']:.2f} | {r['ms_per_image']:.3f} "
            f"| {r['images_per_sec']:.0f} | {w} | {mb(r['hbm_peak_mb'])} "
            f"| {mb(r['hbm_temp_mb'])} |"
        )
    return "\n".join(rows)


def _replace_nth_table(text: str, n: int, new_table: str) -> str:
    """Replace the n-th (0-based) markdown table that starts with HEADER's
    first line."""
    pat = re.compile(r"\| variant \|[^\n]*\n\|[-:| ]+\n(?:\|[^\n]*\n)+")
    matches = list(pat.finditer(text))
    if n >= len(matches):
        raise SystemExit(f"expected >= {n + 1} variant tables, found {len(matches)}")
    m = matches[n]
    return text[: m.start()] + new_table + "\n" + text[m.end() :]


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dequant", default="/tmp/r4_tables_dequant.json")
    p.add_argument("--fused", default="/tmp/r4_tables_fused.json")
    p.add_argument("--doc", default="docs/BENCH_TABLES.md")
    p.add_argument("--note", default=None, help="replacement round-status paragraph")
    args = p.parse_args()

    dq = json.loads(Path(args.dequant).read_text())
    fu = json.loads(Path(args.fused).read_text())
    doc = Path(args.doc)
    text = doc.read_text()

    text = _replace_nth_table(text, 0, _table(dq, VARIANTS_DEQUANT, 64, None))
    text = _replace_nth_table(text, 1, _table(fu, VARIANTS_FUSED, 64, "q4_0"))
    if args.note is not None:
        # swap the "**Round-N status**: ..." paragraph (up to the first blank
        # line after it) for the provided note
        text = re.sub(
            r"\*\*Round-\d+ status\*\*:.*?\n\n",
            args.note.rstrip() + "\n\n",
            text,
            count=1,
            flags=re.S,
        )
    doc.write_text(text)
    print(f"rewrote tables in {args.doc}")


if __name__ == "__main__":
    main()
