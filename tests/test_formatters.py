"""Unit tests for the benchmark-table formatters that turn the TPU queue's
JSON outputs into the judge-facing docs (scripts/make_bench_tables.py,
scripts/make_ref_mirror.py).

These run entirely on CPU with synthetic JSON fixtures shaped exactly like
`cli.benchmark --json` output, so a formatter regression can't silently
corrupt docs/BENCH_TABLES.md / docs/REF_MIRROR.md during the post-queue
regen step.
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

import pytest

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"


def _load_module(name: str):
    spec = importlib.util.spec_from_file_location(name, SCRIPTS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rec(batch=64, ms=22.354, imgs=2863.0, w=170.3, peak=361.2, temp=125.1):
    return {
        "batch": batch,
        "ms_per_batch": ms,
        "ms_per_image": round(ms / batch, 3),
        "images_per_sec": imgs,
        "hbm_weights_mb": w,
        "hbm_peak_mb": peak,
        "hbm_temp_mb": temp,
    }


@pytest.fixture()
def bench_jsons(tmp_path):
    variants = ["f16", "q4_0", "q4_1", "q5_0", "q5_1", "q8_0"]
    dq = {v: [_rec()] for v in variants}
    fu = {v: [_rec(ms=29.3, imgs=2182.4, w=57.0)] for v in variants}
    dq_p = tmp_path / "dq.json"
    fu_p = tmp_path / "fu.json"
    dq_p.write_text(json.dumps(dq))
    fu_p.write_text(json.dumps(fu))
    return dq_p, fu_p


def test_make_bench_tables_rewrites_both_tables(tmp_path, bench_jsons, monkeypatch):
    dq_p, fu_p = bench_jsons
    mod = _load_module("make_bench_tables")
    doc = tmp_path / "BENCH_TABLES.md"
    stub_table = (
        "| variant | ms/batch (b64) | ms/image | img/s | weights MB | peak HBM MB | temps MB |\n"
        "|---------|---------------:|---------:|------:|-----------:|------------:|---------:|\n"
        "| f16    | 0.00 | 0.000 | 0 | 0.0 | 0.0 | 0.0 |\n"
    )
    doc.write_text(
        "# Tables\n\n**Round-3 status**: stale paragraph\nwith two lines.\n\n"
        "prose before the dequant table\n\n" + stub_table +
        "\nprose between the tables\n\n" + stub_table + "\ntrailing prose\n"
    )
    monkeypatch.setattr(
        sys, "argv",
        ["make_bench_tables", "--dequant", str(dq_p), "--fused", str(fu_p),
         "--doc", str(doc), "--note", "**Round-4 status**: regenerated."],
    )
    mod.main()
    text = doc.read_text()
    # both tables rewritten with the fixture numbers (one row per variant)
    assert text.count("| 22.35 |") == 6 and text.count("| 29.30 |") == 5
    # fused table bolds the q4_0 packed-weight column
    assert "**57.0**" in text
    # prose and note handling
    assert "prose between the tables" in text and "trailing prose" in text
    assert "**Round-4 status**: regenerated." in text
    assert "stale paragraph" not in text


def test_make_bench_tables_missing_variant_renders_dashes(tmp_path, bench_jsons, monkeypatch):
    dq_p, fu_p = bench_jsons
    dq = json.loads(dq_p.read_text())
    del dq["q5_1"]
    dq_p.write_text(json.dumps(dq))
    mod = _load_module("make_bench_tables")
    doc = tmp_path / "doc.md"
    stub = (
        "| variant | ms/batch (b64) | ms/image | img/s | weights MB | peak HBM MB | temps MB |\n"
        "|---------|---------------:|---------:|------:|-----------:|------------:|---------:|\n"
        "| f16    | 1 | 1 | 1 | 1 | 1 | 1 |\n"
    )
    doc.write_text(stub + "\n\n" + stub)
    monkeypatch.setattr(
        sys, "argv",
        ["make_bench_tables", "--dequant", str(dq_p), "--fused", str(fu_p), "--doc", str(doc)],
    )
    mod.main()
    assert "| q5_1 | — | — | — | — | — | — |" in doc.read_text()


def test_make_ref_mirror_full_and_partial(tmp_path, monkeypatch, capsys):
    mod = _load_module("make_ref_mirror")
    variants = ["f16", "q4_0", "q4_1", "q5_0", "q5_1", "q8_0"]
    # full data for small, nothing for the other sizes
    data = {v: [_rec(batch=1, ms=1.37, imgs=730.0, w=42.0), _rec()] for v in variants}
    (tmp_path / "mirror_small_dequant.json").write_text(json.dumps(data))
    (tmp_path / "mirror_small_fused.json").write_text(
        json.dumps({q: [_rec(batch=1, ms=2.0, imgs=500.0, w=12.0)] for q in ("q4_0", "q8_0")})
    )
    out = tmp_path / "REF_MIRROR.md"
    monkeypatch.setattr(
        sys, "argv", ["make_ref_mirror", "--glob-dir", str(tmp_path), "-o", str(out)],
    )
    mod.main()
    text = out.read_text()
    # small row: reference 62 ms vs TPU 1.37 ms -> 45x
    assert "| small | 181 | 62 | **1.37** | 45×" in text
    # b64 throughput column present
    assert "**2863**" in text
    # quantized row for small/q4_0: 46 ms vs 1.37 -> 34x
    assert "| small | q4_0 | 46 | 49 | **1.37** | 34× |" in text
    # fused packed-weights row
    assert "| small | q4_0 | 49 | **12** | 2.00 | 361 |" in text
    # absent sizes render as dashes and are reported missing
    assert "| giant | 4384 | 1969 | — | — | — | — | — |" in text
    assert "missing dequant results for ['base', 'large', 'giant']" in text


def test_make_ref_mirror_r5_sections(tmp_path, monkeypatch):
    """Registers / 518px-feature / giant-ladder sections render when their
    input JSONs exist, and are absent otherwise (partial sweeps stay honest)."""
    mod = _load_module("make_ref_mirror")
    (tmp_path / "reg_small.json").write_text(
        json.dumps({"f16": [_rec(batch=1, ms=1.42, imgs=704.0),
                            _rec(batch=64, ms=8.0, imgs=8000.0)]})
    )
    (tmp_path / "feat518_large.json").write_text(
        json.dumps({"f16": [_rec(batch=8, ms=72.0, imgs=111.2, peak=2500.0)]})
    )
    (tmp_path / "giant_ladder.json").write_text(
        json.dumps({"f16": [_rec(batch=1, ms=4.2, imgs=238.0),
                            _rec(batch=64, ms=250.0, imgs=256.0)]})
    )
    out = tmp_path / "REF_MIRROR.md"
    monkeypatch.setattr(
        sys, "argv", ["make_ref_mirror", "--glob-dir", str(tmp_path), "-o", str(out)],
    )
    mod.main()
    text = out.read_text()
    # with-registers row: reference 64 ms vs 1.42 -> 45x, b64 throughput bold
    assert "| small | 297 | 64 | **1.42** | 45× | **8000** |" in text
    # sizes without reg data render dashes inside the section
    assert "| base | 436 | 200 | — | — | — | — |" in text
    # feature-mode row: ms/image at b8
    assert "| large | **9.00** | **111** | 2500 |" in text
    # giant ladder rows with the vs-reference column (1969 ms -> 0.5078 img/s)
    assert "| 1 | 4.2 | 4.20 | **238** | 469× |" in text
    assert "| 64 | 250.0 | 3.91 | **256** | 504× |" in text


def test_make_ref_mirror_r5_sections_absent_when_no_inputs(tmp_path, monkeypatch):
    mod = _load_module("make_ref_mirror")
    out = tmp_path / "REF_MIRROR.md"
    monkeypatch.setattr(
        sys, "argv", ["make_ref_mirror", "--glob-dir", str(tmp_path), "-o", str(out)],
    )
    mod.main()
    text = out.read_text()
    assert "with register tokens" not in text
    assert "518px feature extraction" not in text
    assert "batch ladder" not in text
    assert "Long-sequence" not in text


def test_make_ref_mirror_longt_section(tmp_path, monkeypatch):
    """The long-T flash section parses the queue log's last RESULTS_JSON line
    (bench rows + the parity record) and skips cleanly on a malformed log."""
    mod = _load_module("make_ref_mirror")
    results = {
        "base-1022px-b1-flash": {
            "tokens": 5330, "ms_per_image": 29.2, "img_per_s": 34.22,
            "patch_tok_per_s": 182376},
        "parity-1022px": {
            "max_abs_diff": 0.07023, "max_rel_to_peak": 0.012838,
            "cls_max_abs_diff": 0.03579},
    }
    (tmp_path / "longt.log").write_text(
        "noise line\nRESULTS_JSON {\"stale\": true}\n"
        f"RESULTS_JSON {json.dumps(results)}\n")
    out = tmp_path / "REF_MIRROR.md"
    monkeypatch.setattr(
        sys, "argv", ["make_ref_mirror", "--glob-dir", str(tmp_path), "-o", str(out)],
    )
    mod.main()
    text = out.read_text()
    assert "| base-1022px-b1 | 5330 | 29.2 | **34.2** | 182,376 |" in text
    assert "patch-feature max|Δ| 0.070 (1.28% of peak magnitude)" in text
    # malformed payload -> section skipped, not a crash
    (tmp_path / "longt.log").write_text("RESULTS_JSON {not json\n")
    mod.main()
    assert "Long-sequence" not in out.read_text()


def test_make_ref_mirror_longt_error_records(tmp_path, monkeypatch):
    """bench_longT stores {"error": ...} for legs that failed on chip; the
    formatter must render the completed legs and note the failed ones instead
    of crashing with KeyError and aborting the whole doc regen."""
    mod = _load_module("make_ref_mirror")
    results = {
        "base-1022px-b1-flash": {
            "tokens": 5330, "ms_per_image": 29.2, "img_per_s": 34.22,
            "patch_tok_per_s": 182376},
        "base-1302px-b1-flash": {"error": "RESOURCE_EXHAUSTED: hbm oom"},
        "parity-1022px": {"error": "tunnel reset mid-run"},
    }
    (tmp_path / "longt.log").write_text(f"RESULTS_JSON {json.dumps(results)}\n")
    out = tmp_path / "REF_MIRROR.md"
    monkeypatch.setattr(
        sys, "argv", ["make_ref_mirror", "--glob-dir", str(tmp_path), "-o", str(out)],
    )
    mod.main()
    text = out.read_text()
    assert "| base-1022px-b1 | 5330 | 29.2 | **34.2** | 182,376 |" in text
    assert "base-1302px-b1-flash" in text  # failed leg is named, not hidden
    assert "parity-1022px" in text
    assert "patch-feature" not in text  # errored parity record is not rendered


def test_make_ref_mirror_longt_scalar_values(tmp_path, monkeypatch):
    """A scalar value in the RESULTS_JSON payload (e.g. "aborted_at": 3) must
    be skipped, not TypeError the whole doc regen — and a string value must
    not silently substring-match the 'error' membership test."""
    mod = _load_module("make_ref_mirror")
    results = {
        "aborted_at": 3,
        "note-flash": "terror at 1302px",  # string containing 'error'
        "base-1022px-b1-flash": {
            "tokens": 5330, "ms_per_image": 29.2, "img_per_s": 34.22,
            "patch_tok_per_s": 182376},
    }
    (tmp_path / "longt.log").write_text(f"RESULTS_JSON {json.dumps(results)}\n")
    out = tmp_path / "REF_MIRROR.md"
    monkeypatch.setattr(
        sys, "argv", ["make_ref_mirror", "--glob-dir", str(tmp_path), "-o", str(out)],
    )
    mod.main()
    text = out.read_text()
    assert "| base-1022px-b1 | 5330 | 29.2 | **34.2** | 182,376 |" in text
    assert "aborted_at" not in text and "note-flash" not in text


def test_make_bench_tables_null_memory_fields(tmp_path, monkeypatch):
    """cli/benchmark emits null MB fields on backends without memory analysis
    (CPU jax); the formatter must render a dash, not TypeError the regen."""
    mod = _load_module("make_bench_tables")
    variants = ["f16", "q4_0", "q4_1", "q5_0", "q5_1", "q8_0"]
    rec = _rec()
    rec["hbm_peak_mb"] = None
    rec["hbm_temp_mb"] = None
    dq = {v: [dict(rec)] for v in variants}
    dq_p = tmp_path / "dq.json"
    fu_p = tmp_path / "fu.json"
    dq_p.write_text(json.dumps(dq))
    fu_p.write_text(json.dumps(dq))
    doc = tmp_path / "BENCH_TABLES.md"
    stub_table = (
        "| variant | ms/batch (b64) | ms/image | img/s | weights MB | peak HBM MB | temps MB |\n"
        "|---------|---------------:|---------:|------:|-----------:|------------:|---------:|\n"
        "| f16    | 0.00 | 0.000 | 0 | 0.0 | 0.0 | 0.0 |\n"
    )
    doc.write_text("# T\n\n" + stub_table + "\nmid\n\n" + stub_table + "\n")
    monkeypatch.setattr(
        sys, "argv",
        ["make_bench_tables", "--dequant", str(dq_p), "--fused", str(fu_p),
         "--doc", str(doc)],
    )
    mod.main()
    text = doc.read_text()
    assert "| — |" in text and "None" not in text


def test_make_ref_mirror_null_memory_fields(tmp_path, monkeypatch):
    """Same null-MB guard for the reference-mirror renderer: a CPU-produced
    sweep (hbm fields null) must render dashes instead of aborting."""
    mod = _load_module("make_ref_mirror")
    variants = ["f16", "q4_0", "q4_1", "q5_0", "q5_1", "q8_0"]

    def nullrec(**kw):
        r = _rec(**kw)
        r["hbm_weights_mb"] = r["hbm_peak_mb"] = r["hbm_temp_mb"] = None
        return r

    data = {v: [nullrec(batch=1, ms=1.37, imgs=730.0), nullrec()]
            for v in variants}
    (tmp_path / "mirror_small_dequant.json").write_text(json.dumps(data))
    out = tmp_path / "REF_MIRROR.md"
    monkeypatch.setattr(
        sys, "argv",
        ["make_ref_mirror", "--glob-dir", str(tmp_path), "-o", str(out)],
    )
    mod.main()
    text = out.read_text()
    # the same em-dash marker missing ROWS use — one "no data" glyph
    assert "| — |" in text and "None" not in text
