"""bench.py's device-claim preamble: retry/succeed/fail behavior.

The probe itself runs a subprocess jax matmul; these tests swap the probe
body so no device is touched (CPU or TPU) and the retry loop is exercised
with tiny timeouts.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


@pytest.fixture
def fast_claim(monkeypatch):
    monkeypatch.setattr(bench, "CLAIM_SCHEDULE_S", (5, 5))
    monkeypatch.setattr(bench, "CLAIM_SLEEP_S", 0)


def test_claim_schedule_env_parsing(monkeypatch):
    # the default schedule escalates: one short probe, then one long
    # sit-through attempt (killed probes re-wedge the tunnel, so for a fixed
    # budget fewer/longer attempts dominate — docs/TPU_NOTES.md)
    assert bench.CLAIM_SCHEDULE_S[-1] > bench.CLAIM_SCHEDULE_S[0]


def test_claim_success(monkeypatch, fast_claim):
    monkeypatch.setattr(bench, "_PROBE", "print('CLAIM_OK', flush=True)")
    bench.wait_for_device()  # must return without raising


def test_claim_failure_exits_nonzero(monkeypatch, fast_claim):
    monkeypatch.setattr(bench, "_PROBE", "raise SystemExit(1)")
    with pytest.raises(SystemExit) as exc:
        bench.wait_for_device()
    assert exc.value.code == 2


def test_claim_timeout_then_success(monkeypatch, fast_claim, tmp_path):
    # first attempt hangs past the bounded timeout, second succeeds.
    # flag lives in tmp_path: a shared source-dir flag made concurrent pytest
    # sessions race (vacuous pass or a 60 s hang) and dirtied git status
    flag = tmp_path / "claim_flag"
    probe = (
        "import pathlib, time\n"
        f"f = pathlib.Path({str(flag)!r})\n"
        "if not f.exists():\n"
        "    f.write_text('x')\n"
        "    time.sleep(60)\n"
        "print('CLAIM_OK', flush=True)\n"
    )
    monkeypatch.setattr(bench, "_PROBE", probe)
    try:
        bench.wait_for_device()
    finally:
        flag.unlink(missing_ok=True)


def test_empty_schedule_skips_probe(monkeypatch):
    """DINOV2_TPU_CLAIM_SCHEDULE="" must SKIP the probe (the known-healthy-
    device escape hatch), not exit 2 claiming the device is unreachable
    without ever probing it."""
    monkeypatch.setattr(bench, "CLAIM_SCHEDULE_S", ())
    monkeypatch.setattr(
        bench, "_PROBE", "raise SystemExit(1)"  # would fail if it ever ran
    )
    bench.wait_for_device()  # returns without raising
