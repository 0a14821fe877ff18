"""bench.py suite contract: per-row fault isolation and pin scoping.

The suite is the round's official deliverable — a single row's failure must
degrade to an "error" row, never discard measured rows or flip the exit
status (BENCH_r04 lost a full round's numbers to one VMEM compile failure).
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402


@pytest.fixture
def fake_rows(monkeypatch):
    """Stub run_config/probe so the suite logic runs instantly on CPU."""
    monkeypatch.setattr(bench, "_memory_probe_gbps", lambda: 100.0)

    def fake_run_config(repeats=1, **cfg):
        if cfg.get("fail"):
            raise RuntimeError("Ran out of memory in memory space vmem (test)")
        if cfg.get("serve"):  # serve rows return (metric, [rtf], extras)
            return "serve_loopback_rtf", [cfg["rtf"]], {"req_per_s": 5.0}
        metric = cfg.get("metric", f"rtf_test_b{cfg.get('batch', 1)}")
        return metric, [float(cfg["rtf"])] * repeats

    monkeypatch.setattr(bench, "run_config", fake_run_config)
    return fake_run_config


def _run_suite(monkeypatch, capsys, suite, headline):
    monkeypatch.setattr(bench, "SUITE", suite)
    monkeypatch.setattr(bench, "HEADLINE_ROW", headline)
    rc = bench.run_suite(repeats=1)
    return rc, json.loads(capsys.readouterr().out.strip())


def test_suite_row_failure_is_isolated(fake_rows, monkeypatch, capsys):
    rc, out = _run_suite(
        monkeypatch, capsys,
        suite=[
            ("good_a", dict(batch=1, rtf=80.0)),
            ("bad", dict(fail=True)),
            ("good_b", dict(batch=16, rtf=250.0)),
            ("serve", dict(serve=True, rtf=120.0)),
        ],
        headline="good_b",
    )
    assert rc == 0  # something was measured
    assert out["value"] == 250.0 and out["metric"] == "rtf_test_b16"
    assert out["errors"] == 1
    by_name = {r["row"]: r for r in out["rows"]}
    assert by_name["good_a"]["median"] == 80.0  # pre-failure row survived
    assert "vmem" in by_name["bad"]["error"]
    assert "median" not in by_name["bad"]
    assert by_name["serve"]["req_per_s"] == 5.0  # extras merged into the row


def test_suite_headline_falls_back_to_best_survivor(fake_rows, monkeypatch, capsys):
    rc, out = _run_suite(
        monkeypatch, capsys,
        suite=[
            ("good_a", dict(batch=1, rtf=80.0)),
            ("headline_row", dict(fail=True)),
        ],
        headline="headline_row",
    )
    assert rc == 0
    assert out["value"] == 80.0
    assert "best surviving row" in out["headline_note"]


def test_suite_headline_fallback_prefers_comparable_rows(
    fake_rows, monkeypatch, capsys
):
    """When the designated headline row fails, the fallback must stay
    COMPARABLE (a large-v3 row), never a tiny/turbo row whose vs_baseline
    against the A100 *large-v3* reference would read as a wildly inflated
    north-star pass."""
    rc, out = _run_suite(
        monkeypatch, capsys,
        suite=[
            ("b1_bf16", dict(rtf=80.0, metric="rtf_large_v3_greedy_b1")),
            ("b16_bf16", dict(fail=True)),
            ("turbo_b16", dict(rtf=800.0, metric="rtf_large_v3_turbo_greedy_b16")),
            ("tiny_b16", dict(rtf=4600.0, metric="rtf_tiny_greedy_b16")),
        ],
        headline="b16_bf16",
    )
    assert rc == 0
    assert out["metric"] == "rtf_large_v3_greedy_b1" and out["value"] == 80.0
    assert "best surviving row" in out["headline_note"]

    # only non-comparable rows survive: fall back to the best of them
    rc, out = _run_suite(
        monkeypatch, capsys,
        suite=[
            ("b16_bf16", dict(fail=True)),
            ("tiny_b16", dict(rtf=4600.0, metric="rtf_tiny_greedy_b16")),
        ],
        headline="b16_bf16",
    )
    assert rc == 0 and out["metric"] == "rtf_tiny_greedy_b16"


def test_suite_all_rows_failed(fake_rows, monkeypatch, capsys):
    rc, out = _run_suite(
        monkeypatch, capsys,
        suite=[("bad", dict(fail=True))],
        headline="bad",
    )
    assert rc == 1
    assert "value" not in out and out["errors"] == 1
    assert "error" in out["rows"][0]


def test_suite_heartbeat_lands_on_stderr(fake_rows, monkeypatch, capsys):
    """Every finished row is echoed to stderr as it completes: if the
    PROCESS dies hard mid-suite (driver timeout, host OOM kill) the
    captured output tail still carries every measured row and names the
    row that was in flight."""
    monkeypatch.setattr(
        bench, "SUITE",
        [("good_a", dict(batch=1, rtf=80.0)), ("bad", dict(fail=True))],
    )
    monkeypatch.setattr(bench, "HEADLINE_ROW", "good_a")
    rc = bench.run_suite(repeats=1)
    captured = capsys.readouterr()
    assert rc == 0 and json.loads(captured.out.strip())["value"] == 80.0
    assert "[suite 1/2] good_a ..." in captured.err  # in-flight marker
    assert '"median": 80.0' in captured.err  # finished row echoed
    assert '"error"' in captured.err  # failed row echoed too


def test_forced_tokens_pin_is_scoped():
    """run_config clears the class-level forced-token pin on ANY exit —
    including an exception mid-row — so a failed forced row can't leak its
    pin into the next row of a different kind."""
    from whisper_tpu.decoding import DecodingTask

    with pytest.raises(ValueError):
        bench.run_config(model_name="tiny", batch=0, forced="nope")
    assert getattr(DecodingTask, "_forced_tokens", None) is None

    # forced="ts" with an impossible config raises AFTER the pin installs;
    # the ExitStack must still clear it
    with pytest.raises(Exception):
        bench.run_config(
            model_name="tiny", batch=-1, tokens=4, repeats=1, forced="ts"
        )
    assert DecodingTask._forced_tokens is None
