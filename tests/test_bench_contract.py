"""Pin the bench stdout/artifact contract (VERDICT r13 "Next round" #1).

Round 12's round-over-round comparison died at the driver boundary:
``BENCH_r12.json`` has ``parsed: null`` because bench stdout did not end
with one parseable payload JSON.  These tests pin, WITHOUT a Spark
session (every heavy dependency is stubbed), that:

* ``main()`` and ``run_panel()`` each end stdout with exactly one JSON
  object carrying the driver-contract keys (``metric``, ``value``,
  ``unit``, ``queries``, ``sf``, ``cold_pinned``) — including the
  remeasure path, which mutates the payload after first assembly;
* every other ``print`` in bench.py targets stderr (static scan), so no
  stray stdout line can land after the payload;
* the committed ``BENCH_LOCAL_r{N}.json`` artifact is written ONLY under
  ``--commit`` (VERDICT r13 "What's wrong" #2: every run used to
  silently overwrite the committed round artifact).
"""

from __future__ import annotations

import ast
import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

PAYLOAD_KEYS = {"metric", "value", "unit", "queries", "sf", "cold_pinned"}


class _FakeDF:
    def count(self):
        return 1


class _FakeSC:
    def setLogLevel(self, lvl):
        pass


class _FakeSpark:
    sparkContext = _FakeSC()

    def stop(self):
        pass


def _stub_bench(monkeypatch, tmp_path, names, prev_queries=None):
    """Point bench at a fake 2-query catalog, a no-op session and a tmp
    artifact path; returns the artifact path."""
    from consumer_financial_protection_bureau_predictive_analysis_using_machine_learning_models_in_pyspark_spark import (  # noqa: E501
        plans as plans_mod,
        session as session_mod,
    )

    catalog = {
        n: types.SimpleNamespace(fn=lambda spark, sf: _FakeDF(), twin_of=None)
        for n in names
    }
    monkeypatch.setattr(plans_mod, "CATALOG", catalog)
    monkeypatch.setattr(session_mod, "get_session", lambda **kw: _FakeSpark())
    monkeypatch.setattr(bench, "_prime_session", lambda *a: None)
    monkeypatch.setattr(bench, "BENCH_QUERIES", list(names))
    monkeypatch.setattr(bench, "PANEL_QUERIES", list(names))
    monkeypatch.setattr(
        bench, "_prior_round_queries", lambda limit=2: (
            [prev_queries] if prev_queries else []
        )
    )
    monkeypatch.setattr(bench, "_prior_round_panel", lambda: {})
    art = tmp_path / "BENCH_LOCAL_r99.json"
    monkeypatch.setattr(bench, "_artifact_path", lambda: str(art))
    return art


def _last_stdout_payload(capsys):
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert lines, "no stdout at all"
    payload = json.loads(lines[-1])  # last line parses
    assert len(lines) == 1, f"extra stdout lines before payload: {lines[:-1]}"
    return payload


def test_main_stdout_is_one_full_payload(monkeypatch, tmp_path, capsys):
    art = _stub_bench(monkeypatch, tmp_path, ["qa", "qb"])
    bench.main(commit=False)
    payload = _last_stdout_payload(capsys)
    assert PAYLOAD_KEYS <= set(payload), payload.keys()
    assert set(payload["queries"]) == {"qa", "qb"}
    assert not art.exists(), "artifact written without --commit"


def test_main_remeasure_path_keeps_contract(monkeypatch, tmp_path, capsys):
    # prev-round numbers tiny enough that both queries flag as regressions
    # and ride the remeasure path (median-of-3, all samples recorded)
    art = _stub_bench(
        monkeypatch, tmp_path, ["qa", "qb"],
        prev_queries=None,
    )
    monkeypatch.setattr(
        bench,
        "_regressions_vs_previous_round",
        lambda timings, **kw: {n: (1.0, timings[n]) for n in timings},
    )
    bench.main(commit=True)
    payload = _last_stdout_payload(capsys)
    assert PAYLOAD_KEYS <= set(payload)
    assert set(payload["remeasured"]) == {"qa", "qb"}
    assert all(len(v) == 3 for v in payload["remeasured"].values())
    assert art.exists(), "artifact missing despite --commit"
    on_disk = json.loads(art.read_text())
    assert on_disk["queries"] == payload["queries"]


def test_panel_stdout_is_one_full_payload(monkeypatch, tmp_path, capsys):
    art = _stub_bench(monkeypatch, tmp_path, ["qa", "qb"])
    bench.run_panel(commit=False)
    payload = _last_stdout_payload(capsys)
    assert PAYLOAD_KEYS <= set(payload), payload.keys()
    assert "panel" in payload
    assert set(payload["panel"]["queries"]) == {"qa", "qb"}
    assert not art.exists(), "panel wrote artifact without --commit"


def test_panel_merges_into_existing_payload(monkeypatch, tmp_path, capsys):
    art = _stub_bench(monkeypatch, tmp_path, ["qa"])
    full = {
        "metric": "bench_total_wall", "value": 12.3, "unit": "sec",
        "queries": {"qa": 12.3}, "sf": 0.1, "cold_pinned": [],
    }
    art.write_text(json.dumps(full))
    bench.run_panel(commit=True)
    payload = _last_stdout_payload(capsys)
    # the merged payload keeps the FULL bench's headline keys, panel rides along
    assert payload["metric"] == "bench_total_wall"
    assert payload["value"] == 12.3
    assert "panel" in payload
    on_disk = json.loads(art.read_text())
    assert on_disk["panel"]["queries"]["qa"]["median"] >= 0


def test_every_other_print_targets_stderr():
    """Static scan: any print() that is not the payload print must pass
    file=sys.stderr, so nothing can trail the payload on stdout."""
    src = open(os.path.join(REPO, "bench.py")).read()
    tree = ast.parse(src)
    payload_prints = 0
    for node in ast.walk(tree):
        if not (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "print"
        ):
            continue
        to_stderr = any(
            kw.arg == "file"
            and isinstance(kw.value, ast.Attribute)
            and kw.value.attr == "stderr"
            for kw in node.keywords
        )
        if to_stderr:
            continue
        # the only stdout prints allowed are `print(json.dumps(payload))`
        arg = node.args[0] if node.args else None
        assert (
            isinstance(arg, ast.Call)
            and isinstance(arg.func, ast.Attribute)
            and arg.func.attr == "dumps"
        ), f"stdout print at line {node.lineno} is not the payload print"
        payload_prints += 1
    assert payload_prints == 2, payload_prints  # one in main, one in run_panel
