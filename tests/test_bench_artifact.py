"""Unit tests for bench.write_artifact's round-selection policy — the
order-dependence trap (r7 ADVICE) fixed in r8: explicit round wins,
inference never clobbers, contended runs opt out, malformed input falls
back loudly instead of silently skipping."""

from __future__ import annotations

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import bench  # noqa: E402

RESULT = {"metric": "headline_queries_total_wall", "value": 1.0}


def test_explicit_round_writes_and_overwrites(tmp_path):
    p1 = bench.write_artifact(RESULT, str(tmp_path), {"SPARK_GRAFT_ROUND": "8"})
    assert p1 and p1.endswith("BENCH_LOCAL_r08.json")
    # re-running the SAME round refreshes it (the intended overwrite)
    p2 = bench.write_artifact(
        {**RESULT, "value": 2.0}, str(tmp_path), {"SPARK_GRAFT_ROUND": "8"}
    )
    assert p2 == p1
    assert json.load(open(p1))["value"] == 2.0


def test_inference_from_correctness_files_no_clobber(tmp_path):
    (tmp_path / "CORRECTNESS_r07.json").write_text("{}")
    p1 = bench.write_artifact(RESULT, str(tmp_path), {})
    assert p1.endswith("BENCH_LOCAL_r08.json")
    # a second inferred run must NOT clobber: it lands on a stamped name
    p2 = bench.write_artifact({**RESULT, "value": 9.9}, str(tmp_path), {})
    assert p2 != p1 and "BENCH_LOCAL_r08_" in os.path.basename(p2)
    assert json.load(open(p1))["value"] == 1.0  # original intact


def test_opt_out_writes_nothing(tmp_path):
    p = bench.write_artifact(
        RESULT, str(tmp_path), {"SPARK_GRAFT_BENCH_ARTIFACT": "0"}
    )
    assert p is None and not list(tmp_path.glob("BENCH_LOCAL_*"))


def test_malformed_round_falls_back_to_inference(tmp_path, capsys):
    (tmp_path / "CORRECTNESS_r03.json").write_text("{}")
    p = bench.write_artifact(RESULT, str(tmp_path), {"SPARK_GRAFT_ROUND": "r08"})
    assert p.endswith("BENCH_LOCAL_r04.json")  # inferred, not skipped
    assert "invalid SPARK_GRAFT_ROUND" in capsys.readouterr().err
