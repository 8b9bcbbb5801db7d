"""Evidence-pipeline tool contracts: the scale-evidence merge must not
admit rows-only (no-oracle) minidriver rows as hash-certified, and the
bench warm-runs knob must fail soft on malformed input instead of
aborting a multi-hour run at import."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_split_rows_only_partitions_no_oracle_rows():
    from merge_scale_evidence import _split_rows_only

    cert = {
        "q_hashed": {"rows_match": True, "schema_match": True,
                     "hash_match": True, "err": None},
        "q_weak": {"rows_match": True, "spark_rows": 5, "err": "no_oracle"},
        "q_red": {"rows_match": False, "hash_match": False, "err": None},
    }
    hashed, rows_only = _split_rows_only(cert)
    assert set(hashed) == {"q_hashed", "q_red"}
    assert set(rows_only) == {"q_weak"}


def test_extend_keeps_rows_only_out_of_certification(tmp_path):
    """--extend with a no_oracle row must route it to sf1_rows_only --
    sf1_certification.queries is asserted hash_match=True row-for-row
    by test_scale_records, so a rows-only row there would turn the
    suite red while the tool exits 0 (the r9 review finding)."""
    art = tmp_path / "scale.json"
    art.write_text(json.dumps({
        "probes": {}, "violations": [],
        "decade2": {"small_sf_dir": "a", "large_sf_dir": "b",
                    "data_ratio": 10.0, "linear_bound": 30.0,
                    "probes": {}, "violations": []},
        "sf1_certification": {"queries": {}},
    }))
    cert = tmp_path / "cert.json"
    cert.write_text(json.dumps({
        "q_ok": {"rows_match": True, "schema_match": True,
                 "hash_match": True, "err": None},
        "q_weak": {"rows_match": True, "spark_rows": 5, "err": "no_oracle"},
    }))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "merge_scale_evidence.py"),
         "--extend", str(art), "-", str(cert)],
        check=True, capture_output=True,
    )
    out = json.loads(art.read_text())
    assert set(out["sf1_certification"]["queries"]) == {"q_ok"}
    assert set(out["sf1_rows_only"]) == {"q_weak"}
    assert out["sf1_red_rows"] == []


def test_bench_warm_runs_parse_fails_soft(monkeypatch):
    import bench

    monkeypatch.setenv("SPARK_GRAFT_WARM_RUNS", "not-a-number")
    assert bench._warm_runs() == 4
    monkeypatch.setenv("SPARK_GRAFT_WARM_RUNS", " 3 ")
    assert bench._warm_runs() == 3
    monkeypatch.setenv("SPARK_GRAFT_WARM_RUNS", "1")
    assert bench._warm_runs() == 2  # spread metric needs two samples
