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


def test_bench_compare_calib_ref_mirrors_bench():
    # bench_compare stays stdlib-only (no pyspark import just to read a
    # constant), so it mirrors CALIB_REF as a literal -- this pin keeps
    # the mirror honest when the reference anchor is re-stamped.
    import bench
    import bench_compare

    assert bench_compare.CALIB_REF == bench.CALIB_REF


def test_bench_compare_accepts_detail_shaped_calib():
    # ADVICE r11: BENCH_DETAIL*.json stamps calib as the full
    # {pre, post, median, ref} dict; the bare float() raised TypeError.
    import bench_compare

    assert bench_compare._calib_of(
        {"calib": {"pre": 1.1, "post": 1.3, "median": 1.2, "ref": 0.99}},
        "detail.json",
    ) == 1.2
    assert bench_compare._calib_of({"calib": 1.05}, "compact.json") == 1.05
    assert bench_compare._calib_of({}, "none.json") == 1.0
    try:
        bench_compare._calib_of({"calib": "garbage"}, "bad.json")
    except SystemExit as e:
        assert "bad.json" in str(e)
    else:
        raise AssertionError("junk calib must raise a clear SystemExit")


def test_bench_compare_rounds_totals_are_in_value_norm_units(tmp_path):
    # the --rounds totals must match the committed value_norm convention
    # (wall * CALIB_REF / calib), so a round's stamped value_norm and the
    # compare's total for the same artifact agree (ADVICE r11: the 0.99
    # factor was missing; ratios were right, absolute totals were not).
    import bench_compare

    old = tmp_path / "old.json"
    new = tmp_path / "new.json"
    old.write_text(json.dumps(
        {"sha": "a", "calib": 1.1, "queries": {"q1": 11.0, "q2": 11.0}}))
    new.write_text(json.dumps(
        {"sha": "b", "calib": 0.99, "queries": {"q1": 10.0, "q2": 10.0}}))
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_compare.py"),
         "--rounds", str(old), str(new)],
        capture_output=True, text=True,
    )
    out = json.loads(proc.stdout)
    assert out["total_norm_old"] == round(22.0 * 0.99 / 1.1, 3)
    assert out["total_norm_new"] == round(20.0 * 0.99 / 0.99, 3)
    # 19.8 -> 20.0 is ~+1%: inside both triggers
    assert proc.returncode == 0, proc.stdout
