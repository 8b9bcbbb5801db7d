"""Shuffle-record scaling evidence (SCALE_r6.json, tools/scale_records.py).

Validates the COMMITTED artifact rather than re-running the two-session
harness (~3 min): the per-round refresh is part of the evidence rotation
(see NOTES.md). The harness itself exits 1 on violations, so a stale-
but-green artifact still encodes a real measured state of the code.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _latest_artifact() -> dict:
    paths = glob.glob(os.path.join(REPO, "SCALE_r*.json"))
    assert paths, "no SCALE_r*.json artifact committed"

    def round_no(p: str) -> int:
        m = re.search(r"_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    # numeric, not lexical: SCALE_r10 must beat SCALE_r6
    with open(max(paths, key=round_no)) as fh:
        return json.load(fh)


def test_linear_ops_grow_linearly():
    art = _latest_artifact()
    assert art["violations"] == []
    linear = {
        n: p for n, p in art["probes"].items() if p["class"] == "linear"
    }
    assert len(linear) >= 10
    for name, p in linear.items():
        assert p["growth_ratio"] is not None, name
        assert p["growth_ratio"] <= art["linear_bound"], (name, p)
    # query_set probes (fixture query set grows with the corpus):
    # compound bound = linear_bound x data_ratio
    for name, p in art["probes"].items():
        if p["class"] == "query_set" and p["growth_ratio"] is not None:
            assert (
                p["growth_ratio"] <= art["linear_bound"] * art["data_ratio"]
            ), (name, p)


def _assert_phase_entries(probes: dict) -> None:
    """phase-class probes (broadcast->shuffle transition between
    decades) are bounded on shuffle records PER INPUT ROW at each
    scale, not on the cross-decade ratio the transition invalidates."""
    for name, p in probes.items():
        if p.get("class") != "phase":
            continue
        assert p.get("coef_bound"), (name, p)
        for side in ("small", "large"):
            coef = p.get(f"records_per_input_row_{side}")
            if coef is not None:
                assert coef <= p["coef_bound"], (name, side, p)


def test_phase_probes_bounded_per_input_row():
    art = _latest_artifact()
    _assert_phase_entries(art["probes"])
    for key in ("decade2", "decade3"):
        if key in art:
            _assert_phase_entries(art[key]["probes"])


def test_second_decade_evidence_if_present():
    """When the artifact carries the r9 second decade (sf0.1 -> the
    generated sf1) it must be violation-free and its sf1 hash
    certification must have zero red rows."""
    art = _latest_artifact()
    d2 = art.get("decade2")
    if d2 is None:
        return
    assert d2["violations"] == []
    assert art.get("sf1_red_rows") == []
    cert = art["sf1_certification"]["queries"]
    assert len(cert) >= 5
    for name, row in cert.items():
        assert row.get("hash_match") is True, (name, row)


def test_third_decade_evidence_if_present():
    """When the artifact carries the third decade (the generated sf1 ->
    sf10 snapshots, a true 10x on every table) it must satisfy the same
    contract as decade 2: violation-free probes, zero red rows in the
    sf10 hash certification."""
    art = _latest_artifact()
    d3 = art.get("decade3")
    if d3 is None:
        return
    assert d3["violations"] == []
    assert art.get("sf10_red_rows") == []
    cert = art.get("sf10_certification", {}).get("queries", {})
    assert len(cert) >= 5
    for name, row in cert.items():
        assert row.get("hash_match") is True, (name, row)


def test_control_demonstrates_quadratic_growth():
    """At least one uncapped enumerator must show strongly super-linear
    record growth -- otherwise the fixture can't distinguish a capped
    plan from an uncapped one and the linear-class bound proves
    nothing."""
    art = _latest_artifact()
    controls = [
        p["growth_ratio"]
        for p in art["probes"].values()
        if p["class"] == "control" and p["growth_ratio"]
    ]
    assert controls
    assert max(controls) > 50.0  # the quadratic signature (~100x at 10x data)


def test_wall_inversions_are_annotated_overhead_dominated():
    """VERDICT r11 task 4: decade-1 walls may legitimately invert
    (small > 2x large) because sub-~10s absolute walls sit at the fixed
    per-plan floor even after the per-probe warm pass -- but then the
    artifact must SAY so per probe (wall_regime), and no inversion may
    occur at real magnitudes (the harness files those as violations)."""
    art = _latest_artifact()
    for name, p in art["probes"].items():
        ws, wl = p.get("wall_small_s"), p.get("wall_large_s")
        if ws is None or wl is None or ws <= 2 * wl:
            continue
        regime = p.get("wall_regime", "")
        assert regime.startswith("overhead-dominated"), (name, ws, wl, regime)
