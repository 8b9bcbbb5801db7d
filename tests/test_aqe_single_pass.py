"""Round-13 optimization pins: the AQE no-stage-reuse fixes stay fixed.

Under AQE a twice-referenced subtree executes twice (exchange reuse only
fires with AQE off) -- the r13 finding that motivated replacing every
scalar-total crossJoin(broadcast(frame.agg())) whose left side shared the
aggregate's lineage. These tests pin the executed (final adaptive) plan
shapes so the double-cascade form cannot silently return:

  - q11_important_stock materializes the slim per-part frame once
    (localCheckpoint): the executed plan must read the materialized RDD
    and contain ZERO parquet scans (the old form's final plan held 16 --
    two full partsupp cascades, plans/r13/q11_important_stock_final.txt).
  - llm_lang_temperature_sample takes its totals from a global window
    over the O(languages) stats frame: the executed plan must hold
    exactly the two fundamental documents scans (stats pass + output
    join-back), not the old form's three.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groove_to_helpscout_migration_tool_spark import catalog


def _executed_plan(spark, sf_dir: str, name: str) -> str:
    df = catalog.QUERIES[name].fn(spark, sf_dir)
    df.count()  # drive to completion so the dump is the FINAL adaptive plan
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _scan_nodes(plan: str, kind: str) -> int:
    """Count physical operator detail entries like '(3) Scan parquet'."""
    return len(re.findall(rf"^\(\d+\) Scan {kind}", plan, re.M))


def test_q11_cascade_builds_once(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "q11_important_stock")
    assert _scan_nodes(plan, "parquet") == 0, plan
    assert _scan_nodes(plan, "ExistingRDD") >= 1, plan


def test_lang_temperature_two_fundamental_scans(spark, sf_dir):
    plan = _executed_plan(spark, sf_dir, "llm_lang_temperature_sample")
    assert _scan_nodes(plan, "parquet") == 2, plan
    # the totals ride the bounded-frame global window, never a second
    # corpus cascade: no column-keyed (corpus-keyed) window spec
    assert not re.search(r"windowspecdefinition\([^)]*#", plan), plan
