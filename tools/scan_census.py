"""Executed-plan scan census: run each named catalog query (count(),
the bench action) and report, from the FINAL adaptive plan, how many
times each parquet relation is scanned, plus Exchange / ReusedExchange
/ InMemoryTableScan counts. A relation scanned more times than the
query semantically re-reads it is the signature of the r13 AQE
no-stage-reuse finding (a twice-referenced subtree executes twice);
this tool is the catalog-wide detector that turns that finding into a
checklist instead of an anecdote.

Usage: python tools/scan_census.py <sf_dir> <query...|ALL>
Output: one line per query:
  name  scans=N  exch=N  reuse=N  imts=N  multi=rel:count,rel:count
where multi lists relations scanned more than once.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groove_to_helpscout_migration_tool_spark import catalog, get_session
from groove_to_helpscout_migration_tool_spark.operators import cache


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    if names == ["ALL"]:
        with open(
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "bench_manifest.json",
            )
        ) as f:
            names = list(json.load(f)["headline"])
    spark = get_session(app_name="scan-census")
    for name in names:
        spec = catalog.QUERIES[name]
        try:
            df = spec.fn(spark, sf_dir)
            df.count()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - census must not die mid-sweep
            print(f"{name}  ERR {type(e).__name__}: {e}")
            cache.unpersist_artifacts()
            spark.catalog.clearCache()
            continue
        rels: dict[str, int] = {}
        for m in re.finditer(r"Location:.*?\[?file:[^\]\s,]*/([^/\]\s,]+\.parquet)", plan):
            rels[m.group(1)] = rels.get(m.group(1), 0) + 1
        scans = len(re.findall(r"\(\d+\) Scan parquet", plan))
        exch = len(re.findall(r"\(\d+\) Exchange", plan))
        reuse = len(re.findall(r"ReusedExchange", plan))
        imts = len(re.findall(r"InMemoryTableScan", plan))
        multi = ",".join(f"{k}:{v}" for k, v in sorted(rels.items()) if v > 1)
        print(
            f"{name}  scans={scans}  exch={exch}  reuse={reuse}  imts={imts}"
            + (f"  multi={multi}" if multi else "")
        )
        cache.unpersist_artifacts()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
