"""Count Spark jobs + wall for one full execution of a catalog query
(fn().count(), the bench action) — the box-speed-independent A/B metric
the r13 record uses alongside executed-plan node counts.

Usage: python tools/qjobs.py <sf_dir> <query...>
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groove_to_helpscout_migration_tool_spark import catalog, get_session
from groove_to_helpscout_migration_tool_spark.operators import cache


def main() -> None:
    sf_dir = sys.argv[1]
    spark = get_session(app_name="qjobs")

    def job_counter() -> int:
        # nextJobId is the DAGScheduler's monotonically-increasing job
        # id counter; the delta across an action is the exact number of
        # Spark jobs it submitted (AQE subjobs included).
        nid = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
        return nid if isinstance(nid, int) else nid.get()

    for name in sys.argv[2:]:
        spec = catalog.QUERIES[name]
        j0 = job_counter()
        t0 = time.time()
        df = spec.fn(spark, sf_dir)
        n = df.count()
        dt = time.time() - t0
        jobs = job_counter() - j0
        print(f"{name}: rows={n} jobs={jobs} wall={dt:.2f}s")
        cache.unpersist_artifacts()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
