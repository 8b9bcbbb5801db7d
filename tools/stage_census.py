"""Per-stage task-count census for catalog queries (r14, VERDICT r13
task 4): run each named query once (fn().count(), the bench action) and
report every Spark job/stage it submitted with the stage's task count.

A stage whose task count far exceeds what its row count warrants is
pure scheduler dispatch overhead at 32 local cores -- the r13 low-core
probe showed ~45/61 headline queries FASTER at 8 cores at sf0.1, i.e.
stage dispatch, not compute, bounds their walls. This tool localizes
which stages carry the excess tasks so the fix (deriving partition
counts from data size instead of inheriting the core count) can be
applied to the specific bounded frames, not blanket.

Usage: python tools/stage_census.py <sf_dir> <query...>
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
    spark = get_session(app_name="stage-census")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def next_job_id() -> int:
        nid = sc._jsc.sc().dagScheduler().nextJobId()
        return nid if isinstance(nid, int) else nid.get()

    for name in sys.argv[2:]:
        spec = catalog.QUERIES[name]
        j0 = next_job_id()
        t0 = time.time()
        spec.fn(spark, sf_dir).count()
        dt = time.time() - t0
        j1 = next_job_id()
        rows = []
        total_tasks = 0
        n_stages = 0
        for jid in range(j0, j1):
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            for sid in sorted(ji.stageIds):
                si = tracker.getStageInfo(sid)
                if si is None:
                    continue
                n_stages += 1
                total_tasks += si.numTasks
                rows.append(
                    f"  job={jid} stage={sid} tasks={si.numTasks}"
                    f" done={si.numCompletedTasks} name={si.name[:90]}"
                )
        print(
            f"{name}: jobs={j1 - j0} stages={n_stages}"
            f" tasks={total_tasks} wall={dt:.2f}s"
        )
        for r in rows:
            print(r)
        cache.unpersist_artifacts()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
