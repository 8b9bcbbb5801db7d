"""Snapshot-regeneration gate (VERDICT r9 task 6): ONE command that
rebuilds the gitignored scale snapshots and re-runs the invariant tests
that are skipped whenever the snapshots are absent, so scale evidence is
re-derivable at any HEAD without archaeology.

    python tools/regen_snapshots.py            # testdata_sf1/ + gate
    python tools/regen_snapshots.py --sf10     # also testdata_sf10/

Both generators are deterministic (gen_scale.py is a pure function of
SEED; gen_scale_rel.py is a pure function of the read-only sf0.1
parquet), so the regenerated snapshots are bit-identical across runs
and machines -- which is exactly why they stay out of git. The gate at
the end is `pytest tests/test_gen_scale_rel.py` (the replica-block
invariants: 10x dense-tiled keys, exact fanout-histogram scaling,
referential integrity, replica-0 bit-identity); those tests self-skip
without the snapshot, so running them here proves the regeneration
actually produced the corpus the scale evidence was measured on.
"""

from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run(desc: str, cmd: list[str]) -> None:
    print(f"--- {desc}: {' '.join(cmd)}", flush=True)
    proc = subprocess.run(cmd, cwd=REPO)
    if proc.returncode != 0:
        print(f"FAILED: {desc} (exit {proc.returncode})", file=sys.stderr)
        sys.exit(proc.returncode)


def main() -> None:
    sf10 = "--sf10" in sys.argv[1:]
    py = sys.executable
    run(
        "sf1 documents/embeddings",
        [py, os.path.join(HERE, "gen_scale.py"), os.path.join(REPO, "testdata_sf1")],
    )
    run(
        "sf1 relational tables",
        [py, os.path.join(HERE, "gen_scale_rel.py"), os.path.join(REPO, "testdata_sf1")],
    )
    if sf10:
        run(
            "sf10 documents/embeddings (10x)",
            [
                py,
                os.path.join(HERE, "gen_scale.py"),
                os.path.join(REPO, "testdata_sf10"),
                "10",
            ],
        )
        run(
            "sf10 relational tables (100 replicas)",
            [
                py,
                os.path.join(HERE, "gen_scale_rel.py"),
                os.path.join(REPO, "testdata_sf10"),
                "100",
            ],
        )
    run(
        "invariant gate (un-skips with the snapshot present)",
        [py, "-m", "pytest", "tests/test_gen_scale_rel.py", "-q"],
    )
    print("snapshots regenerated and invariants green")


if __name__ == "__main__":
    main()
