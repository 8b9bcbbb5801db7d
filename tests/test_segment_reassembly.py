"""Round-13 segment-family re-shape: the drop-list + array-expression
reassembly (_segment_drop_lists + _segment_reassemble) must be value-
identical to the r6 collect_list/sort_array group-back it replaced, on
edge inputs the parquet fixtures may not exercise:

  - a doc shorter than one segment window (1 partial segment)
  - a doc whose EVERY segment drops (kept_text must be '')
  - within-doc repetition (both copies corpus-dup; keep-first keeps the
    earlier position; NOT boilerplate, which needs >= 2 distinct docs)
  - the same segment under two sources (boilerplate is source-scoped)
  - a token containing NBSP (\\u00a0 is NOT Java-regex \\s, so it rides
    inside a token and must survive reassembly byte-for-byte)
  - an empty doc (absent from output on both forms)

The reference implementation below IS the old group-back, inlined, so
any divergence in the new shape fails loudly with full rows.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from groove_to_helpscout_migration_tool_spark.catalog.corpus_ops import (
    SEG_W,
    _SEG_PACK,
    _segment_drop_lists,
    _segment_reassemble,
    _segment_table,
)

# 12-token segments: build docs from numbered words so segment
# boundaries are obvious. seg(a) == seg(b) <=> same word string.
W = [f"w{i:02d}" for i in range(SEG_W)]
SEG_A = " ".join(W)  # one full segment of distinct words
SEG_B = " ".join(f"x{i:02d}" for i in range(SEG_W))
SEG_C = " ".join(f"y{i:02d}" for i in range(SEG_W))

DOCS = [
    # (doc_id, source, text)
    (1, "s1", f"{SEG_A} {SEG_B}"),          # A dup with docs 2,3; B dup with doc 2
    (2, "s1", f"{SEG_A} {SEG_B}"),          # every segment dup -> kept_text ''
    (3, "s2", f"{SEG_A} {SEG_A}"),          # within-doc repetition, other source
    (4, "s2", "short nb sp tail"),      # < SEG_W tokens, NBSP inside a token
    (5, "s1", SEG_C),                        # unique everywhere
    (6, "s1", ""),                           # empty -> absent from output
    (7, "s1", "   "),                        # whitespace-only -> absent
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, source string, text string")


def _old_group_back(marked, kept, keys=("doc_id",)):
    """The r6 reassembly, verbatim (removed from corpus_ops in r13)."""
    return marked.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(
                F.filter(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                F.col("seg_idx").alias("seg_idx"),
                                kept.alias("kept"),
                                F.col("seg_text").alias("seg_text"),
                            )
                        )
                    ),
                    lambda s: s["kept"],
                ),
                lambda s: s["seg_text"],
            ),
            " ",
        ).alias("kept_text"),
    )


def _assert_same(new_df, old_df, keys=("doc_id",)):
    cols = [*keys, "n_segments", "n_kept", "kept_text"]
    new_rows = sorted(new_df.select(*cols).collect())
    old_rows = sorted(old_df.select(*cols).collect())
    assert new_rows == old_rows, f"\nnew={new_rows}\nold={old_rows}"
    return new_rows


def test_segment_dedup_shape_matches_old_group_back(spark):
    docs = _docs_df(spark)
    slim = _segment_table(docs, with_text=False)
    dup = (
        slim.groupBy("seg_hash")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .select("seg_hash")
    )
    new = _segment_reassemble(docs, _segment_drop_lists(slim.join(dup, ["seg_hash"])))

    ex = _segment_table(docs)
    marked = ex.join(dup.select("seg_hash", F.lit(True).alias("_dup")), ["seg_hash"], "left")
    old = _old_group_back(marked, F.col("_dup").isNull())

    rows = {r.doc_id: r for r in _assert_same(new, old)}
    # pinned edge expectations, independent of the old implementation
    assert rows[2].kept_text == "" and rows[2].n_kept == 0
    assert rows[3].n_kept == 0  # within-doc copies count as corpus dups
    assert rows[4].kept_text == "short nb sp tail"
    assert rows[5].n_kept == 1
    assert 6 not in rows and 7 not in rows


def test_keep_first_shape_matches_old_group_back(spark):
    docs = _docs_df(spark)
    slim = _segment_table(docs, with_text=False)
    packed = F.col("doc_id") * _SEG_PACK + F.col("seg_idx")
    stats = (
        slim.groupBy("seg_hash")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min(packed).alias("first_packed"))
        .filter(F.col("cnt") > 1)
        .select("seg_hash", "first_packed")
    )
    drops = _segment_drop_lists(
        slim.join(stats, ["seg_hash"]).filter(packed != F.col("first_packed"))
    )
    new = _segment_reassemble(docs, drops)

    ex = _segment_table(docs).withColumn(
        "packed", F.col("doc_id") * _SEG_PACK + F.col("seg_idx")
    )
    all_stats = ex.groupBy("seg_hash").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("packed").alias("first_packed")
    )
    marked = ex.join(all_stats, ["seg_hash"])
    kept = (F.col("cnt") == 1) | (F.col("packed") == F.col("first_packed"))
    old = _old_group_back(marked, kept)

    rows = {r.doc_id: r for r in _assert_same(new, old)}
    assert rows[1].kept_text == f"{SEG_A} {SEG_B}"  # doc 1 holds both argmins
    assert rows[2].kept_text == "" and rows[2].n_kept == 0
    assert rows[3].n_kept == 0  # doc 1's copy of SEG_A packs lower
    assert rows[5].n_kept == 1


def test_boilerplate_shape_matches_old_group_back(spark):
    from groove_to_helpscout_migration_tool_spark.catalog.mining_ops import (
        BP_MIN_DOCS,
    )

    docs = _docs_df(spark)
    slim = _segment_table(docs, carry=("source",), with_text=False)
    boiler = (
        slim.select("source", "seg_hash", "doc_id")
        .groupBy("source", "seg_hash", "doc_id")
        .agg(F.lit(1).alias("_one"))
        .groupBy("source", "seg_hash")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= BP_MIN_DOCS)
        .select("source", "seg_hash")
    )
    new = _segment_reassemble(
        docs,
        _segment_drop_lists(slim.join(boiler, ["source", "seg_hash"])),
        carry=("source",),
    ).select("doc_id", "source", "n_segments", "n_kept", "kept_text")

    ex = _segment_table(docs, carry=("source",))
    marked = ex.join(
        boiler.select("source", "seg_hash", F.lit(True).alias("_boiler")),
        ["source", "seg_hash"],
        "left",
    )
    old = _old_group_back(marked, F.col("_boiler").isNull(), keys=("doc_id", "source"))

    rows = {r.doc_id: r for r in _assert_same(new, old, keys=("doc_id", "source"))}
    # SEG_A is boilerplate in s1 (docs 1+2) but doc 3's s2 copies survive
    # (within-doc repetition is one distinct doc, not boilerplate)
    assert rows[1].n_kept == 0 and rows[2].n_kept == 0  # A and B both s1-boiler
    assert rows[3].n_kept == 2 and rows[3].kept_text == f"{SEG_A} {SEG_A}"
    assert rows[4].n_kept == 1
