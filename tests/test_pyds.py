"""Python Data Source: paginated scan semantics as a real Spark source
(page partitions, pushdown pruning, streaming offsets = resume tokens)."""

from __future__ import annotations

import json

import pytest

from groove_to_helpscout_migration_tool_spark.sources.pyds import PagedJsonDataSource

N_RECORDS, PER_PAGE = 123, 10  # 13 pages, last one short


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    p = tmp_path_factory.mktemp("pyds") / "customers.jsonl"
    with open(p, "w") as f:
        for i in range(N_RECORDS):
            f.write(
                json.dumps(
                    {"id": i, "email": f"user{i}@example.com", "name": f"User {i}"}
                )
                + "\n"
            )
    return str(p)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(PagedJsonDataSource)
    return spark


class TestBatchRead:
    def test_full_scan(self, registered, snapshot):
        df = (
            registered.read.format("groove_pages")
            .option("path", snapshot)
            .option("per_page", PER_PAGE)
            .load()
        )
        assert df.count() == N_RECORDS
        # page = partition axis, 1-indexed like the reference's pagination
        assert df.rdd.getNumPartitions() == 13
        first = df.where("id = 0").collect()[0]
        assert (first["page"], first["email"]) == (1, "user0@example.com")

    def test_page_filter_prunes_partitions(self, registered, snapshot):
        df = (
            registered.read.format("groove_pages")
            .option("path", snapshot)
            .option("per_page", PER_PAGE)
            .load()
            .filter("page >= 3 AND page <= 5")
        )
        assert df.count() == 30
        # pushFilters turned the predicate into partition pruning
        assert df.rdd.getNumPartitions() == 3

    def test_start_stop_page_options(self, registered, snapshot):
        df = (
            registered.read.format("groove_pages")
            .option("path", snapshot)
            .option("per_page", PER_PAGE)
            .option("start_page", 13)
            .load()
        )
        assert df.count() == 3  # 123 = 12*10 + 3

    def test_degenerate_page_range_returns_zero_rows(self, registered, snapshot):
        # `page < 1` pushes stop_page=0; a falsy-check bug would drop the
        # consumed bound and return EVERY page (ADVICE round 1).
        df = (
            registered.read.format("groove_pages")
            .option("path", snapshot)
            .option("per_page", PER_PAGE)
            .load()
            .filter("page < 1")
        )
        assert df.count() == 0

    def test_residual_filter_still_applied(self, registered, snapshot):
        df = (
            registered.read.format("groove_pages")
            .option("path", snapshot)
            .option("per_page", PER_PAGE)
            .load()
            .filter("page = 2 AND email = 'user15@example.com'")
        )
        rows = df.collect()
        assert [r["id"] for r in rows] == [15]


class TestStreamRead:
    def test_one_page_per_microbatch_resume_offsets(self, registered, snapshot, tmp_path):
        stream = (
            registered.readStream.format("groove_pages")
            .option("path", snapshot)
            .option("per_page", PER_PAGE)
            .option("start_page", 11)
            .load()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("pyds_pages")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = registered.sql("SELECT * FROM pyds_pages")
        assert got.count() == 23  # pages 11..13 = 10 + 10 + 3
        assert got.select("page").distinct().count() == 3
