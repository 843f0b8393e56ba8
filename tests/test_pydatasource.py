"""Python DataSource API connector: registration, parallel partition
planning, deterministic re-reads, and wire-format compatibility with
the existing ad-click parser."""

from __future__ import annotations

from pyspark.sql import functions as F

from analysisofuserbehavior_spark.sources.pydatasource import (
    MockClicksDataSource,
    wire_row,
)


def _register(spark):
    # re-registration with the same name is an overwrite, safe per test
    spark.dataSource.register(MockClicksDataSource)


def test_partitions_are_disjoint_and_complete(spark):
    _register(spark)
    df = (
        spark.read.format("mock_clicks")
        .option("rows", 500)
        .option("numPartitions", 7)
        .load()
    )
    ids = [r["row_id"] for r in df.collect()]
    assert sorted(ids) == list(range(500))  # no dupes, no gaps
    # planner really split the scan into the declared shards
    assert df.rdd.getNumPartitions() == 7


def test_reads_are_deterministic_across_jobs(spark):
    _register(spark)
    df = spark.read.format("mock_clicks").option("rows", 200).load()
    first = sorted((r["row_id"], r["value"]) for r in df.collect())
    second = sorted((r["row_id"], r["value"]) for r in df.collect())
    assert first == second
    # and match the driver-side closed form (retry idempotency)
    assert first[17] == wire_row(first[17][0])


def test_wire_rows_feed_existing_parser(spark):
    from analysisofuserbehavior_spark.streaming.ad_stream import (
        parse_ad_click_wire,
    )
    from analysisofuserbehavior_spark.streaming.mockstream import (
        PROVINCE_CITIES,
        PROVINCES,
    )

    _register(spark)
    raw = spark.read.format("mock_clicks").option("rows", 300).load()
    parsed = parse_ad_click_wire(raw)
    rows = parsed.collect()
    assert len(rows) == 300
    assert all(r["province"] in PROVINCES for r in rows)
    assert all(r["city"] in PROVINCE_CITIES[r["province"]] for r in rows)
    assert all(0 <= r["ad_id"] < 10 and 0 <= r["user_id"] < 1000 for r in rows)
    # downstream agg runs unchanged on the custom source
    counts = parsed.groupBy("province").agg(F.count(F.lit(1)).alias("n"))
    assert sum(r["n"] for r in counts.collect()) == 300


def test_stream_reader_two_batches_then_resume(spark, tmp_path):
    """Streaming twin: two micro-batches deliver exactly
    rowsPerBatch rows each in row_id order, identical to the batch
    source's wire rows; a RESTART from the same checkpoint resumes
    at the committed offset (no replays, no gaps)."""
    _register(spark)
    ckpt = str(tmp_path / "ckpt")
    got: list[tuple[int, str]] = []

    def run_batches(n_batches: int) -> None:
        seen = {"n": 0}

        def sink(df, _bid):
            got.extend((r["row_id"], r["value"]) for r in df.collect())
            seen["n"] += 1

        q = (
            spark.readStream.format("mock_clicks")
            .option("rowsPerBatch", 7)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="50 milliseconds")
            .start()
        )
        try:
            import time

            deadline = time.time() + 60
            while seen["n"] < n_batches and time.time() < deadline:
                time.sleep(0.1)
        finally:
            q.stop()
            q.awaitTermination()

    run_batches(2)
    assert len(got) >= 14
    first_run = len(got)
    first_max = max(i for i, _ in got)
    # restart: must RESUME from the committed offset.  Wait for TWO
    # batches — if the first is the replayed uncommitted batch, the
    # second is the one that proves forward progress.
    run_batches(2)
    ids = [i for i, _ in got]
    # foreachBatch is AT-LEAST-ONCE: stop() can land between the sink
    # completing and the offset committing, in which case the restart
    # replays exactly that one uncommitted batch (observed under a
    # loaded suite).  The resume contract is therefore: no GAPS, no
    # restart-from-zero, and at most ONE batch's rows duplicated —
    # exactly-once belongs to an idempotent sink (sources/upsert.py),
    # not to the source.
    distinct = sorted(set(ids))
    assert distinct[0] == 0 and distinct == list(range(len(distinct))), "gap"
    assert len(ids) - len(distinct) <= 7, "more than one batch replayed"
    assert max(ids) > first_max, "restart made no progress"
    assert len(got) > first_run
    # wire parity with the batch source's pure generator
    for i, v in got[:5]:
        assert (i, v) == wire_row(i)
