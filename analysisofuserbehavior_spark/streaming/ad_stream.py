"""Module 4 rebuild on Structured Streaming.

Reference: spark/ad/AdClickRealTimeStatSpark.java:100-992 — DStream
micro-batches (5 s), updateStateByKey running totals, a MySQL-backed
dynamic blacklist loop, per-batch SQL window top-3, and
reduceByKeyAndWindow sliding counts.  The rebuild maps each to the
Structured Streaming equivalent:

| reference                             | rebuild                          |
|---------------------------------------|----------------------------------|
| KafkaUtils.createDirectStream (:127)  | readStream (kafka in prod; file  |
|                                       | source with maxFilesPerTrigger   |
|                                       | for deterministic tests)         |
| 5 s batches (:116)                    | trigger(processingTime/available |
|                                       | Now)                             |
| HDFS checkpoint + HA factory          | option(checkpointLocation) —     |
| (:119-227)                            | built-in recovery                |
| updateStateByKey totals (:620-676)    | streaming groupBy().count() in   |
|                                       | complete/update mode (StateStore)|
| blacklist loop: agg → MySQL → reload  | foreachBatch: anti-join a parquet|
| + leftOuterJoin filter (:234-588)     | blacklist dir, append counts,    |
|                                       | rewrite blacklist (:508 threshold|
|                                       | ≥100 → parameter)                |
| reduceByKeyAndWindow 60min/10s        | window(ts, ...) sliding agg with |
| (:898-935)                            | watermark                        |
| no watermark (processing-time only)   | explicit withWatermark — NEW     |
|                                       | decision; ref never drops late   |
|                                       | data, we default 1 hour          |

The reference parses `timestamp province city userid adid` strings
per record (:322-341); here the stream carries the events schema and
derives the same keys once, with the shared behavior-model columns.
"""

from __future__ import annotations

import os

from ..session import streaming_checkpoint_location as _ckpt_loc
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..functions import day_col, json_long

# Kafka JSON wire contract: `ts` travels as epoch-nanos long (the
# producer-side encoding; converted to a timestamp on parse).
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # wire: epoch nanos as long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# File-source replay contract: the driver parquet layout, where `ts`
# is TIMESTAMP(MICROS) without timezone (timestamp_ntz) — identical
# to what sources/loaders.load_table returns for the batch path.
EVENTS_FILE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def parse_event_json(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse a (binary/string) Kafka value column carrying events-
    schema JSON — ONE from_json per record, then the shared derived
    columns.  Works identically on a stream or a literal batch frame
    (how the unit tests exercise it without a broker)."""
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), EVENTS_SCHEMA).alias("e")
    ).select("e.*")
    return (
        parsed.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        .withColumn("day", day_col("ts"))
        .withColumn("ad_id", json_long("props", "$.k") % 10)
    )


def parse_ad_click_wire(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """The reference's EXACT wire format: a space-delimited string
    `timestamp province city userid adid` with an epoch-millis
    timestamp (AdClickRealTimeStatSpark.java:322-341 — split(" "),
    new Date(Long.valueOf(logSplited[0])), Long userid/adid).
    One split per record, all JVM-side; `day` mirrors the
    reference's yyyyMMdd datekey derivation (ISO-formatted here,
    like every other day column in the engine)."""
    p = F.split(F.col(value_col).cast("string"), " ")
    return raw.select(
        F.timestamp_millis(p.getItem(0).cast("long")).alias("ts"),
        p.getItem(1).alias("province"),
        p.getItem(2).alias("city"),
        p.getItem(3).cast("long").alias("user_id"),
        p.getItem(4).cast("long").alias("ad_id"),
    ).withColumn("day", day_col("ts"))


def read_kafka_event_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source — the production twin of `read_event_stream`
    (ref KafkaUtils.createDirectStream, AdClickRealTimeStatSpark.java:
    127-147).  The reference's payload is the space-delimited wire
    format (see `parse_ad_click_wire`); here the value is JSON in the
    events schema, parsed ONCE with from_json (`parse_event_json`).
    Requires the spark-sql-kafka package on the classpath (not in
    the test container — parsing is unit-tested on literal rows, and
    the file-source twin shares every downstream plan)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_event_json(raw)


def read_kafka_ad_click_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source speaking the reference's OWN wire format —
    byte-compatible with a producer feeding the reference system
    (AdClickRealTimeStatSpark.java:127-147 + :322-341)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_ad_click_wire(raw)


def streaming_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once event dedup inside the stream: drops replayed
    event_ids whose event time is within the watermark horizon —
    state is bounded by the watermark (dropDuplicates on an
    unbounded stream would grow state forever).  The at-least-once →
    exactly-once repair step in front of every counting query."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source event stream (kafka `readStream.format('kafka')`
    in production — same downstream plan)."""
    reader = spark.readStream.schema(EVENTS_FILE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path.endswith(".parquet"):
        # file source needs a directory; select the one file by glob
        base, fname = os.path.split(path)
        reader = reader.option("pathGlobFilter", fname)
        path = base
    raw = reader.parquet(path)
    return (
        # watermarks/windows require TIMESTAMP, not TIMESTAMP_NTZ;
        # the UTC-pinned session makes the cast identity on wall-clock
        raw.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("day", day_col("ts"))
        .withColumn("ad_id", json_long("props", "$.k") % 10)
    )


def hourly_click_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour click counts per ad — the batch-equivalent of
    the per-minute trend at streaming granularity."""
    return (
        stream.where(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("ad_id"))
        .agg(F.count(F.lit(1)).alias("click_count"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "ad_id",
            "click_count",
        )
    )


def sliding_click_trend(
    stream: DataFrame, watermark: str = "1 hour", slide: str = "10 minutes"
) -> DataFrame:
    """The reference's reduceByKeyAndWindow (60 min window / 10 s
    slide keyed by minute, :898-935) as a sliding window agg.  The
    DEFAULT slide is widened to 10 min: a 10 s slide over event-time
    assigns 360 overlapping windows per event — correct but
    pathological in state size; pass slide="10 seconds" for the
    reference's exact cadence when the deployment can afford 36×
    the window state (semantics equality at both slides is
    unit-pinned in tests/test_streaming.py)."""
    return (
        stream.where(F.col("event_type") == "click")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "60 minutes", slide).alias("w"), F.col("ad_id"))
        .agg(F.count(F.lit(1)).alias("click_count"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "ad_id",
            "click_count",
        )
    )


def run_to_completion(
    agg: DataFrame,
    query_name: str,
    mode: str = "complete",
    state_provider: str | None = None,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Drive a bounded stream to completion (availableNow) into a
    memory sink and return the final result as a batch DataFrame.

    `state_provider` ("rocksdb" or a full provider class) pins the
    state-store provider for THIS query (set before start, restored
    after) and asserts from the finished query's progress that the
    stateful operators really executed on it — the 100 TB shape,
    where HDFS-backed in-memory state caps at executor heap and
    RocksDB spills keyed state to local disk with changelog
    checkpointing.

    `state_partitions` right-sizes the STATE partition count for this
    bounded run (shuffle.partitions at stream start is what the
    checkpoint pins forever — it is a capacity knob sized to state
    volume, not to core count).  Profiled on the stream-stream join
    at sf0.1 (SCALING.md round 14): every state-store instance pays a
    ~0.1-0.5 s per-micro-batch open/commit overhead regardless of
    data volume, and a symmetric hash join keeps FOUR stores per
    partition — 32 partitions ⇒ 128 instances ⇒ a fixed multi-second
    floor per batch, vs ~32 instances at 8 partitions for identical
    results (results are partition-invariant; only the overhead
    moves).  At 100 TB you'd raise it to keep per-partition state
    executor-sized; at gate/bench SFs 8 is right-sized.  None keeps
    the session's current setting."""
    spark = agg.sparkSession
    conf_key = "spark.sql.streaming.stateStore.providerClass"
    parts_key = "spark.sql.shuffle.partitions"
    if state_provider == "rocksdb":
        state_provider = (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        )
    prev = spark.conf.get(conf_key, None) if state_provider else None
    prev_parts = spark.conf.get(parts_key, None)
    if state_provider:
        spark.conf.set(conf_key, state_provider)
    if state_partitions is not None:
        spark.conf.set(parts_key, str(state_partitions))
    try:
        q = (
            agg.writeStream.outputMode(mode)
            .format("memory")
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        from ..plans import audit as _audit

        if _audit.capture_active():
            # the LAST micro-batch's executed plan, straight from the
            # StreamExecution — what the streaming plan lint reads
            _audit.observe_micro_batch_plan(
                query_name,
                _audit.physical_section(q._jsq.explainInternal(True)),  # noqa: SLF001
            )
        if state_provider and "RocksDB" in state_provider:
            import json

            progresses = [
                json.loads(p if isinstance(p, str) else p.json)
                for p in q.recentProgress
            ]
            state_ops = [
                op for p in progresses for op in p.get("stateOperators", [])
            ]
            assert state_ops and any(
                any("rocksdb" in k.lower() for k in op.get("customMetrics", {}))
                for op in state_ops
            ), "query did not execute on the RocksDB state store"
    finally:
        if state_provider:
            if prev is not None:
                spark.conf.set(conf_key, prev)
            else:
                spark.conf.unset(conf_key)
        if state_partitions is not None:
            # restore even when there was no prior value — leaving the
            # bounded-run override of 8 in place would shrink every
            # subsequent batch query's parallelism session-wide
            # (round-12 ADVICE; same pattern as the provider conf)
            if prev_parts is not None:
                spark.conf.set(parts_key, prev_parts)
            else:
                spark.conf.unset(parts_key)
    return spark.table(query_name)


def province_top3_per_batch(
    stream: DataFrame, users: DataFrame, out_dir: str, checkpoint_dir: str
) -> None:
    """Per-micro-batch SQL window top-3 — the reference's
    transform+SQL-inside-stream pattern (AdClickRealTimeStatSpark.
    java:739-845: per-batch RDD→DF→registerTempTable→window SQL;
    its `WHERE rank>=3` bug (:840) fixed to `<=3`).  foreachBatch
    receives a BATCH DataFrame, so the full SQL surface (window
    functions included) applies; results land partitioned by epoch
    for idempotent replay."""
    udim = users.select("user_id", F.col("area").alias("province"))

    def run_batch(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        batch.join(F.broadcast(udim), "user_id").createOrReplaceTempView("_batch_clicks")
        top3 = spark.sql(
            """
            SELECT day, province, ad_id, click_count FROM (
              SELECT day, province, ad_id, count(*) AS click_count,
                     row_number() OVER (PARTITION BY day, province
                                        ORDER BY count(*) DESC, ad_id) AS rn
              FROM _batch_clicks
              WHERE event_type = 'click'
              GROUP BY day, province, ad_id
            ) WHERE rn <= 3
            """
        )
        from ..plans import audit as _audit

        out = top3.withColumn("epoch", F.lit(epoch_id))
        _audit.observe_micro_batch_frame("province_top3_batch", out)
        out.write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(run_batch)
        .option(
            "checkpointLocation",
            _ckpt_loc(stream.sparkSession, checkpoint_dir),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


class BlacklistLoop:
    """The dynamic-blacklist feedback loop (ref :234-588) on
    foreachBatch: batch N's aggregated counts fold into a COMPACTED
    keyed state table (one row per (day, user_id, ad_id)); users
    crossing `threshold` total clicks/ad/day join the blacklist;
    batch N+1 is anti-joined against the blacklist BEFORE counting.
    Exactly the reference's MySQL round-trip, minus the per-record
    SELECTs (dao/impl/AdUserClickCountImpl.java:49-78 queries MySQL
    once per record inside foreachPartition).

    Scale + delivery semantics:

    - Per-batch work is O(distinct keys + batch), NOT O(stream
      history): the state dir always holds the compacted totals, so
      each batch reads |keys| rows, unions the batch delta, and
      re-aggregates once.  (The previous design appended raw
      per-batch counts and re-aggregated the whole append-only dir
      every batch — O(history) on a long-lived stream.)
    - foreachBatch is at-least-once; replays must not double-count.
      Every state row carries `applied_epoch` = the last epoch folded
      in, written atomically WITH the totals; a replayed epoch
      (epoch_id <= applied_epoch) is skipped.  The blacklist is
      DERIVED from the totals on read, so there is no second state
      dir that could diverge from the counts under a mid-commit crash.
    - The two-step overwrite (_next, then swap) stands in for a
      transactional MERGE; a production sink would MERGE into
      Delta/Iceberg, touching only files for the batch's days.
    - SINGLE-WRITER contract (same as every foreachBatch sink
      without a table-format lock service): one live query owns a
      state dir at a time.  Crash-and-RESTART of that writer is safe
      (staged finalize + epoch replay guard, recovery in
      sources/upsert.py::_load_state); two OVERLAPPING queries are
      not — a killed query's zombie task commits can land in the dir
      after a successor recovered it.  Delta/Iceberg close that last
      gap with optimistic-concurrency commits.
    """

    _STATE_SCHEMA = (
        "day string, user_id long, ad_id long, "
        "click_count long, applied_epoch long"
    )

    def __init__(self, state_dir: str, threshold: int = 2):
        self.totals_dir = os.path.join(state_dir, "totals")
        self.threshold = threshold

    def _state(self, spark: SparkSession) -> DataFrame:
        # crash-safe shared loader (sources/upsert.py): recovers from
        # the committed `_next` staging copy after a mid-finalize
        # crash and refuses to silently reinitialize over a corrupt
        # main dir — losing this state forgets every blacklisted user
        # and double-counts replayed epochs
        from ..sources.upsert import _load_state

        return _load_state(spark, self._STATE_SCHEMA, self.totals_dir)

    def state_epoch(self, spark: SparkSession) -> tuple[DataFrame, int | None]:
        """(state frame, max applied_epoch) — the epoch comes from the
        crash-arbitration metadata read (parquet footers on local
        schemes), not a second Spark aggregation job."""
        from ..sources.upsert import _load_state_epoch

        return _load_state_epoch(spark, self._STATE_SCHEMA, self.totals_dir)

    def current_totals(self, spark: SparkSession) -> DataFrame:
        return self._state(spark).select("day", "user_id", "ad_id", "click_count")

    def current_blacklist(self, spark: SparkSession) -> DataFrame:
        return (
            self._state(spark)
            .where(F.col("click_count") >= self.threshold)
            .select("user_id")
            .distinct()
        )

    def process_batch(self, batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        state, applied = self.state_epoch(spark)
        if applied is not None and epoch_id <= applied:
            return  # at-least-once replay of an already-folded epoch
        blacklist = (
            state.where(F.col("click_count") >= self.threshold)
            .select("user_id")
            .distinct()
        )
        clean = batch.where(F.col("event_type") == "click").join(
            F.broadcast(blacklist), "user_id", "left_anti"
        )
        delta = clean.groupBy("day", "user_id", "ad_id").agg(
            F.count(F.lit(1)).alias("click_count")
        )
        totals_next = (
            state.select("day", "user_id", "ad_id", "click_count")
            .unionByName(delta)
            .groupBy("day", "user_id", "ad_id")
            .agg(F.sum("click_count").alias("click_count"))
            .withColumn("applied_epoch", F.lit(epoch_id).cast("long"))
        )
        from ..plans import audit as _audit

        _audit.observe_micro_batch_frame("blacklist_loop_totals", totals_next)
        # compacted dimension-sized state: few files (not 32 tiny
        # shuffle-partition files), then a driver-side copy+rename
        # promote instead of a second Spark job — see
        # sources/upsert.py::_promote_state for the crash contract
        from ..sources.upsert import _STATE_FILES, _promote_state

        totals_next.coalesce(_STATE_FILES).write.mode("overwrite").parquet(
            self.totals_dir + "_next"
        )
        _promote_state(spark, self.totals_dir)

    def run(
        self,
        stream: DataFrame,
        checkpoint_dir: str,
        state_partitions: int | None = 8,
    ) -> None:
        # right-size the per-batch aggregate width exactly like
        # run_to_completion's state knob: the delta/totals groupBys
        # run per micro-batch over dimension-sized state, and at the
        # session's core-count width each batch paid 32 near-empty
        # tasks of scheduling overhead per aggregate (profiled via
        # ad_blacklist_feedback: 32-task stages at < 0.4 s total CPU).
        # Capacity knob, not a core-count constant — raise it when
        # per-batch state outgrows executor-sized partitions; results
        # are partition-invariant.  Conf restored in the finally.
        spark = stream.sparkSession
        parts_key = "spark.sql.shuffle.partitions"
        prev_parts = spark.conf.get(parts_key, None)
        if state_partitions is not None:
            spark.conf.set(parts_key, str(state_partitions))
        try:
            q = (
                stream.writeStream.foreachBatch(self.process_batch)
                .option(
                    "checkpointLocation",
                    _ckpt_loc(stream.sparkSession, checkpoint_dir),
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            if state_partitions is not None:
                if prev_parts is not None:
                    spark.conf.set(parts_key, prev_parts)
                else:
                    spark.conf.unset(parts_key)


def run_ad_module(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    blacklist_threshold: int = 2,
) -> dict[str, DataFrame]:
    """Module 4 end-to-end over the bounded event stream — the
    streaming counterpart of modules.run_task: the dynamic-blacklist
    feedback loop, the updateStateByKey-style running totals
    (applyInPandasWithState), the per-batch SQL province top-3, and
    the sliding trend, each driven to completion.  Returns the final
    result tables keyed like the reference's MySQL sinks (§1.3)."""
    import os as _os

    from ..operators import behavior_model as bm
    from ..sources import load_table
    from .stateful import final_totals, running_click_totals

    users = bm.user_info(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )
    path = f"{sf_dir}/events.parquet"
    tag = sf_dir.strip("/").split("/")[-1].replace(".", "_")

    loop = BlacklistLoop(_os.path.join(work_dir, "bl_state"), blacklist_threshold)
    loop.run(read_event_stream(spark, path), _os.path.join(work_dir, "bl_ckpt"))

    totals = final_totals(
        run_to_completion(
            running_click_totals(read_event_stream(spark, path)),
            f"admod_totals_{tag}",
            mode="update",
        )
    )
    top3_dir = _os.path.join(work_dir, "top3")
    province_top3_per_batch(
        read_event_stream(spark, path),
        users,
        top3_dir,
        _os.path.join(work_dir, "top3_ckpt"),
    )
    trend = run_to_completion(
        sliding_click_trend(read_event_stream(spark, path)),
        f"admod_trend_{tag}",
    )
    return {
        "ad_blacklist": loop.current_blacklist(spark),
        "ad_stat": totals,
        "ad_province_top3": spark.read.parquet(top3_dir),
        "ad_click_trend": trend,
    }
