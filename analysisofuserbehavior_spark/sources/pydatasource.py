"""Custom connector through the Python DataSource API (Spark 4).

The reference's only custom ingress is the Kafka producer thread
(util/MockRealTimeData.java:35-51).  This module rebuilds that feed
as a first-class *pluggable source*: `spark.read.format("mock_clicks")`
after one `spark.dataSource.register` call — the modern way to wrap
an external system (REST pager, message-log snapshot, proprietary
SDK) when no JVM connector exists.

Design notes for the 100 TB shape:

* Partition planning lives in `partitions()` — the driver declares
  `numPartitions` independent shards and each executor task reads
  ONLY its shard (round-robin row-id striping here; offset ranges /
  file splits / key ranges in a real connector).  Reads are fully
  parallel and never funnel through the driver.
* Generation is DETERMINISTIC per row id (md5-keyed picks), so a
  retried/speculated task regenerates identical rows — the same
  idempotent-read contract a real source needs for fault tolerance.
* Rows come out in the reference's exact wire format (`time province
  city userid adid`), so the existing `parse_ad_click_wire` and the
  whole ad-stat pipeline consume this source unchanged.

Python-source rows cross one Arrow boundary at scan time; that is
the price of a pure-Python connector and why the parquet/Kafka paths
stay the default — this API is for systems with no other door.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from ..streaming.mockstream import PROVINCE_CITIES, PROVINCES

WIRE_SCHEMA = "row_id bigint, value string"
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _pick(row_id: int, seed: int, n: int) -> int:
    """Deterministic stand-in for Random.nextInt(n), keyed on
    (row_id, seed) — stable across task retries and re-reads."""
    h = hashlib.md5(f"{row_id}:{seed}".encode()).digest()
    return int.from_bytes(h[:8], "big") % n


def wire_row(row_id: int) -> tuple[int, str]:
    """MockRealTimeData.java:42 wire format for one row id."""
    province = PROVINCES[_pick(row_id, 1, len(PROVINCES))]
    city = PROVINCE_CITIES[province][_pick(row_id, 2, 2)]
    user_id = _pick(row_id, 3, 1000)
    ad_id = _pick(row_id, 4, 10)
    ts = _EPOCH + timedelta(milliseconds=100 * row_id)  # ~10 rows/s cadence
    millis = int(ts.timestamp() * 1000)
    return row_id, f"{millis} {province} {city} {user_id} {ad_id}"


class MockClicksReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition: InputPartition):
        for row_id in range(partition.value, self.rows, self.num_partitions):
            yield wire_row(row_id)


class MockClicksDataSource(DataSource):
    """`spark.read.format("mock_clicks").option("rows", N)` after
    `spark.dataSource.register(MockClicksDataSource)`."""

    @classmethod
    def name(cls) -> str:
        return "mock_clicks"

    def schema(self) -> str:
        return WIRE_SCHEMA

    def reader(self, schema) -> MockClicksReader:
        return MockClicksReader(self.options)
