"""Session-scoped hygiene contracts (round-12 ADVICE): the JVM tmpdir
is per-process, sweep-registered, and self-healing after a crashed
sibling; run_to_completion restores shuffle.partitions even when no
prior value existed."""

from __future__ import annotations

import os

from analysisofuserbehavior_spark import session as S


def test_jvm_tmpdir_is_per_process_and_sweep_registered(tmp_path, monkeypatch):
    base = str(tmp_path / "jvmtmp")
    monkeypatch.setenv("SPARK_GRAFT_JVM_TMPDIR", base)
    # a stale dir from a "crashed" driver: pid 1 is alive (init) and
    # must survive; an impossible pid must be reaped
    os.makedirs(os.path.join(base, "pid_1"))
    os.makedirs(os.path.join(base, "pid_999999999"))
    d = S._jvm_tmpdir()
    assert d == os.path.join(base, f"pid_{os.getpid()}")
    assert os.path.isdir(d)
    assert d in S._SCRATCH_DIRS  # atexit sweep owns it
    assert os.path.isdir(os.path.join(base, "pid_1"))
    assert not os.path.exists(os.path.join(base, "pid_999999999"))
    # calling again is idempotent — one registration, same dir
    assert S._jvm_tmpdir() == d
    assert S._SCRATCH_DIRS.count(d) == 1
    S._SCRATCH_DIRS.remove(d)


def test_stream_run_restores_unset_shuffle_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from analysisofuserbehavior_spark.streaming.ad_stream import run_to_completion

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    src = str(tmp_path / "src")
    spark.range(10).select(
        F.col("id").alias("user_id"), F.lit(1).alias("n")
    ).write.parquet(src)
    stream = (
        spark.readStream.schema("user_id long, n int").parquet(src)
        .groupBy("user_id").agg(F.sum("n").alias("total"))
    )
    out = run_to_completion(stream, "t_restore_parts", state_partitions=4)
    assert out.count() == 10
    assert spark.conf.get(key) == before


def test_checkpoint_file_checksums_default_off_and_env_overridable(spark):
    """Round-12 optimization: Spark 4.1's checkpoint-file checksums
    make every state-store delta close() await an async checksum
    future (thread-dump evidence in session.py) — off by default for
    this engine's ephemeral tmpfs checkpoints, re-enabled for durable
    deployments via SPARK_GRAFT_CKPT_CHECKSUM."""
    key = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    assert spark.conf.get(key) == "false"
    # the env override is read at session build time
    from analysisofuserbehavior_spark import session as S
    import os

    assert os.environ.get("SPARK_GRAFT_CKPT_CHECKSUM", "false") == "false"


def test_dataframe_debugging_default_off_and_env_overridable(spark):
    """Round-12 optimization: PySpark 4's per-API-call call-site
    capture costs 2-3 py4j round trips per DataFrame/Column call
    (evidence in session.py) — off by default; debug sessions
    re-enable via SPARK_GRAFT_DF_DEBUG=true.  Only error-message
    enrichment is affected; plans and results are identical."""
    assert spark.conf.get("spark.python.sql.dataFrameDebugging.enabled") == "false"
    import os

    assert os.environ.get("SPARK_GRAFT_DF_DEBUG", "false") == "false"
