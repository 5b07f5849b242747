"""SparkSession factory.

Semantics pinned to match the reference stack (BigQuery SQL + pandas):

- **UTC session timezone** — BigQuery ``DATETIME`` is timezone-less; running
  Spark with UTC makes ``TimestampType`` behave like a wall-clock datetime
  and keeps DuckDB-oracle comparisons stable.
- **ANSI mode off** — BigQuery's ``PARSE_DATETIME`` failures were coerced to
  NULL upstream by ``pd.to_datetime(errors='coerce')`` (reference
  dags/online_retail.py:38); Spark non-ANSI ``to_timestamp`` has exactly the
  null-coerce behavior.
- **AQE on** — runtime re-planning (skew-join splitting, partition
  coalescing) is the 100 TB safety net; free at small SF.

Scale knobs are environment-variable driven so the same code runs on
``local[32]`` in tests and on a 1000-executor cluster unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Default parallelism knobs. On a real cluster these are overridden by
# spark-submit conf; locally they keep shuffle partition counts sane for
# the test scale factors.
_DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "data-pipeline-4-online-retail-spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Parameters are overridable for tests; production deployments pass
    everything through ``spark-submit --conf`` instead and the builder's
    ``getOrCreate`` picks up the externally-configured session.
    """
    cpus = int(_DEFAULT_CPUS)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # local mode: the driver JVM hosts all executor threads — the 1g
        # default heap starves 32-way shuffles/sorts. Applied only at JVM
        # launch; clusters size executors via spark-submit instead.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        # -- semantics pins ------------------------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        # -- adaptive execution: coalesce post-shuffle partitions, split
        #    skewed ones, convert to broadcast when runtime stats allow ----
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- skew-split granularity (measured, tools/skew_probe.py r9):
        #    the 256 MB/factor-5 defaults barely split a ~300 MB
        #    CPU-bound hot partition (13.0 s vs 13.7 unhandled on a 30%-
        #    hot-key join at sf10); 64 MB/factor-2 recovers 2x (6.4 s).
        #    Only partitions >2x median AND >64 MB split, so uniform
        #    workloads are untouched. ------------------------------------
        .config(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64m",
        )
        .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # -- shuffle sizing: small for local test SFs; clusters override ---
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions if shuffle_partitions is not None else cpus),
        )
        # -- scale-adaptive granularity: START each exchange 8x finer and
        #    let AQE coalesce back to the 64 MB advisory size. At sf0.1
        #    everything coalesces to the same effective partitioning
        #    (bench-verified flat); at sf100 sort-heavy stages KEEP the
        #    fine tasks — q04's 600M-row semi-join sort dies with
        #    UNABLE_TO_ACQUIRE_MEMORY at 32x ~300 MB tasks on this box
        #    and runs in 33 s at this setting (measured r9; fixed 128
        #    partitions reads 23 s, but a static number can't serve both
        #    SFs — the cluster analogue is exactly this config). ---------
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(
                8 * int(shuffle_partitions if shuffle_partitions is not None else cpus)
            ),
        )
        # -- shuffle/spill compression codec. lz4 (Spark's default) is the
        #    right latency/ratio trade on a cluster with real disks; on a
        #    spill-constrained single node (the sf100 decade probes live on
        #    ~60 GB of scratch) JVM-native zstd roughly halves shuffle-file
        #    footprint for ~5-10% CPU. Env-set SPARK_GRAFT_IO_CODEC=zstd for
        #    those probes; clusters tune via spark-submit as usual.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        # -- Arrow for the (rare) pandas_udf paths -------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # -- keep parquet scans prunable ------------------------------------
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # quiet progress bars in test logs
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def pin_session_semantics(spark: SparkSession) -> SparkSession:
    """Pin the engine's semantic contract on an externally-created session
    (e.g. the driver's): UTC wall-clock timestamps, non-ANSI null-coerce
    (BigQuery/pandas parity), nanos-parquet readability. All three are
    runtime-settable; called by every engine entry point so queries behave
    identically regardless of who built the SparkSession."""
    for key, val in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.ansi.enabled", "false"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(key, val)
        except Exception:  # pragma: no cover - conf locked/removed
            pass
    return spark
