"""SparkSession factory.

One place to encode the engine's physical-execution posture so every entry
point (tests, bench, driver contract) runs with the same plan-shaping config:

- AQE on (runtime join-strategy switch, skew-join split, partition coalescing)
  — this is the 100 TB story: plans re-shape themselves from runtime stats
  instead of trusting static estimates.
- ``spark.sql.shuffle.partitions`` sized to the local core count for tests;
  on a real cluster AQE's coalescing makes the initial number a ceiling, not
  a constant, so a high initial value + coalescing is the scale-out setting.
- Arrow enabled: every pandas_udf / applyInPandas / toPandas boundary is
  columnar-batched instead of row-pickled.
- Session timezone pinned to UTC so ``to_date``/``date_trunc`` agree with the
  DuckDB oracle regardless of host TZ (reference stores TIMESTAMP_NTZ —
  SURVEY.md §1.2; a fixed-UTC session gives the same no-shift behavior).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

def default_cpus() -> int:
    """SPARK_GRAFT_CPUS resolved at CALL time, not import time — a test
    or driver that sets the env var after importing the package must not
    be silently ignored (config.load_config reads the same variable at
    call time; the two paths must agree)."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "aws_snowflake_kinesis_airflow_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    cpus: int | None = None,
) -> SparkSession:
    """Build (or fetch) the session with the engine's standard config."""
    if cpus is None:
        cpus = default_cpus()
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Broadcast anything the planner *knows* is <= 32 MiB; dimension
        # tables (region/nation/customer at bench SF) stay broadcast-side.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # The fixture events table stores TIMESTAMP(NANOS) parquet, which
        # Spark has no native type for; read as long (ns since epoch) and let
        # the catalog normalize to microsecond TimestampType (catalog.py).
        # InferFiltersFromGenerate synthesizes `size(arr) > 0 AND
        # isnotnull(arr)` below every explode — with the FULL array
        # expression inlined. For this engine's explodes the array is
        # always an expensive computed column (shingle sets, LSH band
        # buckets, token arrays), so the rule (a) computes it twice per
        # row and (b) lets filter-pushdown drag the duplicate below the
        # scan/exchange, serializing it on the scan's task count.
        # Measured on the sf1 shingle index: 6.3 s -> 0.7 s from
        # excluding the rule. The rule's win (dropping empty-array rows
        # pre-shuffle) is negligible here: empty shingle sets are rare
        # and 16 bytes each.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Shuffle/spill codec (guide §2.3): default stays Spark's lz4 so
        # bench/driver runs are config-identical across rounds; zstd is
        # opt-in for disk-bound scale sittings (the 50 M index build's
        # set-store shuffle overflowed this box's free disk under lz4 —
        # zstd's ~40% smaller shuffle files fit it; wall impact at bench
        # SFs not measured, hence not the default).
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
