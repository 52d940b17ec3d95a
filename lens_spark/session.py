"""SparkSession factory with scale-minded defaults.

Tuned for the driver environment (local[$SPARK_GRAFT_CPUS], 128 GiB)
but every setting is chosen to also be the right default on a large
cluster: AQE on (runtime re-planning, skew-join splitting, partition
coalescing), Arrow enabled for the Pandas-UDF escape hatch, and shuffle
partitions sized to the parallelism rather than Spark's legacy 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def get_spark(app_name: str = "lens_spark", *, shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Runtime re-planning: coalesce tiny shuffle partitions, split skewed
        # ones — the 100 TB safety net for every groupBy/join below.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(cpus, 8)))
        # Arrow for the python_udf escape hatch (batched, columnar transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Timestamps in testdata are ns-precision parquet.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # The sources layer reinterprets TIMESTAMP_NTZ as TIMESTAMP, which is
        # only zone-independent if the session zone is pinned. Without this,
        # a non-UTC JVM default shifts event instants by the zone offset and
        # window boundaries/unix_micros diverge from the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def sf_dir(default: str = "/root/testdata/sf0.1") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_tables(spark: SparkSession, sf_path: str, names: tuple[str, ...] = TABLES):
    """Read the driver's parquet tables and register temp views."""
    out = {}
    for name in names:
        df = spark.read.parquet(f"{sf_path}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
