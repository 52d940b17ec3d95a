"""Sources/sinks.

The reference ingests data as stdin-JSON or in-memory slices only
(/root/reference/host-go/cli/main.go:19-31, SURVEY.md §2.4). The Spark
build exposes the full native reader matrix instead; these helpers add
the conventions the engine relies on (schema hints, media binaries,
registry-view registration).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dataset_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe through the Hadoop FileSystem API, so it answers
    correctly for every URI scheme Spark itself can read (local paths,
    ``hdfs:``, ``s3a:``, ...). A driver-local ``Path.exists()`` would
    silently report a remote dataset as absent — for the incremental
    dedup indexes that meant skipping corpus dedup and appending
    duplicate rows whenever the index lived on cluster storage."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def read_json_file(spark: SparkSession, path: str) -> "dict | None":
    """Parse a small JSON file through the Hadoop FileSystem API
    (``None`` if absent) — THE one loader for every index's
    ``model.json`` (ivfpq, postings, maintenance detection). A
    driver-local ``open()`` would miss ``hdfs:``/``s3a:`` paths, and
    three private copies of the py4j buffered-reader loop were the
    same drift class the staged-swap extraction closed."""
    import json as _json

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    try:
        data = bytearray()
        buf = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8"))
        line = buf.readLine()
        while line is not None:
            data.extend((line + "\n").encode("utf-8"))
            line = buf.readLine()
    finally:
        stream.close()
    return _json.loads(bytes(data).decode("utf-8"))


def write_json_file(spark: SparkSession, path: str, payload) -> None:
    """Write a small JSON sidecar through the Hadoop FileSystem API,
    staged via tmp + rename — THE one writer for every index's
    sidecars (postings row stats, ivfpq drift accumulators, streaming
    ingest markers), the write twin of ``read_json_file`` and the
    same drift-class rationale: three private copies of this py4j
    block had already accumulated by r14. The delete-then-rename gap
    can lose the file on a crash; every consumer treats an absent or
    torn sidecar as the benign unknown fallback, never as
    corruption."""
    import json as _json

    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(path).getFileSystem(spark._jsc.hadoopConfiguration())
    tmp = P(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(_json.dumps(payload, sort_keys=True).encode("utf-8"))
    finally:
        out.close()
    fs.delete(P(path), False)
    if not fs.rename(tmp, P(path)):
        fs.delete(tmp, False)  # benign: consumers read unknown


def dataset_nonempty(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists and holds at least one *visible* file.

    Names starting with ``_`` or ``.`` (Hadoop commit markers, our
    incremental-index writer lock) don't count — a directory created
    only to host ``_writer.lock`` must still read as a missing index,
    or the bootstrap path would try to infer a parquet schema from an
    empty dataset. Same Hadoop FS routing as ``dataset_exists`` so the
    answer is correct on ``hdfs:``/``s3a:`` too."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return False
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if not name.startswith(("_", ".")):
            return True
    return False


def read_documents(spark: SparkSession, path: str, fmt: str = "parquet",
                   **options) -> DataFrame:
    """Read a document table (any Spark-native format)."""
    return spark.read.format(fmt).options(**options).load(path)


def read_json_docs(spark: SparkSession, path: str, *, multiline: bool = True,
                   permissive: bool = True) -> DataFrame:
    """JSON documents with the reference's permissive spirit: malformed
    records land in ``_corrupt_record`` instead of failing the job."""
    reader = spark.read.option("multiLine", multiline)
    if permissive:
        reader = reader.option("mode", "PERMISSIVE")
    return reader.json(path)


def read_text_corpus(spark: SparkSession, path: str, *,
                     line_per_doc: bool = True,
                     id_out: str = "doc_id", text_out: str = "text",
                     path_out: str = "source_path") -> DataFrame:
    """Raw text corpora (.txt / .jsonl-as-lines / crawl dumps) as a
    document table: ``line_per_doc=True`` (default) treats each line as
    a document (the JSONL/CC-style layout — splittable, parallel
    within large files); ``False`` treats each FILE as one document
    (wholetext — an unsplittable file becomes one row, the layout dial
    for many-small-file corpora).

    Document ids are content-addressed — xxhash64(source_path, text) —
    so re-reading the same corpus yields the same ids (the sampling.py
    determinism contract; ``monotonically_increasing_id`` changes with
    partitioning). Identical lines in the same file collide onto one
    id by construction, which downstream exact-dedup would collapse
    anyway; keep the raw line if that matters and assign ids later.
    """
    df = spark.read.text(path, wholetext=not line_per_doc).select(
        F.input_file_name().alias(path_out), F.col("value").alias(text_out))
    return df.select(
        F.xxhash64(F.col(path_out), F.col(text_out)).alias(id_out),
        text_out, path_out)


def read_media(spark: SparkSession, path_glob: str) -> DataFrame:
    """Binary media files as (path, modificationTime, length, content) —
    the X4 ingestion path. Pair with operators.multimodal."""
    return spark.read.format("binaryFile").load(path_glob)


def read_ns_timestamps(spark: SparkSession, path: str,
                       ts_cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Read parquet event tables, normalizing timestamp columns to the
    session-zoned TIMESTAMP type whatever precision the writer used.

    Two writer shapes occur in the wild (and across driver testdata
    generations — round 4 switched from ns to µs): TIMESTAMP(NANOS),
    which Spark has no type for (the legacy conf surfaces raw int64
    epoch-ns; converted by integer division — truncation, not rounding,
    so an event never moves across a window boundary; float division
    would corrupt the microsecond digit since epoch-ns overflows a
    double's 53-bit mantissa), and TIMESTAMP(MICROS) without UTC
    adjustment, which surfaces as TIMESTAMP_NTZ (cast to TIMESTAMP —
    the session zone is UTC, so wall-clock values are preserved and
    time functions like unix_micros/window accept the column).
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    dtypes = dict(df.dtypes)
    for c in ts_cols:
        if c not in df.columns:
            continue
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtypes.get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def from_rows(spark: SparkSession, rows: Iterable[dict], schema=None) -> DataFrame:
    """≙ enumerable.New([]T) — in-memory source used across tests."""
    rows = list(rows)
    if schema is not None:
        return spark.createDataFrame(rows, schema=schema)
    return spark.createDataFrame(rows)


def write_partitioned(df: DataFrame, path: str, *, partition_by: list[str],
                      fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Directory-partitioned sink: downstream filters on the partition
    columns prune whole directories at plan time (PartitionFilters) —
    the first scale lever for 100 TB layouts."""
    df.write.format(fmt).mode(mode).partitionBy(*partition_by).save(path)


def write_bucketed(df: DataFrame, table: str, *, bucket_by: list[str],
                   num_buckets: int, sort_by: list[str] | None = None,
                   fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Bucketed managed table: joins/aggs on the bucket keys between
    co-bucketed tables skip their shuffle entirely (no Exchange in the
    plan). Size num_buckets to the target cluster's parallelism, not
    today's data volume."""
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def compact_dataset(spark: SparkSession, path: str, *,
                    target_file_mb: int = 256, fmt: str = "parquet",
                    partition_by: list[str] | None = None) -> int:
    """Rewrite a dataset into ~target-sized files; returns the new file
    count.

    Long-running ingestion (streaming micro-batches, per-hour jobs)
    accretes thousands of KB-sized files; at 100 TB the resulting task
    and scheduler overhead dominates scan cost. Compaction sizes the
    output from the dataset's actual bytes (not row counts), writes to
    a temp dir, then swaps directories via two renames — readers never
    see a half-compacted dataset (the swap window is the instant
    between the two renames; atomic on local FS and HDFS, best-effort
    on object stores, like the commit protocol itself). With
    ``partition_by``, files are rewritten within the same directory
    layout so partition pruning is preserved.

    All filesystem access goes through the Hadoop FS API so the same
    call works on ``hdfs:``/``s3a:`` paths — a driver-local
    ``Path.rglob`` would silently see an empty remote dataset (the
    dataset_exists defect class).
    """
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())

    def visible_files(p):
        out = []
        it = fs.listFiles(p, True)
        while it.hasNext():
            st = it.next()
            if not st.getPath().getName().startswith(("_", ".")):
                out.append(st)
        return out

    total_bytes = sum(st.getLen() for st in visible_files(hpath))
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * (1 << 20))))
    df = spark.read.format(fmt).load(path)
    tmp = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__compacting")
    writer = df.repartition(n_files).write.format(fmt).mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(str(tmp))
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "__old")
    if not fs.rename(hpath, old):
        raise IOError(f"compact_dataset: could not move {path} aside")
    if not fs.rename(tmp, hpath):
        fs.rename(old, hpath)  # roll back: restore the original dataset
        raise IOError(f"compact_dataset: could not publish compacted {path}")
    fs.delete(old, True)
    return len(visible_files(hpath))
