"""Sink/layout tests: partition pruning and bucketed co-located joins —
the two table-layout levers the 100 TB design leans on."""

from __future__ import annotations

from pyspark.sql import functions as F

from lens_spark.sources import write_bucketed, write_partitioned


def test_partitioned_write_prunes_at_plan_time(spark, tmp_path):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    path = str(tmp_path / "orders_by_status")
    write_partitioned(orders, path, partition_by=["o_orderstatus"])
    back = spark.read.parquet(path).filter("o_orderstatus = 'F'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the filter must become a partition filter, not a row filter
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    want = orders.filter("o_orderstatus = 'F'").count()
    assert back.count() == want


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        write_bucketed(orders.withColumnRenamed("o_custkey", "custkey"),
                       "orders_b", bucket_by=["custkey"], num_buckets=4)
        write_bucketed(customer.withColumnRenamed("c_custkey", "custkey"),
                       "customer_b", bucket_by=["custkey"], num_buckets=4)
        joined = spark.table("orders_b").join(spark.table("customer_b"), "custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "co-bucketed join must not shuffle"
        assert joined.count() == orders.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")
        import shutil
        shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_compact_dataset_reduces_file_count(spark, tmp_path):
    from lens_spark.sources import compact_dataset

    path = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)  # 64 tiny files
    before = len([f for f in (tmp_path / "frag").glob("*.parquet")])
    assert before >= 32
    after = compact_dataset(spark, path, target_file_mb=256)
    assert after < before
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_compact_dataset_preserves_partition_layout(spark, tmp_path):
    from lens_spark.sources import compact_dataset

    path = str(tmp_path / "bypart")
    df = spark.range(1_000).withColumn("p", (F.col("id") % 3).cast("int"))
    df.repartition(16).write.partitionBy("p").parquet(path)
    compact_dataset(spark, path, target_file_mb=256, partition_by=["p"])
    subdirs = sorted(d.name for d in (tmp_path / "bypart").iterdir()
                     if d.is_dir())
    assert subdirs == ["p=0", "p=1", "p=2"]
    assert spark.read.parquet(path).count() == 1_000


def test_read_text_corpus_line_and_file_modes(spark, tmp_path):
    """Line mode: one doc per line with content-addressed ids stable
    across re-reads; file mode: one doc per file including newlines."""
    from lens_spark.sources import read_text_corpus

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("alpha one\nbeta two\n")
    (d / "b.txt").write_text("gamma three\n")
    lines = read_text_corpus(spark, str(d)).collect()
    assert {r.text for r in lines} == {"alpha one", "beta two", "gamma three"}
    assert all(r.source_path.endswith((".txt",)) for r in lines)
    ids1 = sorted(r.doc_id for r in lines)
    ids2 = sorted(r.doc_id for r in read_text_corpus(spark, str(d)).collect())
    assert ids1 == ids2 and len(set(ids1)) == 3   # deterministic, distinct

    files = read_text_corpus(spark, str(d), line_per_doc=False).collect()
    assert {r.text for r in files} == {"alpha one\nbeta two\n",
                                       "gamma three\n"}


# --- versioned snapshots ------------------------------------------------

def test_snapshot_append_and_time_travel(spark, tmp_path):
    from lens_spark.sources.snapshots import (
        snapshot_read, snapshot_versions, snapshot_write)
    p = str(tmp_path / "snap")
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    df2 = spark.createDataFrame([(2, "b")], "id long, v string")
    v1 = snapshot_write(df1, p)
    v2 = snapshot_write(df2, p, mode="append")
    assert (v1, v2) == (1, 2)
    assert {r.id for r in snapshot_read(spark, p).collect()} == {1, 2}
    assert {r.id for r in snapshot_read(spark, p, version=1).collect()} == {1}
    vs = snapshot_versions(spark, p)
    assert [m["version"] for m in vs] == [1, 2]
    assert vs[1]["parent"] == 1 and vs[1]["n_dirs"] == 2


def test_snapshot_diff_flags_added_removed_changed(spark, tmp_path):
    from lens_spark.sources.snapshots import snapshot_diff, snapshot_write
    p = str(tmp_path / "snap")
    v1 = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "z")],
        "id long, s string, t string")
    v2 = spark.createDataFrame(
        [(2, "b", "y"), (3, "c", "Z!"), (4, "d", "w")],
        "id long, s string, t string")
    snapshot_write(v1, p, mode="overwrite")
    snapshot_write(v2, p, mode="overwrite")
    got = {r.id: r.change
           for r in snapshot_diff(spark, p, 1, 2, ["id"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_snapshot_diff_validates_inputs(spark, tmp_path):
    import pytest as _pytest

    from lens_spark.sources.snapshots import snapshot_diff, snapshot_write
    p = str(tmp_path / "snap")
    snapshot_write(spark.createDataFrame([(1, "a")], "id long, s string"), p)
    snapshot_write(spark.createDataFrame([(1, "a"), (2, "b")],
                                         "id long, s string"), p)
    with _pytest.raises(ValueError, match="non-empty"):
        snapshot_diff(spark, p, 1, 2, [])


def test_snapshot_overwrite_starts_fresh_but_keeps_history(spark, tmp_path):
    from lens_spark.sources.snapshots import snapshot_read, snapshot_write
    p = str(tmp_path / "snap")
    snapshot_write(spark.createDataFrame([(1,)], "id long"), p)
    snapshot_write(spark.createDataFrame([(2,)], "id long"), p,
                   mode="overwrite")
    assert {r.id for r in snapshot_read(spark, p).collect()} == {2}
    assert {r.id for r in snapshot_read(spark, p, version=1).collect()} == {1}


def test_snapshot_vacuum_reclaims_and_protects_kept(spark, tmp_path):
    from lens_spark.sources.snapshots import (
        snapshot_read, snapshot_vacuum, snapshot_versions, snapshot_write)
    p = str(tmp_path / "snap")
    for i in range(4):
        snapshot_write(spark.createDataFrame([(i,)], "id long"), p,
                       mode="overwrite")
    removed = snapshot_vacuum(spark, p, keep_last=2)
    assert removed == 2                       # v1+v2 dirs reclaimed
    assert [m["version"] for m in snapshot_versions(spark, p)] == [3, 4]
    assert {r.id for r in snapshot_read(spark, p).collect()} == {3}
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        snapshot_read(spark, p, version=1)


def test_snapshot_vacuum_removes_orphan_dirs(spark, tmp_path):
    """A crashed commit (data staged, manifest never created) is
    invisible to readers and reclaimed by vacuum."""
    from lens_spark.sources.snapshots import (
        snapshot_read, snapshot_vacuum, snapshot_write)
    p = str(tmp_path / "snap")
    snapshot_write(spark.createDataFrame([(1,)], "id long"), p)
    # simulate the crash: stage a data dir with no manifest
    spark.createDataFrame([(99,)], "id long").write.parquet(
        f"{p}/data/deadbeef0000")
    assert {r.id for r in snapshot_read(spark, p).collect()} == {1}
    assert snapshot_vacuum(spark, p, keep_last=1) == 1
    assert {r.id for r in snapshot_read(spark, p).collect()} == {1}


def test_snapshot_commit_race_yields_distinct_versions(spark, tmp_path):
    """Two writers staging concurrently both commit — to different
    versions (the optimistic manifest create can't be double-won)."""
    from lens_spark.sources.snapshots import snapshot_read, snapshot_write
    p = str(tmp_path / "snap")
    a = snapshot_write(spark.createDataFrame([(1,)], "id long"), p)
    b = snapshot_write(spark.createDataFrame([(2,)], "id long"), p)
    assert {a, b} == {1, 2}
    assert {r.id for r in snapshot_read(spark, p).collect()} == {1, 2}


def test_snapshot_diff_between_versions(spark, tmp_path):
    """The versioning layer composes with dataset_diff for the audit."""
    from lens_spark.operators.relational import dataset_diff
    from lens_spark.sources.snapshots import snapshot_read, snapshot_write
    p = str(tmp_path / "snap")
    snapshot_write(spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, v string"), p)
    snapshot_write(spark.createDataFrame(
        [(2, "B"), (3, "c")], "id long, v string"), p, mode="overwrite")
    old = snapshot_read(spark, p, version=1)
    new = snapshot_read(spark, p, version=2)
    d = {r.id: r.status for r in
         dataset_diff(old, new, keys=["id"]).collect()}
    assert d == {1: "removed", 2: "changed", 3: "added"}
