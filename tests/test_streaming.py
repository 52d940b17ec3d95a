"""Structured Streaming surface tests.

The reference's "stream" is a bounded pull iterator (SURVEY.md §2.6);
these tests prove the same pipeline specs run unchanged on unbounded
Spark streams — plus the streaming-only surface (watermarked windows,
bounded-state dedup) the 100 TB profile needs.

All tests run real streaming queries (file source → memory sink,
Trigger.AvailableNow), not batch stand-ins.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from lens_spark.sources import read_ns_timestamps
from lens_spark.streaming import (
    apply_stream,
    read_file_stream,
    run_available_now,
    streaming_dedup,
    windowed_counts,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """events.parquet staged as a streaming source directory."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(EVENTS, d / "part-000.parquet")
    return str(d)


def test_lens_pipeline_on_a_real_stream(spark, events_dir):
    """The same spec engine.append compiles for batch runs on a stream."""
    spec = {"lenses": [
        {"name": "filter", "arguments": {"predicate": "value > 0"}},
        {"name": "rename", "arguments": {"src": "event_type", "dst": "kind"}},
    ]}
    stream = read_file_stream(spark, events_dir, schema_from=EVENTS,
                              ts_cols=("ts",))
    assert stream.isStreaming
    got = run_available_now(apply_stream(stream, spec))

    batch = read_ns_timestamps(spark, EVENTS).filter("value > 0") \
        .withColumnRenamed("event_type", "kind")
    assert got.count() == batch.count()
    assert set(got.columns) == set(batch.columns)


def test_windowed_counts_with_watermark_on_stream(spark, events_dir):
    """Event-time tumbling windows + watermark on a real stream equal the
    batch computation once the stream is fully drained."""
    stream = read_file_stream(spark, events_dir, schema_from=EVENTS,
                              ts_cols=("ts",))
    streamed = run_available_now(
        windowed_counts(stream, ts_col="ts", window="1 hour",
                        watermark="2 hours", keys=["event_type"]),
        output_mode="append",
    )
    batch = windowed_counts(read_ns_timestamps(spark, EVENTS), ts_col="ts",
                            window="1 hour", keys=["event_type"])
    # append mode only emits windows the watermark has closed; with
    # AvailableNow + bounded input that is every window except the last.
    batch_rows = {tuple(r) for r in batch.collect()}
    stream_rows = {tuple(r) for r in streamed.collect()}
    assert stream_rows, "stream emitted no closed windows"
    assert stream_rows <= batch_rows
    missing = batch_rows - stream_rows
    if missing:
        # the withheld windows are exactly the tail the 2h watermark
        # hadn't closed when the bounded input ran dry
        assert min(r[0] for r in missing) > max(r[0] for r in stream_rows), \
            "a window older than an emitted one was withheld"


def test_driver_streaming_query_equals_batch(spark):
    """The driver-visible streaming query (entry tail slot) must equal
    the batch windowed aggregate exactly: complete output mode on a
    bounded replay emits every window."""
    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    streamed = entrymod.queries()["streaming_events_windowed"](spark, sf_dir)
    batch = windowed_counts(read_ns_timestamps(spark, f"{sf_dir}/events.parquet"),
                            ts_col="ts", window="1 hour", keys=["event_type"])
    assert {tuple(r) for r in streamed.collect()} \
        == {tuple(r) for r in batch.collect()}


def test_streaming_dedup_within_watermark(spark, events_dir):
    stream = read_file_stream(spark, events_dir, schema_from=EVENTS,
                              ts_cols=("ts",))
    got = run_available_now(
        streaming_dedup(stream, ["user_id"], ts_col="ts", watermark="1 hour"))
    batch_distinct = read_ns_timestamps(spark, EVENTS) \
        .select("user_id").distinct().count()
    # watermark-bounded dedup can only re-admit a key after the horizon
    # passes, never drop extra distinct keys
    assert got.select("user_id").distinct().count() == batch_distinct
    assert got.count() >= batch_distinct


def test_stateful_counter_lens_on_stream_raises_cleanly(spark, events_dir):
    """Global-ordering lenses are batch-only; the stream path must fail
    with a clear error, not silently misnumber (SURVEY.md §7.4a)."""
    spec = {"lenses": [{"name": "counter", "arguments": {"order_by": ["ts"]}}]}
    stream = read_file_stream(spark, events_dir, schema_from=EVENTS,
                              ts_cols=("ts",))
    with pytest.raises(Exception):
        run_available_now(apply_stream(stream, spec))


def test_stateful_running_count_across_microbatches(spark, tmp_path):
    """applyInPandasWithState: state must persist across micro-batches
    (≙ module state across transform calls,
    host-go/engine/tests/wasm32_pipeline_with_state_test.go)."""
    import pandas as pd
    from lens_spark.streaming import read_file_stream, run_available_now, \
        stateful_running_count

    d = tmp_path / "counts_stream"
    d.mkdir()
    # two files + maxFilesPerTrigger=1 => two micro-batches
    pd.DataFrame({"k": ["a", "a", "b"]}).to_parquet(d / "f1.parquet")
    pd.DataFrame({"k": ["a", "b", "b"]}).to_parquet(d / "f2.parquet")
    stream = read_file_stream(spark, str(d), schema_from=str(d / "f1.parquet"),
                              maxFilesPerTrigger=1)
    got = run_available_now(stateful_running_count(stream, ["k"]),
                            output_mode="update")
    # final cumulative totals must aggregate across both batches
    final = {r.k: r.running_count
             for r in got.groupBy("k")
             .agg(F.max("running_count").alias("running_count")).collect()}
    assert final == {"a": 3, "b": 3}
    # more than one emission per key proves multiple micro-batches ran
    assert got.count() > 2


def _have_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


def test_running_count_processor_accumulates_across_batches():
    """Runtime-free contract test of the transformWithState processor:
    state persists across handleInputRows calls (micro-batches) and
    totals match the batch count — the parity assertion the full
    streaming integration test makes when protobuf is available."""
    import pandas as pd

    from lens_spark.streaming import running_count_processor

    class FakeValueState:
        def __init__(self):
            self._v = None

        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.states.setdefault(name, FakeValueState())

    proc = running_count_processor(["k"])
    proc.init(FakeHandle())
    # batch 1: two 'a' rows; batch 2: one more 'a'
    (r1,) = proc.handleInputRows(("a",), iter([pd.DataFrame({"k": ["a", "a"]})]))
    assert r1.iloc[0]["running_count"] == 2
    (r2,) = proc.handleInputRows(("a",), iter([pd.DataFrame({"k": ["a"]})]))
    assert r2.iloc[0]["running_count"] == 3  # state crossed the batch
    proc.close()


@pytest.mark.skipif(
    not _have_protobuf(),
    reason="transformWithState's Python worker needs protobuf (absent "
           "in this container); the processor contract is covered by "
           "test_running_count_processor_accumulates_across_batches")
def test_stateful_running_count_tws_matches_apply_in_pandas(spark, tmp_path):
    """transformWithStateInPandas port of the M5 counter (r6): same
    cumulative totals as the applyInPandasWithState implementation on
    the same two-micro-batch stream, and state survives batches.
    Requires the RocksDB state store (the only provider
    transformWithState supports) — set for this query, restored
    after."""
    import pandas as pd

    from lens_spark.streaming import (
        read_file_stream,
        run_available_now,
        stateful_running_count_tws,
    )

    d = tmp_path / "tws_stream"
    d.mkdir()
    pd.DataFrame({"k": ["a", "a", "b"]}).to_parquet(d / "f1.parquet")
    pd.DataFrame({"k": ["a", "b", "b"]}).to_parquet(d / "f2.parquet")
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    try:
        stream = read_file_stream(spark, str(d),
                                  schema_from=str(d / "f1.parquet"),
                                  maxFilesPerTrigger=1)
        got = run_available_now(stateful_running_count_tws(stream, ["k"]),
                                output_mode="update")
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    final = {r.k: r.running_count
             for r in got.groupBy("k")
             .agg(F.max("running_count").alias("running_count")).collect()}
    # batch parity: cumulative totals equal the plain batch groupBy count
    assert final == {"a": 3, "b": 3}
    assert got.count() > 2  # state crossed at least two micro-batches


def test_stream_static_broadcast_join(spark, events_dir):
    """Enriching a stream with a dimension table — the canonical
    stream-static join. The static side broadcasts per micro-batch;
    the stream side never shuffles. The join lens spec is identical
    to the batch form."""
    users = spark.range(0, 200).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 5).cast("string").alias("cohort"))
    users.createOrReplaceTempView("user_dim")
    spec = {"lenses": [
        {"name": "join", "arguments": {
            "right_view": "user_dim", "on": ["user_id"],
            "broadcast": True, "how": "left"}},
        {"name": "aggregate", "arguments": {
            "keys": ["cohort"], "aggs": {"n": "count(*)"}}},
    ]}
    stream = read_file_stream(spark, events_dir, schema_from=EVENTS,
                              ts_cols=("ts",))
    got = run_available_now(apply_stream(stream, spec),
                            output_mode="complete")
    batch = read_ns_timestamps(spark, EVENTS) \
        .join(users, "user_id", "left").groupBy("cohort").count()
    assert {(r.cohort, r.n) for r in got.collect()} == \
        {(r.cohort, r["count"]) for r in batch.collect()}


def test_stream_to_dataset_foreachbatch_sink(spark, events_dir, tmp_path):
    """Stream → lens pipeline → partitioned parquet landing zone, the
    production write path (exactly-once per checkpointed batch id)."""
    from lens_spark.streaming import stream_to_dataset

    out_dir = str(tmp_path / "landing")
    spec = {"lenses": [
        {"name": "filter", "arguments": {"predicate": "value > 0"}},
        {"name": "project", "arguments": {
            "columns": ["event_id", "event_type", "value"]}},
    ]}
    stream = read_file_stream(spark, events_dir, schema_from=EVENTS,
                              ts_cols=("ts",))
    stream_to_dataset(stream, out_dir, spec=spec,
                      partition_by=["event_type"],
                      checkpoint=str(tmp_path / "ckpt"))
    landed = spark.read.parquet(out_dir)
    expect = read_ns_timestamps(spark, EVENTS).filter("value > 0")
    assert landed.count() == expect.count()
    # partitioned layout: one dir per event_type
    subdirs = {d.name.split("=")[0] for d in (tmp_path / "landing").iterdir()
               if d.is_dir()}
    assert subdirs == {"event_type"}


def test_stream_to_dataset_restart_does_not_duplicate(spark, events_dir, tmp_path):
    """Re-running with the same checkpoint replays no batches: the
    exactly-once property the landing zone depends on."""
    from lens_spark.streaming import stream_to_dataset

    out_dir = str(tmp_path / "landing2")
    ckpt = str(tmp_path / "ckpt2")

    def run():
        stream = read_file_stream(spark, events_dir, schema_from=EVENTS,
                                  ts_cols=("ts",))
        stream_to_dataset(stream, out_dir, checkpoint=ckpt)

    run()
    n1 = spark.read.parquet(out_dir).count()
    run()  # same checkpoint: all source files already committed
    n2 = spark.read.parquet(out_dir).count()
    assert n1 > 0 and n2 == n1


def test_stream_ingest_dedup_exact_cross_batch(spark, tmp_path):
    """Two micro-batches with overlapping keys: the second batch's
    duplicates of the first are dropped via the persistent index, and
    a LATER RUN over new files still dedups against everything the
    first run accepted (the unbounded-horizon contract streaming_dedup
    can't give)."""
    from lens_spark.streaming import read_file_stream, stream_ingest_dedup

    import pandas as pd

    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame({"k": [1, 2], "v": ["a", "b"]}).to_parquet(src / "f1.parquet")
    out = str(tmp_path / "landing")
    idx = str(tmp_path / "idx")
    stream = read_file_stream(spark, str(src),
                              schema_from=str(src / "f1.parquet"),
                              maxFilesPerTrigger=1)
    stream_ingest_dedup(stream, out, idx, mode="exact", columns=["k", "v"],
                        checkpoint=str(tmp_path / "ck1"))
    assert spark.read.parquet(out).count() == 2

    # second run, new file: one dup of run 1, one fresh row
    pd.DataFrame({"k": [2, 3], "v": ["b", "c"]}).to_parquet(src / "f2.parquet")
    stream2 = read_file_stream(spark, str(src),
                               schema_from=str(src / "f1.parquet"),
                               maxFilesPerTrigger=1)
    stream_ingest_dedup(stream2, out, idx, mode="exact", columns=["k", "v"],
                        checkpoint=str(tmp_path / "ck1"))
    landed = {(r.k, r.v) for r in spark.read.parquet(out).collect()}
    assert landed == {(1, "a"), (2, "b"), (3, "c")}


def test_stream_ingest_dedup_neardup_mode(spark, tmp_path):
    """MinHash mode: a second batch containing a near-duplicate of an
    accepted doc lands only its genuinely novel docs."""
    from lens_spark.streaming import read_file_stream, stream_ingest_dedup

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    import pandas as pd

    src = tmp_path / "nsrc"
    src.mkdir()
    pd.DataFrame({"doc_id": [1], "text": [base]}).to_parquet(src / "f1.parquet")
    out = str(tmp_path / "nlanding")
    idx = str(tmp_path / "nidx")
    kw = dict(mode="neardup", id_col="doc_id", text_col="text",
              num_hashes=16, ngram=3, band_size=4, threshold=0.5)
    stream = read_file_stream(spark, str(src),
                              schema_from=str(src / "f1.parquet"),
                              maxFilesPerTrigger=1)
    stream_ingest_dedup(stream, out, idx,
                        checkpoint=str(tmp_path / "nck"), **kw)
    pd.DataFrame({
        "doc_id": [2, 3],
        "text": [base + " extra",  # near-dup of doc 1
                 "completely different words about spark shuffles and "
                 "partitions and exchanges and codegen stages here"],
    }).to_parquet(src / "f2.parquet")
    stream2 = read_file_stream(spark, str(src),
                               schema_from=str(src / "f1.parquet"),
                               maxFilesPerTrigger=1)
    stream_ingest_dedup(stream2, out, idx,
                        checkpoint=str(tmp_path / "nck"), **kw)
    landed = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    assert landed == [1, 3]


def test_stream_ingest_dedup_rejects_bad_mode(spark, tmp_path):
    from lens_spark.streaming import stream_ingest_dedup

    with pytest.raises(ValueError, match="unknown mode"):
        stream_ingest_dedup(None, "x", "y", mode="fuzzy")
    with pytest.raises(ValueError, match="needs id_col"):
        stream_ingest_dedup(None, "x", "y", mode="neardup")


def test_stream_ingest_dedup_embedding_mode(spark, tmp_path):
    """Vector mode: a second batch's near-copy of an accepted embedding
    is rejected via the persistent cell+int8 index; the novel vector
    lands. Also: missing vec_col/dim raises."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from lens_spark.streaming import read_file_stream, stream_ingest_dedup

    def unit(v):
        x = np.array(v, dtype=np.float32)
        return (x / np.linalg.norm(x)).tolist()

    src = tmp_path / "vsrc"
    src.mkdir()
    v1 = unit([1, 0, 2, 0, 3, 0, 4, 0])
    v2 = unit([0, 5, 0, -1, 0, 2, 0, -3])
    pd.DataFrame({"vid": [1, 2], "emb": [v1, v2]}).to_parquet(
        src / "f1.parquet")
    out = str(tmp_path / "vlanding")
    idx = str(tmp_path / "vidx")
    kw = dict(mode="embedding", id_col="vid", vec_col="emb", dim=8,
              threshold=0.98, num_bits=2, num_tables=4)
    stream = read_file_stream(spark, str(src),
                              schema_from=str(src / "f1.parquet"),
                              maxFilesPerTrigger=1)
    stream_ingest_dedup(stream, out, idx, checkpoint=str(tmp_path / "vck"),
                        **kw)
    assert spark.read.parquet(out).count() == 2

    near1 = unit(list(np.array(v1) + 0.003))
    novel = unit([7, 7, -7, 7, 0, 0, 1, 0])
    pd.DataFrame({"vid": [10, 11], "emb": [near1, novel]}).to_parquet(
        src / "f2.parquet")
    stream2 = read_file_stream(spark, str(src),
                               schema_from=str(src / "f1.parquet"),
                               maxFilesPerTrigger=1)
    stream_ingest_dedup(stream2, out, idx, checkpoint=str(tmp_path / "vck"),
                        **kw)
    assert {r.vid for r in spark.read.parquet(out).collect()} == {1, 2, 11}

    with _pytest.raises(ValueError):
        stream_ingest_dedup(stream2, out, idx, mode="embedding",
                            id_col="vid", dim=8)          # no vec_col
    with _pytest.raises(ValueError):
        stream_ingest_dedup(stream2, out, idx, mode="embedding",
                            id_col="vid", vec_col="emb")  # no dim


def test_stream_decontaminate_matches_batch_decontaminate(spark, tmp_path):
    """The streaming per-row filter must reproduce batch
    decontaminate(min_overlaps=1) row-for-row, and it composes before
    a streaming sink (availableNow run)."""
    import pandas as pd

    from lens_spark.operators.dedup import decontaminate
    from lens_spark.streaming import (
        read_file_stream,
        run_available_now,
        stream_decontaminate,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    bench = docs.filter("doc_id % 10 = 3").select(
        F.col("text").alias("bench_text"))
    expect = {r.doc_id for r in decontaminate(
        docs, bench, "doc_id", "text", bench_text_col="bench_text",
        ngram=5, min_overlaps=1).collect()}

    src = tmp_path / "dsrc"
    src.mkdir()
    docs.toPandas().to_parquet(src / "docs.parquet")
    stream = read_file_stream(spark, str(src),
                              schema_from=str(src / "docs.parquet"))
    clean = stream_decontaminate(stream, bench, text_col="text",
                                 bench_text_col="bench_text", ngram=5)
    out = run_available_now(clean)
    assert {r.doc_id for r in out.collect()} == expect
    assert len(expect) < docs.count()     # the filter provably cut


def test_stream_decontaminate_null_text_passes_through(spark, tmp_path):
    import pandas as pd

    from lens_spark.streaming import (
        read_file_stream,
        run_available_now,
        stream_decontaminate,
    )

    src = tmp_path / "nsrc"
    src.mkdir()
    pd.DataFrame({"doc_id": [1, 2], "text": ["clean words here", None]}
                 ).to_parquet(src / "d.parquet")
    bench = spark.createDataFrame([("nothing shared",)], "bench_text string")
    stream = read_file_stream(spark, str(src),
                              schema_from=str(src / "d.parquet"))
    out = run_available_now(stream_decontaminate(
        stream, bench, text_col="text", bench_text_col="bench_text",
        ngram=2))
    assert {r.doc_id for r in out.collect()} == {1, 2}


def test_stream_interval_join_matches_batch_twin(spark, tmp_path):
    """Stream-stream interval join (two file streams, availableNow)
    produces exactly the rows the identical batch join does: key match
    + event-time within ±30 minutes; distinct-ts-name contract
    enforced."""
    import pandas as pd

    from lens_spark.errors import LensError
    from lens_spark.streaming import (
        read_file_stream,
        run_available_now,
        stream_interval_join,
    )

    base = pd.Timestamp("2026-01-01 12:00:00")
    ld = tmp_path / "left"
    rd = tmp_path / "right"
    ld.mkdir(), rd.mkdir()
    def us(col):
        return col.astype("datetime64[us]")  # µs precision → Spark TIMESTAMP

    ldf = pd.DataFrame({"user_id": [1, 2], "l_ts": [base, base]})
    ldf["l_ts"] = us(ldf["l_ts"])
    ldf.to_parquet(ld / "f1.parquet")
    ldf2 = pd.DataFrame({"user_id": [3], "l_ts": [base]})
    ldf2["l_ts"] = us(ldf2["l_ts"])
    ldf2.to_parquet(ld / "f2.parquet")
    rdf = pd.DataFrame({
        "user_id": [1, 1, 2, 3, 9],
        "r_ts": [base + pd.Timedelta(minutes=10),   # in window
                 base + pd.Timedelta(hours=2),      # out of window
                 base - pd.Timedelta(minutes=20),   # in window (before)
                 base + pd.Timedelta(minutes=29),   # in window
                 base],                             # key never matches
    })
    rdf["r_ts"] = us(rdf["r_ts"])
    rdf.to_parquet(rd / "f1.parquet")

    # parquet µs timestamps surface as TIMESTAMP_NTZ; watermarks need
    # the session-tz TIMESTAMP type
    ls = read_file_stream(spark, str(ld), schema_from=str(ld / "f1.parquet")) \
        .withColumn("l_ts", F.col("l_ts").cast("timestamp"))
    rs = read_file_stream(spark, str(rd), schema_from=str(rd / "f1.parquet")) \
        .withColumn("r_ts", F.col("r_ts").cast("timestamp"))
    got = run_available_now(
        stream_interval_join(ls, rs, on=["user_id"], left_ts="l_ts",
                             right_ts="r_ts", within="30 minutes"))
    stream_rows = {(r.user_id, r.r_ts) for r in got.collect()}

    lb = spark.read.parquet(str(ld)) \
        .withColumn("l_ts", F.col("l_ts").cast("timestamp"))
    rb = spark.read.parquet(str(rd)) \
        .withColumn("r_ts", F.col("r_ts").cast("timestamp"))
    batch = stream_interval_join(lb, rb, on=["user_id"], left_ts="l_ts",
                                 right_ts="r_ts", within="30 minutes")
    batch_rows = {(r.user_id, r.r_ts) for r in batch.collect()}
    assert stream_rows == batch_rows
    assert {u for u, _ in batch_rows} == {1, 2, 3}
    assert len(batch_rows) == 3

    with pytest.raises(LensError, match="distinct names"):
        stream_interval_join(lb, rb.withColumnRenamed("r_ts", "l_ts"),
                             on=["user_id"], left_ts="l_ts",
                             right_ts="l_ts")


def test_sliding_windows_memberships(spark):
    """Every event contributes to exactly window/slide = 4 sliding
    windows, and each window's count equals the events inside its
    [start, start+1h) span — the overlap accounting tumbling windows
    can't express."""
    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    out = entrymod.q_x6_sliding_windows(spark, sf_dir).collect()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n_events for r in out) == 4 * n_events
    # spot-check one window against a direct range count
    ev = read_ns_timestamps(spark, f"{sf_dir}/events.parquet")
    r = max(out, key=lambda r: r.n_events)
    direct = ev.filter(
        (F.col("ts") >= F.lit(r.window_start))
        & (F.col("ts") < F.lit(r.window_start) + F.expr("INTERVAL 1 HOUR"))
    ).count()
    assert direct == r.n_events


def test_stream_to_snapshots_atomic_versions(spark, events_dir, tmp_path):
    """Each micro-batch commits as one snapshot version; the latest
    version holds exactly the filtered stream contents, and each
    version is a complete prefix (manifest commits are atomic)."""
    from lens_spark.sources.snapshots import snapshot_read, snapshot_versions
    from lens_spark.streaming import stream_to_snapshots

    out_dir = str(tmp_path / "versioned")
    spec = {"lenses": [{"name": "filter",
                        "arguments": {"predicate": "value > 0"}}]}
    stream = read_file_stream(spark, events_dir, schema_from=EVENTS,
                              ts_cols=("ts",))
    stream_to_snapshots(stream, out_dir, spec=spec,
                        checkpoint=str(tmp_path / "ckpt"))
    versions = snapshot_versions(spark, out_dir)
    assert len(versions) >= 1
    expect = read_ns_timestamps(spark, EVENTS).filter("value > 0").count()
    assert snapshot_read(spark, out_dir).count() == expect
    # append chain: version N lists N data dirs
    assert versions[-1]["n_dirs"] == len(versions)


def test_stream_to_snapshots_restart_does_not_duplicate(spark, events_dir,
                                                        tmp_path):
    from lens_spark.sources.snapshots import snapshot_read
    from lens_spark.streaming import stream_to_snapshots

    out_dir = str(tmp_path / "versioned")
    ckpt = str(tmp_path / "ckpt")
    for _ in range(2):     # second run: source fully drained, no new data
        stream = read_file_stream(spark, events_dir, schema_from=EVENTS,
                                  ts_cols=("ts",))
        stream_to_snapshots(stream, out_dir, checkpoint=ckpt)
    expect = read_ns_timestamps(spark, EVENTS).count()
    assert snapshot_read(spark, out_dir).count() == expect


def test_run_stream_drift_matches_batch_ks_per_microbatch(spark, tmp_path):
    """Each micro-batch's monitored statistic must EQUAL batch
    ks_drift(batch, reference) — the monitor is the batch operator on
    the wire, inheriting its integer-exact digest contract. Two files
    drained with maxFilesPerTrigger=1 → two batch rows per group."""
    import pandas as pd

    from lens_spark.operators.evaluation import ks_drift
    from lens_spark.streaming import read_file_stream, run_stream_drift

    src = tmp_path / "src"
    src.mkdir()
    b1 = pd.DataFrame({"g": ["x"] * 4 + ["y"] * 3,
                       "v": [1, 2, 3, 4, 10, 11, 12]})
    b2 = pd.DataFrame({"g": ["x"] * 3, "v": [100, 101, 102]})
    b1.to_parquet(src / "f1.parquet")
    b2.to_parquet(src / "f2.parquet")
    ref = spark.createDataFrame(
        pd.DataFrame({"g": ["x"] * 5 + ["y"] * 2,
                      "v": [1, 2, 3, 4, 5, 10, 11]}))

    stream = read_file_stream(spark, str(src),
                              schema_from=str(src / "f1.parquet"),
                              maxFilesPerTrigger=1)
    out = run_stream_drift(stream, ref, "v", by="g",
                           checkpoint=str(tmp_path / "ck"))
    got = {(r.batch_id, r.grp): (r.n_a, r.n_b, r.d_num, r.d_microunits)
           for r in out.collect()}
    # batches may arrive in either order; match each file to a batch id
    batches = {}
    for bid in {k[0] for k in got}:
        na_x = got[(bid, "x")][0]
        batches[bid] = b1 if na_x == 4 else b2
    assert len(batches) == 2
    for bid, pdf in batches.items():
        bdf = spark.createDataFrame(pdf)
        exp = {r.group: (r.n_a, r.n_b, r.d_num, r.d_microunits)
               for r in ks_drift(bdf, ref, "v", by="g").collect()}
        for g, vals in exp.items():
            assert got[(bid, g)] == vals, (bid, g)
    # identical distribution -> near-zero drift for batch 1 group x
    b1_id = next(b for b, p in batches.items() if p is b1)
    assert got[(b1_id, "x")][3] < 250000      # D < 0.25
    b2_id = next(b for b, p in batches.items() if p is b2)
    assert got[(b2_id, "x")][3] == 1000000    # disjoint support: D = 1


def test_run_stream_expectations_matches_batch_expect(spark, tmp_path):
    """Per-micro-batch quality gate == batch expect on the wire: each
    batch's report rows must equal expect(batch, rules) exactly, and a
    contract that holds corpus-wide can still fail per-batch (the
    point of checking at intake)."""
    import pandas as pd

    from lens_spark.operators.evaluation import expect
    from lens_spark.streaming import (
        read_file_stream, run_stream_expectations,
    )

    src = tmp_path / "src"
    src.mkdir()
    b1 = pd.DataFrame({"id": [1, 2, 3, 4], "n": [10, 20, 30, 40]})
    b2 = pd.DataFrame({"id": [5, 5, 6],
                       "n": pd.array([10, None, 99], dtype="Int64")})
    b1.to_parquet(src / "f1.parquet")
    b2.to_parquet(src / "f2.parquet")
    rules = [
        {"name": "n_set", "predicate": "n IS NOT NULL"},
        {"name": "n_small", "predicate": "n <= 50", "max_fail_frac": 0.4},
        {"name": "id_unique", "unique": ["id"]},
    ]
    stream = read_file_stream(spark, str(src),
                              schema_from=str(src / "f1.parquet"),
                              maxFilesPerTrigger=1)
    out = run_stream_expectations(stream, rules)
    rows = out.collect()
    batches = {int(r.batch_id) for r in rows}
    assert len(batches) == 2 and len(rows) == 6
    # wire equality: every batch row == batch expect on that file
    for bid, pdf in zip(sorted(batches), [b1, b2]):
        got = {(r.rule): (r.n_rows, r.n_violations, r.fail_frac_micro,
                          r.max_fail_micro, r.passed)
               for r in rows if r.batch_id == bid}
        exp = {(r.rule): (r.n_rows, r.n_violations, r.fail_frac_micro,
                          r.max_fail_micro, r.passed)
               for r in expect(spark.createDataFrame(pdf), rules).collect()}
        assert got == exp, (bid, got, exp)
    by = {(r.batch_id, r.rule): r for r in rows}
    bid1, bid2 = sorted(batches)
    # clean batch passes everything; dirty batch trips all three
    assert all(by[(bid1, n)].passed for n in
               ("n_set", "n_small", "id_unique"))
    assert not by[(bid2, "n_set")].passed          # NULL n
    assert not by[(bid2, "n_small")].passed        # 2/3 > 40% (NULL fails)
    assert not by[(bid2, "id_unique")].passed      # dup id 5


def test_stream_expectations_stream_scope_uniqueness(spark, tmp_path):
    """scope='stream' uniqueness (r8 verdict #5): a key accepted in
    batch 1 re-sent in batch 2 FAILS the rule there (the per-batch
    gate alone would pass it); NULL keys violate; summed per-batch
    violations equal one batch expect over the concatenated stream;
    and the on-disk index persists ACROSS RUNS — a second
    run_stream_expectations call over a new source sees run-1 keys."""
    import pandas as pd

    from lens_spark.operators.evaluation import expect
    from lens_spark.streaming import (
        read_file_stream, run_stream_expectations,
    )

    src = tmp_path / "src"
    src.mkdir()
    b1 = pd.DataFrame({"id": [1, 2, 3, 3], "n": [10, 20, 30, 40]})
    b2 = pd.DataFrame({"id": pd.array([1, 4, None], dtype="Int64"),
                       "n": [50, 60, 70]})
    b1.to_parquet(src / "f1.parquet")
    b2.to_parquet(src / "f2.parquet")
    rules = [
        {"name": "id_unique_batch", "unique": ["id"]},
        {"name": "id_unique_stream", "unique": ["id"], "scope": "stream",
         "max_fail_frac": 0.25},
    ]
    state = tmp_path / "expect_state"
    stream = read_file_stream(spark, str(src),
                              schema_from=str(src / "f1.parquet"),
                              maxFilesPerTrigger=1)
    rows = run_stream_expectations(stream, rules,
                                   state_path=str(state)).collect()
    by = {(r.batch_id, r.rule): r for r in rows}
    bid1, bid2 = sorted({int(r.batch_id) for r in rows})
    # batch 1: within-batch dup (3,3) trips both kinds identically
    assert by[(bid1, "id_unique_stream")].kind == "unique_stream"
    assert by[(bid1, "id_unique_stream")].n_violations == 1
    assert by[(bid1, "id_unique_batch")].n_violations == 1
    # batch 2: per-batch sees only the NULL key; stream scope ALSO
    # catches the batch-1 key replay (id=1) -> 2 of 3 rows violate
    assert by[(bid2, "id_unique_batch")].n_violations == 1
    assert by[(bid2, "id_unique_stream")].n_violations == 2
    assert not by[(bid2, "id_unique_stream")].passed  # 666666 > 250000
    # invariant: per-batch stream-scope violations sum to ONE batch
    # expect over the concatenated stream
    whole = spark.createDataFrame(pd.concat([b1, b2]))
    total = expect(whole, [{"name": "u", "unique": ["id"]}]) \
        .collect()[0].n_violations
    assert (by[(bid1, "id_unique_stream")].n_violations
            + by[(bid2, "id_unique_stream")].n_violations) == total
    # cross-RUN persistence: a fresh run over a new source re-sending
    # an old key fails the rule (per-batch twin passes)
    src2 = tmp_path / "src2"
    src2.mkdir()
    pd.DataFrame({"id": [2, 9], "n": [1, 2]}).to_parquet(
        src2 / "g1.parquet")
    stream2 = read_file_stream(spark, str(src2),
                               schema_from=str(src / "f1.parquet"),
                               maxFilesPerTrigger=1)
    rows2 = run_stream_expectations(stream2, rules,
                                    state_path=str(state)).collect()
    by2 = {r.rule: r for r in rows2}
    assert by2["id_unique_batch"].n_violations == 0
    assert by2["id_unique_stream"].n_violations == 1  # id=2 from run 1
    assert not by2["id_unique_stream"].passed
    # malformed: scope stream on a predicate rule is a loud error
    import pytest as _pytest

    from lens_spark.errors import LensError
    with _pytest.raises(LensError, match="'unique' rules only"):
        run_stream_expectations(stream2, [
            {"name": "p", "predicate": "n > 0", "scope": "stream"}])


def test_stream_drift_monitor_windows_restart_exactly_once(spark, tmp_path):
    """Continuous windowed drift monitor (r7 verdict #7): update-mode
    watermarked histogram agg + per-batch KS rows in a parquet sink.
    The LATEST row per window must equal batch ks_drift(window rows,
    reference); a restart from the same checkpoint processes ONLY new
    files, merges late-but-in-watermark data into its window, and
    never duplicates a (batch_id, window, grp) row."""
    import pandas as pd

    from lens_spark.operators.evaluation import ks_drift
    from lens_spark.streaming import read_file_stream, stream_drift_monitor

    src = tmp_path / "src"
    src.mkdir()
    t0 = pd.Timestamp("2024-01-01 00:10:00")
    t1 = pd.Timestamp("2024-01-01 01:10:00")
    b1 = pd.DataFrame({"ts": [t0] * 4 + [t1] * 3,
                       "v": [1, 2, 3, 4, 10, 11, 12]})
    b1.to_parquet(src / "f1.parquet")
    ref = spark.createDataFrame(pd.DataFrame({"v": [1, 2, 3, 4, 5]}))

    def run():
        stream = read_file_stream(spark, str(src),
                                  schema_from=str(src / "f1.parquet"),
                                  ts_cols=("ts",))
        q = stream_drift_monitor(
            stream, ref, "v", time_col="ts", window_duration="1 hour",
            watermark="1 hour", sink_path=str(tmp_path / "sink"),
            state_path=str(tmp_path / "state"),
            checkpoint=str(tmp_path / "ck"),
            trigger={"availableNow": True})
        assert q.awaitTermination(120)
        q.stop()

    run()
    rows1 = spark.read.parquet(str(tmp_path / "sink")).collect()
    assert {r.ws.hour for r in rows1} == {0, 1}
    n_batches_1 = len({r.batch_id for r in rows1})

    # restart input: a LATE row into window 0 (inside the watermark)
    # plus a brand-new window at 02:xx with ref-disjoint support
    t2 = pd.Timestamp("2024-01-01 02:05:00")
    b2 = pd.DataFrame({"ts": [t0, t2, t2], "v": [5, 100, 101]})
    b2.to_parquet(src / "f2.parquet")
    run()

    sink = spark.read.parquet(str(tmp_path / "sink")).collect()
    # restart processed ONLY the new file: batch ids strictly grew
    assert len({r.batch_id for r in sink}) > n_batches_1
    # exactly-once: no duplicated (batch_id, window, grp) rows
    keys = [(r.batch_id, r.ws, r.grp) for r in sink]
    assert len(keys) == len(set(keys))
    # latest row per window == batch ks_drift over that window's rows
    latest = {}
    for r in sink:
        if r.ws not in latest or r.batch_id > latest[r.ws].batch_id:
            latest[r.ws] = r
    assert len(latest) == 3
    allpdf = pd.concat([b1, b2])
    for ws, r in latest.items():
        in_win = allpdf[(allpdf.ts >= ws)
                        & (allpdf.ts < ws + pd.Timedelta(hours=1))]
        exp = ks_drift(spark.createDataFrame(in_win), ref, "v").collect()[0]
        assert (r.n_a, r.n_b, r.d_num, r.d_microunits) == \
            (exp.n_a, exp.n_b, exp.d_num, exp.d_microunits), ws
    by_hour = {ws.hour: r for ws, r in latest.items()}
    # window 0 ends up IDENTICAL to ref after the late row: D = 0
    assert by_hour[0].d_microunits == 0 and by_hour[0].n_a == 5
    # window 2 is ref-disjoint: D = 1
    assert by_hour[2].d_microunits == 1_000_000


def test_run_stream_quota_caps_keys_across_batches_and_runs(spark, tmp_path):
    """Per-key quota at intake (r9 verdict #6): within a batch the
    top-n by order_by win (group_quota determinism contract); across
    batches the remaining quota shrinks by what earlier batches
    accepted; across RUNS the persistent count index keeps charging
    the same keys; a later batch's better rows cannot evict earlier
    accepts (first-come-first-served intake)."""
    import pandas as pd

    from lens_spark.errors import LensError
    from lens_spark.streaming import read_file_stream, run_stream_quota

    src = tmp_path / "src"
    src.mkdir()
    # batch 1: 6 'a' rows (scores 1..6), 2 'b' rows
    b1 = pd.DataFrame({"dom": ["a"] * 6 + ["b"] * 2,
                       "id": list(range(1, 7)) + [10, 11],
                       "score": [1, 2, 3, 4, 5, 6, 9, 8]})
    # batch 2: 3 more 'a' rows with BETTER scores, 1 'b'
    b2 = pd.DataFrame({"dom": ["a", "a", "a", "b"],
                       "id": [20, 21, 22, 23],
                       "score": [100, 99, 98, 7]})
    b1.to_parquet(src / "f1.parquet")
    b2.to_parquet(src / "f2.parquet")
    out = str(tmp_path / "landed")
    idx = str(tmp_path / "quota_idx")
    stream = read_file_stream(spark, str(src),
                              schema_from=str(src / "f1.parquet"),
                              maxFilesPerTrigger=1)
    run_stream_quota(stream, out, idx, keys=["dom"], n=4,
                     order_by="score", tiebreak=["id"])
    landed = spark.read.parquet(out)
    got = {(r.dom, r.id) for r in landed.collect()}
    # batch 1 fills 'a' with its top-4 by score (ids 3..6); batch 2's
    # better-scored 'a' rows find the quota spent — intake can't evict
    a_ids = {i for d, i in got if d == "a"}
    assert a_ids == {3, 4, 5, 6}
    # 'b': 2 accepted in batch 1, 1 more (of 1) in batch 2 -> 3 <= n
    assert {i for d, i in got if d == "b"} == {10, 11, 23}
    # a SECOND RUN over a new source: 'a' still spent, fresh key fills
    src2 = tmp_path / "src2"
    src2.mkdir()
    pd.DataFrame({"dom": ["a", "c", "c"], "id": [30, 31, 32],
                  "score": [999, 1, 2]}).to_parquet(src2 / "g1.parquet")
    stream2 = read_file_stream(spark, str(src2),
                               schema_from=str(src / "f1.parquet"),
                               maxFilesPerTrigger=1)
    run_stream_quota(stream2, out, idx, keys=["dom"], n=4,
                     order_by="score", tiebreak=["id"])
    landed2 = {(r.dom, r.id) for r in spark.read.parquet(out).collect()}
    assert landed2 - got == {("c", 31), ("c", 32)}  # id=30 rejected
    # per-key totals never exceed n anywhere
    counts = {r.dom: r.c for r in spark.read.parquet(out)
              .groupBy("dom").agg(F.count("*").alias("c")).collect()}
    assert all(v <= 4 for v in counts.values())
    # contract errors are loud
    with pytest.raises(LensError, match="tiebreak"):
        run_stream_quota(stream2, out, idx, keys=["dom"], n=4,
                         order_by="score", tiebreak=[])
    with pytest.raises(LensError, match="n >= 1"):
        run_stream_quota(stream2, out, idx, keys=["dom"], n=0,
                         order_by="score", tiebreak=["id"])


def test_compact_quota_index_merges_increments_and_preserves_charges(
        spark, tmp_path):
    """The quota count index appends one increment row per (batch,
    key); compaction merges them to one row per key under the writer
    lease WITHOUT changing what the index means — a run after
    compaction sees exactly the same remaining quotas. Wrong-layout
    indexes are refused loudly."""
    import pandas as pd

    from lens_spark.errors import LensError
    from lens_spark.streaming import (
        compact_quota_index, read_file_stream, run_stream_quota,
    )

    src = tmp_path / "src"
    src.mkdir()
    # key 'a' accepted in BOTH batches -> two increment rows pre-compact
    pd.DataFrame({"dom": ["a", "a"], "id": [1, 2],
                  "score": [5, 4]}).to_parquet(src / "f1.parquet")
    pd.DataFrame({"dom": ["a", "b"], "id": [3, 4],
                  "score": [9, 1]}).to_parquet(src / "f2.parquet")
    out, idx = str(tmp_path / "landed"), str(tmp_path / "idx")
    stream = read_file_stream(spark, str(src),
                              schema_from=str(src / "f1.parquet"),
                              maxFilesPerTrigger=1)
    run_stream_quota(stream, out, idx, keys=["dom"], n=4,
                     order_by="score", tiebreak=["id"])
    stats = compact_quota_index(spark, idx)
    assert stats["rows_before"] == 3          # a@b1, a@b2, b@b2
    assert stats["rows_after"] == 2           # a merged, b
    assert stats["files_after"] <= stats["files_before"]
    # post-compact, 'a' has 3 charged of 4: one more slot remains
    src2 = tmp_path / "src2"
    src2.mkdir()
    pd.DataFrame({"dom": ["a", "a"], "id": [10, 11],
                  "score": [8, 7]}).to_parquet(src2 / "g1.parquet")
    stream2 = read_file_stream(spark, str(src2),
                               schema_from=str(src / "f1.parquet"),
                               maxFilesPerTrigger=1)
    run_stream_quota(stream2, out, idx, keys=["dom"], n=4,
                     order_by="score", tiebreak=["id"])
    a_ids = {r.id for r in spark.read.parquet(out)
             .filter("dom = 'a'").collect()}
    assert a_ids == {1, 2, 3, 10}             # exactly one more accepted
    # the follow-up run appended one fresh 'a' increment; a second
    # compaction folds it back into one row per key
    again = compact_quota_index(spark, idx)
    assert (again["rows_before"], again["rows_after"]) == (3, 2)
    # wrong layout (a dedup fp index) is refused
    from lens_spark.operators.dedup import dedup_incremental
    fpidx = str(tmp_path / "fpidx")
    dedup_incremental(spark.createDataFrame([(1,)], "k long"), fpidx,
                      columns=["k"])
    with pytest.raises(LensError, match="not a quota count index"):
        compact_quota_index(spark, fpidx)


def test_run_stream_quota_recovers_crashed_compaction(spark, tmp_path):
    """If compact_quota_index crashes between its two renames (parts/
    missing, parts.old + parts.migrating present), the next ingest must
    roll the migration forward BEFORE probing the index — otherwise
    dataset_nonempty sees an empty index and silently re-grants full
    quotas (r11 advice; the dedup peers guard the same window)."""
    import shutil

    import pandas as pd

    from lens_spark.streaming import read_file_stream, run_stream_quota

    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame({"dom": ["a"] * 4, "id": [1, 2, 3, 4],
                  "score": [4, 3, 2, 1]}).to_parquet(src / "f1.parquet")
    out, idx = str(tmp_path / "landed"), str(tmp_path / "idx")
    stream = read_file_stream(spark, str(src),
                              schema_from=str(src / "f1.parquet"))
    # fill 'a' completely (n=4)
    run_stream_quota(stream, out, idx, keys=["dom"], n=4,
                     order_by="score", tiebreak=["id"])
    # simulate the crash-between-renames state: parts/ staged aside,
    # the completed compacted dataset sitting in parts.migrating
    parts = tmp_path / "idx" / "parts"
    shutil.move(str(parts), str(parts) + ".old")
    shutil.copytree(str(parts) + ".old", str(parts) + ".migrating")
    # a new run offering more 'a' rows must land NOTHING for 'a'
    src2 = tmp_path / "src2"
    src2.mkdir()
    pd.DataFrame({"dom": ["a", "a"], "id": [10, 11],
                  "score": [99, 98]}).to_parquet(src2 / "g1.parquet")
    stream2 = read_file_stream(spark, str(src2),
                               schema_from=str(src / "f1.parquet"))
    run_stream_quota(stream2, out, idx, keys=["dom"], n=4,
                     order_by="score", tiebreak=["id"])
    ids = {r.id for r in spark.read.parquet(out).collect()}
    assert ids == {1, 2, 3, 4}          # quota still charged
    assert parts.exists()               # migration rolled forward
    assert not (tmp_path / "idx" / "parts.old").exists()
    assert not (tmp_path / "idx" / "parts.migrating").exists()


def test_run_stream_quota_auto_compacts_hot_buckets(spark, tmp_path):
    """r10 verdict #7: the increment index must not grow one file per
    touched bucket per batch forever. With auto_compact_files=1, any
    bucket reaching 2 increment files triggers the in-lease compaction
    — files-per-bucket stays bounded across many batches and the
    remaining quotas are exactly preserved through every compaction."""
    import pandas as pd

    from lens_spark.streaming import read_file_stream, run_stream_quota

    src = tmp_path / "src"
    src.mkdir()
    # 5 single-row batches, same key -> 5 increment appends to one pb
    for i in range(5):
        pd.DataFrame({"dom": ["a"], "id": [i], "score": [i]}).to_parquet(
            src / f"f{i}.parquet")
    out, idx = str(tmp_path / "landed"), str(tmp_path / "idx")
    stream = read_file_stream(spark, str(src),
                              schema_from=str(src / "f0.parquet"),
                              maxFilesPerTrigger=1)
    run_stream_quota(stream, out, idx, keys=["dom"], n=4,
                     order_by="score", tiebreak=["id"],
                     auto_compact_files=1)
    # quota exactly enforced across the compactions
    ids = sorted(r.id for r in spark.read.parquet(out).collect())
    assert ids == [0, 1, 2, 3]
    # the hot bucket never ends a batch above the threshold+compaction
    parts = tmp_path / "idx" / "parts"
    pb_dirs = [d for d in parts.iterdir() if d.name.startswith("pb=")]
    assert len(pb_dirs) == 1
    files = [f for f in pb_dirs[0].iterdir()
             if not f.name.startswith(("_", "."))]
    assert len(files) <= 2, [f.name for f in files]
    # and the index still reads to the correct charge
    total = (spark.read.parquet(str(parts))
             .agg({"cnt": "sum"}).first()[0])
    assert total == 4
    # disabled trigger (None) keeps the manual contract
    from lens_spark.errors import LensError
    with pytest.raises(LensError, match="auto_compact_files"):
        run_stream_quota(stream, out, idx, keys=["dom"], n=4,
                         order_by="score", tiebreak=["id"],
                         auto_compact_files=0)


def test_run_stream_ivfpq_append_keeps_index_current(spark, tmp_path):
    """The IVFADC index's streaming maintenance runner (r11): batches
    arriving as files append their codes encoded with the frozen
    build-time model; a search after the drain sees every appended
    vector, identical to a batch build over the union."""
    import pandas as pd

    from lens_spark.models import load_model, save_kmeans, save_pq
    from lens_spark.operators.similarity import (
        ivfpq_index_build,
        ivfpq_index_search,
    )
    from lens_spark.registry import Registry
    from lens_spark.streaming import read_file_stream, run_stream_ivfpq_append

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    reg = Registry(str(tmp_path / "reg"))
    cents = load_model(reg, save_kmeans(reg, emb, "vec_id", "embedding",
                                        k=8, max_iter=5),
                       expect_kind="kmeans_centroids")
    env = load_model(reg, save_pq(reg, emb, "vec_id", "embedding",
                                  dim=64, m=8, nbits=6),
                     expect_kind="pq_codebooks")
    idx = str(tmp_path / "idx")
    seed = emb.filter("vec_id % 4 = 0")
    ivfpq_index_build(seed, idx, id_col="vec_id", vec_col="embedding",
                      dim=64, m=8, nbits=6, centroids=cents,
                      codebooks=env["books"])
    # the arriving stream: the other 3/4, two files -> two batches
    src = tmp_path / "src"
    src.mkdir()
    rest = emb.filter("vec_id % 4 <> 0").toPandas()
    rest.iloc[: len(rest) // 2].to_parquet(src / "b1.parquet")
    rest.iloc[len(rest) // 2:].to_parquet(src / "b2.parquet")
    stream = read_file_stream(spark, str(src),
                              schema_from=str(src / "b1.parquet"),
                              maxFilesPerTrigger=1)
    n = run_stream_ivfpq_append(stream, idx, id_col="vec_id",
                                vec_col="embedding")
    assert n == len(rest)
    whole = str(tmp_path / "whole")
    ivfpq_index_build(emb, whole, id_col="vec_id", vec_col="embedding",
                      dim=64, m=8, nbits=6, centroids=cents,
                      codebooks=env["books"])
    queries = emb.filter("vec_id < 5")
    got = {(r.query_id, r.neighbor_id, r.score)
           for r in ivfpq_index_search(spark, idx, queries,
                                       id_col="vec_id",
                                       vec_col="embedding", k=10,
                                       nprobe=4).collect()}
    want = {(r.query_id, r.neighbor_id, r.score)
            for r in ivfpq_index_search(spark, whole, queries,
                                        id_col="vec_id",
                                        vec_col="embedding", k=10,
                                        nprobe=4).collect()}
    assert got == want and len(got) == 50


def _postings_stream_fixture(spark, tmp_path):
    """Build-on-half fixture shared by the postings streaming tests:
    a committed index over docs 1-2 plus a file-source directory with
    one pending batch (docs 3-4). Returns (idx, src, build_corpus)."""
    from lens_spark.operators.ranking import postings_index_build

    build = spark.createDataFrame(
        [(1, "spark shuffle spark join"),
         (2, "hash join hash join hash")],
        "id long, text string")
    idx = str(tmp_path / "pidx")
    postings_index_build(build, idx, id_col="id", text_col="text")
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(3, "spark hash quantum"), (4, "join shuffle physics")],
        "id long, text string").toPandas().to_parquet(src / "b1.parquet")
    return idx, src, build


def test_run_stream_postings_append_cross_run(spark, tmp_path):
    """The postings index's streaming maintenance runner (r11 verdict
    #3): batches append under the FROZEN build stats; a restart with
    the same checkpoint resumes without re-appending drained batches;
    after both runs, serving equals the batch-built-and-appended
    index exactly; and each batch's unknown terms land in the
    dropped-terms parquet log under that batch's tag (a return-value
    count is lost in streaming — the log is the durable signal)."""
    from lens_spark.operators.ranking import (
        postings_index_append,
        postings_index_build,
        postings_index_search,
    )
    from lens_spark.streaming import (
        read_file_stream,
        run_stream_postings_append,
    )

    idx, src, build = _postings_stream_fixture(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    dropped = str(tmp_path / "dropped")

    def stream():
        return read_file_stream(spark, str(src),
                                schema_from=str(src / "b1.parquet"),
                                maxFilesPerTrigger=1)

    # run 1: drains b1 only (docs 3-4; quantum + physics unknown)
    r1 = run_stream_postings_append(stream(), idx, id_col="id",
                                    text_col="text", checkpoint=ckpt,
                                    dropped_path=dropped)
    assert r1 == {"n_postings": 4, "n_dropped_postings": 2}
    # restart: a new file arrives; same checkpoint -> only b2 drains
    spark.createDataFrame(
        [(5, "spark join"), (6, "hash hash novelterm")],
        "id long, text string").toPandas().to_parquet(src / "b2.parquet")
    r2 = run_stream_postings_append(stream(), idx, id_col="id",
                                    text_col="text", checkpoint=ckpt,
                                    dropped_path=dropped)
    assert r2 == {"n_postings": 3, "n_dropped_postings": 1}

    # serving equals the batch path over the same docs (frozen scale)
    panel = spark.createDataFrame([(1, "spark hash join")],
                                  "qid long, qtext string")
    got = {(r.query_id, r.neighbor_id, r.bm25)
           for r in postings_index_search(spark, panel, idx, id_col="qid",
                                          text_col="qtext", k=10).collect()}
    batch_idx = str(tmp_path / "pidx_batch")
    postings_index_build(build, batch_idx, id_col="id", text_col="text")
    postings_index_append(
        spark.createDataFrame(
            [(3, "spark hash quantum"), (4, "join shuffle physics"),
             (5, "spark join"), (6, "hash hash novelterm")],
            "id long, text string"),
        batch_idx, id_col="id", text_col="text")
    want = {(r.query_id, r.neighbor_id, r.bm25)
            for r in postings_index_search(spark, panel, batch_idx,
                                           id_col="qid", text_col="qtext",
                                           k=10).collect()}
    assert got == want
    assert {r.neighbor_id for r in postings_index_search(
        spark, panel, idx, id_col="qid", text_col="qtext",
        k=10).collect()} == {1, 2, 3, 4, 5, 6}

    # the dropped-terms log: per-batch tags, the exact unknown terms
    log = spark.read.parquet(dropped).collect()
    by_tag = {}
    for r in log:
        by_tag.setdefault(r.tag, set()).add((r.term, r.n_postings_dropped))
    assert len(by_tag) == 2
    tags = sorted(by_tag)  # batch ids are distinct per checkpoint run
    assert by_tag[tags[0]] == {("quantum", 1), ("physics", 1)}
    assert by_tag[tags[1]] == {("novelterm", 1)}


def test_stream_postings_replay_then_maintenance_reclaims(spark, tmp_path):
    """An at-least-once replay through the streaming runner (same
    source, FRESH checkpoint) stores byte-identical postings rows:
    search results are unchanged throughout (dedupe-before-sum), and
    the nightly maintenance sweep with drop_replay_duplicates=True
    reclaims the residue (r11 verdict #3's maintenance leg)."""
    from lens_spark.maintenance import compact_all
    from lens_spark.operators.ranking import postings_index_search
    from lens_spark.streaming import (
        read_file_stream,
        run_stream_postings_append,
    )

    idx, src, _ = _postings_stream_fixture(spark, tmp_path)

    def drain(ckpt):
        return run_stream_postings_append(
            read_file_stream(spark, str(src),
                             schema_from=str(src / "b1.parquet")),
            idx, id_col="id", text_col="text",
            checkpoint=str(tmp_path / ckpt))

    panel = spark.createDataFrame([(1, "spark hash join")],
                                  "qid long, qtext string")

    def serve():
        return {(r.query_id, r.neighbor_id, r.bm25, r.rank)
                for r in postings_index_search(
                    spark, panel, idx, id_col="qid", text_col="qtext",
                    k=10).collect()}

    assert drain("ckpt1") == {"n_postings": 4, "n_dropped_postings": 2}
    want = serve()
    n_rows = spark.read.parquet(f"{idx}/parts").count()
    # fresh checkpoint = the runner cannot know b1 already drained:
    # the documented at-least-once replay
    assert drain("ckpt2") == {"n_postings": 4, "n_dropped_postings": 2}
    assert serve() == want  # replay residue never double-counts
    assert spark.read.parquet(f"{idx}/parts").count() == n_rows + 4
    report = compact_all(spark, str(tmp_path),
                         drop_replay_duplicates=True)
    assert report[idx]["kind"] == "postings"
    assert spark.read.parquet(f"{idx}/parts").count() == n_rows
    assert serve() == want


def test_stream_append_auto_compaction_bounds_files(spark, tmp_path):
    """The retrieval-index streaming sinks auto-compact like the quota
    sink (r12): with auto_compact_files=1 and one file appended per
    touched partition per batch, no partition directory ends the
    drain above one file — and serving is unchanged (compaction is
    byte-preserving)."""
    import os

    from lens_spark.streaming import (
        _max_partition_file_count,
        read_file_stream,
        run_stream_postings_append,
    )

    idx, src, _ = _postings_stream_fixture(spark, tmp_path)
    spark.createDataFrame(
        [(5, "spark join"), (6, "hash hash join")],
        "id long, text string").toPandas().to_parquet(src / "b2.parquet")

    r = run_stream_postings_append(
        read_file_stream(spark, str(src),
                         schema_from=str(src / "b1.parquet"),
                         maxFilesPerTrigger=1),
        idx, id_col="id", text_col="text",
        checkpoint=str(tmp_path / "ckpt"), auto_compact_files=1)
    # b1: docs 3-4 contribute 4 known-term postings; b2: doc 5 has
    # spark+join, doc 6 has hash+join -> 4 more (postings are per
    # DISTINCT (doc, term))
    assert r["n_postings"] == 4 + 4
    assert _max_partition_file_count(spark, f"{idx}/parts") <= 1
    got = _pserve_stream(spark, idx)
    assert {d for d, *_ in got} == {1, 2, 3, 4, 5, 6}


def _pserve_stream(spark, idx):
    from lens_spark.operators.ranking import postings_index_search

    panel = spark.createDataFrame([(1, "spark hash join")],
                                  "qid long, qtext string")
    return {(r.neighbor_id, r.bm25, r.rank)
            for r in postings_index_search(spark, panel, idx, id_col="qid",
                                           text_col="qtext",
                                           k=10).collect()}


def test_stream_ivfpq_auto_compaction_bounds_files(spark, tmp_path):
    """Dense twin of the postings auto-compaction: cells stay at one
    file through a multi-batch drain and search equals the
    no-compaction index exactly."""
    import random

    from lens_spark.operators.similarity import (
        ivfpq_index_build,
        ivfpq_index_search,
    )
    from lens_spark.streaming import (
        _max_partition_file_count,
        read_file_stream,
        run_stream_ivfpq_append,
    )

    rng = random.Random(23)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(64)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    seed = emb.filter("vec_id < 16")
    rest = emb.filter("vec_id >= 16").toPandas()
    src = tmp_path / "vsrc"
    src.mkdir()
    rest.iloc[:24].to_parquet(src / "b1.parquet")
    rest.iloc[24:].to_parquet(src / "b2.parquet")

    def mk(idx, **kw):
        ivfpq_index_build(seed, idx, id_col="vec_id", vec_col="embedding",
                          dim=8, nlist=4, m=4, nbits=6)
        n = run_stream_ivfpq_append(
            read_file_stream(spark, str(src),
                             schema_from=str(src / "b1.parquet"),
                             maxFilesPerTrigger=1),
            idx, id_col="vec_id", vec_col="embedding",
            checkpoint=str(tmp_path / f"ckpt_{kw.get('auto_compact_files')}"),
            **kw)
        assert n == len(rest)
        return {(r.query_id, r.neighbor_id, r.score)
                for r in ivfpq_index_search(
                    spark, idx, emb.filter("vec_id < 3"),
                    id_col="vec_id", vec_col="embedding", k=5,
                    nprobe=4).collect()}

    compacted = mk(str(tmp_path / "idx_c"), auto_compact_files=1)
    assert _max_partition_file_count(
        spark, str(tmp_path / "idx_c") + "/parts") <= 1
    plain = mk(str(tmp_path / "idx_p"), auto_compact_files=None)
    assert compacted == plain and len(compacted) == 15


def test_quota_subset_compaction_merges_only_named_buckets(spark,
                                                           tmp_path):
    """r12 verdict #3 applied to the quota sink: its trigger was
    already touched-buckets-only, but the ACTION rewrote the whole
    index. The per-bucket merge must sum increment rows ONLY in the
    named buckets (other dirs' files byte-untouched) and preserve
    every key's total — pb is a pure function of kh, so the bucket
    merge is the full merge restricted to the bucket."""
    import os

    from lens_spark.operators.dedup import INDEX_PROBE_BUCKETS
    from lens_spark.streaming import _compact_quota_parts
    from pyspark.sql import functions as F

    parts = str(tmp_path / "qidx" / "parts")
    rows = [(kh, 1) for kh in range(40) for _ in range(3)]  # 3 increments/key
    df = (spark.createDataFrame(rows, "kh long, cnt long")
          .withColumn("pb", F.pmod(F.col("kh"),
                                   F.lit(INDEX_PROBE_BUCKETS))))
    for i in range(2):  # two appends -> multiple files per bucket
        (df.repartition(2).write.mode("append")
         .partitionBy("pb").parquet(parts))

    def totals():
        return {r.kh: r.total for r in
                (spark.read.parquet(parts).groupBy("kh")
                 .agg(F.sum("cnt").alias("total")).collect())}

    def files():
        return {d: sorted(f for f in os.listdir(os.path.join(parts, d))
                          if not f.startswith(("_", ".")))
                for d in os.listdir(parts) if d.startswith("pb=")}

    want = totals()
    before = files()
    victims = sorted(before)[:2]
    stats = _compact_quota_parts(
        spark, parts, partitions=[int(d.split("=")[1]) for d in victims])
    assert stats["partitions"] == victims
    assert stats["rows_removed"] > 0  # increments merged
    after = files()
    for d in before:
        if d in victims:
            assert len(after[d]) == 1
        else:
            assert after[d] == before[d], f"{d} was rewritten"
    assert totals() == want  # every key's charge is exactly preserved


def test_stream_hybrid_append_grows_both_indexes(spark, tmp_path):
    """run_stream_hybrid_append (r13): one checkpointed stream grows
    BOTH hybrid indexes. After the drain, the fused serve equals the
    batch path (postings + ivfpq appends of the same rows), restart
    with the same checkpoint is a no-op, and a REPLAY (fresh
    checkpoint) changes no result — each family's at-least-once story
    absorbs the duplicate rows."""
    import random

    from lens_spark.operators.ranking import (
        hybrid_search,
        postings_index_append,
        postings_index_build,
    )
    from lens_spark.operators.similarity import (
        ivfpq_index_append,
        ivfpq_index_build,
    )
    from lens_spark.streaming import (
        read_file_stream,
        run_stream_hybrid_append,
    )

    rng = random.Random(31)
    texts = ["spark shuffle join", "hash join hash", "quantum notes",
             "spark hash quantum", "shuffle shuffle spark",
             "join spark hash", "hash quantum join", "spark spark"]
    rows = [(i, texts[i % len(texts)],
             [rng.uniform(-1, 1) for _ in range(8)]) for i in range(32)]
    schema = "doc_id long, text string, embedding array<float>"
    full = spark.createDataFrame(rows, schema)
    seed, rest = full.filter("doc_id < 16"), full.filter("doc_id >= 16")

    def build_pair(base):
        pidx, vidx = f"{base}/pidx", f"{base}/vidx"
        postings_index_build(seed, pidx, id_col="doc_id",
                             text_col="text")
        ivfpq_index_build(seed.select("doc_id", "embedding"), vidx,
                          id_col="doc_id", vec_col="embedding", dim=8,
                          nlist=4, m=4, nbits=6)
        return pidx, vidx

    def serve(pidx, vidx):
        panel = spark.createDataFrame(
            [(10_000, "spark hash join",
              [float(x) for x in rows[0][2]])], schema)
        return {(r.neighbor_id, r.rrf, r.rank) for r in hybrid_search(
            spark, panel, postings_index=pidx, ivfpq_index=vidx,
            id_col="doc_id", text_col="text", vec_col="embedding",
            k=10, per_system_k=15, nprobe=4).collect()}

    # streamed pair
    src = tmp_path / "hsrc"
    src.mkdir()
    pdf = rest.toPandas()
    pdf.iloc[:8].to_parquet(src / "b1.parquet")
    pdf.iloc[8:].to_parquet(src / "b2.parquet")
    spidx, svidx = build_pair(str(tmp_path / "streamed"))
    dropped = str(tmp_path / "dropped")

    def drain(ckpt):
        return run_stream_hybrid_append(
            read_file_stream(spark, str(src),
                             schema_from=str(src / "b1.parquet"),
                             maxFilesPerTrigger=1),
            spidx, svidx, id_col="doc_id", text_col="text",
            vec_col="embedding", checkpoint=str(tmp_path / ckpt),
            dropped_path=dropped)

    r = drain("ckpt1")
    assert r["n_vectors"] == 16
    assert r["n_postings"] + r["n_dropped_postings"] > 0

    # batch pair over the same rows
    bpidx, bvidx = build_pair(str(tmp_path / "batch"))
    postings_index_append(rest, bpidx, id_col="doc_id",
                          text_col="text")
    ivfpq_index_append(rest.select("doc_id", "embedding"), bvidx,
                       id_col="doc_id", vec_col="embedding")
    want = serve(bpidx, bvidx)
    assert serve(spidx, svidx) == want and want

    # restart with the SAME checkpoint: nothing re-drains
    r2 = drain("ckpt1")
    assert r2 == {"n_postings": 0, "n_dropped_postings": 0,
                  "n_vectors": 0}
    # replay with a FRESH checkpoint: results unchanged (duplicate
    # rows collapse before scoring in both families)
    drain("ckpt2")
    assert serve(spidx, svidx) == want


def test_hybrid_lag_report_sees_crash_between_appends(spark, tmp_path,
                                                      monkeypatch):
    """r13 verdict #7: run_stream_hybrid_append's per-index atomicity
    leaves a documented transient — a crash between the two appends
    puts a batch in the postings index the IVFADC index lacks.
    hybrid_lag_report turns it observable: the lag APPEARS after the
    injected crash (postings marker one batch ahead, checkpoint not
    advanced) and CLEARS after the replay (markers equal, committed
    caught up)."""
    import random

    import lens_spark.operators.similarity as sim
    from lens_spark.operators.ranking import postings_index_build
    from lens_spark.operators.similarity import ivfpq_index_build
    from lens_spark.streaming import (
        hybrid_lag_report,
        read_file_stream,
        run_stream_hybrid_append,
    )

    rng = random.Random(7)
    rows = [(i, "spark hash join", [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(24)]
    schema = "doc_id long, text string, embedding array<float>"
    full = spark.createDataFrame(rows, schema)
    seed, rest = full.filter("doc_id < 8"), full.filter("doc_id >= 8")
    pidx, vidx = str(tmp_path / "pidx"), str(tmp_path / "vidx")
    postings_index_build(seed, pidx, id_col="doc_id", text_col="text")
    ivfpq_index_build(seed.select("doc_id", "embedding"), vidx,
                      id_col="doc_id", vec_col="embedding", dim=8,
                      nlist=4, m=4, nbits=6)
    # a never-streamed pair reports unknown, not a fake zero lag
    rep0 = hybrid_lag_report(spark, pidx, vidx).collect()[0]
    assert rep0.postings_batch is None and rep0.in_sync is None

    src = tmp_path / "lagsrc"
    src.mkdir()
    pdf = rest.toPandas()
    pdf.iloc[:8].to_parquet(src / "b1.parquet")
    pdf.iloc[8:].to_parquet(src / "b2.parquet")
    ckpt = str(tmp_path / "ckpt")

    # crash INSIDE batch 1, between the postings append (done) and the
    # ivfpq append (never runs)
    real = sim.ivfpq_index_append
    calls = {"n": 0}

    def crash_on_second(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash between the two appends")
        return real(*a, **kw)

    monkeypatch.setattr(sim, "ivfpq_index_append", crash_on_second)

    def drain():
        return run_stream_hybrid_append(
            read_file_stream(spark, str(src),
                             schema_from=str(src / "b1.parquet"),
                             maxFilesPerTrigger=1),
            pidx, vidx, id_col="doc_id", text_col="text",
            vec_col="embedding", checkpoint=ckpt)

    with pytest.raises(Exception, match="injected crash"):
        drain()
    rep = hybrid_lag_report(spark, pidx, vidx,
                            checkpoint=ckpt).collect()[0]
    assert rep.postings_batch == 1 and rep.ivfpq_batch == 0
    assert rep.lag_batches == 1 and rep.in_sync is False
    assert rep.committed_batch == 0  # the crashed batch never committed

    # the at-least-once replay (same checkpoint) clears the lag
    monkeypatch.setattr(sim, "ivfpq_index_append", real)
    drain()
    rep2 = hybrid_lag_report(spark, pidx, vidx,
                             checkpoint=ckpt).collect()[0]
    assert rep2.postings_batch == rep2.ivfpq_batch == 1
    assert rep2.lag_batches == 0 and rep2.in_sync is True
    assert rep2.committed_batch == 1


def test_stream_sink_compacts_only_offending_buckets(spark, tmp_path):
    """The r12-verdict-#3 'Done' pin at the SINK level: an
    over-threshold micro-batch rewrites ONLY the bucket dir(s) it
    pushed over the threshold — every untouched bucket's file list is
    byte-identical across the drain — and serving is unchanged."""
    import os

    from lens_spark.operators.ranking import (
        postings_index_build,
        postings_index_search,
    )
    from lens_spark.streaming import (
        read_file_stream,
        run_stream_postings_append,
    )

    corpus = spark.createDataFrame(
        [(1, "spark shuffle join hash quantum physics lecture notes"),
         (2, "alpha beta gamma delta epsilon zeta eta theta")],
        "id long, text string")
    idx = str(tmp_path / "pidx_sink")
    parts = f"{idx}/parts"
    postings_index_build(corpus, idx, id_col="id", text_col="text")

    def files():
        return {d: sorted(f for f in os.listdir(os.path.join(parts, d))
                          if not f.startswith(("_", ".")))
                for d in os.listdir(parts) if d.startswith("pb=")}

    def serve():
        panel = spark.createDataFrame([(1, "spark alpha")],
                                      "qid long, qtext string")
        return {(r.neighbor_id, r.bm25, r.rank)
                for r in postings_index_search(
                    spark, panel, idx, id_col="qid", text_col="qtext",
                    k=10).collect()}

    before = files()
    want = serve()
    # one micro-batch whose single known term touches ONE bucket
    src = tmp_path / "sinksrc"
    src.mkdir()
    spark.createDataFrame([(9, "spark")], "id long, text string") \
        .toPandas().to_parquet(src / "b1.parquet")
    run_stream_postings_append(
        read_file_stream(spark, str(src),
                         schema_from=str(src / "b1.parquet")),
        idx, id_col="id", text_col="text",
        checkpoint=str(tmp_path / "ckpt_sink"), auto_compact_files=1)
    after = files()
    changed = [d for d in before if after.get(d) != before[d]]
    # exactly the bucket 'spark' hashes into was rewritten (build file
    # + batch file > threshold 1 → compacted to one file); nothing else
    assert len(changed) == 1, (changed, before, after)
    assert len(after[changed[0]]) == 1
    got = serve()
    # doc 9 now retrievable for 'spark'; every pre-existing row scored
    # byte-identically
    assert {(d, s) for d, s, _ in want if d != 9} <= \
        {(d, s) for d, s, _ in got}
    assert 9 in {d for d, _, _ in got}
