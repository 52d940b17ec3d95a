"""Built-in lens archetypes M1-M7 against the driver's tables —
semantics ported from the reference module tests (tests/modules/*)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lens_spark import engine
from lens_spark.errors import LensError
from lens_spark.operators.counter import assign_sequence


def rows(df):
    return [r.asDict() for r in df.collect()]


@pytest.fixture(scope="module")
def customer(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/customer.parquet")


@pytest.fixture(scope="module")
def region(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/region.parquet")


def test_m6_filter_predicate(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = engine.append(orders, {"lenses": [{"name": "filter", "arguments": {"predicate": "o_orderstatus = 'F'"}}]})
    assert out.count() == orders.filter("o_orderstatus = 'F'").count()
    assert rows(out.select(F.countDistinct("o_orderstatus")))[0].popitem()[1] == 1


def test_m6_filter_column_equals_shape(people):
    # the reference module's exact parameter shape (__type == "pass").
    df = people.withColumn("__type", F.when(F.col("Age") > 30, "pass").otherwise("skip"))
    out = engine.append(df, {"lenses": [{"name": "filter", "arguments": {"column": "__type", "equals": "pass"}}]})
    assert sorted(r["Age"] for r in rows(out)) == [31, 32]


def test_m7_explode_round_trip(spark, sf_dir):
    # collect (N:1) then explode (1:N) reproduces the key/element pairs.
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spec = {
        "lenses": [
            {"name": "project", "arguments": {"columns": ["l_orderkey", "l_linenumber"]}},
            {"name": "collect", "arguments": {"keys": ["l_orderkey"], "column": "l_linenumber", "out": "lines"}},
            {"name": "explode", "arguments": {"column": "lines", "out": "l_linenumber"}},
        ]
    }
    out = engine.append(lineitem, spec)
    assert out.columns == ["l_orderkey", "l_linenumber"]
    assert out.count() == lineitem.count()
    assert out.exceptAll(lineitem.select("l_orderkey", "l_linenumber")).count() == 0


def test_m7_explode_rename_matches_reference_shape(spark):
    # Book{Name, PageNumbers} → Page{BookName, Number}
    # (tests/modules/rust_wasm32_normalize/src/lib.rs:30-77).
    books = spark.createDataFrame(
        [("Ita", [1, 2]), ("Ody", [3])], "Name string, PageNumbers array<int>"
    )
    out = engine.append(
        books,
        {"lenses": [{"name": "explode", "arguments": {
            "column": "PageNumbers", "out": "Number", "rename": {"Name": "BookName"}}}]},
    )
    assert out.columns == ["BookName", "Number"]
    assert sorted(rows(out), key=lambda r: r["Number"]) == [
        {"BookName": "Ita", "Number": 1},
        {"BookName": "Ita", "Number": 2},
        {"BookName": "Ody", "Number": 3},
    ]


def test_m5_counter_strategies_agree(region):
    dist = assign_sequence(region, ["r_regionkey"], out="rid", strategy="distributed")
    win = assign_sequence(region, ["r_regionkey"], out="rid", strategy="window")
    assert rows(dist.orderBy("rid")) == rows(win.orderBy("rid"))
    got = rows(dist.orderBy("rid"))
    assert [r["rid"] for r in got] == list(range(1, len(got) + 1))
    # dense, 1-based, aligned with the declared order
    keys = [r["r_regionkey"] for r in got]
    assert keys == sorted(keys)


def test_m5_counter_distributed_at_scale(spark, sf_dir):
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = assign_sequence(
        lineitem.select("l_orderkey", "l_linenumber"),
        ["l_orderkey", "l_linenumber"], out="seq", strategy="distributed",
    )
    n = out.count()
    stats = rows(out.select(F.min("seq").alias("lo"), F.max("seq").alias("hi"),
                            F.countDistinct("seq").alias("n")))[0]
    assert (stats["lo"], stats["hi"], stats["n"]) == (1, n, n)


def test_m5_counter_releases_intermediate_cache(spark, sf_dir):
    """Success path must not leave the dataset-sized two-pass persist
    pinned: only the checkpointed result may remain registered."""
    sc = spark.sparkContext._jsc.sc()
    before = sc.getPersistentRDDs().size()
    out = assign_sequence(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_linenumber"),
        ["l_orderkey", "l_linenumber"], out="seq",
    )
    assert out.count() > 0
    after = sc.getPersistentRDDs().size()
    assert after - before <= 1  # leaked persist would make this 2


def test_m5_counter_start_and_missing_column(region):
    out = assign_sequence(region, ["r_regionkey"], out="rid", start=100)
    assert min(r["rid"] for r in rows(out)) == 100
    with pytest.raises(LensError):
        assign_sequence(region, ["nope"])


def test_cast_multiply_set_lenses(people):
    spec = {
        "lenses": [
            {"name": "multiply", "arguments": {"column": "Age", "factor": 2}},
            {"name": "cast", "arguments": {"column": "Age", "type": "double"}},
            {"name": "set", "arguments": {"column": "src", "value": "unit"}},
        ]
    }
    out = engine.append(people, spec)
    got = sorted(rows(out), key=lambda r: r["Age"])
    assert got[0]["Age"] == 60.0 and got[0]["src"] == "unit"
    # multiply is invertible
    back = engine.append(
        engine.append(people, {"lenses": [{"name": "multiply", "arguments": {"column": "Age", "factor": 2}}]}),
        {"lenses": [{"name": "multiply", "inverse": True, "arguments": {"column": "Age", "factor": 2}}]},
    )
    assert sorted(r["Age"] for r in rows(back)) == [30.0, 31.0, 32.0]
    # inverse restores the pre-forward dtype: an integer column must not
    # round-trip as double (division widens; the lens casts back)
    assert dict(back.dtypes)["Age"] == dict(people.dtypes)["Age"]


def test_connected_components_long_chain_pointer_jumping(spark):
    """A 60-node path has diameter far beyond 12 iterations of one-hop
    propagation — pointer jumping must converge it in O(log n)."""
    from lens_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a long, id_b long")
    comp = {r["id"]: r["component"]
            for r in connected_components(chain, driver_threshold=0,
                                          max_iter=12).collect()}
    assert set(comp.values()) == {0}  # one component rooted at min id


def test_connected_components_warns_when_not_converged(spark):
    import warnings

    from lens_spark.operators.dedup import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components(chain, driver_threshold=0, max_iter=1).collect()
    assert any("not converged" in str(w.message) for w in caught)


def test_nil_row_preservation(spark):
    # Nil items flow through value-preserving lenses (SURVEY §1.2):
    # an all-null row survives rename/add untouched.
    df = spark.createDataFrame([("John", 30), (None, None)], "Name string, Age long")
    out = engine.append(
        df,
        {"lenses": [
            {"name": "rename", "arguments": {"src": "Name", "dst": "FullName"}},
            {"name": "add", "arguments": {"column": "Age", "magnitude": 1}},
        ]},
    )
    got = rows(out)
    assert len(got) == 2
    assert {"FullName": None, "Age": None} in got


def test_sql_lens(customer):
    out = engine.append(
        customer,
        {"lenses": [{"name": "sql", "arguments": {
            "query": "SELECT c_mktsegment, count(*) AS n FROM _input GROUP BY c_mktsegment"}}]},
    )
    assert out.columns == ["c_mktsegment", "n"]
    assert out.count() == customer.select("c_mktsegment").distinct().count()


def test_approx_quantiles_within_tolerance(spark, sf_dir):
    """Sketch quantiles must land within 1% relative of exact (X6)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact, approx = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)"),
    ).first()
    assert abs(approx - exact) / exact < 0.01


def test_approx_distinct_within_tolerance(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact, approx = o.agg(
        F.countDistinct("o_custkey"), F.approx_count_distinct("o_custkey")
    ).first()
    assert abs(approx - exact) / exact < 0.05


def test_connected_components_both_strategies_agree(spark):
    from lens_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 1)], "id_a long, id_b long")
    # chain 1-2-3-9-8 plus 5-6 → components {1: min 1, 5}
    local = {r.id: r.component
             for r in connected_components(pairs).collect()}
    dist = {r.id: r.component
            for r in connected_components(pairs, driver_threshold=0).collect()}
    want = {1: 1, 2: 1, 3: 1, 8: 1, 9: 1, 5: 5, 6: 5}
    assert local == want
    assert dist == want


def test_probe_pair_losers_one_action_matches_components(spark):
    """r15 (r14 verdict #4): the incremental dedups' emptiness probe
    and component resolution are ONE take() — `_probe_pair_losers`
    must return None for a clean batch and the connected_components
    loser ids as a driver list for a small graph (union-find over the
    rows the probe already fetched); `_drop_ids` must then cut them
    with anti-join NULL semantics (NULL ids are KEPT)."""
    from lens_spark.operators.dedup import (
        _drop_ids,
        _probe_pair_losers,
        connected_components,
    )

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert _probe_pair_losers(empty) is None

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 1)], "id_a long, id_b long")
    losers = _probe_pair_losers(pairs)
    comp = connected_components(pairs)
    want = {r.id for r in
            comp.filter("id != component").select("id").collect()}
    assert set(losers) == want == {2, 3, 8, 9, 6}

    df = spark.createDataFrame(
        [(1, "keep"), (2, "drop"), (None, "null-keep")],
        "id long, tag string")
    kept = {r.tag for r in _drop_ids(df, "id", losers).collect()}
    assert kept == {"keep", "null-keep"}


def test_dedup_incremental_across_batches(spark, tmp_path):
    """Batch 2 drops rows already accepted in batch 1; the index stores
    fingerprints only."""
    from lens_spark.operators.dedup import dedup_incremental

    idx = str(tmp_path / "fp_index")
    b1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "b"), (3, "c")], "k long, v string")
    out1 = dedup_incremental(b1, idx, columns=["k", "v"])
    assert out1.count() == 3  # internal dup collapsed

    b2 = spark.createDataFrame(
        [(2, "b"), (3, "c"), (4, "d")], "k long, v string")
    out2 = dedup_incremental(b2, idx, columns=["k", "v"])
    assert {(r.k, r.v) for r in out2.collect()} == {(4, "d")}

    # replaying an already-ingested batch yields nothing new
    out3 = dedup_incremental(b2, idx, columns=["k", "v"])
    assert out3.count() == 0
    # the index holds one 8-byte fingerprint per accepted row, in the
    # pb-bucketed parts/ layout (r6)
    assert sorted(spark.read.parquet(f"{idx}/parts").columns) == ["fp", "pb"]
    assert spark.read.parquet(f"{idx}/parts").count() == 4


_ND_A = ("the quick brown fox jumps over the lazy dog while the bright sun "
         "shines over the quiet green hill in the early morning light")
_ND_A2 = _ND_A.replace("morning", "evening")     # near-dup of A
_ND_B = ("completely different text about spark shuffles partitions and "
         "broadcast joins at terabyte scale with adaptive execution")
_ND_C = ("yet another unrelated document discussing minhash signatures "
         "banding buckets and jaccard similarity estimation theory")
_ND_C2 = _ND_C.replace("theory", "practice")     # near-dup of C


def test_neardup_incremental_across_batches(spark, tmp_path):
    """Batch 2 drops near-dups of batch 1 (via the persistent MinHash
    index) AND near-dups within itself; novel docs survive."""
    from lens_spark.operators.dedup import neardup_incremental

    idx = str(tmp_path / "nd_index")
    kw = dict(num_hashes=16, ngram=3, band_size=4, threshold=0.5)
    b1 = spark.createDataFrame([(1, _ND_A), (2, _ND_B)], "id long, text string")
    out1 = neardup_incremental(b1, idx, "id", "text", **kw)
    assert {r.id for r in out1.collect()} == {1, 2}

    # 3 = near-dup of corpus doc 1; 4/5 = near-dups of each other (novel
    # vs corpus) → min-id representative 4 survives
    b2 = spark.createDataFrame(
        [(3, _ND_A2), (4, _ND_C), (5, _ND_C2)], "id long, text string")
    out2 = neardup_incremental(b2, idx, "id", "text", **kw)
    assert {r.id for r in out2.collect()} == {4}

    # the index persisted batch 2's survivor: replaying C' now dedups
    # against it, and a batch-1 near-dup still dedups after "restart"
    b3 = spark.createDataFrame(
        [(6, _ND_C2), (7, _ND_A2), (8, "tiny")], "id long, text string")
    out3 = neardup_incremental(b3, idx, "id", "text", **kw)
    assert {r.id for r in out3.collect()} == {8}  # shingle-less doc passes


def test_neardup_incremental_read_only_mode(spark, tmp_path):
    from lens_spark.operators.dedup import neardup_incremental

    idx = str(tmp_path / "nd_index_ro")
    kw = dict(num_hashes=16, ngram=3, band_size=4, threshold=0.5)
    b1 = spark.createDataFrame([(1, _ND_A)], "id long, text string")
    neardup_incremental(b1, idx, "id", "text", **kw)
    n_index = spark.read.parquet(f"{idx}/parts").count()
    probe = spark.createDataFrame(
        [(2, _ND_A2), (3, _ND_B)], "id long, text string")
    out = neardup_incremental(probe, idx, "id", "text",
                              update_index=False, **kw)
    assert {r.id for r in out.collect()} == {3}
    assert spark.read.parquet(f"{idx}/parts").count() == n_index  # untouched


def _assert_dynamic_pb_pruning(df):
    """The plan's parquet PartitionFilters must carry a dynamic-
    pruning subquery on pb — Spark then skips the untouched (kind,
    pb) directories at runtime using the batch side's pb values."""
    import re

    jvm = df.sparkSession._jvm
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(),
                                            "formatted")
    m = re.search(
        r"PartitionFilters: \[[^\]]*dynamicpruningexpression\([^\]]*pb",
        plan)
    assert m, f"no dynamic pb partition pruning in plan:\n{plan}"


def test_neardup_incremental_probe_prunes_band_buckets(spark, tmp_path):
    """r6: the corpus band probe must prune to the (kind, pb)
    partitions the batch's own bands touch — a small batch's probe
    lists a strict subset of the index's pb directories instead of
    scanning the whole band index, and the dedup answer is unchanged."""
    import os

    from lens_spark.operators.dedup import (
        INDEX_PROBE_BUCKETS,
        neardup_incremental,
    )

    idx = str(tmp_path / "nd_prune")
    kw = dict(num_hashes=16, ngram=3, band_size=4, threshold=0.5)
    corpus = spark.createDataFrame(
        [(i, " ".join(f"tok{i}w{j}" for j in range(30)))
         for i in range(40)] + [(99, _ND_A)],
        "id long, text string")
    neardup_incremental(corpus, idx, "id", "text", **kw)
    # the accumulated index spreads bands over (nearly) all pb dirs
    on_disk = {int(d.split("=")[1])
               for d in os.listdir(f"{idx}/parts/kind=bands")
               if d.startswith("pb=")}
    assert len(on_disk) > 8, "corpus too small to spread over buckets"

    probe = spark.createDataFrame(
        [(200, _ND_A2), (201, "completely novel words nobody used")],
        "id long, text string")
    out = neardup_incremental(probe, idx, "id", "text",
                              update_index=False, **kw)
    # semantics unchanged: the corpus near-dup drops, the novel doc stays
    assert {r.id for r in out.collect()} == {201}
    # the probe plan dynamically prunes the index scan on pb: the tiny
    # batch's ≤ 2 docs × 4 bands of pb values gate which of the
    # populated directories are read at runtime
    _assert_dynamic_pb_pruning(out)


def test_embedding_neardup_incremental_probe_prunes_cell_buckets(
        spark, tmp_path):
    """r6: same pruning contract for the persistent vector index — the
    cell probe lists only the pb directories the batch's cells hash
    into; results unchanged."""
    import os

    import numpy as np

    from lens_spark.operators.dedup import embedding_neardup_incremental

    rnd = np.random.RandomState(7)
    idx = str(tmp_path / "vec_prune")
    kw = dict(dim=8, threshold=0.95, num_bits=2, num_tables=4)
    vecs = [_unit(list(rnd.randn(8))) for _ in range(40)]
    corpus = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "id long, vec array<float>")
    embedding_neardup_incremental(corpus, idx, "id", "vec", **kw)
    on_disk = {int(d.split("=")[1])
               for d in os.listdir(f"{idx}/parts/kind=cells")
               if d.startswith("pb=")}
    assert len(on_disk) > 4, "corpus too small to spread over buckets"

    near0 = _unit(list(np.array(vecs[0]) + 0.005))
    probe = spark.createDataFrame(
        [(100, near0)], "id long, vec array<float>")
    out = embedding_neardup_incremental(probe, idx, "id", "vec",
                                        update_index=False, **kw)
    assert out.count() == 0  # still rejected as a near-copy
    # 1 doc × num_tables cells → ≤ 4 pb values gate the runtime scan
    _assert_dynamic_pb_pruning(out)


def test_neardup_incremental_unbucketed_index_migrates(spark, tmp_path):
    """A pre-r6 kind-only parts/ index is rewritten into the (kind,
    pb) layout on the first writing call; accumulated dedup state
    survives the migration."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from lens_spark.operators.dedup import neardup_incremental

    idx = str(tmp_path / "nd_unbucketed")
    kw = dict(num_hashes=16, ngram=3, band_size=4, threshold=0.5)
    b1 = spark.createDataFrame([(1, _ND_A), (2, _ND_B)],
                               "id long, text string")
    neardup_incremental(b1, idx, "id", "text", **kw)
    # rewrite the index into the pre-r6 kind-only layout
    legacy = spark.read.parquet(f"{idx}/parts").drop("pb").localCheckpoint()
    shutil.rmtree(f"{idx}/parts")
    legacy.write.partitionBy("kind").parquet(f"{idx}/parts")
    assert "pb" not in spark.read.parquet(f"{idx}/parts").columns

    # read-only refuses loudly (migration needs the write lease)
    probe = spark.createDataFrame([(3, _ND_A2)], "id long, text string")
    import pytest as _pytest

    from lens_spark.errors import LensError

    with _pytest.raises(LensError, match="bucketed"):
        neardup_incremental(probe, idx, "id", "text",
                            update_index=False, **kw)

    # a writing call migrates and still remembers batch 1
    out = neardup_incremental(probe, idx, "id", "text", **kw)
    assert out.count() == 0
    assert "pb" in spark.read.parquet(f"{idx}/parts").columns
    assert any(d.startswith("pb=")
               for d in os.listdir(f"{idx}/parts/kind=bands"))
    # migration staging fully cleaned up
    assert not os.path.exists(f"{idx}/parts.old")
    assert not os.path.exists(f"{idx}/parts.migrating")


def test_dedup_incremental_read_only_mode(spark, tmp_path):
    from lens_spark.operators.dedup import dedup_incremental

    idx = str(tmp_path / "fp_index_ro")
    b = spark.createDataFrame([(1, "a")], "k long, v string")
    dedup_incremental(b, idx, columns=["k", "v"])
    probe = spark.createDataFrame([(1, "a"), (9, "z")], "k long, v string")
    out = dedup_incremental(probe, idx, columns=["k", "v"],
                            update_index=False)
    assert {r.k for r in out.collect()} == {9}
    assert spark.read.parquet(f"{idx}/parts").count() == 1  # untouched
    # the probe dynamically prunes the fingerprint index scan on pb
    _assert_dynamic_pb_pruning(out)


def test_incremental_index_concurrent_writer_refused(spark, tmp_path):
    """The incremental flow is read-index → dedup → append-index; two
    concurrent writers would both dedup against the pre-append index
    and double-accept the same dups. A live writer lock must make the
    second ingest raise instead of corrupting the index; read-only
    probes take no lock."""
    from lens_spark.errors import ConcurrentIndexWriterError
    from lens_spark.operators.dedup import dedup_incremental

    idx_dir = tmp_path / "fp_idx_lock"
    idx = str(idx_dir)
    b = spark.createDataFrame([(1, "a")], "k long, v string")
    dedup_incremental(b, idx, columns=["k", "v"])
    assert not (idx_dir / "_writer.lock").exists()  # released after commit
    (idx_dir / "_writer.lock").touch()  # simulate a live concurrent writer
    with pytest.raises(ConcurrentIndexWriterError,
                       match="locked by another writer"):
        dedup_incremental(b, idx, columns=["k", "v"])
    out = dedup_incremental(b, idx, columns=["k", "v"], update_index=False)
    assert out.count() == 0  # read-only path unaffected by the lock


def test_incremental_index_stale_lock_broken(spark, tmp_path):
    """A lock older than the stale window is presumed a crashed writer
    (one that never reached its finally) and broken; ingest proceeds
    and releases its own lock afterwards."""
    import os
    import time

    from lens_spark.operators.dedup import dedup_incremental

    idx_dir = tmp_path / "fp_idx_stale"
    idx_dir.mkdir()
    lock = idx_dir / "_writer.lock"
    lock.touch()
    old = time.time() - 7200  # well past INDEX_LOCK_STALE_SEC
    os.utime(lock, (old, old))
    b = spark.createDataFrame([(1, "a")], "k long, v string")
    out = dedup_incremental(b, str(idx_dir), columns=["k", "v"])
    assert out.count() == 1
    assert not lock.exists()


def test_neardup_incremental_concurrent_writer_refused(spark, tmp_path):
    from lens_spark.errors import ConcurrentIndexWriterError
    from lens_spark.operators.dedup import neardup_incremental

    idx_dir = tmp_path / "nd_idx_lock"
    kw = dict(num_hashes=16, ngram=3, band_size=4, threshold=0.5)
    b1 = spark.createDataFrame([(1, _ND_A)], "id long, text string")
    neardup_incremental(b1, str(idx_dir), "id", "text", **kw)
    assert not (idx_dir / "_writer.lock").exists()  # released after commit
    (idx_dir / "_writer.lock").touch()
    with pytest.raises(ConcurrentIndexWriterError):
        neardup_incremental(b1, str(idx_dir), "id", "text", **kw)
    # read-only dedup against the locked index still works
    out = neardup_incremental(b1, str(idx_dir), "id", "text",
                              update_index=False, **kw)
    assert out.count() == 0


def test_dedup_nil_not_conflated_with_all_null(spark):
    """A nil item (reference TypeId=0) and a genuine all-null document
    are distinct item *kinds* (host-go/engine/module/protocol.go:42-52)
    — default dedup identity keeps the hidden nil flag so they never
    collapse into one survivor."""
    from lens_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(None, None, True), (None, None, False), (None, None, True)],
        "Name string, Age long, __lens_nil boolean")
    got = {(r["Name"], r["Age"], r["__lens_nil"]) for r in exact_dedup(df).collect()}
    assert got == {(None, None, True), (None, None, False)}


def test_line_dedup_strips_boilerplate_keeps_order(spark):
    """Lines in >= min_df distinct docs vanish from every doc; unique
    lines keep their original order; an all-boilerplate doc stays in
    the output as an empty string."""
    from lens_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [(1, "MENU\nalpha body\nFOOTER"),
         (2, "MENU\nbeta body\nmore beta\nFOOTER"),
         (3, "MENU\nFOOTER")],
        "doc_id long, text string")
    out = {r.doc_id: r.text for r in
           line_dedup(df, "doc_id", "text", min_df=2).collect()}
    assert out == {1: "alpha body", 2: "beta body\nmore beta", 3: ""}


def test_line_dedup_min_df_dial_and_out_column(spark):
    from lens_spark.operators.dedup import line_dedup

    df = spark.createDataFrame(
        [(1, "shared\nuniq1"), (2, "shared\nuniq2")],
        "doc_id long, text string")
    # min_df above corpus size: nothing is boilerplate
    untouched = line_dedup(df, "doc_id", "text", min_df=3)
    assert {r.text for r in untouched.collect()} \
        == {"shared\nuniq1", "shared\nuniq2"}
    # out= writes the cleaned text next to the original
    side = line_dedup(df, "doc_id", "text", min_df=2, out="clean")
    rows = {r.doc_id: (r.text, r.clean) for r in side.collect()}
    assert rows == {1: ("shared\nuniq1", "uniq1"),
                    2: ("shared\nuniq2", "uniq2")}


def test_dup_span_stats_scores_copied_spans(spark):
    """A doc sharing its first 4-token span with another doc scores
    that span as duplicated; unique tails don't; short docs score 0."""
    from lens_spark.operators.dedup import dup_span_stats

    df = spark.createDataFrame(
        [(1, "a b c d unique tail one"),
         (2, "a b c d different ending words"),
         (3, "totally distinct text with no overlap at all"),
         (4, "tiny")],
        "doc_id long, text string")
    out = {r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_span_frac)
           for r in dup_span_stats(df, "doc_id", "text", span=4).collect()}
    # 7 tokens -> 4 distinct 4-spans; only "a b c d" is shared
    assert out[1] == (4, 1, 0.25)
    assert out[2] == (4, 1, 0.25)
    assert out[3][1] == 0 and out[3][2] == 0.0
    assert out[4] == (0, 0, 0.0)  # shorter than the span width


def test_simhash_table_matches_expression_form(spark):
    """The agg form (one hash per token, 60 popcount sums) and the
    expression form (per-bit array filters) must pack identical
    integers; tokenless docs score 0 in both."""
    from lens_spark.functions.hashing import simhash60
    from lens_spark.functions.text import tokens
    from lens_spark.operators.dedup import simhash_table

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"),
         (3, "a completely different document body"), (4, "")],
        "doc_id long, text string")
    via_table = {r.doc_id: r.simhash
                 for r in simhash_table(df, "doc_id", "text").collect()}
    via_expr = {r.doc_id: r.sh for r in df.select(
        "doc_id", simhash60(tokens(F.col("text"))).alias("sh")).collect()}
    assert via_table == via_expr
    assert via_table[1] == via_table[2]  # identical text, identical hash
    assert via_table[1] != via_table[3]
    assert via_table[4] == 0
    assert all(0 <= v < (1 << 60) for v in via_table.values())


def test_neardup_incremental_legacy_layout_migrates(spark, tmp_path):
    """A pre-r4 bands/+sigs/ index is migrated into parts/ (not silently
    treated as empty, which would re-accept indexed near-dups)."""
    from lens_spark.errors import LensError
    from lens_spark.operators.dedup import neardup_incremental

    idx = str(tmp_path / "nd_index_legacy")
    kw = dict(num_hashes=16, ngram=3, band_size=4, threshold=0.5)
    b1 = spark.createDataFrame([(1, _ND_A), (2, _ND_B)], "id long, text string")
    neardup_incremental(b1, idx, "id", "text", **kw)

    # Rewrite the modern parts/ index into the legacy two-dataset layout.
    parts = spark.read.parquet(f"{idx}/parts")
    parts.filter("kind = 'bands'").select("id", "band_hash") \
        .write.parquet(f"{idx}/bands")
    parts.filter("kind = 'sigs'").select("id", "sig") \
        .write.parquet(f"{idx}/sigs")
    import shutil
    shutil.rmtree(f"{idx}/parts")

    # Read-only calls cannot migrate: loud error, not empty-index dedup.
    probe = spark.createDataFrame([(3, _ND_A2)], "id long, text string")
    with pytest.raises(LensError, match="legacy"):
        neardup_incremental(probe, idx, "id", "text",
                            update_index=False, **kw)

    # An updating call migrates, then dedups against the migrated corpus.
    out = neardup_incremental(probe, idx, "id", "text", **kw)
    assert out.count() == 0  # near-dup of legacy-indexed doc 1
    assert not os.path.exists(f"{idx}/bands")
    assert not os.path.exists(f"{idx}/sigs")
    kinds = {r.kind for r in
             spark.read.parquet(f"{idx}/parts").select("kind").distinct().collect()}
    assert kinds == {"bands", "sigs"}


def test_neardup_incremental_half_migrated_index_refused(spark, tmp_path):
    """Both layouts present (crashed migration) is ambiguous: raise."""
    from lens_spark.errors import LensError
    from lens_spark.operators.dedup import neardup_incremental

    idx = str(tmp_path / "nd_index_half")
    kw = dict(num_hashes=16, ngram=3, band_size=4, threshold=0.5)
    b1 = spark.createDataFrame([(1, _ND_A)], "id long, text string")
    neardup_incremental(b1, idx, "id", "text", **kw)
    spark.read.parquet(f"{idx}/parts").filter("kind = 'bands'") \
        .select("id", "band_hash").write.parquet(f"{idx}/bands")
    with pytest.raises(LensError, match="BOTH"):
        neardup_incremental(b1, idx, "id", "text", **kw)


def test_minhash_max_bucket_drop_is_reported(spark):
    """The skew cap must not be a silent cut: drop_metrics carries the
    dropped bucket/row counts for a synthetic boilerplate-heavy corpus."""
    from lens_spark.operators.dedup import minhash_candidates

    boiler = [(i, _ND_A) for i in range(30)]          # one giant LSH bucket
    rows = boiler + [(100, _ND_B), (101, _ND_C)]
    df = spark.createDataFrame(rows, "id long, text string")
    metrics: dict = {}
    pairs = minhash_candidates(df, "id", "text", num_hashes=16, band_size=4,
                               max_bucket=10, drop_metrics=metrics)
    assert metrics["dropped_buckets"] >= 1
    # every band of the 30-doc boilerplate cluster exceeds the cap
    assert metrics["dropped_rows"] >= 30
    got = pairs.collect()
    assert all(r.id_a >= 100 and r.id_b >= 100 for r in got)


def test_minhash_max_bucket_clean_corpus_reports_zero(spark):
    from lens_spark.operators.dedup import minhash_candidates

    df = spark.createDataFrame(
        [(1, _ND_A), (2, _ND_B), (3, _ND_C)], "id long, text string")
    metrics: dict = {}
    minhash_candidates(df, "id", "text", num_hashes=16, band_size=4,
                       max_bucket=50, drop_metrics=metrics).collect()
    assert metrics == {"dropped_buckets": 0, "dropped_rows": 0}


def test_span_dedup_removes_covered_positions(spark):
    """Tokens covered by any corpus-duplicated 4-token span vanish;
    unique tails survive in order; a fully-duplicated doc becomes ""
    but keeps its row; short docs pass through."""
    from lens_spark.operators.dedup import span_dedup

    common = "one two three four"
    df = spark.createDataFrame(
        [(1, f"{common} tail alpha"),
         (2, f"{common} tail beta"),
         (3, "totally unique words here indeed"),
         (4, "tiny doc")],
        "doc_id long, text string")
    out = {r.doc_id: r.text for r in
           span_dedup(df, "doc_id", "text", span=4, min_df=2).collect()}
    # "tail" is inside the duplicated window of doc1/doc2? spans are
    # positions 1..3 of 7 tokens: [one two three four], [two three four
    # tail], [three four tail alpha] — only span 1 is duplicated (docs
    # differ from token 6 on... doc1: one two three four tail alpha;
    # doc2: ... tail beta. Span 2 "two three four tail" occurs in BOTH
    # → duplicated; span 3 differs. Covered = positions 1..5 → "alpha"/
    # "beta" survive.
    assert out == {1: "alpha", 2: "beta",
                   3: "totally unique words here indeed", 4: "tiny doc"}


def test_span_dedup_case_insensitive_match_preserves_case(spark):
    from lens_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(
        [(1, "Alpha Beta Gamma Delta KEEP1"),
         (2, "alpha beta gamma delta KEEP2")],
        "doc_id long, text string")
    out = {r.doc_id: r.text for r in
           span_dedup(df, "doc_id", "text", span=4, min_df=2).collect()}
    assert out == {1: "KEEP1", 2: "KEEP2"}


def test_span_dedup_min_df_dial_and_out_column(spark):
    from lens_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(
        [(1, "a b c d x"), (2, "a b c d y")],
        "doc_id long, text string")
    untouched = span_dedup(df, "doc_id", "text", span=4, min_df=3)
    assert {r.text for r in untouched.collect()} \
        == {"a b c d x", "a b c d y"}
    side = span_dedup(df, "doc_id", "text", span=4, min_df=2, out="clean")
    rows = {r.doc_id: (r.text, r.clean) for r in side.collect()}
    assert rows == {1: ("a b c d x", "x"), 2: ("a b c d y", "y")}


def test_unigram_logprob_hand_computed(spark):
    """mean_logprob matches the add-k unigram formula computed by hand;
    token-less docs keep their row at 0.0."""
    import math

    from lens_spark.operators.text import unigram_logprob

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "   ")],
        "doc_id long, text string")
    out = {r.doc_id: r.mean_logprob for r in
           unigram_logprob(df, "doc_id", "text").collect()}
    # counts: a=2 b=2 c=1; total=5 vocab=3; denom = 5 + 0.5*3
    lp = {t: -math.log2((c + 0.5) / 6.5) for t, c in
          {"a": 2, "b": 2, "c": 1}.items()}
    exp1 = round((2 * lp["a"] + lp["b"]) / 3, 6)
    exp2 = round((lp["b"] + lp["c"]) / 2, 6)
    assert out[3] == 0.0
    assert abs(out[1] - exp1) < 1e-9 and abs(out[2] - exp2) < 1e-9


def test_unigram_logprob_ranks_rare_above_common(spark):
    from lens_spark.operators.text import unigram_logprob

    rows = [(i, "the same common phrase") for i in range(10)]
    rows.append((99, "zxqv wmbr ktjp"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.mean_logprob for r in
           unigram_logprob(df, "doc_id", "text").collect()}
    assert out[99] > out[0]


def test_hash_embedding_unit_norm_and_determinism(spark):
    """Nonzero vectors are L2-normalized; identical texts map to
    identical vectors; token-less docs keep their row as the zero
    vector of the right dimension."""
    import math

    from lens_spark.operators.text import hash_embedding

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "totally different words"), (4, "   ")],
        "doc_id long, text string")
    out = {r.doc_id: list(r.embedding) for r in
           hash_embedding(df, "doc_id", "text", dim=8).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
    assert out[4] == [0.0] * 8
    for d in (1, 3):
        norm = math.sqrt(sum(x * x for x in out[d]))
        assert abs(norm - 1.0) < 1e-4  # rounded components, near-unit


def test_hash_embedding_feeds_vector_surface(spark):
    """The text→vector bridge composes: near-identical docs land as
    embedding near-dups of each other via exact cosine."""
    from lens_spark.operators.dedup import embedding_neardup_pairs
    from lens_spark.operators.text import hash_embedding

    base = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, base), (2, base + " eleven"), (3, "utterly unrelated text")],
        "doc_id long, text string")
    emb = hash_embedding(df, "doc_id", "text", dim=16)
    pairs = embedding_neardup_pairs(emb, "doc_id", "embedding",
                                    threshold=0.8, method="exact")
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_winnow_fingerprints_shared_substring_guarantee(spark):
    """Docs sharing a run of >= window+k-1 tokens share >= 1
    fingerprint (the winnowing guarantee); disjoint docs share none;
    docs shorter than k+window-1 tokens emit nothing."""
    from lens_spark.operators.dedup import winnow_fingerprints

    run = "a b c d e f g h"  # 8 tokens >= 4+4-1
    df = spark.createDataFrame(
        [(1, f"{run} unique1 tail1"),
         (2, f"prefix2 other2 {run}"),
         (3, "totally disjoint words with nothing in common here"),
         (4, "too short")],
        "doc_id long, text string")
    fp = winnow_fingerprints(df, "doc_id", "text", k=4, window=4).collect()
    by_doc: dict = {}
    for r in fp:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2]          # guarantee
    assert not (by_doc[1] & by_doc[3])    # disjoint
    assert 4 not in by_doc                # short doc emits nothing


def test_winnow_fingerprints_density(spark):
    """Winnowing keeps far fewer hashes than the full gram set (the
    point of the scheme) but at least one per doc."""
    from lens_spark.operators.dedup import winnow_fingerprints

    text = " ".join(f"tok{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n = winnow_fingerprints(df, "doc_id", "text", k=4, window=4).count()
    n_grams = 100 - 4 + 1
    assert 1 <= n < n_grams / 2  # expected density 2/(w+1) = 0.4


def test_bigram_logprob_hand_computed(spark):
    """mean_bigram_logprob matches the add-k conditional formula by
    hand; sub-2-token docs keep their row at 0.0."""
    import math

    from lens_spark.operators.text import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a"), (3, "x")],
        "doc_id long, text string")
    out = {r.doc_id: r.mean_bigram_logprob for r in
           bigram_logprob(df, "doc_id", "text").collect()}
    # bigram table: doc1: (a,b) (b,a) (a,b); doc2: (b,a)
    # c2: (a,b)=2 (b,a)=2; c1: a=2 b=2; V = |{a,b}| = 2
    lp_ab = -math.log2((2 + 0.5) / (2 + 0.5 * 2))
    exp1 = round((2 * lp_ab + lp_ab) / 3, 6)  # all transitions same prob
    assert out[3] == 0.0
    assert abs(out[1] - exp1) < 1e-9
    assert abs(out[2] - round(lp_ab, 6)) < 1e-9


def test_bigram_logprob_flags_word_salad_unigram_misses(spark):
    """A doc built from common words in UNSEEN order scores higher than
    in-order docs — the transition signal unigram stats can't see."""
    from lens_spark.operators.text import bigram_logprob, unigram_logprob

    rows = [(i, "the quick brown fox jumps") for i in range(10)]
    rows.append((99, "jumps the fox brown quick"))  # same words, shuffled
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bi = {r.doc_id: r.mean_bigram_logprob for r in
          bigram_logprob(df, "doc_id", "text").collect()}
    uni = {r.doc_id: r.mean_logprob for r in
           unigram_logprob(df, "doc_id", "text").collect()}
    assert bi[99] > bi[0]                      # bigram LM flags it
    assert abs(uni[99] - uni[0]) < 0.2         # unigram barely moves


def test_winnow_pairs_finds_shared_passages_and_max_df_cut(spark):
    """Docs sharing a long verbatim passage pair up with n_shared >= 2;
    globally dissimilar docs without passages don't; a boilerplate
    passage present in EVERY doc is killed by the max_df cut."""
    from lens_spark.operators.dedup import winnow_pairs

    passage = " ".join(f"p{i}" for i in range(16))
    df = spark.createDataFrame(
        [(1, f"{passage} unique one two three"),
         (2, f"other stuff here {passage}"),
         (3, "completely different text with nothing shared at all ok")],
        "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.n_shared for r in
           winnow_pairs(df, "doc_id", "text", min_shared=2).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 2
    assert not any(3 in p for p in got)

    boiler = " ".join(f"b{i}" for i in range(16))
    df2 = spark.createDataFrame(
        [(i, f"{boiler} doc{i} filler{i} more{i} words{i}")
         for i in range(6)],
        "doc_id long, text string")
    cut = winnow_pairs(df2, "doc_id", "text", min_shared=1, max_df=3)
    assert cut.count() == 0  # universal boilerplate fps dropped


def test_chunk_documents_windows_and_overlap(spark):
    """size=4/overlap=0: tokens partition exactly; size=4/overlap=2:
    consecutive chunks share 2 tokens and reconstruct the doc; empty
    docs vanish; metadata columns ride along on every chunk."""
    from lens_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", "web"),
         (2, "a b c", "book"),
         (3, "   ", "web")],
        "doc_id long, text string, source string")
    flat = chunk_documents(df, "text", size=4).collect()
    by_doc = {}
    for r in sorted(flat, key=lambda r: (r.doc_id, r.chunk_index)):
        by_doc.setdefault(r.doc_id, []).append((r.chunk_text, r.chunk_tokens))
    assert by_doc[1] == [("t1 t2 t3 t4", 4), ("t5 t6 t7 t8", 4),
                        ("t9 t10", 2)]
    assert by_doc[2] == [("a b c", 3)]
    assert 3 not in by_doc                       # token-less doc: no chunks
    assert all(r.source in ("web", "book") for r in flat)  # carry columns

    lapped = chunk_documents(df.filter("doc_id = 1"), "text",
                             size=4, overlap=2).collect()
    texts = [r.chunk_text for r in sorted(lapped, key=lambda r: r.chunk_index)]
    # stride-2 windows over 10 tokens: starts 0,2,4,6 — the last window
    # reaches the final token, so no extra runt chunk is emitted
    assert texts == ["t1 t2 t3 t4", "t3 t4 t5 t6",
                     "t5 t6 t7 t8", "t7 t8 t9 t10"]


def test_chunk_documents_rejects_bad_params(spark):
    from lens_spark.errors import LensError
    from lens_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    for kwargs in ({"size": 0}, {"size": 4, "overlap": 4},
                   {"size": 4, "overlap": -1}):
        try:
            chunk_documents(df, "text", **kwargs)
            assert False, f"accepted {kwargs}"
        except LensError:
            pass


def test_html_to_text_strips_markup_decodes_entities(spark):
    from lens_spark.operators.text import html_to_text

    df = spark.createDataFrame(
        [(1, "<html><head><style>p {color: red}</style>"
             "<script type='t'>var x = '<p>';</script></head>"
             "<body><p>Hello &amp; welcome.</p><!-- note -->"
             "<div>A&nbsp;&lt;tag&gt; &#39;quoted&#39;</div></body></html>"),
         (2, "plain text stays"),
         (3, "double-encoded &amp;lt; survives as literal")],
        "doc_id long, text string")
    out = {r.doc_id: r.text for r in html_to_text(df, "text").collect()}
    assert out[1] == "Hello & welcome. A <tag> 'quoted'"
    assert out[2] == "plain text stays"
    assert out[3] == "double-encoded &lt; survives as literal"


def test_dedup_keep_best_picks_max_score_deterministically(spark):
    from lens_spark.operators.dedup import dedup_keep_best

    df = spark.createDataFrame(
        [(1, "k1", 10.0), (2, "k1", 30.0), (3, "k1", 30.0),
         (4, "k2", 5.0), (5, "k3", 1.0)],
        "doc_id long, key string, score double")
    got = {r.key: r.doc_id for r in
           dedup_keep_best(df, ["key"], "score", "doc_id").collect()}
    # k1: max score 30 ties between 2 and 3 -> max tie_col wins (3)
    assert got == {"k1": 3, "k2": 4, "k3": 5}
    out_cols = dedup_keep_best(df, ["key"], "score", "doc_id").columns
    assert out_cols == df.columns                # schema + order preserved


def test_bloom_decontaminate_equals_exact_even_with_tiny_filter(spark):
    """The bloom path must produce EXACTLY decontaminate's output: with
    a generous bitset (few false positives) and with a deliberately
    saturated 1-bit-per-gram bitset (fp ~ 1: every gram survives the
    prefilter and the exact confirm does all the work)."""
    from lens_spark.operators.dedup import bloom_decontaminate, decontaminate

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 10 == 3).select(
        F.col("text").alias("bench_text"))
    exact = {r.doc_id for r in decontaminate(
        docs, bench, "doc_id", "text", bench_text_col="bench_text",
        ngram=5).collect()}
    for bpg in (12, 1):
        got = {r.doc_id for r in bloom_decontaminate(
            docs, bench, "doc_id", "text", bench_text_col="bench_text",
            ngram=5, bits_per_gram=bpg).collect()}
        assert got == exact, f"bits_per_gram={bpg} diverged"
    assert len(exact) < docs.count()                # something was dropped


def test_bloom_decontaminate_guard_refuses_oversized_benchmark(spark):
    from lens_spark.errors import LensError
    from lens_spark.operators.dedup import bloom_decontaminate

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} q{i} r{i}") for i in range(20)],
        "doc_id long, text string")
    try:
        bloom_decontaminate(docs, bench, "doc_id", "text", ngram=3,
                            max_driver_grams=10)
        assert False, "guard did not trip"
    except LensError as e:
        assert "max_driver_grams" in str(e)


def _unit(v):
    import numpy as np
    x = np.array(v, dtype=float)
    return [float(t) for t in x / np.linalg.norm(x)]


def test_embedding_neardup_incremental_across_batches(spark, tmp_path):
    """Batch 1 bootstraps the index; batch 2's near-copies of batch-1
    vectors are rejected while genuinely new directions are accepted;
    batch 3 re-sending an accepted vector is rejected (the index
    remembers across calls)."""
    import numpy as np

    from lens_spark.operators.dedup import embedding_neardup_incremental

    idx = str(tmp_path / "vecidx")
    kw = dict(dim=8, threshold=0.95, num_bits=2, num_tables=4)
    rng = [_unit([1, 0, 0, 0, 1, 0, 0, 0]),
           _unit([0, 1, 0, 0, 0, 1, 0, 0]),
           _unit([0, 0, 1, 0, 0, 0, 1, 0])]
    b1 = spark.createDataFrame(
        [(i, rng[i]) for i in range(3)], "id long, vec array<float>")
    out1 = embedding_neardup_incremental(b1, idx, "id", "vec", **kw)
    assert {r.id for r in out1.collect()} == {0, 1, 2}

    near0 = _unit(list(np.array(rng[0]) + 0.01))       # ~copy of id 0
    newdir = _unit([0, 0, 0, 1, 0, 0, 0, -1])
    b2 = spark.createDataFrame(
        [(10, near0), (11, newdir)], "id long, vec array<float>")
    out2 = embedding_neardup_incremental(b2, idx, "id", "vec", **kw)
    assert {r.id for r in out2.collect()} == {11}

    b3 = spark.createDataFrame([(20, rng[1])], "id long, vec array<float>")
    out3 = embedding_neardup_incremental(b3, idx, "id", "vec", **kw)
    assert out3.count() == 0


def test_embedding_neardup_incremental_within_batch_and_readonly(spark, tmp_path):
    import numpy as np

    from lens_spark.operators.dedup import embedding_neardup_incremental

    idx = str(tmp_path / "vecidx2")
    kw = dict(dim=8, threshold=0.95, num_bits=2, num_tables=4)
    v = _unit([1, 2, 3, 4, 5, 6, 7, 8])
    vnear = _unit(list(np.array(v) + 0.005))
    other = _unit([8, -7, 6, -5, 4, -3, 2, -1])
    batch = spark.createDataFrame(
        [(1, v), (2, vnear), (3, other)], "id long, vec array<float>")
    out = embedding_neardup_incremental(batch, idx, "id", "vec", **kw)
    # within-batch near-pair collapses to the min-id representative
    assert {r.id for r in out.collect()} == {1, 3}

    # read-only: rejects dups without growing the index
    probe = spark.createDataFrame([(30, v)], "id long, vec array<float>")
    ro = embedding_neardup_incremental(probe, idx, "id", "vec",
                                       update_index=False, **kw)
    assert ro.count() == 0
    again = embedding_neardup_incremental(probe, idx, "id", "vec",
                                          update_index=False, **kw)
    assert again.count() == 0  # index unchanged by the read-only call


def test_dedup_segments_keeps_first_occurrence_in_order(spark):
    from lens_spark.operators.text import dedup_segments

    df = spark.createDataFrame(
        [(1, "intro\nbody A\nintro\nbody B\nbody A\noutro"),
         (2, "no repeats here\nat all"),
         (3, "x\nx\nx")],
        "doc_id long, text string")
    out = {r.doc_id: r.text for r in dedup_segments(df, "text").collect()}
    assert out[1] == "intro\nbody A\nbody B\noutro"
    assert out[2] == "no repeats here\nat all"
    assert out[3] == "x"
    # custom delimiter + out column leaves the original intact
    df2 = spark.createDataFrame([(1, "a. b. a. c")], "doc_id long, text string")
    side = dedup_segments(df2, "text", delimiter=". ", out="clean").collect()[0]
    assert side.text == "a. b. a. c" and side.clean == "a. b. c"


def test_domain_filter_block_and_allow_with_subdomains(spark):
    from lens_spark.operators.text import domain_filter

    df = spark.createDataFrame(
        [(1, "https://spam.example.com/page"),
         (2, "http://www.example.com/a?x=1"),
         (3, "https://good.org/b"),
         (4, "https://notexample.com/c"),       # NOT a subdomain match
         (5, "https://evil.example.com:8080/p"),  # port must not bypass
         (6, "http://u:pw@example.com/q")],       # userinfo must not bypass
        "doc_id long, url string")
    blocked = {r.doc_id for r in
               domain_filter(df, "url", ["example.com"]).collect()}
    assert blocked == {3, 4}
    allowed = {r.doc_id for r in
               domain_filter(df, "url", ["example.com"],
                             mode="allow").collect()}
    assert allowed == {1, 2, 5, 6}


def test_truncate_tokens_caps_only_long_docs(spark):
    from lens_spark.operators.text import truncate_tokens

    df = spark.createDataFrame(
        [(1, "a  b\tc d e"),       # 5 tokens, odd whitespace
         (2, "one two")],
        "doc_id long, text string")
    out = {r.doc_id: r.text for r in
           truncate_tokens(df, "text", 3).collect()}
    assert out[1] == "a b c"               # rewritten, single spaces
    assert out[2] == "one two"             # under cap: original bytes


def test_round5_lenses_compose_via_lens_spec(spark):
    """Every round-5 lens is reachable through the engine's spec path
    (registration + argument parsing), composed into one pipeline:
    markup strip → within-doc dedup → truncate → domain blocklist →
    keep-best → profile. Values are covered by the per-operator tests;
    this pins the lens-file surface."""
    from lens_spark import engine

    df = spark.createDataFrame(
        [(1, "<p>hello world</p>\n<p>hello world</p>", 5.0,
          "https://ok.org/a"),
         (2, "<b>hello world</b>", 9.0, "https://ok.org/b"),
         (3, "unique text here", 1.0, "https://spam.bad.com/c")],
        "doc_id long, text string, score double, url string")
    spec = {"lenses": [
        {"name": "html_to_text", "arguments": {"column": "text"}},
        {"name": "dedup_segments", "arguments": {"column": "text",
                                                 "delimiter": " "}},
        {"name": "truncate_tokens", "arguments": {"column": "text",
                                                  "max_tokens": 8}},
        {"name": "domain_filter", "arguments": {"column": "url",
                                                "domains": ["bad.com"]}},
        {"name": "dedup_keep_best", "arguments": {
            "keys": ["text"], "score": "score", "tie": "doc_id"}},
    ]}
    out = {r.doc_id: r.text for r in engine.append(df, spec).collect()}
    # doc 3 blocked by domain; docs 1+2 normalize to "hello world" and
    # keep-best picks the higher score (doc 2)
    assert out == {2: "hello world"}

    prof = engine.append(df, {"lenses": [
        {"name": "dataset_profile", "arguments": {
            "columns": ["doc_id", "url"], "exact": True}}]})
    got = {r.col_name: r.n_distinct for r in prof.collect()}
    assert got == {"doc_id": 3, "url": 3}

    chunks = engine.append(df, {"lenses": [
        {"name": "chunk_documents", "arguments": {
            "column": "text", "size": 2}}]})
    assert chunks.count() >= 3 and "chunk_text" in chunks.columns


def test_compression_ratio_orders_repetitive_below_random(spark):
    """The zlib signal must rank: templated/repetitive < English prose
    < high-entropy noise; empty/null score 0.0 and keep their rows;
    the value is deterministic and matches a local zlib computation."""
    import zlib

    from lens_spark.operators.text import compression_ratio

    rep = "buy now click here " * 50
    prose = ("the quick brown fox jumps over the lazy dog while the "
             "rain in spain stays mainly on the plain and every "
             "sentence here says something new about something else")
    import random
    import string

    rng = random.Random(0)  # seeded: deterministic, never repeats
    noise = "".join(rng.choice(string.ascii_letters + string.digits
                               + string.punctuation) for _ in range(200))
    df = spark.createDataFrame(
        [(1, rep), (2, prose), (3, noise), (4, ""), (5, None)],
        "doc_id long, text string")
    out = {r.doc_id: r.compression_ratio
           for r in compression_ratio(df, "text").collect()}
    assert out[1] < out[2] < out[3]
    assert out[4] == 0.0 and out[5] == 0.0
    raw = rep.encode()
    assert out[1] == round(len(zlib.compress(raw, 6)) / len(raw), 6)
    # spec path + inverse drops the column
    from lens_spark import engine

    spec = {"lenses": [{"name": "compression_ratio",
                        "arguments": {"column": "text"}}]}
    assert "compression_ratio" in engine.append(df, spec).columns


def test_containment_pairs_directional_overlap(spark):
    """A short doc fully inside a long one scores 1.0 on its side and
    the true fraction on the other; disjoint docs emit nothing."""
    from lens_spark.operators.dedup import containment_pairs

    long_doc = "alpha beta gamma delta epsilon zeta eta theta"
    short_doc = "alpha beta gamma delta"          # contained prefix
    other = "one two three four five six"
    df = spark.createDataFrame(
        [(1, long_doc), (2, short_doc), (3, other)],
        "id long, text string")
    rows = containment_pairs(df, "id", "text", ngram=3,
                             threshold=0.5).collect()
    assert len(rows) == 1
    (r,) = rows
    assert (r.id_a, r.id_b) == (1, 2)
    # long doc: 6 distinct 3-grams, short: 2, all shared
    assert r.containment_b == pytest.approx(1.0)
    assert r.containment_a == pytest.approx(round(2 / 6, 6))


def test_containment_pairs_max_df_cut(spark):
    """A stop-shingle present in every doc is cut by max_df before the
    self-join, removing pairs whose only overlap is boilerplate."""
    from lens_spark.operators.dedup import containment_pairs

    boiler = "click here to subscribe"
    df = spark.createDataFrame(
        [(i, f"{boiler} unique{i} words{i} here{i}") for i in range(4)],
        "id long, text string")
    with_cut = containment_pairs(df, "id", "text", ngram=3,
                                 threshold=0.3, max_df=2)
    assert with_cut.count() == 0
    no_cut = containment_pairs(df, "id", "text", ngram=3, threshold=0.3)
    assert no_cut.count() > 0


def test_score_band_deterministic_thirds_per_stratum(spark):
    """Nine docs per stratum band into thirds by score (desc), ties
    broken by id; strata band independently; bands<2 raises."""
    from lens_spark.errors import LensError
    from lens_spark.operators.text import score_band

    rows = [(i, "s1", float(100 - i)) for i in range(9)]
    rows += [(100 + i, "s2", 5.0) for i in range(3)]   # all-tied stratum
    df = spark.createDataFrame(rows, "doc_id long, src string, sc double")
    got = {r.doc_id: r.band for r in
           score_band(df, "sc", "doc_id", strata="src").collect()}
    assert [got[i] for i in range(9)] == [0, 0, 0, 1, 1, 1, 2, 2, 2]
    # tied scores band by id order — deterministic, never arbitrary
    assert [got[100 + i] for i in range(3)] == [0, 1, 2]
    with pytest.raises(LensError, match="bands must be"):
        score_band(df, "sc", "doc_id", strata="src", bands=1)


def test_score_band_lens_roundtrip(spark):
    from lens_spark import engine

    df = spark.createDataFrame(
        [(1, "a", 9.0), (2, "a", 5.0), (3, "a", 1.0)],
        "doc_id long, src string, sc double")
    spec = {"lenses": [{"name": "score_band", "arguments": {
        "column": "sc", "id": "doc_id", "strata": "src", "bands": 3}}]}
    out = engine.append(df, spec)
    assert {r.doc_id: r.band for r in out.collect()} == {1: 0, 2: 1, 3: 2}
    back = engine.append(out, engine.invert(spec))
    assert "band" not in back.columns


def test_compact_index_reduces_files_and_preserves_dedup(spark, tmp_path):
    """Many small appends → compact → ≤1 file per (kind, pb)
    partition, byte-equivalent rows, and the index still rejects a
    previously accepted near-dup afterward."""
    from lens_spark.operators.dedup import compact_index, neardup_incremental

    idx = str(tmp_path / "nd_compact")
    kw = dict(num_hashes=16, ngram=3, band_size=4, threshold=0.5)
    # several appends accumulate several files per partition
    for b in range(3):
        batch = spark.createDataFrame(
            [(b * 10 + i, " ".join(f"c{b}d{i}w{j}" for j in range(25)))
             for i in range(5)],
            "id long, text string")
        neardup_incremental(batch, idx, "id", "text", **kw)
    parts = f"{idx}/parts"
    rows_before = spark.read.parquet(parts).orderBy("id", "kind",
                                                    "band_hash").collect()
    stats = compact_index(spark, idx)
    assert stats["files_after"] < stats["files_before"]
    rows_after = spark.read.parquet(parts).orderBy("id", "kind",
                                                   "band_hash").collect()
    assert rows_before == rows_after  # data byte-equivalent
    # staging fully cleaned up, lock released
    import os

    assert not os.path.exists(f"{parts}.old")
    assert not os.path.exists(f"{parts}.migrating")
    assert not os.path.exists(f"{idx}/_writer.lock")
    # dedup state intact: replaying an accepted doc is rejected
    replay = spark.createDataFrame(
        [(999, " ".join(f"c0d0w{j}" for j in range(25)))],
        "id long, text string")
    assert neardup_incremental(replay, idx, "id", "text", **kw).count() == 0


def test_compact_index_refuses_unbucketed_and_handles_empty(spark, tmp_path):
    from lens_spark.errors import LensError
    from lens_spark.operators.dedup import compact_index

    empty = str(tmp_path / "no_index")
    assert compact_index(spark, empty) == {"files_before": 0,
                                           "files_after": 0}


def test_classifier_score_hand_computed_and_tokenless(spark):
    """Two buckets with known weights: score = sigmoid(bias + mean
    weight of the doc's token buckets); token-less docs score
    sigmoid(bias) and keep their row; lens inverse drops the column."""
    import hashlib
    import math

    from lens_spark import engine
    from lens_spark.operators.text import classifier_score

    nb = 8
    ws = [round((i - 4) / 10.0, 6) for i in range(nb)]
    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, ""), (3, None)],
        "doc_id long, text string")
    out = {r.doc_id: r.clf_score
           for r in classifier_score(df, "doc_id", "text", weights=ws,
                                     bias=0.25).collect()}

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % nb

    toks = ["alpha", "beta", "alpha"]
    z = 0.25 + sum(ws[bucket(t)] for t in toks) / len(toks)
    assert out[1] == pytest.approx(round(1 / (1 + math.exp(-z)), 6))
    empty = round(1 / (1 + math.exp(-0.25)), 6)
    assert out[2] == empty and out[3] == empty
    spec = {"lenses": [{"name": "classifier_score", "arguments": {
        "id": "doc_id", "column": "text", "weights": ws}}]}
    fwd = engine.append(df, spec)
    assert "clf_score" in fwd.columns
    back = engine.append(fwd, engine.invert(spec))
    assert "clf_score" not in back.columns


def test_classifier_fit_separates_and_feeds_score(spark):
    """Full-batch logistic regression on hashed features learns a
    planted good-word/bad-word separation, and its output model plugs
    straight into classifier_score (shared featurization)."""
    from lens_spark.operators.text import classifier_fit, classifier_score

    rows = []
    for i in range(40):
        rows.append((i, 1, f"quality prose insight clarity filler{i % 7}"))
        rows.append((1000 + i, 0, f"spam casino pills scam filler{i % 7}"))
    df = spark.createDataFrame(rows, "doc_id long, label int, text string")
    model = classifier_fit(df, "label", "text", num_buckets=256,
                           iters=30, lr=2.0)
    scored = classifier_score(df, "doc_id", "text",
                              weights=model["weights"],
                              bias=model["bias"])
    got = {r.doc_id: r.clf_score for r in scored.collect()}
    pos = [got[i] for i in range(40)]
    neg = [got[1000 + i] for i in range(40)]
    # fully separable by construction: every positive above every negative
    assert min(pos) > max(neg)
    acc = (sum(s > 0.5 for s in pos) + sum(s <= 0.5 for s in neg)) / 80
    assert acc >= 0.95


def test_classifier_fit_validation(spark):
    from lens_spark.errors import LensError
    from lens_spark.operators.text import classifier_fit

    df = spark.createDataFrame([(1, 1, "x")], "id long, label int, text string")
    import pytest as _pytest

    with _pytest.raises(LensError, match="must be >= 1"):
        classifier_fit(df, "label", "text", num_buckets=0)
    empty = df.filter("id < 0")
    with _pytest.raises(LensError, match="empty training corpus"):
        classifier_fit(empty, "label", "text", iters=1)


def test_dedup_incremental_flat_index_migrates(spark, tmp_path):
    """A pre-r6 flat fp index (files directly under index_path) is
    rewritten into parts/pb=N by the first writing call; accumulated
    state survives, and read-only calls work on the flat layout too."""
    import os

    from pyspark.sql import functions as F

    from lens_spark.operators.dedup import dedup_incremental

    idx = str(tmp_path / "fp_flat")
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    dedup_incremental(b1, idx, columns=["k", "v"])
    # rewrite into the pre-r6 flat layout
    import shutil

    fps = spark.read.parquet(f"{idx}/parts").select("fp").localCheckpoint()
    shutil.rmtree(idx)
    fps.write.parquet(idx)
    assert any(f.endswith(".parquet") for f in os.listdir(idx))

    # read-only against the flat layout still dedups correctly
    probe = spark.createDataFrame([(1, "a"), (9, "z")], "k long, v string")
    ro = dedup_incremental(probe, idx, columns=["k", "v"],
                           update_index=False)
    assert {r.k for r in ro.collect()} == {9}

    # a writing call migrates in place and remembers batch 1
    out = dedup_incremental(probe, idx, columns=["k", "v"])
    assert {r.k for r in out.collect()} == {9}
    assert os.path.isdir(f"{idx}/parts")
    assert not os.path.exists(f"{idx}/parts.migrating")
    # no flat files remain at the root
    assert all(not f.endswith(".parquet") for f in os.listdir(idx)
               if os.path.isfile(os.path.join(idx, f)))
    assert spark.read.parquet(f"{idx}/parts").count() == 3  # 1,2,9


def test_compact_index_on_exact_fp_layout(spark, tmp_path):
    """compact_index handles the kind-less pb-partitioned fp index."""
    from lens_spark.operators.dedup import compact_index, dedup_incremental

    idx = str(tmp_path / "fp_compact")
    for b in range(3):
        batch = spark.createDataFrame(
            [(b * 10 + i, f"v{b}-{i}") for i in range(8)],
            "k long, v string")
        dedup_incremental(batch, idx, columns=["k", "v"])
    rows_before = {r.fp for r in
                   spark.read.parquet(f"{idx}/parts").collect()}
    stats = compact_index(spark, idx)
    assert stats["files_after"] < stats["files_before"]
    assert {r.fp for r in
            spark.read.parquet(f"{idx}/parts").collect()} == rows_before
    # index still functional after compaction
    replay = spark.createDataFrame([(0, "v0-0"), (99, "new")],
                                   "k long, v string")
    out = dedup_incremental(replay, idx, columns=["k", "v"])
    assert {r.k for r in out.collect()} == {99}


def test_parts_migration_recovery_crash_windows(spark, tmp_path):
    """Each staged-rename crash state rolls forward or back
    deterministically: (parts + tmp) drops the garbage tmp;
    (old + tmp, no parts) completes the swap; (parts + old) drops the
    stale old copy."""
    import os
    import shutil

    from lens_spark.operators.dedup import _parts_pb_migration_recover

    def mk(path, marker):
        os.makedirs(path, exist_ok=True)
        open(os.path.join(path, marker), "w").write("x")

    # window 1: crash before rename 1 — parts intact, tmp partial
    root = str(tmp_path / "w1")
    mk(f"{root}/parts", "keep.parquet")
    mk(f"{root}/parts.migrating", "partial.parquet")
    _parts_pb_migration_recover(spark, f"{root}/parts")
    assert os.path.exists(f"{root}/parts/keep.parquet")
    assert not os.path.exists(f"{root}/parts.migrating")

    # window 2: crash between renames — no parts, complete tmp + old
    root = str(tmp_path / "w2")
    mk(f"{root}/parts.old", "legacy.parquet")
    mk(f"{root}/parts.migrating", "migrated.parquet")
    _parts_pb_migration_recover(spark, f"{root}/parts")
    assert os.path.exists(f"{root}/parts/migrated.parquet")
    assert not os.path.exists(f"{root}/parts.old")
    assert not os.path.exists(f"{root}/parts.migrating")

    # window 3: crash before the final delete — parts new, old stale
    root = str(tmp_path / "w3")
    mk(f"{root}/parts", "migrated.parquet")
    mk(f"{root}/parts.old", "legacy.parquet")
    _parts_pb_migration_recover(spark, f"{root}/parts")
    assert os.path.exists(f"{root}/parts/migrated.parquet")
    assert not os.path.exists(f"{root}/parts.old")

    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_parts_migration_leftovers_detection(spark, tmp_path):
    """Read-only callers see the unsafe window (parts missing, staging
    present) and nothing else."""
    import os

    from lens_spark.operators.dedup import _parts_migration_leftovers

    root = str(tmp_path / "det")
    parts = f"{root}/parts"
    os.makedirs(root)
    assert not _parts_migration_leftovers(spark, parts)  # nothing there
    os.makedirs(f"{parts}.migrating")
    assert _parts_migration_leftovers(spark, parts)      # unsafe
    os.makedirs(parts)
    assert not _parts_migration_leftovers(spark, parts)  # parts present


def test_ngram_novelty_planted_extremes(spark):
    """A doc duplicated verbatim scores 0 (every 3-gram shared); a doc
    of unique words scores 1; partial overlap lands in between; docs
    too short for a 3-gram score 0 and keep their row."""
    from lens_spark import engine
    from lens_spark.operators.dedup import ngram_novelty

    dup = "alpha beta gamma delta epsilon zeta"
    uniq = "one lonely sentence nobody else wrote here"
    mixed = "alpha beta gamma delta fresh ending words"
    df = spark.createDataFrame(
        [(1, dup), (2, dup), (3, uniq), (4, mixed), (5, "too short")],
        "doc_id long, text string")
    got = {r.doc_id: r.novelty
           for r in ngram_novelty(df, "doc_id", "text").collect()}
    assert got[1] == 0.0 and got[2] == 0.0
    assert got[3] == 1.0
    assert 0.0 < got[4] < 1.0
    assert got[5] == 0.0
    # lens registration + inverse
    spec = {"lenses": [{"name": "ngram_novelty", "arguments": {
        "id": "doc_id", "column": "text"}}]}
    fwd = engine.append(df, spec)
    assert "novelty" in fwd.columns
    assert "novelty" not in engine.append(fwd, engine.invert(spec)).columns


def test_compact_index_respects_writer_lease(spark, tmp_path):
    """compact_index serializes with ingest: a held writer lock makes
    it refuse instead of rewriting an index mid-ingest."""
    import os

    from lens_spark.errors import ConcurrentIndexWriterError
    from lens_spark.operators.dedup import compact_index, dedup_incremental

    idx = str(tmp_path / "fp_locked")
    b = spark.createDataFrame([(1, "a")], "k long, v string")
    dedup_incremental(b, idx, columns=["k", "v"])
    open(os.path.join(idx, "_writer.lock"), "w").write("held")
    try:
        import pytest as _pytest

        with _pytest.raises(ConcurrentIndexWriterError):
            compact_index(spark, idx)
    finally:
        os.remove(os.path.join(idx, "_writer.lock"))
    # lease released → compaction proceeds
    stats = compact_index(spark, idx)
    assert stats["files_after"] >= 1


# --- edit_distance_pairs ------------------------------------------------

def test_edit_distance_pairs_finds_small_edits(spark):
    """Docs differing by a few character edits pair up with the exact
    distance; unrelated docs don't pair at all."""
    from lens_spark.operators.dedup import edit_distance_pairs
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, base),
         (2, base.replace("quick", "quvck")),      # 1 substitution
         (3, "completely different text about spark catalyst planning")],
        "id long, text string")
    rows = edit_distance_pairs(df, "id", "text", max_dist=5,
                               num_hashes=8, ngram=3, band_size=2)
    got = {(r.id_a, r.id_b): r.edit_distance for r in rows.collect()}
    assert got == {(1, 2): 1}


def test_edit_distance_pairs_threshold_cuts(spark):
    from lens_spark.operators.dedup import edit_distance_pairs
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = spark.createDataFrame(
        [(1, base), (2, base + " EXTRA WORDS APPENDED HERE NOW")],
        "id long, text string")
    loose = edit_distance_pairs(df, "id", "text", max_dist=40,
                                num_hashes=8, ngram=3, band_size=2)
    tight = edit_distance_pairs(df, "id", "text", max_dist=3,
                                num_hashes=8, ngram=3, band_size=2)
    assert loose.count() == 1 and tight.count() == 0


def test_edit_distance_pairs_prefix_resolution(spark):
    """Edits beyond the prefix are invisible: distance is computed on
    the first `prefix` chars by contract."""
    from lens_spark.operators.dedup import edit_distance_pairs
    a = "shared head tokens for banding " * 4
    df = spark.createDataFrame(
        [(1, a + "tail one"), (2, a + "tail TWO")], "id long, text string")
    rows = edit_distance_pairs(df, "id", "text", max_dist=10,
                               prefix=len(a),
                               num_hashes=8, ngram=3, band_size=2)
    got = rows.collect()
    assert len(got) == 1 and got[0].edit_distance == 0


def test_edit_distance_pairs_lens_registration(spark):
    from lens_spark import engine
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, base), (2, base.replace("dog", "dig"))],
        "id long, text string")
    out = engine.append(df, {"lenses": [{
        "name": "edit_distance_pairs", "arguments": {
            "id": "id", "column": "text", "max_dist": 5,
            "num_hashes": 8, "ngram": 3, "band_size": 2}}]})
    assert out.count() == 1


# --- vocab_encode -------------------------------------------------------

def test_vocab_encode_rank_and_oov(spark):
    """ids rank by count desc then token asc; OOV (below vocab_size)
    maps to oov_id; encoding preserves token order."""
    from lens_spark.operators.text import vocab_encode
    df = spark.createDataFrame(
        [(1, "b b b a a rare"), (2, "a b unknown")],
        "doc_id long, text string")
    out = {r.doc_id: r.token_ids
           for r in vocab_encode(df, "doc_id", "text",
                                 vocab_size=2).collect()}
    # counts: b=4, a=3, rare=1, unknown=1 → vocab: b→1, a→2
    assert out[1] == [1, 1, 1, 2, 2, 0]
    assert out[2] == [2, 1, 0]


def test_vocab_encode_tie_break_token_asc(spark):
    from lens_spark.operators.text import vocab_encode
    df = spark.createDataFrame([(1, "zz aa zz aa")], "doc_id long, text string")
    out = vocab_encode(df, "doc_id", "text", vocab_size=2).collect()[0]
    assert out.token_ids == [2, 1, 2, 1]      # equal counts: aa first


def test_vocab_encode_empty_doc_empty_array(spark):
    from lens_spark.operators.text import vocab_encode
    df = spark.createDataFrame([(1, "a"), (2, "")], "doc_id long, text string")
    out = {r.doc_id: r.token_ids
           for r in vocab_encode(df, "doc_id", "text").collect()}
    assert out[2] == []


def test_vocab_encode_lens_inverse(spark):
    from lens_spark import engine
    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    spec = {"lenses": [{"name": "vocab_encode", "arguments": {
        "id": "doc_id", "column": "text", "vocab_size": 10}}]}
    out = engine.append(df, spec)
    assert out.collect()[0].token_ids == [1, 2]
    back = engine.append(out, engine.invert(spec))
    assert back.columns == ["doc_id", "text"]


def test_connected_components_lens_over_edge_frame(spark):
    """The lens contract: the input frame IS the edge list."""
    from lens_spark import engine
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    out = engine.append(df, {"lenses": [{
        "name": "connected_components", "arguments": {}}]})
    got = {r.id: r.component for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_lens_custom_columns(spark):
    from lens_spark import engine
    df = spark.createDataFrame([(5, 6)], "u long, v long")
    out = engine.append(df, {"lenses": [{
        "name": "connected_components",
        "arguments": {"id_a": "u", "id_b": "v"}}]})
    assert {r.component for r in out.collect()} == {5}


# --- sentence_split -----------------------------------------------------

def test_sentence_split_boundaries(spark):
    from lens_spark.operators.text import sentence_split
    df = spark.createDataFrame(
        [(1, "Hi there. How are you?! Fine... ok"), (2, ""), (3, "No end")],
        "doc_id long, text string")
    out = sentence_split(df, "doc_id", "text").collect()
    got = {}
    for r in out:
        got.setdefault(r.doc_id, []).append((r.sent_idx, r.sentence))
    assert [s for _, s in sorted(got[1])] == [
        "Hi there.", "How are you?!", "Fine...", "ok"]
    assert 2 not in got                       # empty doc → no rows
    assert [s for _, s in sorted(got[3])] == ["No end"]


def test_sentence_split_lens(spark):
    from lens_spark import engine
    df = spark.createDataFrame([(1, "A. B.")], "doc_id long, text string")
    out = engine.append(df, {"lenses": [{"name": "sentence_split",
        "arguments": {"id": "doc_id", "column": "text"}}]})
    assert [r.sentence for r in out.orderBy("sent_idx").collect()] == ["A.", "B."]


def test_sentence_dedup_removes_cross_doc_boilerplate(spark):
    from lens_spark.operators.dedup import sentence_dedup
    df = spark.createDataFrame(
        [(1, "Unique insight one. All rights reserved."),
         (2, "Another thought! All rights reserved."),
         (3, "All rights reserved.")],
        "doc_id long, text string")
    got = {r.doc_id: r.text
           for r in sentence_dedup(df, "doc_id", "text").collect()}
    assert got[1] == "Unique insight one."
    assert got[2] == "Another thought!"
    assert got[3] == ""                      # fully boilerplate → kept row


def test_sentence_dedup_within_doc_repeat_not_boilerplate(spark):
    """min_df counts DISTINCT documents — a sentence repeated inside
    one doc survives."""
    from lens_spark.operators.dedup import sentence_dedup
    df = spark.createDataFrame(
        [(1, "Echo. Echo."), (2, "Other text here.")],
        "doc_id long, text string")
    got = {r.doc_id: r.text
           for r in sentence_dedup(df, "doc_id", "text").collect()}
    assert got[1] == "Echo. Echo."


def test_sentence_dedup_lens_out_column(spark):
    from lens_spark import engine
    df = spark.createDataFrame(
        [(1, "Keep me. Shared."), (2, "Shared.")], "doc_id long, text string")
    spec = {"lenses": [{"name": "sentence_dedup", "arguments": {
        "id": "doc_id", "column": "text", "out": "clean"}}]}
    out = {r.doc_id: (r.text, r.clean)
           for r in engine.append(df, spec).collect()}
    assert out[1] == ("Keep me. Shared.", "Keep me.")


# --- fim_transform ------------------------------------------------------

def test_fim_transform_psm_reassembles_to_original(spark):
    """PRE p SUF s MID m with p+m+s a permutation partition: stripping
    sentinels and reordering recovers the original text."""
    from lens_spark.operators.text import fim_transform
    df = spark.createDataFrame(
        [(i, f"document number {i} with some content") for i in range(40)],
        "doc_id long, text string")
    out = fim_transform(df, "doc_id", "text", rate=1.0, out="fim")
    for r in out.collect():
        body = r.fim
        assert body.startswith("<PRE>")
        p, rest = body[5:].split("<SUF>", 1)
        s, m = rest.split("<MID>", 1)
        assert p + m + s == r.text


def test_fim_transform_rate_zero_is_identity(spark):
    from lens_spark.operators.text import fim_transform
    df = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    assert fim_transform(df, "doc_id", "text", rate=0.0) \
        .collect()[0].text == "abc"


def test_fim_transform_deterministic_and_salted(spark):
    from lens_spark.operators.text import fim_transform
    df = spark.createDataFrame(
        [(i, "x" * 50) for i in range(200)], "doc_id long, text string")
    a = {r.doc_id: r.text for r in
         fim_transform(df, "doc_id", "text", rate=0.5).collect()}
    b = {r.doc_id: r.text for r in
         fim_transform(df.repartition(7), "doc_id", "text",
                       rate=0.5).collect()}
    assert a == b                              # repartition-stable
    c = {r.doc_id: r.text for r in
         fim_transform(df, "doc_id", "text", rate=0.5,
                       salt="epoch2").collect()}
    assert a != c                              # salt draws independently
    frac = sum(1 for v in a.values() if v.startswith("<PRE>")) / 200
    assert 0.3 < frac < 0.7


def test_fim_transform_empty_doc(spark):
    from lens_spark.operators.text import fim_transform
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    got = fim_transform(df, "doc_id", "text", rate=1.0).collect()[0].text
    assert got == "<PRE><SUF><MID>"


# --- mask_tokens --------------------------------------------------------

def test_mask_tokens_labels_match_masked_positions(spark):
    from lens_spark.operators.text import mask_tokens
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(30)],
        "doc_id long, text string")
    out = mask_tokens(df, "doc_id", "text", rate=0.4).collect()
    any_masked = False
    for r in out:
        toks = r.text.split()
        masked = r.masked.split()
        assert len(masked) == len(toks)
        originals = [t for t, m in zip(toks, masked) if m == "<MASK>"]
        assert originals == list(r.mask_labels)   # in-order originals
        assert [m for m in masked if m != "<MASK>"] == \
            [t for t, m in zip(toks, masked) if m != "<MASK>"]
        any_masked = any_masked or bool(originals)
    assert any_masked


def test_mask_tokens_deterministic_and_salt(spark):
    from lens_spark.operators.text import mask_tokens
    df = spark.createDataFrame(
        [(i, "w1 w2 w3 w4 w5 w6 w7 w8") for i in range(50)],
        "doc_id long, text string")
    a = {r.doc_id: r.masked for r in
         mask_tokens(df, "doc_id", "text").collect()}
    b = {r.doc_id: r.masked for r in
         mask_tokens(df.repartition(9), "doc_id", "text").collect()}
    assert a == b
    c = {r.doc_id: r.masked for r in
         mask_tokens(df, "doc_id", "text", salt="e2").collect()}
    assert a != c


def test_mask_tokens_lens_inverse(spark):
    from lens_spark import engine
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    spec = {"lenses": [{"name": "mask_tokens", "arguments": {
        "id": "doc_id", "column": "text", "rate": 1.0}}]}
    out = engine.append(df, spec)
    r = out.collect()[0]
    assert r.masked == "<MASK> <MASK> <MASK>" and list(r.mask_labels) == ["a", "b", "c"]
    back = engine.append(out, engine.invert(spec))
    assert sorted(back.columns) == ["doc_id", "text"]


def test_span_corrupt_roundtrip_reconstructs_original(spark):
    """The defining T5 property: substituting each <extra_id_k>'s
    target span back into the corrupted input reproduces the original
    token stream exactly — checks span placement, sentinel numbering,
    and target assembly in one shot."""
    import re

    from lens_spark.operators.text import span_corrupt

    rows = [(i, " ".join(f"tok{i}_{j}" for j in range(7 * i)))
            for i in range(1, 12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = span_corrupt(df, "doc_id", "text", block=10, span_len=3)
    for r in out.collect():
        # parse targets: "<extra_id_0> a b c <extra_id_1> d e f <extra_id_2>"
        parts = re.split(r"<extra_id_(\d+)>", r.span_targets)
        spans = {}
        for k, chunk in zip(parts[1::2], parts[2::2]):
            spans[int(k)] = chunk.strip()
        rebuilt = re.sub(
            r"<extra_id_(\d+)>", lambda m: spans[int(m.group(1))],
            r.corrupted)
        original = " ".join(r.text.split())
        assert " ".join(rebuilt.split()) == original, r.doc_id
        assert r.n_spans == len(r.text.split()) // 10


def test_span_corrupt_density_and_validation(spark):
    from lens_spark.errors import LensError
    from lens_spark.operators.text import span_corrupt

    df = spark.createDataFrame(
        [(1, " ".join(str(j) for j in range(100)))],
        "doc_id long, text string")
    r = span_corrupt(df, "doc_id", "text", block=20, span_len=3).collect()[0]
    # exact density: 5 full blocks × 3 hidden tokens, one sentinel each
    assert r.n_spans == 5
    assert len(r.corrupted.split()) == 100 - 5 * 3 + 5
    import pytest as _pytest
    with _pytest.raises(LensError, match="block > span_len"):
        span_corrupt(df, "doc_id", "text", block=3, span_len=3)


def test_span_corrupt_salt_draws_new_epoch(spark):
    from lens_spark.operators.text import span_corrupt

    df = spark.createDataFrame(
        [(1, " ".join(str(j) for j in range(200)))],
        "doc_id long, text string")
    a = span_corrupt(df, "doc_id", "text").collect()[0].corrupted
    b = span_corrupt(df, "doc_id", "text", salt="e2").collect()[0].corrupted
    c = span_corrupt(df, "doc_id", "text").collect()[0].corrupted
    assert a == c and a != b


def test_chat_render_spans_extract_exact_content(spark):
    """The defining property: slicing the rendered string at each
    loss span reproduces the assistant message's content exactly, and
    n_loss_tokens equals the whitespace-token total of those slices —
    checks the fold's cursor arithmetic end to end, including
    multi-assistant conversations and empty contents."""
    from lens_spark.operators.chat import chat_render

    rows = [
        (1, [("system", "Be terse."), ("user", "hi there"),
             ("assistant", "hello friend")]),
        (2, [("user", "q1"), ("assistant", "a one"), ("user", "q2"),
             ("assistant", "answer two here")]),
        (3, [("assistant", "")]),                       # empty content
        (4, [("user", "no assistant at all")]),          # no loss span
        (5, [("assistant", "unicode naïve café 中文 test")]),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, messages array<struct<role:string,content:string>>")
    out = {r.doc_id: r for r in chat_render(df, "messages").collect()}
    for doc_id, msgs in rows:
        r = out[doc_id]
        asst = [c for role, c in msgs if role == "assistant"]
        assert len(r.loss_spans) == len(asst)
        for span, content in zip(r.loss_spans, asst):
            assert r.rendered[span.s:span.e] == content, doc_id
        assert r.n_loss_tokens == sum(len(c.split()) for c in asst)
        assert r.n_turns == len(msgs)
        # template structure: one open/close pair per message
        assert r.rendered.count("<|im_start|>") == len(msgs)
        assert r.rendered.count("<|im_end|>\n") == len(msgs)


def test_chat_render_lens_inverse_drops_outputs(spark):
    from lens_spark import engine

    df = spark.createDataFrame(
        [(1, [("user", "x"), ("assistant", "y")])],
        "doc_id long, messages array<struct<role:string,content:string>>")
    spec = {"lenses": [{"name": "chat_render",
                        "arguments": {"column": "messages"}}]}
    fwd = engine.append(df, spec)
    assert {"rendered", "n_turns", "loss_spans",
            "n_loss_tokens"} <= set(fwd.columns)
    back = engine.inverse(fwd, spec)
    assert set(back.columns) == {"doc_id", "messages"}


def test_epoch_plan_regimes_match_integer_reference(spark):
    """Pin all four planner regimes against a pure-python integer
    reference: upweighted, zero-weight (excluded), default-weight, and
    the max-epoch cap biting (served < target)."""
    from lens_spark.operators.sampling import epoch_plan

    rows = []
    sizes = {"big": 50, "mid": 20, "tiny": 2, "zero": 10}
    for src, n in sizes.items():
        for i in range(n):
            rows.append((f"{src}-{i}", src, "tok " * 10))  # 10 tokens/doc
    df = spark.createDataFrame(rows, "id string, source string, text string")
    weights = {"big": 3, "tiny": 50, "zero": 0}
    budget, cap = 4000, 4000
    out = {r.source: r for r in epoch_plan(
        df, "source", total_budget_tokens=budget, weights=weights,
        default_weight=1, max_epochs_milli=cap, text_col="text").collect()}
    wsum = 3 + 50 + 0 + 1  # big + tiny + zero + mid(default)
    for src, n in sizes.items():
        avail = n * 10
        w = weights.get(src, 1)
        target = budget * w // wsum
        em = min(target * 1000 // avail, cap) if avail else 0
        r = out[src]
        assert r.available_tokens == avail, src
        assert r.target_tokens == target, src
        assert r.epochs_milli == em, src
        assert r.served_tokens == avail * em // 1000, src
    # the cap actually bit for 'tiny' (2 docs, weight 50)
    assert out["tiny"].served_tokens < out["tiny"].target_tokens
    assert out["tiny"].epochs_milli == cap
    assert out["zero"].target_tokens == 0 and out["zero"].epochs_milli == 0


def test_ks_drift_matches_brute_force_ecdf(spark):
    """KS numerator vs a brute-force python ECDF over every observed
    value, plus the identical-frames → D = 0 identity."""
    from lens_spark.operators.evaluation import ks_drift

    import random as _random
    rng = _random.Random(7)
    a = [(i, "g1", rng.randrange(0, 30)) for i in range(80)]
    b = [(i, "g1", rng.randrange(5, 40)) for i in range(60)]
    dfa = spark.createDataFrame(a, "id long, g string, v long")
    dfb = spark.createDataFrame(b, "id long, g string, v long")
    r = ks_drift(dfa, dfb, "v", by="g").collect()[0]
    va, vb = [x[2] for x in a], [x[2] for x in b]
    na, nb = len(va), len(vb)
    d_num = max(abs(sum(1 for x in va if x <= t) * nb
                    - sum(1 for x in vb if x <= t) * na)
                for t in set(va) | set(vb))
    assert (r.n_a, r.n_b, r.d_num) == (na, nb, d_num)
    assert r.d_microunits == d_num * 1000000 // (na * nb)
    same = ks_drift(dfa, dfa, "v", by="g").collect()[0]
    assert same.d_num == 0 and same.d_microunits == 0


def test_ks_drift_ungrouped_single_row(spark):
    from lens_spark.operators.evaluation import ks_drift

    dfa = spark.createDataFrame([(1, 1), (2, 2)], "id long, v long")
    dfb = spark.createDataFrame([(1, 3), (2, 4)], "id long, v long")
    rows = ks_drift(dfa, dfb, "v").collect()
    assert len(rows) == 1
    # disjoint supports → D = 1 → numerator = n_a * n_b
    assert rows[0].d_num == 4 and rows[0].d_microunits == 1000000


def test_structure_stats_matches_python_reference(spark):
    """Exact line/token-shape metrics vs a plain-python reference —
    bullets (dash/star/numbered), ellipsis endings (ASCII + unicode),
    alpha-word fraction, stopword hits, empty/null docs."""
    import re

    from lens_spark.operators.text import GOPHER_STOPWORDS, structure_stats

    rows = [
        (1, "- item one\n* item two\n3. third\nplain line"),
        (2, "teaser one...\nteaser two…\nfull sentence here."),
        (3, "the cat sat with the dog and that bird have be to of"),
        (4, "1234 5678 !!! ??? mix3d w0rds"),
        (5, ""),
        (6, None),
        (7, "   \n  \n\t\n"),                      # only blank lines
        (8, "10) numbered paren bullet\nnot - a bullet mid line"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in structure_stats(df, "text").collect()}
    for doc_id, text in rows:
        t = text or ""
        lines = [ln.strip(" ") for ln in t.split("\n")]
        lines = [ln for ln in lines if ln != ""]
        toks = [w for w in re.split(r"\s+", t) if w != ""]
        nb = sum(1 for ln in lines
                 if re.search(r"^([-*•]|[0-9]+[.)])[ \t]", ln))
        ne = sum(1 for ln in lines if re.search(r"(\.\.\.|…)$", ln))
        na = sum(1 for w in toks if re.search("[A-Za-z]", w))
        ns = sum(1 for w in toks if w.lower() in GOPHER_STOPWORDS)
        r = got[doc_id]
        assert r.n_lines == len(lines), doc_id
        if lines:
            assert r.bullet_frac_micro == nb * 1000000 // len(lines), doc_id
            assert r.ellipsis_frac_micro == ne * 1000000 // len(lines)
        else:
            assert r.bullet_frac_micro is None
            assert r.ellipsis_frac_micro is None
        if toks:
            assert r.alpha_word_frac_micro == na * 1000000 // len(toks)
        else:
            assert r.alpha_word_frac_micro is None
        assert r.n_stopword_hits == ns, doc_id


def test_preference_pairs_best_vs_worst_and_filters(spark):
    from lens_spark.operators.chat import preference_pairs

    rows = [
        # normal group: clear best/worst
        ("p1", 1, 10.0), ("p1", 2, 50.0), ("p1", 3, 30.0),
        # tie on max score: chosen takes the LARGEST id; tie on min:
        # rejected the smallest
        ("p2", 10, 9.0), ("p2", 11, 9.0), ("p2", 12, 1.0), ("p2", 13, 1.0),
        # singleton: dropped (min_candidates)
        ("p3", 20, 99.0),
        # margin below threshold: dropped
        ("p4", 30, 5.0), ("p4", 31, 5.5),
        # all-equal scores: margin 0, dropped at min_margin > 0
        ("p5", 40, 7.0), ("p5", 41, 7.0),
    ]
    df = spark.createDataFrame(rows, "prompt string, rid long, score double")
    out = {r.prompt: r for r in preference_pairs(
        df, "prompt", "rid", "score", min_margin=1.0).collect()}
    assert set(out) == {"p1", "p2"}
    assert (out["p1"].chosen_id, out["p1"].rejected_id) == (2, 1)
    assert out["p1"].margin == 40.0 and out["p1"].n_candidates == 3
    assert (out["p2"].chosen_id, out["p2"].rejected_id) == (11, 12)
    # min_margin=0 keeps p5 (distinct ids, zero margin), still drops p3
    out0 = {r.prompt for r in preference_pairs(
        df, "prompt", "rid", "score", min_margin=0.0).collect()}
    assert out0 == {"p1", "p2", "p4", "p5"}


def test_interleave_matches_python_schedule(spark):
    """Full schedule vs a plain-python md5 reference: sharding, rank
    order, block/slot arithmetic, weight-0 drop, pos uniqueness and
    the every-full-block-serves-each-stratum-its-weight property."""
    import hashlib
    from collections import Counter, defaultdict

    from lens_spark.operators.sampling import interleave

    rows = [(i, f"s{i % 4}") for i in range(120)]
    df = spark.createDataFrame(rows, "id long, src string")
    weights = {"s0": 3, "s1": 2, "s2": 0}
    out = interleave(df, "src", ["id"], weights, default_weight=1,
                     num_shards=4).collect()

    # python reference
    wmap = {"s0": 3, "s1": 2, "s3": 1}
    active = sorted(wmap)
    offsets, acc = {}, 0
    for s in active:
        offsets[s] = acc
        acc += wmap[s]
    wtotal = acc
    ref = defaultdict(list)
    for i, src in rows:
        if src == "s2":
            continue
        hp = hashlib.md5(str(i).encode()).hexdigest()[:8]
        ref[(int(hp, 16) % 4, src)].append((hp, i))
    expected = {}
    for (shard, src), items in ref.items():
        for r0, (_, i) in enumerate(sorted(items)):
            block, within = divmod(r0, wmap[src])
            slot = offsets[src] + within
            expected[i] = (shard, block, slot, block * wtotal + slot)
    assert len(out) == len(expected)
    for r in out:
        assert (r.shard, r.block, r.slot, r.pos) == expected[r.id], r.id
    # pos unique per shard; full blocks serve each stratum its weight
    per_shard = defaultdict(list)
    for r in out:
        per_shard[r.shard].append(r)
    for shard, rs in per_shard.items():
        assert len({r.pos for r in rs}) == len(rs)
        n_blocks = Counter(r.block for r in rs)
        full = [b for b, c in n_blocks.items() if c == wtotal]
        for b in full:
            served = Counter(r.src for r in rs if r.block == b)
            assert served == Counter(wmap), (shard, b)


def test_interleave_auto_shards_scale_with_input(spark):
    """num_shards=None derives the shard count from the scan split
    count (r7 verdict #4): a wide input must fan out past the 64-shard
    floor so the per-(shard, stratum) window task stays bounded at
    100x data, while a small input keeps the floor. md5 arithmetic is
    unchanged, so the schedule stays exact for the derived count."""
    from collections import Counter

    from lens_spark.operators.sampling import interleave

    rows = [(i, f"s{i % 2}") for i in range(4000)]
    wide = spark.createDataFrame(rows, "id long, src string") \
        .repartition(128)
    out = interleave(wide, "src", ["id"], {"s0": 2, "s1": 1})
    # derived shards = max(64, 2*128) = 256: observed shard ids must
    # exceed the old static 64 ceiling
    assert out.agg({"shard": "max"}).first()[0] >= 64
    # small input keeps the floor (shards < 64 only because mod 64)
    small = spark.createDataFrame(rows[:50], "id long, src string") \
        .coalesce(1)
    out_s = interleave(small, "src", ["id"], {"s0": 2, "s1": 1})
    assert out_s.agg({"shard": "max"}).first()[0] < 64
    # auto mode stays weight-exact: full blocks serve 2:1
    per = {}
    for r in out.collect():
        per.setdefault((r.shard, r.block), []).append(r.src)
    full = [v for v in per.values() if len(v) == 3]
    assert full, "expected at least one full block"
    for v in full:
        assert Counter(v) == Counter({"s0": 2, "s1": 1})


def test_interleave_rejects_bad_weights(spark):
    from lens_spark.errors import LensError
    from lens_spark.operators.sampling import interleave

    df = spark.createDataFrame([(1, "a")], "id long, src string")
    with pytest.raises(LensError):
        interleave(df, "src", ["id"], {"a": -1})
    with pytest.raises(LensError):
        interleave(df, "src", ["id"], {"a": 0}, default_weight=0)


def test_pseudonymize_stable_unlinkable_null_safe(spark):
    import hashlib

    from lens_spark.operators.text import pseudonymize

    df = spark.createDataFrame(
        [("u1", "u1", "a"), ("u2", "u1", "b"), (None, "u3", "c")],
        "user string, owner string, payload string")
    out = pseudonymize(df, ["user", "owner"], salt="s3cr3t").collect()
    by_payload = {r.payload: r for r in out}
    # stable: same value, same column -> same pseudonym
    exp_user_u1 = hashlib.md5(b"s3cr3t|user|u1").hexdigest()[:16]
    assert by_payload["a"].user == exp_user_u1
    # unlinkable across columns: same value, different column -> differs
    assert by_payload["a"].owner != by_payload["a"].user
    assert by_payload["b"].owner == by_payload["a"].owner  # u1 stable in owner
    # NULL stays NULL; untouched column intact
    assert by_payload["c"].user is None and by_payload["c"].payload == "c"


def test_pseudonymize_lens_contract(spark):
    from lens_spark import engine
    from lens_spark.errors import LensError
    from lens_spark.operators.text import pseudonymize

    df = spark.createDataFrame([("u1", 1)], "user string, x long")
    spec = {"lenses": [{"name": "pseudonymize", "arguments": {
        "columns": ["user"], "salt": "k", "prefix": "anon_", "length": 8}}]}
    r = engine.append(df, spec).collect()[0]
    assert r.user.startswith("anon_") and len(r.user) == 13
    with pytest.raises(LensError):            # one-way: inverse refuses
        engine.inverse(engine.append(df, spec), spec).collect()
    with pytest.raises(LensError):            # unsalted hash refused
        pseudonymize(df, ["user"], salt="")
    with pytest.raises(LensError):
        pseudonymize(df, ["nope"], salt="k")


def test_equiwidth_hist_matches_python_reference(spark):
    from lens_spark.operators.relational import equiwidth_hist

    vals = [float(x) for x in (0, 1, 2, 3, 5, 8, 13, 21, 34, 55, 100)]
    df = spark.createDataFrame([(v,) for v in vals] + [(None,)],
                               "v double")
    out = {r.bin: r for r in equiwidth_hist(df, "v", bins=5).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    lo, hi = 0.0, 100.0
    import collections
    ref = collections.Counter(
        min(4, int((v - lo) * 5 / (hi - lo))) for v in vals)
    for b in range(5):
        assert out[b].n == ref.get(b, 0), b
        assert out[b].lo_edge == lo + b * (hi - lo) / 5
        assert out[b].hi_edge == lo + (b + 1) * (hi - lo) / 5
    # hi value lands in the LAST bin (clamp), all 12-1 nulls excluded
    assert sum(r.n for r in out.values()) == len(vals)


def test_equiwidth_hist_explicit_range_clamps(spark):
    from lens_spark.errors import LensError
    from lens_spark.operators.relational import equiwidth_hist

    df = spark.createDataFrame(
        [(-5.0,), (0.5,), (1.5,), (99.0,)], "v double")
    out = {r.bin: r.n for r in
           equiwidth_hist(df, "v", bins=2, lo=0.0, hi=2.0).collect()}
    assert out == {0: 2, 1: 2}          # -5 clamps to bin 0, 99 to bin 1
    with pytest.raises(LensError):
        equiwidth_hist(df, "v", bins=2, lo=2.0, hi=2.0)
    # degenerate data range (all equal, auto bounds): everything bin 0
    same = spark.createDataFrame([(7.0,), (7.0,)], "v double")
    rows = {r.bin: r.n for r in equiwidth_hist(same, "v", bins=3).collect()}
    assert rows == {0: 2, 1: 0, 2: 0}


def test_overlap_matrix_containment_semantics(spark):
    """Diagonal = 1.0; asymmetric containment (a ⊂ b gives a→b = 1,
    b→a < 1); disjoint sources share only what they share — all vs a
    plain-python distinct-3-gram reference."""
    from lens_spark.operators.dedup import overlap_matrix

    rows = [
        (1, "a", "alpha beta gamma delta epsilon"),
        (2, "b", "alpha beta gamma delta epsilon zeta eta theta"),
        (3, "c", "one two three four five six"),
        (4, "c", "one two three seven eight nine"),
    ]
    df = spark.createDataFrame(rows, "id long, src string, text string")
    out = {(r.src_a, r.src_b): r for r in
           overlap_matrix(df, "src", "text", ngram=3).collect()}

    def grams(texts):
        s = set()
        for t in texts:
            w = t.split()
            s |= {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        return s

    by_src = {}
    for _, src, text in [(r[0], r[1], r[2]) for r in rows]:
        by_src.setdefault(src, []).append(text)
    gs = {s: grams(ts) for s, ts in by_src.items()}
    for a in gs:
        for b in gs:
            shared = len(gs[a] & gs[b])
            if shared == 0:
                assert (a, b) not in out
                continue
            r = out[(a, b)]
            assert r.ngrams_a == len(gs[a])
            assert r.shared == shared
            assert r.containment_micro == shared * 1000000 // len(gs[a])
    assert out[("a", "a")].containment_micro == 1000000
    assert out[("a", "b")].containment_micro == 1000000  # a ⊂ b
    assert out[("b", "a")].containment_micro < 1000000


def test_realize_epochs_matches_integer_reference(spark):
    """Copies per row = em div 1000 + md5-exact fractional draw; the
    realized multiset matches a plain-python reference with the same
    integer plan arithmetic, and served tokens ≈ plan target."""
    import hashlib

    from lens_spark.operators.sampling import realize_epochs

    rows = []
    sizes = {"big": 50, "mid": 20, "tiny": 2}
    for src, n in sizes.items():
        for i in range(n):
            rows.append((f"{src}-{i}", src, "tok " * 10))
    df = spark.createDataFrame(rows, "id string, source string, text string")
    weights = {"big": 3, "tiny": 50}
    out = realize_epochs(
        df, "source", ["id"], total_budget_tokens=4000, weights=weights,
        default_weight=1, max_epochs_milli=4000, text_col="text").collect()

    # python reference: same plan, same md5 rule
    wsum = 3 + 50 + 1
    em = {}
    for src, n in sizes.items():
        avail = n * 10
        target = 4000 * weights.get(src, 1) // wsum
        em[src] = min(target * 1000 // avail, 4000)
    expected = {}
    for rid, src, _ in rows:
        h = int(hashlib.md5(rid.encode()).hexdigest()[:8], 16)
        n = em[src] // 1000 + (1 if h * 1000 < (em[src] % 1000) << 32 else 0)
        if n > 0:
            expected[rid] = n
    got = {}
    for r in out:
        got[r.id] = max(got.get(r.id, 0), r.epoch_idx)
    assert got == expected
    # every copy index 1..n present exactly once
    from collections import Counter
    c = Counter((r.id, r.epoch_idx) for r in out)
    assert all(v == 1 for v in c.values())


def test_realize_epochs_lens_inverse_keeps_first_copy(spark):
    from lens_spark import engine

    df = spark.createDataFrame(
        [(f"d{i}", "a", "t t t") for i in range(10)],
        "id string, source string, text string")
    spec = {"lenses": [{"name": "realize_epochs", "arguments": {
        "strata": "source", "keys": ["id"], "total_budget_tokens": 90,
        "column": "text"}}]}
    fwd = engine.append(df, spec)
    back = engine.inverse(fwd, spec)
    assert back.count() <= 10 and "epoch_idx" not in back.columns


def test_chat_render_astral_plane_offsets(spark):
    """Span offsets must count CODE POINTS the way python slicing
    does — emoji (astral plane, 2 UTF-16 units) and CJK both count 1.
    Guards against a UTF-16-unit length regression breaking every
    downstream loss mask."""
    from lens_spark.operators.chat import chat_render

    msgs = [("user", "look 👀 here"), ("assistant", "emoji 🎉🎉 reply"),
            ("assistant", "中文 and 𝕌𝕟𝕚 text")]
    df = spark.createDataFrame(
        [(1, msgs)],
        "doc_id long, messages array<struct<role:string,content:string>>")
    r = chat_render(df, "messages").collect()[0]
    asst = [c for role, c in msgs if role == "assistant"]
    assert [r.rendered[s.s:s.e] for s in r.loss_spans] == asst


def test_ks_drift_empty_side_yields_null_stat(spark):
    from lens_spark.operators.evaluation import ks_drift

    dfa = spark.createDataFrame([(1, "g", 5)], "id long, g string, v long")
    dfb = spark.createDataFrame([], "id long, g string, v long")
    r = ks_drift(dfa, dfb, "v", by="g").collect()[0]
    assert r.n_a == 1 and r.n_b == 0 and r.d_microunits is None


def test_interleave_single_stratum_is_identity_schedule(spark):
    from lens_spark.operators.sampling import interleave

    df = spark.createDataFrame([(i, "only") for i in range(20)],
                               "id long, src string")
    out = interleave(df, "src", ["id"], {}, default_weight=2,
                     num_shards=2).collect()
    # W == w == 2, offset 0: pos == rank-1 within each shard
    for r in out:
        assert r.pos == r.block * 2 + r.slot and r.slot in (0, 1)
    per_shard = {}
    for r in out:
        per_shard.setdefault(r.shard, []).append(r.pos)
    for poss in per_shard.values():
        assert sorted(poss) == list(range(len(poss)))


def _bpe_reference_fit(word_counts, num_merges, min_count=2):
    """Pure-python BPE trainer twin: word-freq symbols, argmax by
    (count desc, left asc, right asc), greedy left-to-right merge."""
    from lens_spark.operators.bpe import EOW

    syms = {w: list(w) + [EOW] for w in word_counts}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for w, s in syms.items():
            c = word_counts[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        (l, r), _ = best
        merges.append((l, r))
        for w, s in syms.items():
            out = []
            for x in s:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            syms[w] = out
    return merges


def test_bpe_fit_matches_python_reference(spark):
    from collections import Counter

    from lens_spark.operators.bpe import bpe_fit

    texts = ["low lower lowest", "low low newer newest", "wider new low",
             "newer newest wider low lower"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    wc = Counter(w for t in texts for w in t.lower().split())
    # the min_word_count vocabulary cut (default: min_count=2) applies
    # before training on every path — mirror it in the reference
    wc = {w: c for w, c in wc.items() if c >= 2}
    ref = _bpe_reference_fit(wc, 20)
    got = bpe_fit(df, "text", num_merges=20)
    assert got == ref and len(got) > 5
    # determinism across runs/partitionings
    assert bpe_fit(df.repartition(7), "text", num_merges=20) == ref
    # min_word_count=1 disables the cut (pre-r8 semantics)
    full = Counter(w for t in texts for w in t.lower().split())
    assert bpe_fit(df, "text", num_merges=20, min_word_count=1) \
        == _bpe_reference_fit(full, 20)


def test_bpe_tokenize_roundtrips_and_counts(spark):
    from lens_spark.operators.bpe import EOW, bpe_tokenize

    texts = ["low lower lowest", "low low newer newest", "wider new low",
             "newer newest wider low lower"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = {r.doc_id: r for r in bpe_tokenize(df, "text",
                                             num_merges=20).collect()}
    for i, t in enumerate(texts):
        toks = out[i].bpe_tokens
        # concatenating tokens reproduces the words exactly
        assert "".join(toks) == "".join(w + EOW for w in t.lower().split())
        assert out[i].n_bpe_tokens == len(toks)
        # a frequent word must have become a single token
    whole_low = [x for r in out.values() for x in r.bpe_tokens
                 if x == "low" + EOW]
    assert whole_low, "frequent word 'low' never merged to one token"


def test_bpe_tokenize_lens_inverse(spark):
    from lens_spark import engine

    df = spark.createDataFrame([(1, "aa ab aa")], "doc_id long, text string")
    spec = {"lenses": [{"name": "bpe_tokenize", "arguments": {
        "column": "text", "num_merges": 5, "min_count": 1}}]}
    fwd = engine.append(df, spec)
    assert {"bpe_tokens", "n_bpe_tokens"} <= set(fwd.columns)
    back = engine.inverse(fwd, spec)
    assert set(back.columns) == {"doc_id", "text"}


def test_bpe_distributed_path_equals_driver_path(spark):
    """Force the distributed merge loop (driver_fit_limit=0) and
    assert it learns the IDENTICAL merge table as the driver-side
    path — the two engines may never drift."""
    from lens_spark.operators.bpe import bpe_fit

    texts = ["low lower lowest", "low low newer newest", "wider new low"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    # min_word_count=1: keep the singleton words so the corpus stays
    # rich enough to exercise >3 merges and interacting pairs
    local = bpe_fit(df, "text", num_merges=12, min_word_count=1)
    dist = bpe_fit(df, "text", num_merges=12, min_word_count=1,
                   driver_fit_limit=0)
    assert dist == local and len(local) > 3
    # batch_cap=1 degrades batching to plain sequential — same table
    assert bpe_fit(df, "text", num_merges=12, min_word_count=1,
                   driver_fit_limit=0, batch_cap=1) == local


def test_bpe_distributed_batches_merges(spark):
    """r7 verdict #2: the distributed loop applies multiple provably
    non-interacting merges per pair-count job. On a corpus of disjoint
    frequent bigrams the whole merge budget lands in O(1) iterations
    (job count scales with iterations), and the merge table is still
    byte-identical to one-recount-per-merge sequential BPE."""
    from lens_spark.operators.bpe import bpe_fit

    # 8 disjoint bigrams, each diffused over 4 per-bigram-distinct
    # suffix chars ("lrs" words): pair (l,r) has count ~340-400 while
    # its largest neighbor TRIPLE (l,r,s) is <=100, so guard C's
    # created-pair bound certifies all 8 merges as one batch. (A plain
    # "ab"x40 corpus would NOT batch: merging (a,b) creates (ab,</w>)
    # at full count — and the guard correctly refuses it.)
    bigram_chars = "abcdefghijklmnop"
    suffixes = "qrstuvwxyz" + "0123456789" + ",.;:!?@#$%^*"
    words = []
    for i in range(8):
        l, r = bigram_chars[2 * i], bigram_chars[2 * i + 1]
        for j in range(4):
            words.extend([l + r + suffixes[4 * i + j]] * (100 - 10 * i - j))
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    stats: dict = {}
    dist = bpe_fit(df, "text", num_merges=8, min_word_count=1,
                   driver_fit_limit=0, fit_stats=stats)
    assert stats["path"] == "distributed"
    # 8 merges in ONE recount job, not 8 (job count ∝ iterations)
    assert stats["iterations"] <= 2, stats
    local = bpe_fit(df, "text", num_merges=8, min_word_count=1)
    assert dist == local and len(dist) == 8


def test_bpe_batch_stops_when_created_pair_could_outrank(spark):
    """Adversarial guard-C case: 'x a b' repeated means merging (a,b)
    creates pair (x, ab) with a count ABOVE the next ranked pair —
    sequential BPE picks (x, ab) second, so the batch must stop after
    (a,b) and recount. Equality with the sequential reference is the
    proof the guard fired."""
    from collections import Counter

    from lens_spark.operators.bpe import EOW, bpe_fit

    # "xab" x90 -> top pair (a,b) 90, creates (x,ab) 90; "cd" x60 next
    corpus = " ".join(["xab"] * 90 + ["cd"] * 60)
    df = spark.createDataFrame([(corpus,)], "text string")
    wc = Counter(corpus.split())
    ref = _bpe_reference_fit(wc, 6)
    # sequential reference must indeed interleave the created pairs
    # BEFORE the next pre-existing pair (c,d) — the scenario a naive
    # batcher gets wrong
    assert ref[0] == ("a", "b") and ref[1] == ("ab", EOW)
    assert ("c", "d") not in ref[:3]
    dist = bpe_fit(df, "text", num_merges=6, driver_fit_limit=0)
    assert dist == ref


def test_expect_contract_verdicts(spark):
    """Data-quality contract: NULL predicate = violation; unique
    counts extras AND NULL keys; tolerance is the exact integer
    comparison v·10⁶ ≤ cap·n (boundary inclusive); empty input passes
    with NULL fractions; malformed rules error."""
    from lens_spark.errors import LensError
    from lens_spark.operators.evaluation import expect

    rows = [(1, 100), (2, 100), (2, None), (None, 300)]
    df = spark.createDataFrame(rows, "id long, n long")
    out = {r.rule: r for r in expect(df, [
        {"name": "n_set", "predicate": "n IS NOT NULL"},
        {"name": "n_small", "predicate": "n <= 200",
         "max_fail_frac": 0.25},
        {"name": "id_unique", "unique": ["id"]},
    ]).collect()}
    # NULL n row violates n_set; hard cap → failed
    assert (out["n_set"].n_violations, out["n_set"].passed) == (1, False)
    # n=300 violates n_small AND the NULL n row does too (NULL = fail):
    # 2/4 > 25% → failed; frac floor-divided
    assert (out["n_small"].n_violations, out["n_small"].passed) == (2, False)
    assert out["n_small"].fail_frac_micro == 2 * 1000000 // 4
    # id=2 twice (1 extra) + one NULL id = 2 violations, hard → failed
    assert (out["id_unique"].n_violations, out["id_unique"].passed) == \
        (2, False)
    # boundary INCLUSIVE: exactly 25% fails tolerated at 0.25
    df2 = spark.createDataFrame([(1,), (2,), (3,), (300,)], "n long")
    r = expect(df2, [{"name": "b", "predicate": "n <= 200",
                      "max_fail_frac": 0.25}]).collect()[0]
    assert (r.n_violations, r.passed) == (1, True)
    # empty input: every rule passes, fraction is NULL
    r0 = expect(df.filter("false"), [
        {"name": "p", "predicate": "n > 0"},
        {"name": "u", "unique": ["id"]}]).collect()
    assert all(x.passed and x.fail_frac_micro is None for x in r0)
    with pytest.raises(LensError):
        expect(df, [])
    with pytest.raises(LensError):
        expect(df, [{"name": "x", "predicate": "n > 0", "unique": ["id"]}])
    with pytest.raises(LensError):
        expect(df, [{"name": "a", "predicate": "n > 0"},
                    {"name": "a", "predicate": "n > 1"}])


def test_expect_tolerance_cap_is_decimal_floor(spark):
    """r8 verdict #3 / advice: the tolerance cap is the DECIMAL floor
    of max_fail_frac·10⁶, not a binary-float truncation. 0.000249 is
    the flagged witness (float path yields 248); sweep every 6dp
    micro value and every 1..4dp decimal for exactness; e-notation
    and int inputs too."""
    from decimal import ROUND_FLOOR, Decimal

    from lens_spark.operators.evaluation import _micro_floor, expect

    assert _micro_floor(0.000249) == 249  # float-trunc gives 248
    for i in range(0, 10_000):
        s = f"0.{i:06d}"
        assert _micro_floor(float(s)) == i, s
    for nd in (1, 2, 3, 4):
        for i in range(10 ** nd):
            s = f"0.{i:0{nd}d}"
            want = int((Decimal(s) * 10 ** 6)
                       .to_integral_value(rounding=ROUND_FLOOR))
            assert _micro_floor(float(s)) == want, s
    assert _micro_floor(1) == 1_000_000
    assert _micro_floor(2.49e-4) == 249
    # end-to-end: exactly 249 ppm of violations at max_fail_frac
    # 0.000249 is boundary-inclusive PASS (the r8 contract deviation)
    df = spark.range(1_000_000).selectExpr(
        "case when id < 249 then -1 else cast(id as long) end as n")
    r = expect(df, [{"name": "b", "predicate": "n >= 0",
                     "max_fail_frac": 0.000249}]).collect()[0]
    assert (r.n_violations, r.max_fail_micro, r.passed) == (249, 249, True)


def test_filter_funnel_first_fail_attribution(spark):
    """A row failing multiple rules counts against the FIRST; NULL
    predicate = fail; survivor count invariant under rule reorder."""
    from lens_spark.errors import LensError
    from lens_spark.operators.evaluation import filter_funnel

    rows = [(1, 50, "en"), (2, 500, "en"), (3, 50, "zh"),
            (4, 200, "zh"), (5, 200, "en"), (6, None, "en")]
    df = spark.createDataFrame(rows, "id long, n long, lang string")
    rules = [("min_n", "n >= 100"), ("max_n", "n <= 400"),
             ("lang_en", "lang = 'en'")]
    out = {r.rule: r for r in filter_funnel(df, rules).collect()}
    # row1 and row3 and row6(NULL) fail min_n first; row2 fails max_n;
    # row4 fails lang_en; row5 survives
    assert (out["min_n"].n_in, out["min_n"].n_dropped) == (6, 3)
    assert (out["max_n"].n_in, out["max_n"].n_dropped) == (3, 1)
    assert (out["lang_en"].n_in, out["lang_en"].n_dropped) == (2, 1)
    assert (out["survived"].n_in, out["survived"].n_out) == (1, 1)
    assert out["min_n"].drop_frac_micro == 3 * 1000000 // 6
    # reorder: attribution moves, survivors don't
    out2 = {r.rule: r for r in filter_funnel(
        df, list(reversed(rules))).collect()}
    assert out2["survived"].n_out == 1
    assert out2["lang_en"].n_dropped == 2     # zh rows now hit lang first
    with pytest.raises(LensError):
        filter_funnel(df, [])
    with pytest.raises(LensError):
        filter_funnel(df, [("a", "n > 1"), ("a", "n > 2")])


# --- vocab_coverage -------------------------------------------------------

def test_vocab_coverage_counts_and_oov_micro(spark):
    """Exact per-group coverage arithmetic: occurrence and distinct
    counts split by vocab membership; oov_micro is the exact floored
    micro-fraction; a group whose docs have no tokens gets zero counts
    and NULL oov_micro (not a crash, not 0)."""
    from lens_spark.operators.text import vocab_coverage
    df = spark.createDataFrame(
        [(1, "en", "b b a rare"), (2, "en", "a unknown"),
         (3, "de", "b zz"), (4, "xx", "")],
        "doc_id long, lang string, text string")
    # global vocab (size 2): counts b=3, a=2 -> {b, a}
    rows = {r.lang: r for r in
            vocab_coverage(df, "text", by=["lang"], vocab_size=2).collect()}
    en = rows["en"]
    assert (en.n_docs, en.words_total, en.words_known) == (2, 6, 4)
    assert (en.distinct_words, en.distinct_known) == (4, 2)
    assert en.oov_micro == 333333          # floor(1e6 * 2/6)
    de = rows["de"]
    assert (de.n_docs, de.words_total, de.words_known) == (1, 2, 1)
    assert de.oov_micro == 500000
    xx = rows["xx"]
    assert (xx.n_docs, xx.words_total, xx.words_known) == (1, 0, 0)
    assert xx.oov_micro is None


def test_vocab_coverage_global_row_and_fitted_vocab(spark):
    """by=None emits ONE corpus row; a fitted/registry vocabulary is
    scored as-given (not refit on the scored corpus)."""
    from lens_spark.operators.text import vocab_coverage
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a d")], "doc_id long, text string")
    out = vocab_coverage(df, "text", vocab=[("a", 1), ("zzz", 2)]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_docs, r.words_total, r.words_known) == (2, 5, 2)
    assert (r.distinct_words, r.distinct_known) == (4, 1)
    assert r.oov_micro == 600000


def test_vocab_coverage_lens_refuses_inverse_and_guards(spark):
    from lens_spark import engine
    from lens_spark.errors import LensError
    from lens_spark.operators.text import vocab_coverage
    import pytest as _pytest

    df = spark.createDataFrame([(1, "en", "a b")],
                               "doc_id long, lang string, text string")
    spec = {"lenses": [{"name": "vocab_coverage", "arguments": {
        "column": "text", "by": ["lang"], "vocab_size": 4}}]}
    got = engine.append(df, spec).collect()
    assert got[0].words_total == 2
    with _pytest.raises(LensError, match="not invertible"):
        engine.inverse(engine.append(df, spec), spec).collect()
    clash = df.withColumnRenamed("doc_id", "__known")
    with _pytest.raises(LensError, match="reserved"):
        vocab_coverage(clash, "text", by=["lang"])
    with _pytest.raises(LensError, match="non-empty"):
        vocab_coverage(df, "text", vocab=[])


def test_neardup_incremental_sig_fetch_prunes_and_broadcasts(spark,
                                                             tmp_path):
    """r15: the candidate-SIGNATURE fetch is partition-pruned the same
    way the band probe is (pb of a sigs row is a pure function of its
    id, so the est-Jaccard join carries (__cid, __pb) and the sigs
    scan skips non-candidate bucket directories at runtime — it
    previously read every sigs partition of the index per batch), and
    under the default small-batch contract the within-batch self-join
    and both signature joins broadcast their batch-sized side (no
    SortMergeJoin anywhere in the probe plan). Dedup answer
    unchanged."""
    from lens_spark.operators.dedup import neardup_incremental

    idx = str(tmp_path / "nd_sig_prune")
    kw = dict(num_hashes=16, ngram=3, band_size=4, threshold=0.5)
    corpus = spark.createDataFrame(
        [(i, " ".join(f"tok{i}w{j}" for j in range(30)))
         for i in range(40)] + [(99, _ND_A)],
        "id long, text string")
    neardup_incremental(corpus, idx, "id", "text", **kw)
    probe = spark.createDataFrame(
        [(200, _ND_A2), (201, "completely novel words nobody used")],
        "id long, text string")
    out = neardup_incremental(probe, idx, "id", "text",
                              update_index=False, **kw)
    assert {r.id for r in out.collect()} == {201}
    jvm = spark._jvm
    plan = jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(),
                                            "formatted")
    # BOTH index scans (bands probe + sigs fetch) dynamically prune
    assert plan.count("dynamicpruningexpression") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
