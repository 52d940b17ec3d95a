"""Sequence-packing invariants (operators.packing).

No SQL oracle exists for the greedy per-shard fill (inherently
sequential), so these tests ARE the correctness contract:
budget respected, every doc packed exactly once, deterministic and
repartition-stable layout, oversized docs flagged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_spark import engine
from lens_spark.errors import LensError
from lens_spark.operators.packing import pack_sequences

SF = "/root/testdata/sf0.001"
BUDGET = 128


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def packed(docs):
    return pack_sequences(docs, "doc_id", max_tokens=BUDGET,
                          text_col="text").cache()


def test_every_doc_packed_exactly_once(docs, packed):
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()


def test_budget_respected_or_oversized_alone(packed):
    per_seq = (packed.groupBy("seq_id")
               .agg(F.sum("n_tokens").alias("tot"),
                    F.count(F.lit(1)).alias("n"),
                    F.max(F.col("truncate").cast("int")).alias("trunc")))
    # over-budget sequences must be a single truncate-flagged document
    bad = per_seq.filter((F.col("tot") > BUDGET)
                         & ((F.col("n") > 1) | (F.col("trunc") == 0)))
    assert bad.count() == 0


def test_seq_pos_contiguous(packed):
    agg = (packed.groupBy("seq_id")
           .agg(F.min("seq_pos").alias("lo"), F.max("seq_pos").alias("hi"),
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("seq_pos").alias("nd")))
    bad = agg.filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)
                     | (F.col("nd") != F.col("n")))
    assert bad.count() == 0


def test_truncate_flag_iff_doc_exceeds_budget(packed):
    bad = packed.filter(F.col("truncate") != (F.col("n_tokens") > BUDGET))
    assert bad.count() == 0


def test_layout_stable_under_repartition(docs, packed):
    again = pack_sequences(docs.repartition(17), "doc_id",
                           max_tokens=BUDGET, text_col="text")
    a = {(r.doc_id, r.seq_id, r.seq_pos) for r in packed.collect()}
    b = {(r.doc_id, r.seq_id, r.seq_pos) for r in again.collect()}
    assert a == b


def test_precomputed_token_counts(spark):
    df = spark.createDataFrame(
        [(1, 60), (2, 60), (3, 60), (4, 200)], "id long, nt long")
    out = pack_sequences(df, "id", max_tokens=100, token_count_col="nt",
                         num_shards=1).collect()
    by_id = {r.id: r for r in out}
    # greedy in id order within one shard: 1 alone+2 won't fit → [1], [2], ...
    assert by_id[1].seq_id != by_id[2].seq_id  # 60+60 > 100
    assert by_id[4].truncate and by_id[4].seq_pos == 0
    seq4 = [r for r in out if r.seq_id == by_id[4].seq_id]
    assert len(seq4) == 1  # oversized doc gets its own sequence


def test_requires_a_token_source(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(LensError):
        pack_sequences(df, "id", max_tokens=10)


def test_lens_registration(docs):
    spec = {"lenses": [{"name": "pack_sequences", "arguments": {
        "id": "doc_id", "column": "text", "max_tokens": BUDGET}}]}
    out = engine.append(docs, spec)
    assert {"doc_id", "n_tokens", "seq_id", "seq_pos", "truncate"} <= set(out.columns)
    assert out.count() == docs.count()


# --- concat_blocks ------------------------------------------------------

def test_concat_blocks_stream_contract(spark):
    """Offsets are contiguous per shard in (hash, id) order; block ids
    cover exactly [start/B .. end/B]; empty docs stay in one block."""
    from lens_spark.operators.packing import concat_blocks
    df = spark.createDataFrame(
        [(i, "tok " * (3 + i)) for i in range(20)] + [(99, "")],
        "doc_id long, text string")
    out = concat_blocks(df, "doc_id", block_tokens=8, text_col="text",
                        num_shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.start_tok)
        expect = 0
        for r in rows:
            assert r.start_tok == expect
            expect += r.n_tokens
            first_local = r.start_tok // 8
            last_local = max(r.start_tok + r.n_tokens - 1, r.start_tok) // 8
            assert r.block_first == (shard << 32) + first_local
            assert r.block_last == (shard << 32) + last_local
    empty = [r for r in out if r.doc_id == 99][0]
    assert empty.n_tokens == 0 and empty.block_first == empty.block_last


def test_concat_blocks_sep_tokens_advance_stream(spark):
    from lens_spark.operators.packing import concat_blocks
    df = spark.createDataFrame([(1, "a b"), (2, "c d")],
                               "doc_id long, text string")
    out = {r.doc_id: r for r in concat_blocks(
        df, "doc_id", block_tokens=100, text_col="text",
        num_shards=1, sep_tokens=5).collect()}
    starts = sorted(r.start_tok for r in out.values())
    assert starts == [0, 7]        # 2 tokens + 5 separator positions


def test_concat_blocks_repartition_stable(spark):
    from lens_spark.operators.packing import concat_blocks
    df = spark.createDataFrame([(i, "w " * (i % 7 + 1)) for i in range(300)],
                               "doc_id long, text string")
    kw = dict(block_tokens=16, text_col="text", num_shards=8)
    a = sorted(map(tuple, concat_blocks(df.coalesce(1), "doc_id", **kw).collect()))
    b = sorted(map(tuple, concat_blocks(df.repartition(23), "doc_id", **kw).collect()))
    assert a == b


def test_concat_blocks_lens_and_errors(spark):
    import pytest as _pytest
    from lens_spark import engine
    from lens_spark.errors import LensError
    from lens_spark.operators.packing import concat_blocks
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    out = engine.append(df, {"lenses": [{"name": "concat_blocks",
        "arguments": {"id": "doc_id", "block_tokens": 2, "column": "text",
                      "num_shards": 1}}]})
    r = out.collect()[0]
    assert (r.block_first, r.block_last) == (0, 1)
    with _pytest.raises(LensError, match="block_tokens"):
        concat_blocks(df, "doc_id", block_tokens=0, text_col="text")


# --- length_batches -----------------------------------------------------

def test_length_batches_groups_similar_lengths(spark):
    from lens_spark.operators.packing import length_batches
    df = spark.createDataFrame(
        [(i, "w " * (1 + (i * 37) % 50)) for i in range(120)],
        "doc_id long, text string")
    out = length_batches(df, "doc_id", batch_size=8, text_col="text",
                         num_shards=2).collect()
    by_batch = {}
    for r in out:
        by_batch.setdefault(r.batch_id, []).append(r)
    assert all(len(v) <= 8 for v in by_batch.values())
    # within a shard, batch length ranges must be non-overlapping and
    # ordered: max(batch k) <= min(batch k+1)
    shards = {}
    for bid, rows in by_batch.items():
        shards.setdefault(bid >> 32, []).append(
            (bid, min(r.n_tokens for r in rows),
             max(r.n_tokens for r in rows)))
    for batches in shards.values():
        batches.sort()
        for (_, _, hi), (_, lo2, _) in zip(batches, batches[1:]):
            assert hi <= lo2
    # positions are 0..len-1 per batch
    for rows in by_batch.values():
        assert sorted(r.batch_pos for r in rows) == list(range(len(rows)))


def test_length_batches_repartition_stable(spark):
    from lens_spark.operators.packing import length_batches
    df = spark.createDataFrame(
        [(i, "t " * (i % 9 + 1)) for i in range(200)],
        "doc_id long, text string")
    kw = dict(batch_size=16, text_col="text", num_shards=4)
    a = sorted(map(tuple, length_batches(df.coalesce(1), "doc_id", **kw).collect()))
    b = sorted(map(tuple, length_batches(df.repartition(11), "doc_id", **kw).collect()))
    assert a == b


def test_length_batches_lens(spark):
    from lens_spark import engine
    df = spark.createDataFrame([(1, "a"), (2, "b c d")],
                               "doc_id long, text string")
    out = engine.append(df, {"lenses": [{"name": "length_batches",
        "arguments": {"id": "doc_id", "batch_size": 2, "column": "text",
                      "num_shards": 1}}]})
    rows = sorted(out.collect(), key=lambda r: r.batch_pos)
    assert [r.doc_id for r in rows] == [1, 2]   # shorter doc first
