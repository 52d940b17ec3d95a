"""Deterministic sampling / splitting lens tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_spark import engine
from lens_spark.errors import LensError
from lens_spark.operators.base import make_lens
from lens_spark.operators.sampling import (
    fraction_to_threshold,
    hash_split,
    sample_hash,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_threshold_endpoints():
    assert fraction_to_threshold(0.0) == "00000000"
    assert fraction_to_threshold(1.0) == "g"  # sorts above any hex prefix
    with pytest.raises(LensError):
        fraction_to_threshold(1.5)


def test_sample_is_deterministic_and_stable_under_repartition(spark, docs):
    a = {r.doc_id for r in sample_hash(docs, ["doc_id"], 0.3).collect()}
    b = {r.doc_id for r in
         sample_hash(docs.repartition(13), ["doc_id"], 0.3).collect()}
    assert a == b
    n = docs.count()
    assert 0.15 * n < len(a) < 0.45 * n  # roughly the asked fraction


def test_sample_salt_gives_independent_sample(spark, docs):
    a = {r.doc_id for r in sample_hash(docs, ["doc_id"], 0.3).collect()}
    c = {r.doc_id for r in
         sample_hash(docs, ["doc_id"], 0.3, salt="v2").collect()}
    assert a != c


def test_split_partitions_every_row_exactly_once(spark, docs):
    out = hash_split(docs, ["doc_id"], {"train": 0.8, "test": 0.1, "val": 0.1})
    counts = {r.split: r.n for r in
              out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "test", "val"}
    assert counts["train"] > counts.get("test", 0)


def test_split_membership_stable_when_splits_extend(spark, docs):
    """Consecutive-range assignment: re-cutting val into val+holdout
    must not move any train/test row."""
    base = hash_split(docs, ["doc_id"], {"train": 0.8, "test": 0.1, "val": 0.1})
    ext = hash_split(docs, ["doc_id"],
                     {"train": 0.8, "test": 0.1, "val": 0.05, "holdout": 0.05})
    b = {(r.doc_id, r.split) for r in base.collect() if r.split in ("train", "test")}
    e = {(r.doc_id, r.split) for r in ext.collect() if r.split in ("train", "test")}
    assert b == e


def test_split_fractions_must_sum_to_one(spark, docs):
    with pytest.raises(LensError):
        hash_split(docs, ["doc_id"], {"train": 0.8, "test": 0.1}).collect()


def test_lens_spec_path(spark, docs):
    spec = {"lenses": [
        {"name": "hash_split", "arguments": {
            "keys": ["doc_id"], "splits": {"a": 0.5, "b": 0.5}}},
        {"name": "sample_hash", "arguments": {
            "keys": ["doc_id"], "fraction": 1.0}},
    ]}
    out = engine.append(docs, spec)
    assert out.count() == docs.count()
    inv = make_lens("hash_split", {"keys": ["doc_id"],
                                   "splits": {"a": 0.5, "b": 0.5}})
    assert "split" not in inv.inverse(out).columns


def test_oversample_weights_and_copy_indexes(spark):
    """Weight 3.0 -> exactly 3 indexed copies; 1.0 -> one; 0.0 -> gone;
    fractional parts choose a stable content-hash subset."""
    from lens_spark.operators.sampling import oversample

    df = spark.createDataFrame(
        [(i, "a" if i < 10 else ("b" if i < 20 else "c")) for i in range(30)],
        "id long, src string")
    out = oversample(df, ["id"], "src", {"a": 3.0, "c": 0.0})
    rows = [(r.id, r.src, r.repeat_idx) for r in out.collect()]
    by_src = {}
    for i, s, ri in rows:
        by_src.setdefault(s, []).append((i, ri))
    # 10 ids in "a", tripled with copy indexes 1..3
    assert len(by_src["a"]) == 30 and {ri for _, ri in by_src["a"]} == {1, 2, 3}
    # default weight 1.0: the 10 "b" ids appear exactly once
    assert len(by_src["b"]) == 10 and {ri for _, ri in by_src["b"]} == {1}
    assert "c" not in by_src


def test_oversample_fractional_is_deterministic_and_invertible(spark):
    from lens_spark import engine
    from lens_spark.operators.sampling import oversample

    df = spark.createDataFrame([(i, "w") for i in range(200)],
                               "id long, src string")
    a = oversample(df, ["id"], "src", {"w": 1.5})
    b = oversample(df.repartition(7), ["id"], "src", {"w": 1.5})
    ra = sorted((r.id, r.repeat_idx) for r in a.collect())
    rb = sorted((r.id, r.repeat_idx) for r in b.collect())
    assert ra == rb  # reproducible across plans
    n_extra = sum(1 for _, ri in ra if ri == 2)
    assert 60 <= n_extra <= 140  # ~50% of 200, content-chosen
    # lens inverse: keep copy 1, drop the index column -> original rows
    spec = {"lenses": [{"name": "oversample", "arguments": {
        "keys": ["id"], "strata": "src", "weights": {"w": 2.5}}}]}
    fwd = engine.append(df, spec)
    back = engine.append(fwd, {"lenses": [{"name": "oversample",
                                           "inverse": True,
                                           "arguments": {
        "keys": ["id"], "strata": "src", "weights": {"w": 2.5}}}]})
    assert sorted(r.id for r in back.collect()) == sorted(r.id for r in df.collect())
    assert back.columns == df.columns


def test_mix_by_token_budget_weights_from_data(spark):
    """weight = budget / stratum token total: a stratum whose budget is
    2.5x its token count behaves exactly like oversample(weight=2.5);
    unlisted strata honor default_weight."""
    from lens_spark.operators.sampling import mix_by_token_budget, oversample

    rows = [(i, "a", "one two") for i in range(50)]          # 100 tokens
    rows += [(100 + i, "b", "three four five") for i in range(20)]  # 60 tokens
    df = spark.createDataFrame(rows, "id long, src string, text string")
    mixed = mix_by_token_budget(df, ["id"], "src", {"a": 250},
                                text_col="text", default_weight=0.0)
    over = oversample(df.filter("src = 'a'"), ["id"], "src", {"a": 2.5})
    got = {(r.id, r.repeat_idx) for r in mixed.collect()}
    exp = {(r.id, r.repeat_idx) for r in over.collect()}
    assert got == exp
    assert all(r.src == "a" for r in mixed.collect())  # default 0 drops 'b'


def test_mix_by_token_budget_downsamples_to_budget(spark):
    """budget << stratum tokens: kept token mass lands near the budget
    (expected-value contract of the md5-prefix CDF)."""
    from lens_spark.operators.sampling import mix_by_token_budget

    rows = [(i, "a", "tok " * 10) for i in range(500)]  # 5000 tokens
    df = spark.createDataFrame(rows, "id long, src string, text string")
    mixed = mix_by_token_budget(df, ["id"], "src", {"a": 1000},
                                text_col="text", default_weight=0.0)
    kept_tokens = mixed.count() * 10
    assert 600 <= kept_tokens <= 1400  # ~1000 expected, binomial spread


def test_mix_by_token_budget_needs_token_source(spark):
    from lens_spark.errors import LensError
    from lens_spark.operators.sampling import mix_by_token_budget

    df = spark.createDataFrame([(1, "a", "x")],
                               "id long, src string, text string")
    with pytest.raises(LensError, match="token_count_col or text_col"):
        mix_by_token_budget(df, ["id"], "src", {"a": 10})


def test_shuffle_shards_deterministic_and_stable(spark):
    """Same shards/positions across runs AND across repartitioning; all
    shards used; positions are 1..shard_size without gaps."""
    from lens_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(200)], "id long")
    a = {r.id: (r.shard, r.shard_pos)
         for r in shuffle_shards(df, ["id"], 4).collect()}
    b = {r.id: (r.shard, r.shard_pos)
         for r in shuffle_shards(df.repartition(7), ["id"], 4).collect()}
    assert a == b
    shards = {}
    for s, p in a.values():
        shards.setdefault(s, []).append(p)
    assert set(shards) == {0, 1, 2, 3}
    for ps in shards.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_shuffle_shards_salt_changes_order_not_membership(spark):
    from lens_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    a = {r.id: (r.shard, r.shard_pos)
         for r in shuffle_shards(df, ["id"], 4).collect()}
    b = {r.id: (r.shard, r.shard_pos)
         for r in shuffle_shards(df, ["id"], 4, salt="epoch2").collect()}
    assert a != b                      # a different epoch order…
    assert set(a) == set(b)            # …over exactly the same rows


def test_shuffle_shards_rejects_bad_shard_count(spark):
    from lens_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(LensError, match="num_shards"):
        shuffle_shards(df, ["id"], 0)


def test_sample_exact_k_sizes_and_equivalence_to_full_rank(spark):
    """Exactly k per stratum (all rows of smaller strata), and the
    two-phase pre-filtered result equals the naive full-stratum hash
    top-k (the superset-correctness property)."""
    from lens_spark.operators.sampling import sample_exact_k

    rows = [(i, "big") for i in range(300)] + [(1000 + i, "tiny")
                                               for i in range(3)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = sample_exact_k(df, ["id"], "src", 10)
    got = {}
    for r in out.collect():
        got.setdefault(r.src, set()).add(r.id)
    assert len(got["big"]) == 10 and len(got["tiny"]) == 3
    # naive reference: full-stratum rank by (md5 prefix, id)
    import hashlib

    def prefix(i):
        return hashlib.md5(str(i).encode()).hexdigest()[:8]

    expect = set(sorted(range(300), key=lambda i: (prefix(i), i))[:10])
    assert got["big"] == expect


def test_sample_exact_k_shrink_stable_and_deterministic(spark):
    """Adding rows to a stratum only replaces members with lower-hash
    rows — survivors of the smaller corpus that stay are a superset
    intersection; and repeated runs agree."""
    from lens_spark.operators.sampling import sample_exact_k

    small = spark.createDataFrame([(i, "a") for i in range(50)],
                                  "id long, src string")
    big = spark.createDataFrame([(i, "a") for i in range(100)],
                                "id long, src string")
    s1 = {r.id for r in sample_exact_k(small, ["id"], "src", 10).collect()}
    s2 = {r.id for r in sample_exact_k(small, ["id"], "src", 10).collect()}
    b = {r.id for r in sample_exact_k(big, ["id"], "src", 10).collect()}
    assert s1 == s2
    # every big-panel member from the old id range was already in the
    # small panel (hash order is global: new rows only push members out)
    assert all(i in s1 for i in b if i < 50)


def test_sample_exact_k_fallback_when_candidates_short(spark):
    """safety=... tiny threshold forces the shortfall path; result must
    still be the exact top-k."""
    from lens_spark.operators.sampling import sample_exact_k

    df = spark.createDataFrame([(i, "a") for i in range(40)],
                               "id long, src string")
    # k close to stratum size => threshold ~1 anyway; use safety=1 with
    # k small to make shortfalls plausible across hash ranges
    out = sample_exact_k(df, ["id"], "src", 39, safety=1)
    assert out.count() == 39


def test_mix_by_temperature_budget_shares(spark):
    """α < 1 tilts budgets toward small strata: the upsampling weight
    of the minority source exceeds its natural share, totals land near
    the temperature-scaled budgets, and α validation refuses
    non-positive temperatures."""
    import pytest as _pytest

    from lens_spark.errors import LensError
    from lens_spark.operators.sampling import mix_by_temperature

    rows = [(i, "big", "w " * 20) for i in range(90)]
    rows += [(1000 + i, "small", "w " * 20) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = mix_by_temperature(df, ["doc_id"], "source",
                             total_budget_tokens=2000, alpha=0.3,
                             text_col="text")
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # natural shares are 90/10; α=0.3 budgets ∝ 1800^0.3 : 200^0.3
    # ≈ 0.66 : 0.34 — the small stratum must be strongly upsampled
    assert counts["small"] > 10          # replicated above natural size
    assert counts["small"] * 1.2 > counts["big"] * 0.34 / 0.66
    # expectation sanity: total docs ≈ budget/20 tokens each = ~100
    assert 60 <= counts["small"] + counts["big"] <= 140
    with _pytest.raises(LensError, match="alpha must be"):
        mix_by_temperature(df, ["doc_id"], "source",
                           total_budget_tokens=100, alpha=0.0,
                           text_col="text")


def test_mix_by_temperature_alpha_one_matches_natural_budget(spark):
    """α = 1 reduces to plain proportional budgeting: every stratum's
    weight is total_budget / corpus_tokens — identical replication for
    all strata."""
    from lens_spark.operators.sampling import mix_by_temperature

    rows = [(i, "a", "x " * 10) for i in range(20)]
    rows += [(100 + i, "b", "x " * 10) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # budget = 2× corpus tokens → every doc exactly twice, both strata
    out = mix_by_temperature(df, ["doc_id"], "source",
                             total_budget_tokens=1600, alpha=1.0,
                             text_col="text")
    per_doc = {r["doc_id"]: r["n"] for r in
               out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert set(per_doc.values()) == {2}
    assert len(per_doc) == 80


def test_group_quota_keeps_top_n_per_key_and_is_partitioning_stable(spark):
    """Survivors = exactly the top-n per key under (order desc,
    tiebreak asc), with ranks 1..min(n, group size); the same set and
    ranks come back under a different input partitioning (the
    two-stage prune is invariant — the determinism contract)."""
    from lens_spark.operators.sampling import group_quota

    rows = [(i, "dom%d" % (i % 3), (i * 7) % 20) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, dom string, score long")

    def expect_for(pdf_rows, n):
        byk = {}
        for i, d, s in pdf_rows:
            byk.setdefault(d, []).append((-s, i))
        out = set()
        for d, items in byk.items():
            for rk, (_, i) in enumerate(sorted(items)[:n], start=1):
                out.add((d, i, rk))
        return out

    want = expect_for(rows, 4)
    got = {(r.dom, r.id, r.quota_rank) for r in group_quota(
        df, ["dom"], 4, order_by="score", tiebreak=["id"]).collect()}
    assert got == want
    got2 = {(r.dom, r.id, r.quota_rank) for r in group_quota(
        df.repartition(13, "score"), ["dom"], 4,
        order_by="score", tiebreak=["id"]).collect()}
    assert got2 == want


def test_group_quota_native_map_side_prune(spark):
    """r15 (r14 advice): group_quota's pre-shuffle funnel protection
    relies on Spark's InferWindowGroupLimit rule, guarded only by the
    threshold conf — mirror test_rank_topk_native_map_side_prune so a
    Spark upgrade or an excludedRules change that stops the rule
    firing surfaces here, not at production scale. Pins: Partial
    WindowGroupLimit present (the map-side prune) with one window for
    n <= threshold; the manual __gq_pid prune engages past it."""
    import re

    from lens_spark.operators.sampling import group_quota

    rows = [(i, "dom%d" % (i % 3), (i * 7) % 20) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, dom string, score long")
    out = group_quota(df, ["dom"], 4, order_by="score", tiebreak=["id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert len(re.findall(r"Window \[", final)) == 1
    # the manual two-stage fallback past the optimizer threshold — a
    # hot Zipf key must never rely on a rule that cannot fire
    big = group_quota(df, ["dom"], 1500, order_by="score",
                      tiebreak=["id"])
    assert "__gq_pid" in big._jdf.queryExecution().executedPlan().toString()


def test_group_quota_small_groups_null_order_and_validation(spark):
    """Groups smaller than n survive whole; NULL order values rank
    last under either direction; missing tiebreak / bad n raise."""
    import pytest as _pytest

    from lens_spark.operators.sampling import group_quota

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", None), (3, "a", 9), (4, "b", 1)],
        "id long, dom string, score long")
    out = {(r.dom, r.id, r.quota_rank) for r in group_quota(
        df, ["dom"], 2, order_by="score", tiebreak=["id"]).collect()}
    assert out == {("a", 3, 1), ("a", 1, 2), ("b", 4, 1)}
    asc = {(r.dom, r.id, r.quota_rank) for r in group_quota(
        df, ["dom"], 3, order_by="score", tiebreak=["id"],
        descending=False).collect()}
    assert asc == {("a", 1, 1), ("a", 3, 2), ("a", 2, 3), ("b", 4, 1)}
    with _pytest.raises(LensError, match="tiebreak"):
        group_quota(df, ["dom"], 2, order_by="score", tiebreak=[])
    with _pytest.raises(LensError, match="n >= 1"):
        group_quota(df, ["dom"], 0, order_by="score", tiebreak=["id"])
    with _pytest.raises(LensError, match="key column"):
        group_quota(df, [], 2, order_by="score", tiebreak=["id"])


def test_group_quota_reserved_internal_columns_raise(spark):
    """ADVICE r9: inputs (or rank_col) named like the __gq_* internals
    would silently corrupt the two-stage prune — refuse loudly."""
    import pytest as _pytest

    from lens_spark.operators.sampling import group_quota

    df = spark.createDataFrame([(1, "a", 5)], "id long, dom string, score long")
    with _pytest.raises(LensError, match="__gq_"):
        group_quota(df.withColumnRenamed("score", "__gq_pid"),
                    ["dom"], 2, order_by="id", tiebreak=["id"])
    with _pytest.raises(LensError, match="__gq_"):
        group_quota(df, ["dom"], 2, order_by="score", tiebreak=["id"],
                    rank_col="__gq_lr")
