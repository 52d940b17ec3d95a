"""Plan-quality regression tests: the properties that make operators
survive a 100× scale-up. These assert on the *physical plan*, not the
result — a query can be correct and still read every column, skip
pushdown, or fall out of codegen.
"""

from __future__ import annotations

import pytest

from lens_spark import engine

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_filter_lens_pushes_predicate_to_scan(spark, orders):
    out = engine.append(orders, {"lenses": [{"name": "filter", "arguments": {
        "predicate": "o_orderstatus = 'F'"}}]})
    plan = _plan(out)
    assert "PushedFilters: [" in plan
    assert "o_orderstatus" in plan.split("PushedFilters:")[1].split("]")[0]


def test_projection_prunes_scan_schema(spark, orders):
    out = engine.append(orders, {"lenses": [{"name": "project", "arguments": {
        "columns": ["o_orderkey", "o_totalprice"]}}]})
    plan = _plan(out)
    schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "o_orderkey" in schema and "o_totalprice" in schema
    assert "o_orderpriority" not in schema  # unused column never read


def test_rename_add_chain_stays_in_one_codegen_stage(spark, orders):
    """Chained narrow lenses must fuse (the Catalyst analogue of the
    reference's raw-byte pipe handoff) — no exchange, one codegen span."""
    out = engine.append(orders, {"lenses": [
        {"name": "rename", "arguments": {"src": "o_orderkey", "dst": "id"}},
        {"name": "add", "arguments": {"column": "o_totalprice", "magnitude": 1}},
        {"name": "filter", "arguments": {"predicate": "o_totalprice > 100"}},
    ]})
    plan = _plan(out)
    assert "Exchange" not in plan
    # "*(1)" marks whole-stage-codegen stage 1; a second stage or an
    # un-starred operator between scan and project would mean the chain
    # broke out of the fused span
    assert "*(1) Project" in plan
    assert "*(2)" not in plan


def test_aggregate_does_partial_before_exchange(spark, orders):
    out = engine.append(orders, {"lenses": [{"name": "aggregate", "arguments": {
        "keys": ["o_orderstatus"], "aggs": {"n": "count(*)"}}}]})
    plan = _plan(out)
    # map-side combine: a HashAggregate must appear below the Exchange
    assert plan.index("Exchange") < plan.rindex("HashAggregate")
    assert plan.count("HashAggregate") >= 2


def test_broadcast_join_has_no_shuffle_on_fact_side(spark, orders):
    out = engine.append(orders, {"lenses": [{"name": "join", "arguments": {
        "right": f"{SF}/customer.parquet", "on": "o_custkey = c_custkey",
        "broadcast": True, "select": ["c_custkey", "c_nationkey"]}}]})
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_brute_topk_preranks_before_global_window(spark):
    """brute_force_topk must prune per input partition before the
    per-query window so no single task sorts a whole query's candidate
    set. Since r14 the prune is Spark's native WindowGroupLimit
    (Partial) pushed below the exchange (one Window operator, one
    exchange) instead of the manual (query, spark_partition_id)
    pre-rank window — same bound, one less Exchange+Sort. The manual
    form remains the fallback past the optimizer's pushdown threshold
    (pinned in test_similarity's
    test_rank_topk_native_map_side_prune)."""
    from lens_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.limit(5)
    out = brute_force_topk(emb, q, id_col="vec_id", vec_col="embedding", k=10)
    plan = _plan(out)
    assert "WindowGroupLimit" in plan, "map-side pre-prune missing"
    assert "Partial" in plan, "pre-prune must run below the exchange"


def test_quality_filter_tokenizes_once_per_row(spark):
    """The 7x quality-filter win (functions/text.py let_) depends on
    CollapseProject / filter pushdown NOT re-inlining the bound token
    array into each predicate. Pin it: the physical plan must contain
    exactly ONE tokenizing split() for the whole rule set. The pre-r3
    formulation (filter on repetition_stats output columns) inlines one
    split per metric reference and fails this test."""
    from lens_spark.operators.text import quality_filter

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bounds = {"min_tokens": 5, "max_tokens": 100000,
              "min_mean_word_len": 1.0, "max_mean_word_len": 12.0,
              "min_unique_ratio": 0.1, "max_top_token_frac": 0.9,
              "max_top_bigram_frac": 0.9}
    plan = _plan(quality_filter(docs, "text", bounds))
    # the condition prints twice (Filter node + the scan's DataFilters
    # metadata listing) — count tokenizations within the Filter node,
    # which is what actually evaluates per row
    filter_lines = [l for l in plan.splitlines() if "Filter " in l
                    and "FileScan" not in l]
    assert filter_lines, f"no Filter node in plan:\n{plan}"
    n_split = sum(l.count("split(") for l in filter_lines)
    assert n_split == 1, (
        f"expected exactly 1 tokenize split() in the Filter condition, found "
        f"{n_split} — the let_ binding is being re-inlined (per-predicate "
        "re-tokenization, the ~11s-at-sf0.1 regression class)")


def test_oversample_plan_is_narrow(spark):
    """Fractional oversampling must stay a pure projection/explode —
    zero exchanges at any scale."""
    from lens_spark.operators.sampling import oversample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(oversample(docs, ["doc_id"], "source", {"src0": 2.5}))
    assert "Exchange" not in plan


def test_line_dedup_plan_joins_on_hashes(spark):
    """Boilerplate line removal must never degrade to a quadratic join,
    and its aggregations must combine map-side before exchanging."""
    from lens_spark.operators.dedup import line_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(line_dedup(docs, "doc_id", "text"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final df-count


def test_embedding_neardup_lsh_plan_has_no_quadratic_join(spark):
    """The flagship embedding near-dup must stay bucketed: an equi-join
    on the LSH bucket key, never a cartesian/nested-loop pair blowup."""
    from lens_spark.operators.dedup import embedding_neardup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = embedding_neardup_pairs(emb, "vec_id", "embedding",
                                  threshold=0.45, method="lsh", dim=64,
                                  num_bits=4, num_tables=8)
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_span_dedup_plan_joins_on_hashes_no_quadratic(spark):
    """Duplicate-span removal must stay an equi-join pipeline: df-count
    and reassembly aggregations combine map-side, the dup-key and
    covered-position joins are hash/sort-merge equi-joins, and no
    cartesian/nested-loop pair blowup anywhere."""
    from lens_spark.operators.dedup import span_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(span_dedup(docs, "doc_id", "text"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final df-count
    assert "xxhash64" in plan  # span identity moves as 8-byte hashes


def test_dsir_weights_plan_hashes_only_no_quadratic(spark):
    """DSIR scoring: gram identity moves as xxhash64 keys, the count
    aggs combine map-side, totals broadcast, and no cartesian pair
    blowup anywhere (the raw×target interaction is the ratio-table
    equi-join, never a doc-level cross join)."""
    from lens_spark.operators.selection import _lm_counts, dsir_logweights

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = dsir_logweights(docs.filter("doc_id % 7 <> 0"),
                          docs.filter("doc_id % 7 = 0"),
                          "doc_id", "text")
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    # partial+final of the per-doc score agg (the LM-count legs sit
    # behind the doc-gram/ratio localCheckpoints, whose subtree explain
    # truncates to ExistingRDD — assert their shape separately below)
    assert plan.count("HashAggregate") >= 2
    counts_plan = _plan(_lm_counts(docs, "text", num_buckets=None,
                                   name="__c"))
    assert "xxhash64" in counts_plan          # gram identity is 8-byte keys
    assert counts_plan.count("HashAggregate") >= 2  # map-side partial


def test_unigram_logprob_plan_partial_aggs_and_broadcast_totals(spark):
    """Corpus-LM scoring: token counts partial-aggregate before the
    exchange, the 1-row totals side is broadcast, and the score join is
    an equi-join on the token hash."""
    from lens_spark.operators.text import unigram_logprob

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(unigram_logprob(docs, "doc_id", "text"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan or \
        "BuildRight" in plan  # 1-row totals may plan as broadcast NLJ
    # token-count agg AND the per-doc scaled-long digest sum (the r7
    # order-independent mean recipe — functions/digest.py) both
    # partial-combine map-side
    assert "partial_count" in plan and "partial_sum" in plan
    # (the tokenize+xxhash64 subtree sits behind the shared lazy
    # checkpoint, so it is not visible in this executed-plan string)


def test_winnow_pairs_plan_is_equi_join_on_fps(spark):
    """The fingerprint self-join must be an equi-join on the 8-byte fp
    key with map-side partial pair counts — no pair blowup operator."""
    from lens_spark.operators.dedup import winnow_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(winnow_pairs(docs, "doc_id", "text", max_df=50))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan


def test_contamination_score_plan_no_corpus_cross_benchmark(spark):
    from lens_spark.operators.dedup import contamination_score

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter("doc_id % 97 = 0")
    plan = _plan(contamination_score(docs, bench, "doc_id", "text", ngram=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan


def test_semdedup_pairs_stay_grouped_no_quadratic_join(spark):
    """SemDedup's verification is the grouped per-cluster kernel — the
    physical plan must contain the applyInPandas stage and no
    cartesian/nested-loop pair join."""
    from lens_spark.operators.clustering import kmeans
    import pandas  # noqa: F401  (kernel dependency sanity)

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assigned = kmeans(emb, "vec_id", "embedding", k=4, max_iter=2)
    plan = _plan(assigned)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "ArrowEvalPython" in plan or "PythonUDF" in plan  # kernel stage


def test_ks_drift_window_runs_over_histogram_not_corpus(spark):
    """The cumulative window's input must be the (group, value)
    HISTOGRAM aggregate — a window directly over the unioned corpora
    would sort every row instead of every distinct value."""
    from lens_spark.operators.evaluation import ks_drift

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = ks_drift(docs.filter("doc_id % 2 = 0"),
                   docs.filter("doc_id % 2 = 1"), "n_chars", by="lang")
    plan = _plan(out)
    # the Window consumes HashAggregate output (cum sums over ca/cb
    # histogram counts), so an aggregate appears below the first Window
    win_pos = plan.find("Window")
    assert win_pos > 0
    assert "HashAggregate" in plan[win_pos:], \
        "no aggregate feeding the KS window"
    # and the histogram agg is partial (map-side combined)
    assert "partial_sum" in plan


def test_overlap_matrix_joins_on_hash_never_nested_loop(spark):
    """Posting-list self-join must be an equi-join on the 8-byte gram
    hash — no cartesian/nested-loop, no gram STRINGS in the join."""
    from lens_spark.operators.dedup import overlap_matrix

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(overlap_matrix(docs, "source", "text", ngram=3))
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan
    # r14: the distinct (src, xxhash64(gram)) table is computed ONCE
    # behind a lazy localCheckpoint (the plan used to re-run the
    # explode→distinct for all three consumers), so the visible plan
    # joins checkpoint scans whose 8-byte __gh column IS the hash —
    # gram strings still never cross an exchange
    assert "__gh" in plan
    assert plan.count("Generate") == 0  # no per-consumer re-explode


def test_realize_epochs_plan_broadcasts_plan_and_stays_narrow(spark):
    """The #strata plan side must broadcast; the replication is an
    explode (Generate), not a shuffle."""
    from lens_spark.operators.sampling import realize_epochs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = realize_epochs(docs, "source", ["doc_id"],
                         total_budget_tokens=10000, text_col="text")
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "Generate explode" in plan
