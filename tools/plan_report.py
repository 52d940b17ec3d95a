"""Regenerate PLANS.md: formatted physical plans for flagship queries.

Evidence artifact for the scale claims in SCALE.md / README — shows the
actual `explain("formatted")` output (pushed filters, read schemas,
codegen stages, join strategies, exchange count) at sf0.01.

Usage: python tools/plan_report.py > PLANS.md
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from lens_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

# One representative per plan-shape family.
FLAGSHIPS = [
    ("e1_composition", "narrow lens chain — fused into one codegen stage, "
                       "filter pushed to the scan"),
    ("join_enriched_orders", "star join — both dims broadcast, no fact-side "
                             "exchange before the partial aggregate"),
    ("agg_pricing_summary", "grouped aggregate — map-side partial combine "
                            "below the single exchange"),
    ("range_join_events", "interval join — bin equi-key hash join, no "
                          "nested loop"),
    ("window_running_revenue", "two analytic windows over one partitioning "
                               "— a single exchange"),
    ("x2_minhash_pairs", "LSH banding — shuffle carries signatures, band "
                         "self-join is an equi-join"),
    ("x2_embedding_neardup_lsh", "flagship embedding near-dup — hyperplane "
                                 "buckets, equi-join, exact-cosine verify; "
                                 "no cartesian/nested-loop operator"),
    ("x5_span_dedup", "duplicate-span removal — df-count and joins on "
                      "xxhash64 keys; duplicated starts aggregate per doc "
                      "and the text is rebuilt with array expressions, so "
                      "token text never crosses a token-granular exchange"),
    ("x7_dsir_weights", "DSIR importance weights — one tokenize+explode "
                        "pass feeds both the raw-LM count agg and the "
                        "scoring join; exchanges carry 8-byte gram keys "
                        "and doubles, never gram text"),
    ("x9_curation_pipeline", "flagship composition — quality filter, "
                             "corpus-LM scoring, band filter, split, audit "
                             "agg in one plan; partial aggs throughout, "
                             "1-row totals broadcast"),
    ("x5_chunk_docs", "token-window chunking — rlike pre-filter (no "
                      "re-tokenize), tokenize once, inline explode, slice "
                      "the bound array; the only exchange is "
                      "ensure_parallelism's small-scan fan-out, a no-op "
                      "on a production many-split scan"),
    ("x2_bloom_decontaminate", "bloom prefilter — corpus gram stream cut "
                               "by the broadcast bitset BEFORE the confirm "
                               "semi-join shuffles"),
    ("x9_ks_drift", "two-sample KS — both corpora collapse to "
                    "(group, value) histograms in one map-side-combined "
                    "agg; the cumulative window runs over distinct "
                    "values only, partitioned by group"),
    ("x2_overlap_matrix", "cross-source containment matrix — distinct "
                          "(source, gram-hash) posting lists self-joined "
                          "on the 8-byte hash; fan-out bounded by the "
                          "source domain, result is #sources² rows"),
    ("x3_knn_graph", "corpus kNN graph — SHUFFLED bucket self-join "
                     "(never broadcast, never all-pairs), score-before-"
                     "distinct exchanges scalars, two-stage top-k; NO "
                     "mid-plan checkpoint pinning the exploded corpus "
                     "(r10 — the bucket UDF recomputes per side)"),
    ("x5_vocab_coverage", "tokenizer coverage report — token explode "
                          "collapses map-side to (group, token) counts "
                          "before the broadcast vocab join; distinct "
                          "counts are plain COUNTs, no countDistinct "
                          "Expand over the exploded corpus"),
    ("x3_ivfpq_index", "materialized IVFADC serving (r11) — the codes "
                       "scan carries PartitionFilters on the probed "
                       "cells (disk partition pruning; at 100 TB the "
                       "panel reads ~nprobe/nlist of an index 128× "
                       "narrower than the vectors), ADC emits only "
                       "(query, neighbor, score) scalars, and the exact "
                       "re-rank fetches true vectors via a BROADCAST "
                       "join on the bounded shortlist — no corpus "
                       "exchange anywhere"),
    ("x8_bm25_index", "materialized BM25 postings serving (late r11) — "
                      "the postings scan carries a dynamicpruning "
                      "subquery on the term-hash bucket column (the "
                      "panel's broadcast (term, pb) probe prunes "
                      "directories on disk: a panel reads ~|its terms| "
                      "of 64 buckets, never the index), the sum "
                      "aggregates map-side-combined scaled longs, and "
                      "the two-stage top-k keeps any one query's "
                      "candidates off a single task"),
    ("x8_hybrid_dense_sparse", "dense+sparse hybrid flagship (r12) — ONE "
                               "fused plan serving the same panel from "
                               "BOTH materialized indexes and combining "
                               "by reciprocal rank. The three 100 TB "
                               "properties, all visible: (1) the postings "
                               "scan carries the panel's term probe as a "
                               "dynamicpruning subquery on pb; (2) the "
                               "IVFADC scan carries the probed cells as "
                               "a `cell INSET` PartitionFilter (toy "
                               "nprobe=8/nlist=16 with 5 queries happens "
                               "to cover all cells; at real nlist a "
                               "panel touches nprobe/nlist of the "
                               "index); (3) the fusion is ONE "
                               "partial+final HashAggregate pair "
                               "directly over the Union of the two "
                               "bounded top-per_system_k rankings — "
                               "≤ 2·per_system_k rows per query reach "
                               "it, then the shared two-stage top-k. "
                               "NO table outside the two indexes is "
                               "scanned at serve time (r14, r13 "
                               "verdict #1): the sparse leg reads "
                               "postings buckets, the dense leg reads "
                               "byte codes, and the exact re-rank "
                               "reads true vectors from the SAME "
                               "probed-cell partitions (the index is "
                               "built store_vectors=True) — the old "
                               "rerank_corpus scan, the one "
                               "panel-independent full read on this "
                               "path, is gone"),
    ("x8_hybrid_serve", "the hybrid flagship's SERVE PATH alone (r13, "
                        "r12 verdict #4) — the identical fused plan as "
                        "x8_hybrid_dense_sparse but against indexes "
                        "built once per process, which is what the "
                        "bench row times: the production repeating "
                        "unit is the panel serve, builds amortize. "
                        "Pinned separately so a serve-path plan "
                        "regression (a lost PartitionFilter, a "
                        "broadcast flipping to shuffle) is visible in "
                        "this report even when the end-to-end row's "
                        "build noise hides the seconds. r14 (r13 "
                        "verdict #1): every file scan here is one of "
                        "the two indexes' pruned partitions — the "
                        "exact re-rank's vec fetch is the second "
                        "cell-INSET scan, and the per-panel "
                        "rerank_corpus full read no longer exists"),
]


def main() -> int:
    spark = get_spark("plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    print("# PLANS — flagship physical plans (sf0.01)")
    print()
    print("Generated by `python tools/plan_report.py > PLANS.md`.")
    print("What to look for per plan is noted above each block;")
    print("the properties are pinned by tests/test_plans.py.")
    for name, why in FLAGSHIPS:
        df = queries[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        print(f"\n## {name}\n\n*{why}*\n")
        print("```")
        print(buf.getvalue().rstrip())
        print("```")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
