"""Static lint: reserved-internals declarations cannot drift from the
internals an operator actually creates (r10 verdict #4).

Three consecutive advice rounds found the same defect class — an
operator creating a ``__``-prefixed scratch column it never put in its
reserved-name check (group_quota's ``__gq_pid``/``__gq_lr`` r9,
resample's ``__rs_*`` r10, vocab_coverage guarding a column it never
creates r11) — because every operator hand-rolled its own
``clash = {...} & set(df.columns)``. The shared helper is
``operators.base.check_reserved``; this lint walks the AST of every
function that calls it and fails if the function creates a
``withColumn("__…")`` / ``.alias("__…")`` literal missing from the
declared set. Pure source analysis — no SparkSession."""

from __future__ import annotations

import ast
import glob
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Functions REQUIRED to use the shared helper. r12 (r11 verdict #8):
# adoption extended from the 4 r10/r11 operators to EVERY module-level
# public operator that creates __-prefixed scratch columns (82 more,
# scripted insert, each with the exact literal set this lint extracts)
# — the static guarantee now covers the whole operator surface, not
# just the newest cohort. Removing a call — or hand-rolling the check
# again — fails here, not in a future advice round.
MUST_OPT_IN = {
    "ann_topk", "asof_join", "assign_sequence", "bigram_logprob",
    "binary_eval", "bloom_decontaminate", "bloom_decontaminate_saved",
    "bm25_score", "brute_force_topk", "chunk_documents", "classifier_fit",
    "classifier_fit_multinomial", "classifier_score", "concat_blocks",
    "connected_components", "containment_pairs", "contamination_score",
    "dataset_profile", "decontaminate", "dedup_incremental",
    "dedup_keep_best", "dsir_logweights", "dsir_select", "dup_span_stats",
    "edit_distance_pairs", "embedding_neardup_incremental",
    "embedding_neardup_pairs", "epoch_plan", "equiwidth_hist", "expect",
    "filter_funnel", "group_centroid", "group_quota", "hash_embedding",
    "image_neardup_pairs", "interleave", "ivf_topk", "ivfpq_index_append",
    "ivfpq_index_build", "ivfpq_topk", "kmeans_fit", "knn_graph", "ks_drift",
    "lang_id_score", "length_batches", "line_dedup", "mask_tokens",
    "minhash_signature", "mix_by_temperature", "mix_by_token_budget",
    "neardup_against", "neardup_incremental", "neardup_pairs",
    "ngram_jaccard_pairs", "ngram_novelty", "outlier_filter",
    "overlap_matrix", "oversample", "pack_sequences",
    "postings_index_search", "pq_topk", "quantile_bin", "realize_epochs",
    "resample", "rolling_agg", "rrf_fuse", "run_stream_quota", "salted_join",
    "sample_exact_k", "segment_filter", "semdedup", "semdedup_pairs",
    "sentence_dedup", "sentence_split", "shuffle_shards", "simhash_table",
    "span_corrupt", "span_dedup", "stream_drift_monitor", "tfidf_top_terms",
    "threshold_sweep", "topk_with_recall", "unigram_logprob",
    "vocab_coverage", "winnow_fingerprints", "winnow_pairs",
}


def _literal_names(node: ast.expr) -> set[str] | None:
    """String constants inside a set/list/tuple literal, else None."""
    if isinstance(node, (ast.Set, ast.List, ast.Tuple)):
        out = set()
        for elt in node.elts:
            if not (isinstance(elt, ast.Constant)
                    and isinstance(elt.value, str)):
                return None
            out.add(elt.value)
        return out
    return None


def _scan() -> tuple[dict[str, tuple[str, set[str], set[str]]], list[str]]:
    """{func_name: (path, declared_reserved, created_internals)} for
    every function calling check_reserved; plus lint errors for calls
    whose reserved set is not a plain literal (unverifiable)."""
    found: dict[str, tuple[str, set[str], set[str]]] = {}
    errors: list[str] = []
    for path in glob.glob(os.path.join(REPO, "lens_spark", "**", "*.py"),
                          recursive=True):
        tree = ast.parse(open(path).read())
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef,
                                     ast.AsyncFunctionDef)):
                continue
            declared: set[str] | None = None
            for n in ast.walk(node):
                if (isinstance(n, ast.Call)
                        and ((isinstance(n.func, ast.Name)
                              and n.func.id == "check_reserved")
                             or (isinstance(n.func, ast.Attribute)
                                 and n.func.attr == "check_reserved"))):
                    if len(n.args) < 2:
                        errors.append(f"{path}:{n.lineno} check_reserved "
                                      "needs positional (df, cols, op)")
                        continue
                    lits = _literal_names(n.args[1])
                    if lits is None:
                        errors.append(
                            f"{path}:{n.lineno} check_reserved cols must "
                            "be a literal set of strings so the lint can "
                            "verify it")
                        continue
                    declared = (declared or set()) | lits
            if declared is None:
                continue
            created = set()
            for n in ast.walk(node):
                if (isinstance(n, ast.Call)
                        and isinstance(n.func, ast.Attribute)
                        and n.func.attr in ("withColumn", "alias")
                        and n.args
                        and isinstance(n.args[0], ast.Constant)
                        and isinstance(n.args[0].value, str)
                        and n.args[0].value.startswith("__")):
                    created.add(n.args[0].value)
            rel = os.path.relpath(path, REPO)
            found[node.name] = (rel, declared, created)
    return found, errors


def test_reserved_internals_lint():
    found, errors = _scan()
    assert not errors, errors
    missing_opt_in = MUST_OPT_IN - set(found)
    assert not missing_opt_in, (
        f"{sorted(missing_opt_in)} must guard their internals via "
        "operators.base.check_reserved (r10 verdict #4)")
    drift = []
    for fn, (path, declared, created) in found.items():
        undeclared = created - declared
        if undeclared:
            drift.append(
                f"{path}: {fn} creates {sorted(undeclared)} but its "
                f"check_reserved set declares only {sorted(declared)}")
    assert not drift, drift


def test_lint_catches_an_undeclared_internal():
    """The lint's extraction really sees both creation forms — feed it
    a synthetic module and check it reports the drift."""
    src = (
        "def op(df):\n"
        "    check_reserved(df, {'__a'}, 'op')\n"
        "    return df.withColumn('__a', 1).select(c.alias('__b'))\n")
    tree = ast.parse(src)
    node = tree.body[0]
    created = {
        n.args[0].value for n in ast.walk(node)
        if isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute)
        and n.func.attr in ("withColumn", "alias") and n.args
        and isinstance(n.args[0], ast.Constant)
        and isinstance(n.args[0].value, str)
        and n.args[0].value.startswith("__")}
    assert created == {"__a", "__b"}          # both forms extracted
    assert created - {"__a"} == {"__b"}       # __b is the drift
