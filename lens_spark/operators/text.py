"""X5 text-analysis operators as registered lenses over a text column.

All computation is Catalyst-side (lens_spark.functions.text); these
wrappers just bind column names from pipeline arguments.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lens_spark.functions.text import (
    bigrams_of,
    bpe_ish_token_count,
    fingerprint,
    let_,
    mean_word_length_of,
    predict_lang,
    punct_ratio,
    quality_score,
    tokens,
    top_fraction_of,
    unique_token_ratio_of,
)
from lens_spark.errors import LensError
from lens_spark.operators.base import Lens, check_reserved, ensure_parallelism, register_lens, require_arg


def text_stats(df: DataFrame, text_col: str, prefix: str = "") -> DataFrame:
    """Append the full text-metrics block in one narrow projection.

    Tokenizes ONCE into a shared array column read by every token
    metric (n_tokens, stopword ratio, quality's stop component, the 6
    language scores) — the naive per-metric form re-split the text
    ~9× per row. Same trick as repetition_stats: CollapseProject keeps
    a multiply-referenced non-trivial alias in its own Project.
    """
    from lens_spark.functions.text import (
        predict_lang_of,
        quality_score_of,
        stopword_ratio_of,
        tokens,
    )

    t = F.col(text_col)
    toks_col = f"__{prefix}ts_toks"
    toks = F.col(toks_col)
    df = ensure_parallelism(df)  # regex-heavy per row; fan out small scans
    return (
        df.withColumn(toks_col, tokens(t))
        .withColumn(f"{prefix}n_tokens", F.size(toks).cast("bigint"))
        .withColumn(f"{prefix}n_bpe_tokens", bpe_ish_token_count(t))
        .withColumn(f"{prefix}punct_ratio", F.round(punct_ratio(t), 6))
        .withColumn(f"{prefix}stopword_ratio", F.round(stopword_ratio_of(toks), 6))
        .withColumn(f"{prefix}quality", quality_score_of(t, toks))
        .withColumn(f"{prefix}pred_lang", predict_lang_of(toks))
        .withColumn(f"{prefix}fingerprint", fingerprint(t))
        .drop(toks_col)
    )


@register_lens("text_stats")
def text_stats_lens(arguments: Mapping[str, Any]) -> Lens:
    text_col = str(require_arg(arguments, "column", "text_stats"))
    prefix = str(arguments.get("prefix", ""))
    return Lens("text_stats", arguments, lambda df: text_stats(df, text_col, prefix))


@register_lens("lang_id")
def lang_id_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column (text), out ("pred_lang") — marker-heuristic
    language id (narrow expression, no shuffle). OR the fitted path
    (r9 verdict #5): model_id (lens1b-…) + registry + id load a
    ``lang_classifier`` artifact saved by
    ``lens_spark.models.save_lang_id`` and score ALL languages in one
    corpus pass (see ``lang_id_score``); optional score ("lang_score")
    appends the winner's sigmoid confidence."""
    text_col = str(require_arg(arguments, "column", "lang_id"))
    out = str(arguments.get("out", "pred_lang"))
    model_id = arguments.get("model_id")
    if model_id is not None:
        from lens_spark.models import load_model

        id_col = str(require_arg(arguments, "id", "lang_id"))
        reg = require_arg(arguments, "registry", "lang_id")
        model = load_model(reg, str(model_id),
                           expect_kind="lang_classifier")
        score_out = arguments.get("score")
        return Lens(
            "lang_id", arguments,
            lambda df: lang_id_score(
                df, id_col, text_col, model, out=out,
                score_out=(str(score_out) if score_out else None)),
            lambda df: df.drop(out, *( [str(score_out)] if score_out
                                       else [] )))
    return Lens("lang_id", arguments,
                lambda df: df.withColumn(out, predict_lang(F.col(text_col))),
                lambda df: df.drop(out))


@register_lens("quality_score")
def quality_score_lens(arguments: Mapping[str, Any]) -> Lens:
    text_col = str(require_arg(arguments, "column", "quality_score"))
    out = str(arguments.get("out", "quality"))
    return Lens("quality_score", arguments,
                lambda df: df.withColumn(out, quality_score(F.col(text_col))))


@register_lens("fingerprint")
def fingerprint_lens(arguments: Mapping[str, Any]) -> Lens:
    text_col = str(require_arg(arguments, "column", "fingerprint"))
    out = str(arguments.get("out", "fingerprint"))
    return Lens("fingerprint", arguments,
                lambda df: df.withColumn(out, fingerprint(F.col(text_col))))


# ---------------------------------------------------------------------------
# Gopher-style repetition/quality filtering and PII redaction. Narrow
# column expressions only — no shuffle at any scale; thresholds are
# plain arguments so a lens file can encode a full cleaning policy.
# ---------------------------------------------------------------------------

def repetition_stats(df: DataFrame, text_col: str, prefix: str = "") -> DataFrame:
    """Append the repetition/diversity metric block (Gopher-style).

    Tokenizes ONCE into a shared array column that every metric reads
    (CollapseProject keeps a multiply-referenced non-trivial alias in
    its own Project, so the split really is evaluated once per row —
    the first cut re-split the text five times), then O(n log n)
    run-length top-fractions. All narrow; no shuffle at any scale.
    """
    from lens_spark.functions.text import (
        bigrams_of,
        mean_word_length_of,
        tokens,
        top_fraction_of,
        unique_token_ratio_of,
    )

    toks_col = f"__{prefix}rs_toks"
    df = ensure_parallelism(df)
    toks = F.col(toks_col)
    return (
        df.withColumn(toks_col, tokens(F.col(text_col)))
        .withColumn(f"{prefix}n_tokens", F.size(toks).cast("bigint"))
        .withColumn(f"{prefix}mean_word_len",
                    F.round(mean_word_length_of(toks), 6))
        .withColumn(f"{prefix}unique_ratio",
                    F.round(unique_token_ratio_of(toks), 6))
        .withColumn(f"{prefix}top_token_frac",
                    F.round(top_fraction_of(toks), 6))
        .withColumn(f"{prefix}top_bigram_frac",
                    F.round(top_fraction_of(bigrams_of(toks)), 6))
        .drop(toks_col)
    )


# (name, metric factory, is_lower_bound) — bounds default to None (off).
_GOPHER_RULES: tuple[tuple[str, str], ...] = (
    ("min_tokens", "lower"), ("max_tokens", "upper"),
    ("min_mean_word_len", "lower"), ("max_mean_word_len", "upper"),
    ("min_unique_ratio", "lower"),
    ("max_top_token_frac", "upper"), ("max_top_bigram_frac", "upper"),
)

_GOPHER_METRIC = {
    "min_tokens": "n_tokens", "max_tokens": "n_tokens",
    "min_mean_word_len": "mean_word_len", "max_mean_word_len": "mean_word_len",
    "min_unique_ratio": "unique_ratio",
    "max_top_token_frac": "top_token_frac",
    "max_top_bigram_frac": "top_bigram_frac",
}


_METRIC_EXPRS = {
    "n_tokens": lambda toks: F.size(toks).cast("bigint"),
    "mean_word_len": lambda toks: F.round(mean_word_length_of(toks), 6),
    "unique_ratio": lambda toks: F.round(unique_token_ratio_of(toks), 6),
    "top_token_frac": lambda toks: F.round(top_fraction_of(toks), 6),
    "top_bigram_frac": lambda toks: F.round(top_fraction_of(bigrams_of(toks)), 6),
}


def quality_filter(df: DataFrame, text_col: str,
                   bounds: Mapping[str, float]) -> DataFrame:
    """Keep documents inside every configured metric bound.

    ``bounds`` maps rule name → threshold; omitted rules are off. Rules
    mirror the Gopher quality heuristics: token-count window, mean word
    length window, minimum lexical diversity, maximum single-token and
    single-bigram coverage (repetition guards).

    The whole rule set compiles to ONE let_-bound filter expression —
    tokenize once per row, evaluate every configured bound against the
    bound array. The first cut filtered on `repetition_stats` output
    columns; filter pushdown re-inlined each metric's full expression
    tree into the condition, re-tokenizing and re-sorting per predicate
    (~11 s → sub-second at sf0.1 for the same rows).
    """
    unknown = set(bounds) - {name for name, _ in _GOPHER_RULES}
    if unknown:
        raise LensError(f"quality_filter: unknown rules {sorted(unknown)}")

    def cond_body(toks):
        cond = F.lit(True)
        for name, kind in _GOPHER_RULES:
            if name not in bounds:
                continue
            metric = _METRIC_EXPRS[_GOPHER_METRIC[name]](toks)
            limit = F.lit(float(bounds[name]))
            cond = cond & (metric >= limit if kind == "lower" else metric <= limit)
        return cond

    df = ensure_parallelism(df)
    return df.filter(let_(tokens(F.col(text_col)), cond_body))


@register_lens("repetition_stats")
def repetition_stats_lens(arguments: Mapping[str, Any]) -> Lens:
    text_col = str(require_arg(arguments, "column", "repetition_stats"))
    prefix = str(arguments.get("prefix", ""))
    return Lens("repetition_stats", arguments,
                lambda df: repetition_stats(df, text_col, prefix))


@register_lens("quality_filter")
def quality_filter_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column, plus any of min_tokens/max_tokens/
    min_mean_word_len/max_mean_word_len/min_unique_ratio/
    max_top_token_frac/max_top_bigram_frac."""
    text_col = str(require_arg(arguments, "column", "quality_filter"))
    bounds = {k: float(v) for k, v in arguments.items()
              if k in _GOPHER_METRIC}
    return Lens("quality_filter", arguments,
                lambda df: quality_filter(df, text_col, bounds))


def unigram_logprob(df: DataFrame, id_col: str, text_col: str, *,
                    out: str = "mean_logprob", k: float = 0.5) -> DataFrame:
    """Per-document mean surprisal −log₂ p(token) under the corpus' own
    add-k-smoothed unigram LM — the engine-native stand-in for the
    KenLM perplexity filter in CCNet-style quality bucketing (very high
    mean → rare-token gibberish/spam; very low → boilerplate of stock
    phrases; the middle is typical prose). Appends ``out`` (rounded to
    6 decimals; 0.0 for token-less docs — kept, not dropped, so the
    operator composes with an explicit downstream filter).

    p(t) = (count(t) + k) / (total_tokens + k·|vocab|), both statistics
    computed from the input corpus itself in the same job.

    Scale shape: one tokenize+explode pass (checkpointed — it feeds the
    count agg AND the scoring join) → token-count groupBy on
    xxhash64(token) (agg; map-side partial, 8-byte keys) → 1-row
    corpus-totals agg cross-joined back (broadcast of two scalars) →
    score join on the hash (AQE handles stop-token skew) → per-doc avg
    (agg on id). Exchanges carry hashes, ids, and doubles — never token
    text. Token identity is the 64-bit hash: at web scale two rare
    tokens may conflate counts with probability ~n²/2⁶⁴ — harmless for
    a smoothed frequency estimate.
    """
    check_reserved(df, {
        "__c", "__lp_id", "__lp_mean", "__lp_n", "__lp_s", "__lps", "__t0",
        "__th",
    }, "unigram_logprob")
    toks = (
        ensure_parallelism(df, by=[id_col])
        .select(F.col(id_col).alias("__lp_id"),
                F.explode(tokens(F.col(text_col))).alias("__t0"))
        .select("__lp_id", F.xxhash64("__t0").alias("__th"))
        .localCheckpoint(eager=False)
    )
    counts = toks.groupBy("__th").agg(F.count(F.lit(1)).alias("__c"))
    # The two corpus scalars come back as LITERALS (a bounded 1-row
    # collect — the same job the broadcast(totals) form ran anyway,
    # and it materializes the token checkpoint): wrapping the counts
    # agg in a crossJoin-projection hid its runtime stats, and the
    # scoring join below then mis-planned as a broadcast of the
    # CORPUS-TOKEN side (measured +35% on this query in r8). As a pure
    # projection of the counts aggregate, the join plans off real AQE
    # sizes, exactly like the pre-r8 shape. Same literal op sequence →
    # identical doubles → identical digest.
    tot = counts.agg(F.sum("__c"), F.count(F.lit(1))).collect()[0]
    total_n, vocab_n = int(tot[0] or 0), int(tot[1] or 0)
    lp = -F.log2((F.col("__c") + F.lit(float(k)))
                 / (F.lit(total_n) + F.lit(float(k)) * F.lit(vocab_n)))
    # Order-independent 6dp mean (functions.digest recipe): each
    # surprisal term is quantized to an 11dp scaled long, summed
    # exactly, then rounded to 6dp in integer space — a plain
    # round(avg(lp), 6) is the r6-verdict digest-flip class (fold
    # order differs across engines AND round(x, 6) itself diverges).
    # The scaled term is computed once per DISTINCT gram on the
    # counts table (r8: it is a pure function of (__c, totals), and
    # evaluating log2+round per corpus TOKEN in the agg below was the
    # r7 digest-hardening bench cost) — identical doubles, identical
    # scaled longs, identical sums.
    from lens_spark.functions.digest import round6_mean_expr, scaled_term

    surprisal = counts.select("__th", scaled_term(lp).alias("__lps"))
    per_doc = (
        toks.join(surprisal, "__th")
        .groupBy("__lp_id")
        .agg(F.sum("__lps").alias("__lp_s"),
             F.count(F.lit(1)).alias("__lp_n"))
        .select("__lp_id",
                F.expr(round6_mean_expr("__lp_s", "__lp_n"))
                .alias("__lp_mean"))
    )
    joined = df.join(per_doc, df[id_col] == per_doc["__lp_id"], "left")
    return joined.withColumn(
        out, F.coalesce(F.col("__lp_mean"), F.lit(0.0))
    ).drop("__lp_id", "__lp_mean")


def score_band(df: DataFrame, score_col: str, id_col: str, *,
               strata: str, bands: int = 3, descending: bool = True,
               out: str = "band") -> DataFrame:
    """CCNet-style head/middle/tail banding of a quality score WITHIN
    each stratum: band 0 holds the top 1/``bands`` of each stratum by
    ``score_col`` (CCNet buckets per-language KenLM perplexity and
    keeps the head; compose with an m6 filter on ``band``).

    band = min(floor(percent_rank · bands), bands−1) over a window
    PARTITIONED by ``strata`` and ordered by (score, id) — the id
    tiebreak makes the banding deterministic across partitionings and
    engines. A partitioned sort, never a global one: stratum size is
    the skew dial (CCNet's strata are languages/snapshots — bounded);
    for a single global band over an unbounded corpus use quantile
    thresholds instead (the dsir_select threshold idiom), which is why
    ``strata`` is required rather than defaulting to a global window.
    """
    from pyspark.sql import Window

    nb = int(bands)
    if nb < 2:
        raise LensError(f"score_band: bands must be >= 2, got {bands}")
    order = (F.col(score_col).desc() if descending
             else F.col(score_col).asc())
    w = Window.partitionBy(strata).orderBy(order, F.col(id_col).asc())
    pr = F.percent_rank().over(w)
    return df.withColumn(
        out,
        F.least(F.floor(pr * nb), F.lit(nb - 1)).cast("int"))


@register_lens("score_band")
def score_band_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column (score), id, strata, bands (3), descending
    (true), out ("band"). Inverse drops the appended column."""
    score_col = str(require_arg(arguments, "column", "score_band"))
    id_col = str(require_arg(arguments, "id", "score_band"))
    strata = str(require_arg(arguments, "strata", "score_band"))
    out = str(arguments.get("out", "band"))
    return Lens(
        "score_band", arguments,
        lambda df: score_band(df, score_col, id_col, strata=strata,
                              bands=int(arguments.get("bands", 3)),
                              descending=bool(arguments.get("descending",
                                                            True)),
                              out=out),
        lambda df: df.drop(out))


def bigram_logprob(df: DataFrame, id_col: str, text_col: str, *,
                   out: str = "mean_bigram_logprob",
                   k: float = 0.5) -> DataFrame:
    """Per-document mean conditional surprisal −log₂ p(token | prev)
    under the corpus' own add-k-smoothed bigram LM — one rung up from
    ``unigram_logprob`` toward the KenLM filter: catches shuffled-
    word-salad that unigram statistics score as normal (every word
    common, every transition rare). p(t|prev) = (c(prev,t) + k) /
    (c(prev,·) + k·|V|), all statistics from the input corpus in the
    same job; |V| counts distinct following-tokens. Docs with < 2
    tokens score 0.0 and keep their row.

    Scale shape: one positional-bigram explode pass (checkpointed — it
    feeds the pair-count agg, the context-count agg, and the scoring
    join) → two map-side-combined groupBys on 8-byte hashes → score
    joins on (prev, tok) and prev (AQE splits stop-bigram skew) →
    per-doc avg. Exchanges carry hashes, ids, and doubles only.
    """
    check_reserved(df, {
        "__bg", "__bl_id", "__bl_mean", "__bl_n", "__bl_s", "__bl_tk",
        "__bls", "__c1", "__c2", "__p", "__t",
    }, "bigram_logprob")
    toks = tokens(F.col(text_col))
    pairs = (
        ensure_parallelism(df, by=[id_col])
        .select(F.col(id_col).alias("__bl_id"), toks.alias("__bl_tk"))
        .filter(F.size("__bl_tk") >= 2)
        .select("__bl_id",
                F.explode(F.expr(
                    "transform(sequence(2, size(__bl_tk)), i -> "
                    "struct(xxhash64(element_at(__bl_tk, i - 1)) AS p, "
                    "xxhash64(element_at(__bl_tk, i)) AS t))")).alias("__bg"))
        .select("__bl_id", F.col("__bg.p").alias("__p"),
                F.col("__bg.t").alias("__t"))
        .localCheckpoint(eager=False)
    )
    c2 = pairs.groupBy("__p", "__t").agg(F.count(F.lit(1)).alias("__c2"))
    c1 = pairs.groupBy("__p").agg(F.count(F.lit(1)).alias("__c1"))
    # |V| as a LITERAL (bounded 1-row collect; materializes the pair
    # checkpoint) — see unigram_logprob: the crossJoin-projection form
    # hid the LM table's stats from the scoring join's planner.
    vocab_n = int(pairs.agg(F.count_distinct("__t")).collect()[0][0] or 0)
    lp = -F.log2((F.col("__c2") + F.lit(float(k)))
                 / (F.col("__c1") + F.lit(float(k)) * F.lit(vocab_n)))
    # Same order-independent 6dp-mean digest as unigram_logprob
    # (functions.digest recipe — see there for the rationale), with
    # the r8 once-per-distinct-bigram scaled-term precompute: the LM
    # table below is |distinct bigrams| rows, the per-doc agg joins at
    # corpus-bigram scale and sums bare longs.
    from lens_spark.functions.digest import round6_mean_expr, scaled_term

    lm = (c2.join(c1, "__p")
          .select("__p", "__t", scaled_term(lp).alias("__bls")))
    per_doc = (
        pairs.join(lm, ["__p", "__t"])
        .groupBy("__bl_id")
        .agg(F.sum("__bls").alias("__bl_s"),
             F.count(F.lit(1)).alias("__bl_n"))
        .select("__bl_id",
                F.expr(round6_mean_expr("__bl_s", "__bl_n"))
                .alias("__bl_mean"))
    )
    joined = df.join(per_doc, df[id_col] == per_doc["__bl_id"], "left")
    return joined.withColumn(
        out, F.coalesce(F.col("__bl_mean"), F.lit(0.0))
    ).drop("__bl_id", "__bl_mean")


@register_lens("bigram_logprob")
def bigram_logprob_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), out ("mean_bigram_logprob"),
    k (0.5 smoothing). Inverse drops the appended column."""
    id_col = str(require_arg(arguments, "id", "bigram_logprob"))
    text_col = str(require_arg(arguments, "column", "bigram_logprob"))
    out = str(arguments.get("out", "mean_bigram_logprob"))
    return Lens(
        "bigram_logprob", arguments,
        lambda df: bigram_logprob(df, id_col, text_col, out=out,
                                  k=float(arguments.get("k", 0.5))),
        lambda df: df.drop(out))


@register_lens("unigram_logprob")
def unigram_logprob_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), out ("mean_logprob"), k (0.5
    smoothing). Inverse drops the appended column."""
    id_col = str(require_arg(arguments, "id", "unigram_logprob"))
    text_col = str(require_arg(arguments, "column", "unigram_logprob"))
    out = str(arguments.get("out", "mean_logprob"))
    return Lens(
        "unigram_logprob", arguments,
        lambda df: unigram_logprob(df, id_col, text_col, out=out,
                                   k=float(arguments.get("k", 0.5))),
        lambda df: df.drop(out))


def hash_embedding(df: DataFrame, id_col: str, text_col: str, *,
                   dim: int = 16, out: str = "embedding",
                   normalize: bool = True) -> DataFrame:
    """Deterministic hashed bag-of-words embedding (the
    feature-hashing trick): token t adds sign(t) ∈ {+1, −1} to bucket
    md5(t) mod ``dim`` (sign from the next md5 hex digit — the signed
    variant keeps inner products unbiased), optionally L2-normalized.
    Bridges the text surface to the vector surface: output feeds
    similarity_topk / kmeans / semdedup / embedding near-dup straight
    from raw text, no external model. md5-derived buckets are
    engine-portable, so the DuckDB oracle reproduces vectors
    bit-for-bit.

    Scale shape (the explode+agg form, NOT a per-row O(dim·n)
    expression): explode tokens → (id, bucket, sign) — the exchange
    carries ids + two small ints — groupBy (id, bucket) sum (map-side
    partial), per-doc map assembly, one dense transform. Token-less
    docs keep their row with the zero vector.
    """
    check_reserved(df, {
        "__he_b", "__he_id", "__he_m", "__he_raw", "__he_s", "__he_t",
        "__he_v", "__he_vec",
    }, "hash_embedding")
    bucket = (F.conv(F.substring(F.md5(F.col("__he_t")), 1, 8), 16, 10)
              .cast("bigint") % F.lit(int(dim)))
    sign = F.when(F.substring(F.md5(F.col("__he_t")), 9, 1) < "8",
                  F.lit(1.0)).otherwise(F.lit(-1.0))
    pairs = (
        ensure_parallelism(df, by=[id_col])
        .select(F.col(id_col).alias("__he_id"),
                F.explode(tokens(F.col(text_col))).alias("__he_t"))
        .select("__he_id", bucket.alias("__he_b"), sign.alias("__he_s"))
    )
    sums = (pairs.groupBy("__he_id", "__he_b")
            .agg(F.sum("__he_s").alias("__he_v")))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(int(dim) - 1)),
        lambda i: F.coalesce(F.element_at(F.col("__he_m"),
                                          i.cast("bigint")), F.lit(0.0)))
    vecs = (
        sums.groupBy("__he_id")
        .agg(F.map_from_entries(
            F.collect_list(F.struct("__he_b", "__he_v"))).alias("__he_m"))
        .select("__he_id", dense.alias("__he_raw"))
    )
    if normalize:
        norm = F.sqrt(F.aggregate(F.col("__he_raw"), F.lit(0.0),
                                  lambda a, x: a + x * x))
        # round6 integer path (functions.digest, r6 verdict #2): a
        # plain round(x, 6) diverges between engines' decimal-rounding
        # algorithms even on identical doubles; round-to-integer does
        # not. Inputs here ARE identical (integer sums -> exact norm).
        vec = F.when(
            norm > 0,
            F.transform(F.col("__he_raw"),
                        lambda x: F.round(x / norm * F.lit(1e6))
                        .cast("bigint").cast("double") / F.lit(1e6))
        ).otherwise(F.col("__he_raw"))
    else:
        vec = F.transform(F.col("__he_raw"), lambda x: F.round(x, 6))
    vecs = vecs.select("__he_id", vec.alias("__he_vec"))
    joined = df.join(vecs, df[id_col] == vecs["__he_id"], "left")
    zeros = F.array_repeat(F.lit(0.0), int(dim))
    return joined.withColumn(
        out, F.coalesce(F.col("__he_vec"), zeros)
    ).drop("__he_id", "__he_vec")


def classifier_score(df: DataFrame, id_col: str, text_col: str, *,
                     weights: "Sequence[float]", bias: float = 0.0,
                     out: str = "clf_score") -> DataFrame:
    """FastText-style linear text-classifier INFERENCE over hashed
    bag-of-words features: token t lands in bucket md5(t) mod
    len(weights) (the ``hash_embedding`` bucket scheme), and the
    document scores sigmoid(bias + mean_t w[bucket(t)]) — the shape of
    the quality/safety classifiers web-pipeline curation actually runs
    at scale (fastText: averaged features → linear → sigmoid).
    Training happens OFFLINE (fasttext/sklearn on the same hashed
    features; the weights vector is the interchange format) — this
    operator is the 100 TB scoring pass.

    Scale shape: explode tokens → md5 bucket (8-byte exchange) →
    broadcast join against the bucket→weight table (driver-held, one
    double per bucket) → per-doc mean (map-side partial agg) →
    sigmoid. Weights are rounded to 6dp and summed in decimal(38,12),
    so the mean is partition-order-independent (the DSIR fixed-point
    lesson). Token-less docs score sigmoid(bias) and keep their row.
    """
    check_reserved(df, {
        "__clf_b", "__clf_id", "__clf_t", "__clf_z",
    }, "classifier_score")
    spark = df.sparkSession
    nb = len(weights)
    if nb < 1:
        raise LensError("classifier_score: weights must be non-empty")
    wdf = spark.createDataFrame(
        [(i, round(float(w), 6)) for i, w in enumerate(weights)],
        "__clf_b long, __clf_w double")
    bucket = (F.conv(F.substring(F.md5(F.col("__clf_t")), 1, 8), 16, 10)
              .cast("bigint") % F.lit(nb))
    toks = (
        ensure_parallelism(df, by=[id_col])
        .select(F.col(id_col).alias("__clf_id"),
                F.explode(tokens(F.col(text_col))).alias("__clf_t"))
        .select("__clf_id", bucket.alias("__clf_b"))
    )
    z = (F.sum(F.col("__clf_w").cast("decimal(38,12)")).cast("double")
         / F.count(F.lit(1)))
    scored = (toks.join(F.broadcast(wdf), "__clf_b")
              .groupBy("__clf_id").agg(z.alias("__clf_z")))
    joined = df.join(scored, df[id_col] == scored["__clf_id"], "left")
    logit = F.lit(float(bias)) + F.coalesce(F.col("__clf_z"), F.lit(0.0))
    return joined.withColumn(
        out, F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
    ).drop("__clf_id", "__clf_z")


def classifier_fit(df: DataFrame, label_col: str, text_col: str, *,
                   num_buckets: int = 1024, iters: int = 20,
                   lr: float = 1.0, l2: float = 0.0) -> dict:
    """Train the linear model :func:`classifier_score` serves:
    full-batch logistic regression over the SAME hashed bag-of-words
    features (md5 bucket fold — fit and score can never disagree on
    featurization). Returns ``{"weights": [...], "bias": float}``, the
    interchange format ``classifier_score`` consumes — the in-engine
    counterpart of training offline in fasttext/sklearn.

    Scale shape (the ``kmeans_fit`` recipe): per-doc bucket arrays are
    extracted once (narrow expression, pinned DISK_ONLY); each
    iteration is ONE mapInPandas pass computing per-partition gradient
    partials — the exchange carries ≤ num_buckets+2 (bucket, partial)
    doubles per partition, never rows — and the driver holds the
    num_buckets-sized model, closed over into the next pass. Full-
    batch GD is deterministic up to partition-order float addition
    (rows-only territory, same note as kmeans_fit).
    """
    check_reserved(df, {"__b", "__g", "__y"}, "classifier_fit")
    import numpy as np

    nb, its = int(num_buckets), int(iters)
    if nb < 1 or its < 1:
        raise LensError("classifier_fit: num_buckets and iters must be >= 1")
    bucket_of = lambda t: (F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
                           .cast("bigint") % F.lit(nb))
    # DISK_ONLY pin for the `iters` passes, not localCheckpoint (r11,
    # SCALE.md "Round-11 additions"): a corpus-sized feature projection
    # must not occupy executor storage memory at 100 TB.
    from pyspark import StorageLevel

    base = (
        ensure_parallelism(df)
        .select(F.col(label_col).cast("double").alias("__y"),
                F.transform(tokens(F.col(text_col)), bucket_of)
                .alias("__b"))
        .persist(StorageLevel.DISK_ONLY)
    )
    try:
        w = np.zeros(nb)
        b = 0.0
        lrf, l2f = float(lr), float(l2)
        for _ in range(its):
            wb, bb = w, b  # bind current model into the task closure

            def grads(batches):
                # Fully vectorized Arrow-batch kernel (r6 verdict #6 — the
                # previous version looped rows in Python). Flatten every
                # row's bucket list into one (row_id, bucket) pair array;
                # logits are a wb-gather + per-row segment sum (bincount
                # over row ids), the gradient a per-bucket segment sum of
                # err/len — two bincounts per batch, zero Python-level
                # row iteration.
                gw = np.zeros(nb)
                gb = 0.0
                n = 0
                for pdf in batches:
                    y = pdf["__y"].to_numpy(dtype=np.float64)
                    rows = pdf["__b"].to_numpy()
                    nrows = len(y)
                    if nrows == 0:
                        continue
                    lens = np.fromiter((len(r) for r in rows),
                                       dtype=np.int64, count=nrows)
                    flat = (np.concatenate(
                        [np.asarray(r, dtype=np.int64) for r in rows])
                        if lens.sum() else np.empty(0, dtype=np.int64))
                    row_ids = np.repeat(np.arange(nrows), lens)
                    safe_len = np.maximum(lens, 1).astype(np.float64)
                    z = bb + np.bincount(
                        row_ids, weights=wb[flat],
                        minlength=nrows) / safe_len
                    err = 1.0 / (1.0 + np.exp(-z)) - y
                    gw += np.bincount(
                        flat, weights=(err / safe_len)[row_ids],
                        minlength=nb)
                    gb += float(err.sum())
                    n += nrows
                if n == 0:
                    return
                out = pd.DataFrame({
                    "b": np.concatenate([np.nonzero(gw)[0], [-1, -2]]),
                    "g": np.concatenate([gw[np.nonzero(gw)[0]], [gb, float(n)]]),
                })
                yield out

            partials = (base.mapInPandas(grads, "b long, g double")
                        .groupBy("b").agg(F.sum("g").alias("__g")).collect())
            gw = np.zeros(nb)
            gb = 0.0
            n = 0.0
            for r in partials:
                if r["b"] == -2:
                    n = r["__g"]
                elif r["b"] == -1:
                    gb = r["__g"]
                else:
                    gw[r["b"]] = r["__g"]
            if n == 0:
                raise LensError("classifier_fit: empty training corpus")
            w = w - lrf * (gw / n + l2f * w)
            b = b - lrf * (gb / n)
    finally:
        # release the corpus-sized pin even on a failed fit (r11 review)
        base.unpersist()
    return {"weights": [round(float(x), 6) for x in w],
            "bias": round(float(b), 6)}


def classifier_fit_multinomial(df: DataFrame, label_col: str,
                               text_col: str, *,
                               labels: "list[str] | None" = None,
                               num_buckets: int = 1024, iters: int = 20,
                               lr: float = 1.0,
                               l2: float = 0.0) -> "dict[str, dict]":
    """Softmax (multinomial logistic) regression over the SAME hashed
    bag-of-words featurization as :func:`classifier_fit` — ALL L
    classes in one model, ONE corpus pass per iteration.

    This is the fit-side I/O upgrade over one-vs-rest (r10 verdict
    #6): ``save_lang_id``'s OVR loop costs L × ``iters`` corpus passes
    (at L=64 languages, 64× the scan I/O of this trainer at 100 TB);
    here each iteration is a single mapInPandas pass whose exchange
    carries ≤ num_buckets × L (bucket, class, partial) doubles per
    partition — gradient partials for the whole weight matrix, never
    rows. The driver holds the (num_buckets × L) model and closes it
    over into the next pass — the ``kmeans_fit`` /
    ``classifier_fit`` recipe widened by one axis.

    Returns ``{label: {"weights": [...], "bias": float}}`` — the same
    per-class interchange shape as L separate ``classifier_fit`` runs,
    so ``lang_id_score`` and the ``lang_classifier`` artifact envelope
    serve either trainer unchanged. Softmax and OVR-sigmoid optimize
    different losses, so weights differ numerically; prediction
    quality is equivalence-tested (test_models.py pins both ≥0.95 on
    the fixture corpus and high mutual agreement). Full-batch GD,
    deterministic up to partition-order float addition (rows-only
    territory, same note as ``classifier_fit``).
    """
    check_reserved(df, {"__b", "__g", "__y"}, "classifier_fit_multinomial")
    import numpy as np

    nb, its = int(num_buckets), int(iters)
    if nb < 1 or its < 1:
        raise LensError(
            "classifier_fit_multinomial: num_buckets and iters must be >= 1")
    if labels is None:
        labels = sorted(
            r[0] for r in df.select(label_col).distinct().collect()
            if r[0] is not None)
    labels = [str(lg) for lg in labels]
    if len(labels) < 2:
        raise LensError(
            f"classifier_fit_multinomial: needs >= 2 classes, got {labels}")
    ll = len(labels)
    idx = {lg: i for i, lg in enumerate(labels)}
    y_expr = F.col(label_col).cast("string")
    y_idx = F.lit(None).cast("int")
    for lg, i in idx.items():
        y_idx = F.when(y_expr == F.lit(lg), F.lit(i)).otherwise(y_idx)
    bucket_of = lambda t: (F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
                           .cast("bigint") % F.lit(nb))
    from pyspark import StorageLevel

    base = (
        ensure_parallelism(df)
        .filter(y_idx.isNotNull())  # unlisted labels don't train
        .select(y_idx.alias("__y"),
                F.transform(tokens(F.col(text_col)), bucket_of)
                .alias("__b"))
        .persist(StorageLevel.DISK_ONLY)  # read `iters` times
    )
    try:
        w = np.zeros((nb, ll))
        b = np.zeros(ll)
        lrf, l2f = float(lr), float(l2)
        for _ in range(its):
            wb, bb = w, b  # bind current model into the task closure

            def grads(batches):
                # One vectorized kernel for the whole class axis: logits
                # are a (nnz, L) gather accumulated per row, softmax rows,
                # and the gradient one np.add.at scatter back onto the
                # (nb, L) matrix — no Python-level row OR class loop.
                gw = np.zeros((nb, ll))
                gb = np.zeros(ll)
                n = 0
                for pdf in batches:
                    y = pdf["__y"].to_numpy(dtype=np.int64)
                    rows = pdf["__b"].to_numpy()
                    nrows = len(y)
                    if nrows == 0:
                        continue
                    lens = np.fromiter((len(r) for r in rows),
                                       dtype=np.int64, count=nrows)
                    flat = (np.concatenate(
                        [np.asarray(r, dtype=np.int64) for r in rows])
                        if lens.sum() else np.empty(0, dtype=np.int64))
                    row_ids = np.repeat(np.arange(nrows), lens)
                    safe_len = np.maximum(lens, 1).astype(np.float64)
                    z = np.tile(bb, (nrows, 1))
                    np.add.at(z, row_ids,
                              wb[flat] / safe_len[row_ids, None])
                    z -= z.max(axis=1, keepdims=True)  # stable softmax
                    p = np.exp(z)
                    p /= p.sum(axis=1, keepdims=True)
                    p[np.arange(nrows), y] -= 1.0  # E = P - onehot(y)
                    np.add.at(gw, flat, p[row_ids] / safe_len[row_ids, None])
                    gb += p.sum(axis=0)
                    n += nrows
                if n == 0:
                    return
                nzb, nzl = np.nonzero(gw)
                out = pd.DataFrame({
                    "b": np.concatenate([nzb, np.full(ll, -1), [-2]]),
                    "l": np.concatenate([nzl, np.arange(ll), [0]]),
                    "g": np.concatenate([gw[nzb, nzl], gb, [float(n)]]),
                })
                yield out

            partials = (base.mapInPandas(grads, "b long, l int, g double")
                        .groupBy("b", "l").agg(F.sum("g").alias("__g"))
                        .collect())
            gw = np.zeros((nb, ll))
            gb = np.zeros(ll)
            n = 0.0
            for r in partials:
                if r["b"] == -2:
                    n = r["__g"]
                elif r["b"] == -1:
                    gb[r["l"]] = r["__g"]
                else:
                    gw[r["b"], r["l"]] = r["__g"]
            if n == 0:
                raise LensError(
                    "classifier_fit_multinomial: empty training corpus")
            w = w - lrf * (gw / n + l2f * w)
            b = b - lrf * (gb / n)
    finally:
        # release the corpus-sized pin even on a failed fit (r11 review)
        base.unpersist()
    return {lg: {"weights": [round(float(x), 6) for x in w[:, i]],
                 "bias": round(float(b[i]), 6)}
            for lg, i in idx.items()}


@register_lens("classifier_score")
def classifier_score_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), weights (list of doubles), bias
    (0.0), out ("clf_score"). OR apply a registry-persisted model:
    model_id (lens1b-…) + registry (root path) loads
    {weights, bias} saved by lens_spark.models.save_classifier (an
    explicit bias argument overrides the saved one). Inverse drops
    the appended column."""
    id_col = str(require_arg(arguments, "id", "classifier_score"))
    text_col = str(require_arg(arguments, "column", "classifier_score"))
    out = str(arguments.get("out", "clf_score"))
    model_id = arguments.get("model_id")
    if model_id is not None:
        from lens_spark.models import load_model

        reg = require_arg(arguments, "registry", "classifier_score")
        model = load_model(reg, str(model_id),
                           expect_kind="linear_classifier")
        weights = [float(w) for w in model["weights"]]
        bias = float(arguments.get("bias", model.get("bias", 0.0)))
    else:
        weights = [float(w) for w in
                   require_arg(arguments, "weights", "classifier_score")]
        bias = float(arguments.get("bias", 0.0))
    return Lens(
        "classifier_score", arguments,
        lambda df: classifier_score(
            df, id_col, text_col, weights=weights, bias=bias, out=out),
        lambda df: df.drop(out))


def lang_id_score(df: DataFrame, id_col: str, text_col: str,
                  model: Mapping[str, Any], *, out: str = "pred_lang",
                  score_out: "str | None" = None) -> DataFrame:
    """Fitted language identification: score EVERY language of a
    ``lang_classifier`` model (see ``lens_spark.models.save_lang_id``)
    in ONE corpus pass and append the argmax label — the model-path
    upgrade of the marker-heuristic ``lang_id`` (r9 verdict #5).

    Scale shape (the whole point vs L separate ``classifier_score``
    passes): the broadcast weight table carries one column PER
    LANGUAGE (bucket, w_en, w_de, …) — num_buckets rows × L doubles,
    still KB/MB-scale — so tokens explode once, the md5 bucket fold
    happens once, the broadcast hash join happens once, and the
    per-doc aggregate computes all L decimal fixed-point means
    map-side-combined in the same shuffle. The argmax is a narrow
    ``greatest`` + when-chain over L columns; ties break
    alphabetically (the marker heuristic's contract). Token-less docs
    argmax the biases alone and keep their row.
    """
    check_reserved(df, {"__li_b", "__li_id", "__li_t"}, "lang_id_score")
    langs = [str(lg) for lg in model["langs"]]
    if not langs:
        raise LensError("lang_id: model has no languages")
    if sorted(set(langs)) != sorted(langs):
        raise LensError("lang_id: duplicate languages in model")
    models = model["models"]
    nb = int(model["num_buckets"])
    for lg in langs:
        if len(models[lg]["weights"]) != nb:
            raise LensError(
                f"lang_id: model for {lg!r} has "
                f"{len(models[lg]['weights'])} weights, envelope says "
                f"num_buckets={nb}")
    spark = df.sparkSession
    ordered = sorted(langs)
    wcols = ", ".join(f"`__li_w_{lg}` double" for lg in ordered)
    wdf = spark.createDataFrame(
        [(i, *[round(float(models[lg]["weights"][i]), 6)
               for lg in ordered]) for i in range(nb)],
        f"__li_b long, {wcols}")
    bucket = (F.conv(F.substring(F.md5(F.col("__li_t")), 1, 8), 16, 10)
              .cast("bigint") % F.lit(nb))
    toks = (
        ensure_parallelism(df, by=[id_col])
        .select(F.col(id_col).alias("__li_id"),
                F.explode(tokens(F.col(text_col))).alias("__li_t"))
        .select("__li_id", bucket.alias("__li_b"))
    )
    mean_of = lambda lg: (  # noqa: E731 — decimal fixed-point mean
        F.sum(F.col(f"__li_w_{lg}").cast("decimal(38,12)")).cast("double")
        / F.count(F.lit(1)))
    scored = (toks.join(F.broadcast(wdf), "__li_b")
              .groupBy("__li_id")
              .agg(*[mean_of(lg).alias(f"__li_z_{lg}") for lg in ordered]))
    joined = df.join(scored, df[id_col] == scored["__li_id"], "left")
    logits = {lg: F.lit(float(models[lg]["bias"]))
              + F.coalesce(F.col(f"__li_z_{lg}"), F.lit(0.0))
              for lg in ordered}
    best = (F.greatest(*logits.values()) if len(ordered) > 1
            else logits[ordered[0]])
    pred = F.lit(ordered[-1])
    for lg in reversed(ordered[:-1]):
        pred = F.when(logits[lg] == best, F.lit(lg)).otherwise(pred)
    cols = [pred.alias(out)]
    if score_out:
        cols.append(F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-best)), 6)
                    .alias(score_out))
    return joined.select(*df.columns, *cols)


@register_lens("hash_embedding")
def hash_embedding_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), dim (16), out ("embedding"),
    normalize (true). Inverse drops the embedding column."""
    id_col = str(require_arg(arguments, "id", "hash_embedding"))
    text_col = str(require_arg(arguments, "column", "hash_embedding"))
    out = str(arguments.get("out", "embedding"))
    return Lens(
        "hash_embedding", arguments,
        lambda df: hash_embedding(
            df, id_col, text_col, dim=int(arguments.get("dim", 16)),
            out=out, normalize=bool(arguments.get("normalize", True))),
        lambda df: df.drop(out))


def pii_redact(df: DataFrame, text_col: str, *, out: str | None = None,
               counts: bool = False) -> DataFrame:
    """Redact PII spans in ``text_col`` (email/SSN/phone/IPv4 →
    category tokens); ``counts`` appends per-category span counts."""
    from lens_spark.functions.text import pii_counts, redact_pii

    t = F.col(text_col)
    res = df
    if counts:
        for name, col in pii_counts(t).items():
            res = res.withColumn(f"n_{name}", col)
    return res.withColumn(out or text_col, redact_pii(t))


@register_lens("pii_redact")
def pii_redact_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column, out (default in-place), counts (false)."""
    text_col = str(require_arg(arguments, "column", "pii_redact"))
    out = arguments.get("out")
    counts = bool(arguments.get("counts", False))
    return Lens("pii_redact", arguments,
                lambda df: pii_redact(df, text_col,
                                      out=str(out) if out else None,
                                      counts=counts))


def pseudonymize(df: DataFrame, columns: "Sequence[str]", *,
                 salt: str, length: int = 16,
                 prefix: str = "") -> DataFrame:
    """Replace identifier columns with salted stable pseudonyms —
    the de-identification step a corpus takes before user/session ids
    may appear in training data or be shared with annotators. Each
    value maps to ``prefix + substr(md5(salt|column|value), length)``:

    - STABLE: the same value always maps to the same pseudonym, so
      joins/groupBys on the column keep working (referential
      consistency) and re-runs are byte-identical;
    - UNLINKABLE without the salt: the salt never appears in the
      output, and each column uses its own keyspace (the same user id
      in two columns yields two different pseudonyms, preventing
      cross-column linkage);
    - NOT invertible (the lens refuses ``inverse`` loudly rather than
      pretending).

    Narrow per-row expressions — zero exchanges at any scale. NULLs
    stay NULL (a pseudonym for "absent" would invent linkage).
    """
    if not 4 <= int(length) <= 32:
        raise LensError("pseudonymize: length must be in [4, 32]")
    if not salt:
        raise LensError("pseudonymize: a non-empty salt is required "
                        "(an unsalted hash is a dictionary attack away "
                        "from re-identification)")
    res = df
    for c in columns:
        c = str(c)
        if c not in df.columns:
            raise LensError(f"pseudonymize: no column '{c}'")
        pseudo = F.concat(
            F.lit(prefix),
            F.substring(F.md5(F.concat_ws(
                "|", F.lit(salt), F.lit(c), F.col(c).cast("string"))),
                1, int(length)))
        res = res.withColumn(
            c, F.when(F.col(c).isNotNull(), pseudo))
    return res


@register_lens("pseudonymize")
def pseudonymize_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: columns (list), salt (required), length (16),
    prefix (""). Inverse refuses: pseudonymization is one-way."""
    columns = [str(c) for c in require_arg(arguments, "columns",
                                           "pseudonymize")]
    salt = str(require_arg(arguments, "salt", "pseudonymize"))

    def refuse(df: DataFrame) -> DataFrame:
        raise LensError(
            "pseudonymize is not invertible: the mapping is a salted "
            "one-way hash by design (re-identification would defeat "
            "the de-identification contract)")

    return Lens(
        "pseudonymize", arguments,
        lambda df: pseudonymize(
            df, columns, salt=salt,
            length=int(arguments.get("length", 16)),
            prefix=str(arguments.get("prefix", ""))),
        refuse)


def segment_filter(df: DataFrame, id_col: str, text_col: str, *,
                   delimiter: str = "\n", min_tokens: int = 0,
                   max_tokens: int | None = None,
                   min_alpha_ratio: float | None = None,
                   end_punct: bool = False,
                   out: str | None = None) -> DataFrame:
    """Segment-level cleaning (the C4/FineWeb line rules): split each
    document on ``delimiter``, drop segments failing any configured
    intrinsic rule, reassemble the survivors in original order.
    Complements ``line_dedup`` (corpus-frequency rule) with per-segment
    content rules: token-count window, minimum letter fraction
    (boilerplate/code/ascii-art guard), and C4's terminal-punctuation
    rule (``end_punct`` keeps only segments ending in . ! ? or a
    closing quote). Docs whose every segment fails stay in the output
    as "" (row count preserved).

    Scale shape: posexplode segments (narrow) → per-segment metric
    projection (narrow Catalyst expressions) → per-doc ordered
    reassembly (ONE agg) → join back on id. The only exchange carrying
    text is the reassembly agg — the same contract as line_dedup.
    """
    check_reserved(df, {"__pos", "__sg_id"}, "segment_filter")
    import re as _re

    out = out or text_col
    segs = df.select(
        F.col(id_col).alias("__sg_id"),
        F.posexplode(F.split(F.col(text_col), _re.escape(delimiter), -1))
        .alias("__pos", "__seg"),
    )
    keep = F.lit(True)
    n_tok = F.size(F.filter(F.split(F.col("__seg"), r"\s+"),
                            lambda x: x != ""))
    if min_tokens:
        keep = keep & (n_tok >= int(min_tokens))
    if max_tokens is not None:
        keep = keep & (n_tok <= int(max_tokens))
    if min_alpha_ratio is not None:
        n_alpha = F.length(F.regexp_replace(F.col("__seg"),
                                            "[^A-Za-z]", ""))
        keep = keep & (F.length("__seg") > 0) \
            & (n_alpha / F.length("__seg") >= float(min_alpha_ratio))
    if end_punct:
        keep = keep & F.col("__seg").rlike('[.!?"]\\s*$')
    from lens_spark.operators.base import reassemble_by_position

    return reassemble_by_position(df, id_col, segs.filter(keep),
                                  key="__sg_id", pos="__pos", seg="__seg",
                                  delimiter=delimiter, out=out)


def normalize_text(df: DataFrame, text_col: str, *, form: str = "NFC",
                   lowercase: bool = False,
                   collapse_whitespace: bool = True,
                   strip_control: bool = True,
                   out: str | None = None) -> DataFrame:
    """Text canonicalization — the step BEFORE any hashing/dedup op so
    byte-different renderings of the same text (decomposed accents,
    NBSP runs, stray control chars) collapse onto one form: Unicode
    normalization (NFC/NFKC/NFD/NFKD), optional lowercasing, control
    character removal, and whitespace collapsing (any run of Unicode
    whitespace → one space, trimmed).

    Narrow op. The regex steps are JVM-side Catalyst expressions; the
    Unicode normalization itself has no Spark SQL builtin, so it runs
    as an Arrow-batched vectorized pandas kernel
    (``Series.str.normalize`` — C-loop per batch, not per-row Python;
    the documented UDF exception class, like the ANN bucket kernel).
    Both engines implement the same Unicode standard, so the DuckDB
    oracle (``nfc_normalize``) reproduces the output byte-for-byte.
    """
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise LensError(f"normalize_text: unknown form {form!r}")

    @pandas_udf("string")
    def _unorm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    c = _unorm(F.col(text_col))
    if strip_control:
        c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    if collapse_whitespace:
        # \s alone misses the Unicode whitespace web text is full of —
        # NEL, NBSP, ogham/mongolian spaces, the en/em-space block,
        # line/paragraph separators, narrow NBSP, math space,
        # ideographic space — include them explicitly (Java \uXXXX
        # escapes; the DuckDB oracle mirrors with RE2 \x{...})
        c = F.trim(F.regexp_replace(
            c, "[\\s\\u0085\\u00A0\\u1680\\u180E"
               "\\u2000-\\u200A\\u2028\\u2029\\u202F"
               "\\u205F\\u3000]+",
            " "))
    if lowercase:
        c = F.lower(c)
    return df.withColumn(out or text_col, c)


@register_lens("normalize_text")
def normalize_text_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column, form ("NFC"), lowercase (false),
    collapse_whitespace (true), strip_control (true),
    out (default in-place)."""
    text_col = str(require_arg(arguments, "column", "normalize_text"))
    out = arguments.get("out")
    return Lens("normalize_text", arguments, lambda df: normalize_text(
        df, text_col,
        form=str(arguments.get("form", "NFC")),
        lowercase=bool(arguments.get("lowercase", False)),
        collapse_whitespace=bool(arguments.get("collapse_whitespace", True)),
        strip_control=bool(arguments.get("strip_control", True)),
        out=str(out) if out else None))


@register_lens("segment_filter")
def segment_filter_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), delimiter (newline), min_tokens
    (0), max_tokens, min_alpha_ratio, end_punct (false), out
    (default in-place)."""
    id_col = str(require_arg(arguments, "id", "segment_filter"))
    text_col = str(require_arg(arguments, "column", "segment_filter"))
    mt = arguments.get("max_tokens")
    mar = arguments.get("min_alpha_ratio")
    out = arguments.get("out")
    return Lens("segment_filter", arguments, lambda df: segment_filter(
        df, id_col, text_col,
        delimiter=str(arguments.get("delimiter", "\n")),
        min_tokens=int(arguments.get("min_tokens", 0)),
        max_tokens=int(mt) if mt is not None else None,
        min_alpha_ratio=float(mar) if mar is not None else None,
        end_punct=bool(arguments.get("end_punct", False)),
        out=str(out) if out else None))


def chunk_documents(df: DataFrame, text_col: str, *,
                    size: int, overlap: int = 0,
                    index_out: str = "chunk_index",
                    text_out: str = "chunk_text",
                    tokens_out: str = "chunk_tokens") -> DataFrame:
    """Split each document into fixed token-count windows — the
    context-length packing/pretraining prep step (one doc → N training
    chunks of ≤ ``size`` whitespace tokens, consecutive chunks sharing
    ``overlap`` tokens so no boundary context is lost).

    Chunk i covers tokens [i·stride, i·stride + size) with
    stride = size − overlap; every chunk is non-empty and the last one
    may be short. Chunk text is the tokens re-joined with single
    spaces (original intra-document whitespace is not preserved —
    chunking is a tokenizer-level operation). Token-less documents
    produce no chunks (this op changes cardinality by design, unlike
    the row-preserving rewrite ops). All non-text input columns are
    carried onto every chunk.

    Scale shape: tokenize ONCE into a shared array column, inline-
    explode a ``sequence(0, n_chunks-1)`` (the SCALE.md inline-explode
    lesson: aliasing the generated array in its own Project first
    materializes it per row), then slice + join per chunk — fully
    narrow, zero exchanges at any corpus size. The chunk text is built
    from the one bound token array, never by re-splitting.
    """
    check_reserved(df, {"__ck_toks"}, "chunk_documents")
    size = int(size)
    overlap = int(overlap)
    if size <= 0:
        raise LensError("chunk_documents: size must be > 0")
    if not (0 <= overlap < size):
        raise LensError("chunk_documents: overlap must be in [0, size)")
    stride = size - overlap

    carry = [c for c in df.columns if c != text_col]
    toks = F.col("__ck_toks")
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(F.size(toks) - F.lit(size), F.lit(0))
                 / F.lit(float(stride)))
    ).cast("int")
    start = F.col(index_out) * stride + 1  # F.slice is 1-based
    chunk = F.slice(toks, start, F.lit(size))
    return (
        ensure_parallelism(df)
        # ≥1 token ⟺ any non-whitespace char: the rlike form keeps the
        # pre-explode filter from re-tokenizing every row (Catalyst
        # inlines a size(__ck_toks) predicate through the Project,
        # evaluating the split twice — seen in the PLANS.md audit)
        .filter(F.col(text_col).rlike(r"\S"))
        .withColumn("__ck_toks", tokens(F.col(text_col), lowercase=False))
        .select(*carry, "__ck_toks",
                F.explode(F.sequence(F.lit(0), n_chunks - 1))
                .alias(index_out))
        .withColumn(text_out, F.array_join(chunk, " "))
        .withColumn(tokens_out, F.size(chunk).cast("bigint"))
        .drop("__ck_toks")
    )


@register_lens("chunk_documents")
def chunk_documents_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column (text), size, overlap (0), index_out
    ("chunk_index"), text_out ("chunk_text"), tokens_out
    ("chunk_tokens")."""
    text_col = str(require_arg(arguments, "column", "chunk_documents"))
    size = int(require_arg(arguments, "size", "chunk_documents"))
    return Lens("chunk_documents", arguments, lambda df: chunk_documents(
        df, text_col, size=size,
        overlap=int(arguments.get("overlap", 0)),
        index_out=str(arguments.get("index_out", "chunk_index")),
        text_out=str(arguments.get("text_out", "chunk_text")),
        tokens_out=str(arguments.get("tokens_out", "chunk_tokens"))))


def dedup_segments(df: DataFrame, text_col: str, *,
                   delimiter: str = "\n", out: str | None = None) -> DataFrame:
    """WITHIN-document repeated-segment removal: split on ``delimiter``,
    keep only each segment's FIRST occurrence (original order), rejoin.
    The intra-document member of the dedup family — ``line_dedup``
    removes segments repeated ACROSS documents (corpus frequency);
    this removes the copy-paste stutter inside one document (repeated
    boilerplate paragraphs, duplicated list items) that inflates
    repetition metrics and wastes training tokens.

    Fully narrow — pure array expressions, zero exchanges at any
    corpus size (no per-doc shuffle like the cross-doc rewrites need).
    Keep-first is expressed as ``array_position(segs, s) == i+1``
    (first index of the value equals this index) — O(m²) per doc in
    segment count, fine for the ≤10³ segments real documents have.
    Repeated empty segments (blank-line runs) collapse too, by design.
    """
    import re as _re

    segs = F.split(F.col(text_col), _re.escape(delimiter), -1)
    kept = F.filter(segs, lambda s, i: F.array_position(segs, s) == i + 1)
    return df.withColumn(out or text_col, F.array_join(kept, delimiter))


@register_lens("dedup_segments")
def dedup_segments_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column, delimiter (newline), out (default in-place)."""
    text_col = str(require_arg(arguments, "column", "dedup_segments"))
    out = arguments.get("out")
    return Lens("dedup_segments", arguments, lambda df: dedup_segments(
        df, text_col, delimiter=str(arguments.get("delimiter", "\n")),
        out=str(out) if out else None))


def html_to_text(df: DataFrame, text_col: str, *,
                 out: str | None = None) -> DataFrame:
    """Markup removal for crawled corpora: drop <script>/<style>
    blocks and HTML comments wholesale, strip the remaining tags,
    decode the common named entities (&nbsp; &lt; &gt; &quot; &#39;
    &apos;, with &amp; decoded LAST so &amp;lt; round-trips to the
    literal string "&lt;" rather than double-decoding), and collapse
    the whitespace the removed markup leaves behind.

    This is the regex tier of HTML cleaning (the scale of C4's
    original pipeline), not a DOM parser: malformed nesting degrades
    gracefully to over-stripping, never to a crash. Narrow Catalyst
    regexp chain — JVM-side, codegen'd, zero exchanges; both regex
    dialects (Java here, RE2 in the DuckDB oracle) support the inline
    (?is) flags and non-greedy spans used, so the oracle reproduces
    the output byte-for-byte.
    """
    c = F.col(text_col)
    # Block elements whose CONTENT must go too, then comments, then tags.
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, rep in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                     ("&quot;", '"'), ("&#39;", "'"), ("&apos;", "'"),
                     ("&amp;", "&")):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out or text_col, c)


@register_lens("html_to_text")
def html_to_text_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column, out (default in-place)."""
    text_col = str(require_arg(arguments, "column", "html_to_text"))
    out = arguments.get("out")
    return Lens("html_to_text", arguments,
                lambda df: html_to_text(df, text_col,
                                        out=str(out) if out else None))


def domain_filter(df: DataFrame, url_col: str, domains: list[str], *,
                  mode: str = "block") -> DataFrame:
    """Block (or allow-only) documents by registrable domain — the
    crawl-pipeline blocklist step (spam/adult/SEO-farm domain lists).
    A row matches when its URL's host equals a listed domain OR is a
    subdomain of one (``news.example.com`` matches ``example.com``).
    ``mode="block"`` drops matches; ``mode="allow"`` keeps only them.

    Narrow expression filter — the domain list rides the plan as an
    array literal (broadcast with the task binary; fine to ~10⁵
    entries, beyond that join a blocklist TABLE instead)."""
    from lens_spark.functions.text import url_domain

    if mode not in ("block", "allow"):
        raise LensError(f"domain_filter: mode must be block|allow, "
                        f"got {mode!r}")
    # Match on the HOST alone: strip userinfo ("user@host") and an
    # explicit port ("host:8080") before comparing, or a blocklisted
    # domain is silently bypassed by any URL carrying either (fails
    # open in block mode, fails closed in allow mode).
    dom = F.regexp_replace(
        F.regexp_replace(url_domain(F.col(url_col)), r"^[^/@]*@", ""),
        r":\d+$", "")
    dl = F.array(*[F.lit(str(d).lower()) for d in domains])
    hit = F.exists(dl, lambda b: (dom == b)
                   | dom.endswith(F.concat(F.lit("."), b)))
    return df.filter(hit if mode == "allow" else ~hit)


@register_lens("domain_filter")
def domain_filter_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column (url), domains (list), mode ("block")."""
    url_col = str(require_arg(arguments, "column", "domain_filter"))
    domains = [str(d) for d in require_arg(arguments, "domains",
                                           "domain_filter")]
    return Lens("domain_filter", arguments, lambda df: domain_filter(
        df, url_col, domains, mode=str(arguments.get("mode", "block"))))


def truncate_tokens(df: DataFrame, text_col: str, max_tokens: int, *,
                    out: str | None = None) -> DataFrame:
    """Cap documents at ``max_tokens`` whitespace tokens — the
    context-length guard rail. Documents UNDER the cap keep their
    original text byte-for-byte (whitespace preserved); only over-cap
    documents are rewritten (tokens re-joined with single spaces, the
    same tokenizer-level contract as chunk_documents). Narrow."""
    if max_tokens <= 0:
        raise LensError("truncate_tokens: max_tokens must be > 0")
    toks = tokens(F.col(text_col), lowercase=False)
    c = F.when(F.size(toks) > int(max_tokens),
               F.array_join(F.slice(toks, 1, int(max_tokens)), " ")
               ).otherwise(F.col(text_col))
    return df.withColumn(out or text_col, c)


@register_lens("truncate_tokens")
def truncate_tokens_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column, max_tokens, out (default in-place)."""
    text_col = str(require_arg(arguments, "column", "truncate_tokens"))
    mt = int(require_arg(arguments, "max_tokens", "truncate_tokens"))
    out = arguments.get("out")
    return Lens("truncate_tokens", arguments, lambda df: truncate_tokens(
        df, text_col, mt, out=str(out) if out else None))


def compression_ratio(df: DataFrame, text_col: str, *,
                      out: str = "compression_ratio",
                      level: int = 6) -> DataFrame:
    """Append zlib compressed-size / raw-size per document — the
    classic cheap repetition/boilerplate signal from web-corpus
    curation (highly compressible ⟹ templated or repeated content;
    near-1.0 ⟹ high-entropy text or binary noise): the
    whole-document complement of ``repetition_stats``' windowed n-gram
    ratios, catching long-range structure those windows miss.

    zlib has no Catalyst expression, so this is the documented
    escape-hatch shape: an Arrow-batched pandas UDF (never row-at-a-
    time) over a narrow projection — one C-speed deflate per doc, no
    shuffle at any scale. Empty/null docs score 0.0 and keep their
    row. Rounded to 6 decimals; ratios can exceed 1.0 on tiny inputs
    (the zlib header dominates) — that is the honest signal, not an
    error.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    lv = int(level)
    if not 0 <= lv <= 9:
        raise LensError(
            f"compression_ratio: level must be in [0, 9], got {level}")

    @pandas_udf("double")
    def ratio(texts: pd.Series) -> pd.Series:
        def one(t):
            # pandas/Arrow may surface a missing string as NaN (float),
            # not None — `t.encode` would raise inside the UDF.
            if t is None or not isinstance(t, str):
                return 0.0
            raw = t.encode("utf-8", "surrogatepass")
            if not raw:
                return 0.0
            return round(len(zlib.compress(raw, lv)) / len(raw), 6)

        return texts.map(one)

    return ensure_parallelism(df).withColumn(out, ratio(F.col(text_col)))


#: the eight Gopher "stop word presence" probe words (Rae et al. 2021,
#: table A1 — public paper); a document with < 2 hits is likely
#: non-prose (navigation chrome, code, tag soup).
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with")

# RE2/Java-portable line-shape patterns (same contract as the sentence
# ops: explicit [ \t] classes — Java's \s includes \x0B, RE2's does
# not). Lines are trimmed before matching, so bullets anchor at ^.
_BULLET_RE = r"^([-*•]|[0-9]+[.)])[ \t]"
_ELLIPSIS_RE = r"(\.\.\.|…)$"


def structure_stats(df: DataFrame, text_col: str,
                    prefix: str = "") -> DataFrame:
    """Append the LINE-shape quality metric block — the other half of
    the Gopher heuristics (``repetition_stats`` covers token shape):

    - ``n_lines``: non-empty (after trim) lines;
    - ``bullet_frac_micro``: micro-fraction (⌊10⁶·a/b⌋, exact integer
      arithmetic per the digest contract) of lines starting with a
      bullet marker (``-``, ``*``, ``•``, ``1.``/``1)``) — Gopher
      drops docs with > 90% bulleted lines;
    - ``ellipsis_frac_micro``: micro-fraction of lines ending in
      ``...``/``…`` — > 30% flags truncated-teaser pages;
    - ``alpha_word_frac_micro``: micro-fraction of whitespace tokens
      containing at least one ``[A-Za-z]`` — Gopher keeps docs with
      ≥ 80%;
    - ``n_stopword_hits``: tokens (lowercased) among the eight Gopher
      probe words — < 2 flags non-prose.

    Everything is an exact bigint count or an exact floor-divided
    micro-fraction, so the block is hash-stable across engines and
    partitionings. Narrow per-row expressions (lines and tokens each
    bound ONCE via ``let_``) — no exchange at any scale; zero-line /
    zero-token docs get NULL fractions, not divide-by-zero.
    """
    def micro(cnt: Column, total: Column) -> Column:
        return F.when(
            total > 0,
            F.floor(cnt.cast("decimal(38,0)") * 1000000 / total)
            .cast("bigint"))

    text = F.coalesce(F.col(text_col), F.lit(""))
    lines_arr = F.filter(
        F.transform(F.split(text, "\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != "")

    def line_block(lines: Column) -> Column:
        n = F.size(lines).cast("bigint")
        bullets = F.size(F.filter(
            lines, lambda ln: ln.rlike(_BULLET_RE))).cast("bigint")
        ellipses = F.size(F.filter(
            lines, lambda ln: ln.rlike(_ELLIPSIS_RE))).cast("bigint")
        return F.struct(n.alias("n"),
                        micro(bullets, n).alias("bf"),
                        micro(ellipses, n).alias("ef"))

    def tok_block(toks: Column) -> Column:
        n = F.size(toks).cast("bigint")
        alpha = F.size(F.filter(
            toks, lambda t: t.rlike("[A-Za-z]"))).cast("bigint")
        stop = F.size(F.filter(
            toks,
            lambda t: F.lower(t).isin(*GOPHER_STOPWORDS))).cast("bigint")
        return F.struct(micro(alpha, n).alias("af"), stop.alias("sw"))

    lb = f"__{prefix}ss_l"
    tb = f"__{prefix}ss_t"
    return (
        ensure_parallelism(df)
        .withColumn(lb, let_(lines_arr, line_block))
        .withColumn(tb, let_(tokens(text, lowercase=False), tok_block))
        .withColumn(f"{prefix}n_lines", F.col(f"{lb}.n"))
        .withColumn(f"{prefix}bullet_frac_micro", F.col(f"{lb}.bf"))
        .withColumn(f"{prefix}ellipsis_frac_micro", F.col(f"{lb}.ef"))
        .withColumn(f"{prefix}alpha_word_frac_micro", F.col(f"{tb}.af"))
        .withColumn(f"{prefix}n_stopword_hits", F.col(f"{tb}.sw"))
        .drop(lb, tb)
    )


@register_lens("structure_stats")
def structure_stats_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column (text), prefix (""). Inverse drops the five
    appended metric columns."""
    text_col = str(require_arg(arguments, "column", "structure_stats"))
    prefix = str(arguments.get("prefix", ""))
    cols = [f"{prefix}{c}" for c in (
        "n_lines", "bullet_frac_micro", "ellipsis_frac_micro",
        "alpha_word_frac_micro", "n_stopword_hits")]
    return Lens(
        "structure_stats", arguments,
        lambda df: structure_stats(df, text_col, prefix),
        lambda df: df.drop(*cols))


@register_lens("compression_ratio")
def compression_ratio_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column, out ("compression_ratio"), level (6).
    Inverse drops the appended column."""
    text_col = str(require_arg(arguments, "column", "compression_ratio"))
    out = str(arguments.get("out", "compression_ratio"))
    return Lens(
        "compression_ratio", arguments,
        lambda df: compression_ratio(
            df, text_col, out=out, level=int(arguments.get("level", 6))),
        lambda df: df.drop(out))


@register_lens("url_normalize")
def url_normalize_lens(arguments: Mapping[str, Any]) -> Lens:
    """Canonicalize a URL column (lowercase, scheme/www stripped,
    query+fragment dropped, trailing slash trimmed) and optionally
    extract the domain — the key-preparation step for URL-level dedup
    of crawled corpora (raw crawl URLs are near-unique because of
    tracking parameters; canonical ones collapse).

    arguments: column, out (default in-place), domain_out (optional
    column for the extracted host)."""
    from lens_spark.functions.text import normalize_url, url_domain

    url_col = str(require_arg(arguments, "column", "url_normalize"))
    out = str(arguments.get("out", url_col))
    domain_out = arguments.get("domain_out")

    def fwd(df: DataFrame) -> DataFrame:
        res = df.withColumn(out, normalize_url(F.col(url_col)))
        if domain_out:
            res = res.withColumn(str(domain_out), url_domain(F.col(out)))
        return res

    return Lens("url_normalize", arguments, fwd)


def vocab_encode(df: DataFrame, id_col: str, text_col: str, *,
                 vocab_size: int = 4096, lowercase: bool = True,
                 oov_id: int = 0, out: str = "token_ids") -> DataFrame:
    """Corpus-frequency vocabulary + ordered token-id encoding: build
    the top-``vocab_size`` whitespace-token vocabulary (ids 1..V by
    descending count, token-ascending tie-break; ``oov_id`` for
    everything else) and encode each doc as its in-order id array —
    the tokenize-against-a-learned-vocab step of a training-data
    export, minus the subword merge table.

    Scale (100 TB):
    - vocab build = one explode + map-side-combined groupBy(token),
      then a two-phase TakeOrdered top-V (never a global sort of the
      vocabulary) and a row_number over the V survivors — a bounded
      funnel of ``vocab_size`` rows, driver never holds the corpus.
    - encoding = the (id, pos, token) explode joins the V-row vocab
      (broadcast hash join), then re-collects per doc sorted by
      position; the re-collect exchange carries (id, pos, int32) —
      token text never crosses it.
    ``vocab_size`` is capped at 2^20 so the broadcast stays MB-scale.
    """
    vocab = _vocab_topv_df(df, text_col, vocab_size=vocab_size,
                           lowercase=lowercase)
    return _vocab_encode_with(df, id_col, text_col, vocab,
                              lowercase=lowercase, oov_id=oov_id, out=out)


def _vocab_topv_df(df: DataFrame, text_col: str, *, vocab_size: int,
                   lowercase: bool) -> DataFrame:
    """The top-V (``__tok``, ``__tid``) vocabulary frame, fully
    in-plan (no collect on the hot path): map-side-combined token
    counts → two-phase TakeOrdered top-V → row_number over the V
    survivors. Deterministic ordering: count DESC, token ASC."""
    from pyspark.sql import Window

    from lens_spark.functions.text import tokens as _tok

    if not 1 <= int(vocab_size) <= (1 << 20):
        raise LensError("vocab_encode: vocab_size must be in [1, 2^20]")
    toks = ensure_parallelism(df).select(
        F.explode(_tok(F.col(text_col), lowercase=lowercase))
        .alias("__tok"))
    counts = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__c"))
    top = counts.orderBy(F.col("__c").desc(), F.col("__tok").asc()) \
        .limit(int(vocab_size))
    w = Window.orderBy(F.col("__c").desc(), F.col("__tok").asc())
    return top.withColumn("__tid", F.row_number().over(w).cast("int")) \
        .select("__tok", "__tid")


def _vocab_encode_with(df: DataFrame, id_col: str, text_col: str,
                       vocab: DataFrame, *, lowercase: bool, oov_id: int,
                       out: str) -> DataFrame:
    from lens_spark.functions.text import tokens as _tok

    toks = ensure_parallelism(df, by=[id_col]).select(
        F.col(id_col).alias("__vid"),
        F.posexplode(_tok(F.col(text_col), lowercase=lowercase))
        .alias("__pos", "__tok"))
    encoded = (
        toks.join(F.broadcast(vocab), "__tok", "left")
        .select("__vid", "__pos",
                F.coalesce(F.col("__tid"), F.lit(int(oov_id)).cast("int"))
                .alias("__tid"))
        .groupBy("__vid")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("__pos", "__tid"))),
            lambda s: s["__tid"]).alias(out))
    )
    joined = df.join(encoded, df[id_col] == encoded["__vid"], "left")
    return joined.withColumn(
        out, F.coalesce(F.col(out), F.array().cast("array<int>"))
    ).drop("__vid")


def vocab_fit(df: DataFrame, text_col: str, *, vocab_size: int = 4096,
              lowercase: bool = True) -> "list[tuple[str, int]]":
    """Materialize the top-V vocabulary as driver-held model state
    (``[(token, id), …]``, id-ascending — bounded by vocab_size ≤ 2^20,
    the model-state contract) for persistence via
    ``lens_spark.models.save_vocab`` and later ``vocab_apply``. The
    zero-collect in-plan path (``vocab_encode``) stays the hot path
    when fit and encode happen in one job."""
    rows = _vocab_topv_df(df, text_col, vocab_size=vocab_size,
                          lowercase=lowercase).collect()
    return sorted(((r["__tok"], int(r["__tid"])) for r in rows),
                  key=lambda t: t[1])


def vocab_apply(df: DataFrame, id_col: str, text_col: str,
                vocab: "Sequence[tuple[str, int]]", *,
                lowercase: bool = True, oov_id: int = 0,
                out: str = "token_ids") -> DataFrame:
    """Encode against a FITTED (or registry-loaded) vocabulary: the
    broadcast join + positional re-collect of ``vocab_encode``, with
    the V-row vocab supplied instead of rebuilt — fit-once/apply-many
    (encoding a new corpus shard with last release's vocabulary)."""
    if not vocab:
        raise LensError("vocab_apply: vocabulary must be non-empty")
    vdf = df.sparkSession.createDataFrame(
        [(str(t), int(i)) for t, i in vocab], "__tok string, __tid int")
    return _vocab_encode_with(df, id_col, text_col, vdf,
                              lowercase=lowercase, oov_id=oov_id, out=out)


@register_lens("vocab_encode")
def vocab_encode_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), vocab_size (4096), lowercase
    (true), oov_id (0), out ("token_ids"). OR apply a registry-
    persisted vocabulary: model_id (lens1b-…) + registry (root path)
    loads {vocab, lowercase} saved by lens_spark.models.save_vocab —
    lowercase comes from the MODEL (fit/apply tokenization must
    match). Inverse drops the ids."""
    id_col = str(require_arg(arguments, "id", "vocab_encode"))
    text_col = str(require_arg(arguments, "column", "vocab_encode"))
    out = str(arguments.get("out", "token_ids"))
    model_id = arguments.get("model_id")
    if model_id is not None:
        from lens_spark.models import load_model

        reg = require_arg(arguments, "registry", "vocab_encode")
        model = load_model(reg, str(model_id), expect_kind="token_vocab")
        vocab = [(str(t), int(i)) for t, i in model["vocab"]]
        lc = bool(model.get("lowercase", True))
        return Lens(
            "vocab_encode", arguments,
            lambda df: vocab_apply(
                df, id_col, text_col, vocab, lowercase=lc,
                oov_id=int(arguments.get("oov_id", 0)), out=out),
            lambda df: df.drop(out))
    return Lens(
        "vocab_encode", arguments,
        lambda df: vocab_encode(
            df, id_col, text_col,
            vocab_size=int(arguments.get("vocab_size", 4096)),
            lowercase=bool(arguments.get("lowercase", True)),
            oov_id=int(arguments.get("oov_id", 0)), out=out),
        lambda df: df.drop(out))


def vocab_coverage(df: DataFrame, text_col: str, *,
                   by: "Sequence[str] | None" = None,
                   vocab: "Sequence[tuple[str, int]] | None" = None,
                   vocab_size: int = 4096,
                   lowercase: bool = True) -> DataFrame:
    """Tokenizer-vocabulary coverage report, per group: how well a
    token vocabulary covers each slice of the corpus — the QA table a
    tokenizer release ships with ("what's the OOV rate per language
    before we train on this"). No reference counterpart (SURVEY.md
    §2.6); X5/X9 evaluation extension pairing with ``vocab_encode``
    (which produces ids) and ``threshold_sweep`` (the same
    one-pass-report philosophy).

    Output, one row per ``by`` group (or one global row): ``n_docs,
    words_total, words_known, distinct_words, distinct_known,
    oov_micro`` — all exact bigints; ``oov_micro`` is the exact
    floor-divided micro-fraction of token occurrences outside the
    vocabulary (NULL when the group has no tokens), the repo-wide
    hash-stable fraction contract. ``vocab`` is a fitted
    ``[(token, id), …]`` (``vocab_fit`` / a registry ``token_vocab``
    artifact); None fits the top-``vocab_size`` corpus vocabulary
    in-plan (``vocab_encode``'s exact build rule: count desc, token
    asc).

    Scale shape: ONE token explode over the corpus, map-side-combined
    down to (group, token) counts BEFORE anything else touches it, a
    broadcast hash join against the V-row vocabulary (V ≤ 2^20 —
    MB-scale) on that collapsed table, then one grouped aggregate of
    plain SUM/COUNTs — distinct counts fall out of the pre-aggregation
    for free, so there is no countDistinct Expand duplicating the
    exploded corpus. A narrow per-doc count joins back by group key —
    the group table is bounded by the key domain, never the corpus.
    """
    gcols = [str(c) for c in (by or [])]
    check_reserved(df, {"__tok", "__known", "__tc"}, "vocab_coverage")
    if vocab is not None:
        if not vocab:
            raise LensError("vocab_coverage: vocabulary must be non-empty")
        vdf = df.sparkSession.createDataFrame(
            [(str(t),) for t, _ in vocab], "__tok string")
    else:
        vdf = _vocab_topv_df(df, text_col, vocab_size=vocab_size,
                             lowercase=lowercase).select("__tok")
    toks = ensure_parallelism(df).select(
        *gcols,
        F.explode(tokens(F.col(text_col), lowercase=lowercase))
        .alias("__tok"))
    # Pre-aggregate to (group, token) counts BEFORE tagging: the
    # occurrence explode collapses map-side, the vocab join touches
    # one row per distinct (group, token), and the distinct counts
    # become plain COUNTs — no countDistinct Expand duplicating the
    # exploded corpus.
    tok_counts = toks.groupBy(*gcols, "__tok").agg(
        F.count(F.lit(1)).alias("__tc"))
    tagged = tok_counts.join(
        F.broadcast(vdf.withColumn("__known", F.lit(1))), "__tok", "left")
    stats = tagged.groupBy(*gcols).agg(
        F.sum("__tc").alias("words_total"),
        F.coalesce(F.sum(F.when(F.col("__known") == 1, F.col("__tc"))),
                   F.lit(0)).cast("bigint").alias("words_known"),
        F.count(F.lit(1)).alias("distinct_words"),
        F.count(F.when(F.col("__known") == 1, F.lit(1)))
        .alias("distinct_known"))
    docs = df.groupBy(*gcols).agg(F.count(F.lit(1)).alias("n_docs"))
    joined = (docs.join(stats, gcols, "left") if gcols
              else docs.crossJoin(stats))
    wt = F.coalesce(F.col("words_total"), F.lit(0)).cast("bigint")
    wk = F.coalesce(F.col("words_known"), F.lit(0)).cast("bigint")
    return joined.select(
        *gcols,
        F.col("n_docs").cast("bigint").alias("n_docs"),
        wt.alias("words_total"),
        wk.alias("words_known"),
        F.coalesce(F.col("distinct_words"), F.lit(0)).cast("bigint")
        .alias("distinct_words"),
        F.coalesce(F.col("distinct_known"), F.lit(0)).cast("bigint")
        .alias("distinct_known"),
        F.when(wt > 0,
               F.floor((wt - wk).cast("decimal(38,0)") * 1000000 / wt)
               .cast("bigint")).alias("oov_micro"))


@register_lens("vocab_coverage")
def vocab_coverage_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column (text), by (group cols, optional), vocab_size
    (4096), lowercase (true). OR model_id (lens1b-…) + registry to
    score a registry-persisted token_vocab (lowercase comes from the
    model — fit/apply tokenization must match). AGGREGATING lens
    (irreversible): inverse refuses like the other report lenses."""
    text_col = str(require_arg(arguments, "column", "vocab_coverage"))
    by = [str(c) for c in arguments.get("by", [])] or None
    model_id = arguments.get("model_id")

    def _refuse(df: DataFrame) -> DataFrame:
        raise LensError("vocab_coverage is not invertible: the "
                        "coverage report discards the documents")

    if model_id is not None:
        from lens_spark.models import load_model

        reg = require_arg(arguments, "registry", "vocab_coverage")
        model = load_model(reg, str(model_id), expect_kind="token_vocab")
        fitted = [(str(t), int(i)) for t, i in model["vocab"]]
        lc = bool(model.get("lowercase", True))
        return Lens(
            "vocab_coverage", arguments,
            lambda df: vocab_coverage(df, text_col, by=by, vocab=fitted,
                                      lowercase=lc),
            _refuse)
    return Lens(
        "vocab_coverage", arguments,
        lambda df: vocab_coverage(
            df, text_col, by=by,
            vocab_size=int(arguments.get("vocab_size", 4096)),
            lowercase=bool(arguments.get("lowercase", True))),
        _refuse)


def sentence_split(df: DataFrame, id_col: str, text_col: str, *,
                   out_idx: str = "sent_idx",
                   out: str = "sentence") -> DataFrame:
    """Explode documents into (id, sent_idx, sentence) rows on
    terminal punctuation — the sentence-granular cousin of
    ``chunk_documents`` (token windows) and ``segment_filter``
    (newline segments), for sentence-level dedup/quality/packing.

    Boundary rule: maximal runs of non-terminators followed by their
    run of ``.!?`` — deliberately expressed as a single
    ``regexp_extract_all`` with no lookbehind/backreferences so the
    same pattern runs identically under Java regex and RE2 (the
    DuckDB oracle); sentences are trimmed, empties dropped, index is
    0-based document order. Narrow (zero exchanges): extract +
    posexplode are per-row; abbreviation handling ("e.g.") is out of
    scope by contract — this is the deterministic splitter, not an
    NLP model.
    """
    check_reserved(df, {"__sents"}, "sentence_split")
    sents = F.filter(
        F.transform(
            F.regexp_extract_all(F.col(text_col).cast("string"),
                                 F.lit(r"[^.!?]+[.!?]*"), F.lit(0)),
            lambda s: F.trim(s)),
        lambda s: s != "")
    return (df.select(F.col(id_col), sents.alias("__sents"))
            .select(id_col, F.posexplode("__sents").alias(out_idx, out)))


@register_lens("sentence_split")
def sentence_split_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), out_idx ("sent_idx"),
    out ("sentence")."""
    id_col = str(require_arg(arguments, "id", "sentence_split"))
    text_col = str(require_arg(arguments, "column", "sentence_split"))
    return Lens("sentence_split", arguments, lambda df: sentence_split(
        df, id_col, text_col,
        out_idx=str(arguments.get("out_idx", "sent_idx")),
        out=str(arguments.get("out", "sentence"))))


def fim_transform(df: DataFrame, id_col: str, text_col: str, *,
                  rate: float = 0.5, pre: str = "<PRE>",
                  suf: str = "<SUF>", mid: str = "<MID>",
                  out: str | None = None, salt: str = "") -> DataFrame:
    """Fill-in-the-middle reordering (Bavarian et al. 2022, PSM
    format): a deterministic md5-selected ``rate`` fraction of docs is
    rewritten ``PRE prefix SUF suffix MID middle`` so the model learns
    infilling; the rest pass through byte-identical.

    Selection AND split points derive from md5(salt|id) — the
    sampling.py determinism contract: reproducible, repartition-
    stable, engine-portable (no rand()). Char-level splits: p1 ~
    U[0, n], p2 ~ U[p1, n] from two independent md5 draws. Narrow
    (zero exchanges, pure Catalyst string ops); ``salt`` derives an
    independent epoch's selection.
    """
    if not 0.0 <= float(rate) <= 1.0:
        raise LensError("fim_transform: rate must be in [0, 1]")
    out = out or text_col
    t = F.col(text_col).cast("string")
    n = F.length(t)
    key = lambda tag: F.conv(F.substring(  # noqa: E731
        F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"),
                          F.lit(tag))), 1, 8), 16, 10).cast("bigint")
    selected = (key("sel").cast("double") / F.lit(float(1 << 32))) \
        < F.lit(float(rate))
    p1 = key("p1") % (n + 1)
    p2 = p1 + key("p2") % (n - p1 + 1)
    rewritten = F.concat(
        F.lit(pre), F.substring(t, F.lit(1), p1.cast("int")),
        F.lit(suf), F.substring(t, (p2 + 1).cast("int"),
                                (n - p2).cast("int")),
        F.lit(mid), F.substring(t, (p1 + 1).cast("int"),
                                (p2 - p1).cast("int")))
    return df.withColumn(
        out, F.when(selected & t.isNotNull(), rewritten)
        .otherwise(F.col(text_col)))


@register_lens("fim_transform")
def fim_transform_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), rate (0.5), pre/suf/mid sentinel
    strings, out (default: overwrite column), salt ("")."""
    id_col = str(require_arg(arguments, "id", "fim_transform"))
    text_col = str(require_arg(arguments, "column", "fim_transform"))
    return Lens("fim_transform", arguments, lambda df: fim_transform(
        df, id_col, text_col,
        rate=float(arguments.get("rate", 0.5)),
        pre=str(arguments.get("pre", "<PRE>")),
        suf=str(arguments.get("suf", "<SUF>")),
        mid=str(arguments.get("mid", "<MID>")),
        out=(str(arguments["out"]) if arguments.get("out") else None),
        salt=str(arguments.get("salt", ""))))


def mask_tokens(df: DataFrame, id_col: str, text_col: str, *,
                rate: float = 0.15, sentinel: str = "<MASK>",
                out: str = "masked", labels_out: str = "mask_labels",
                salt: str = "") -> DataFrame:
    """BERT-style masked-LM corruption: a deterministic md5-selected
    ``rate`` of whitespace-token POSITIONS is replaced by ``sentinel``;
    the originals come back in order as ``labels_out`` (the training
    targets). Per-position selection hashes (salt|doc id|position), so
    masks are reproducible, repartition-stable, engine-portable, and
    ``salt`` draws an independent epoch's corruption — the fim_transform
    contract at token granularity.

    Narrow (zero exchanges): tokenize ONCE per row (the ``let_``
    binding — quality_filter's lesson: Catalyst re-evaluates a
    referenced subtree per reference), then two indexed higher-order
    transforms over the bound array.
    """
    check_reserved(df, {"__mt"}, "mask_tokens")
    from lens_spark.functions.text import let_, tokens as _tok

    if not 0.0 <= float(rate) <= 1.0:
        raise LensError("mask_tokens: rate must be in [0, 1]")

    def sel(i):
        h = F.conv(F.substring(F.md5(F.concat_ws(
            "|", F.lit(salt), F.col(id_col).cast("string"),
            i.cast("string"))), 1, 8), 16, 10).cast("bigint")
        return (h.cast("double") / F.lit(float(1 << 32))) \
            < F.lit(float(rate))

    # The selection array is let_-bound so each position hashes ONCE —
    # referencing sel(i) from both output transforms embedded (and
    # evaluated) the md5 subtree twice per token (the span_corrupt
    # lesson: Catalyst has no CSE across an expression tree).
    def build(w):
        sels = F.transform(w, lambda x, i: sel(i))

        def body(m):
            picked = lambda i: F.element_at(m, (i + 1).cast("int"))  # noqa: E731
            return F.struct(
                F.array_join(
                    F.transform(w, lambda x, i: F.when(picked(i),
                                                       F.lit(sentinel))
                                .otherwise(x)), " ").alias("m"),
                F.filter(F.transform(w, lambda x, i: F.when(picked(i), x)),
                         lambda x: x.isNotNull()).alias("l"))

        return let_(sels, body)

    pair = let_(_tok(F.col(text_col), lowercase=False), build)
    return (df.withColumn("__mt", pair)
            .withColumn(out, F.col("__mt.m"))
            .withColumn(labels_out, F.col("__mt.l"))
            .drop("__mt"))


@register_lens("mask_tokens")
def mask_tokens_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), rate (0.15), sentinel ("<MASK>"),
    out ("masked"), labels ("mask_labels"), salt (""). Inverse drops
    both outputs."""
    id_col = str(require_arg(arguments, "id", "mask_tokens"))
    text_col = str(require_arg(arguments, "column", "mask_tokens"))
    out = str(arguments.get("out", "masked"))
    labels_out = str(arguments.get("labels", "mask_labels"))
    return Lens(
        "mask_tokens", arguments,
        lambda df: mask_tokens(
            df, id_col, text_col,
            rate=float(arguments.get("rate", 0.15)),
            sentinel=str(arguments.get("sentinel", "<MASK>")),
            out=out, labels_out=labels_out,
            salt=str(arguments.get("salt", ""))),
        lambda df: df.drop(out, labels_out))


def span_corrupt(df: DataFrame, id_col: str, text_col: str, *,
                 block: int = 20, span_len: int = 3,
                 out: str = "corrupted", targets_out: str = "span_targets",
                 salt: str = "") -> DataFrame:
    """T5-style span corruption ("Exploring the Limits of Transfer
    Learning", Raffel et al. 2020 — the span-corruption pre-training
    objective): contiguous token spans are replaced by numbered
    sentinels ``<extra_id_k>`` in the input; the targets string holds
    each sentinel followed by the tokens it hid, terminated by one
    final sentinel. Completes the training-transform family
    (fim_transform = infilling, mask_tokens = token-level MLM,
    span_corrupt = span-level seq2seq denoising).

    Span placement is BLOCK-DETERMINISTIC (the fim/mask_tokens md5
    contract extended to spans): token positions are cut into fixed
    blocks of ``block`` tokens; every FULL block k hides one
    ``span_len``-token span starting at offset
    md5(salt|id|k) % (block − span_len + 1). This yields an exact
    span_len/block corruption density, guaranteed-non-overlapping
    spans, and arithmetic a SQL oracle mirrors term for term — T5's
    sequential random walk over span starts cannot be reproduced
    engine-portably without per-row state.

    Narrow (zero exchanges): tokenize ONCE per row (let_-bound — the
    quality_filter lesson), then indexed higher-order transforms; the
    targets string is built from sequence(0, nblocks−1) without
    re-exploding. ``salt`` draws an independent epoch's corruption.
    """
    check_reserved(df, {"__sc"}, "span_corrupt")
    from lens_spark.functions.text import let_, tokens as _tok

    b, sl = int(block), int(span_len)
    if sl < 1 or b <= sl:
        raise LensError("span_corrupt: need span_len >= 1 and "
                        "block > span_len")

    def offset(k):
        h = F.conv(F.substring(F.md5(F.concat_ws(
            "|", F.lit(salt), F.col(id_col).cast("string"),
            k.cast("string"))), 1, 8), 16, 10).cast("bigint")
        return h % F.lit(b - sl + 1)

    def sentinel(k):
        return F.concat(F.lit("<extra_id_"), k.cast("string"), F.lit(">"))

    def build(w):
        nblocks = F.floor(F.size(w) / F.lit(b)).cast("bigint")
        # One md5 PER BLOCK, bound once: Catalyst embeds (and
        # evaluates) an expression subtree once per reference, so
        # reading offset(k) inside the per-token lambda cost ~3 md5
        # evaluations per TOKEN (2.3 s → 0.9 s at sf0.1 for the bench
        # query). The offsets array is let_-bound and the lambdas do
        # O(1) element_at lookups instead.
        offs_arr = (
            F.when(nblocks > 0,
                   F.transform(F.sequence(F.lit(0).cast("bigint"),
                                          nblocks - 1), offset))
            .otherwise(F.expr("array()").cast("array<bigint>")))

        def body(offs):
            def off_at(k):
                return F.element_at(offs, (k + 1).cast("int"))

            def corrupted_tok(x, i):
                k = F.floor(i.cast("bigint") / F.lit(b)).cast("bigint")
                rel = i.cast("bigint") - k * F.lit(b)
                o = off_at(k)
                in_span = (k < nblocks) & (rel >= o) & (rel < o + F.lit(sl))
                return (F.when(in_span & (rel == o), sentinel(k))
                        .when(in_span, F.lit(None).cast("string"))
                        .otherwise(x))

            corrupted = F.array_join(
                F.filter(F.transform(w, corrupted_tok),
                         lambda x: x.isNotNull()), " ")

            def piece(k):
                return F.concat(
                    sentinel(k), F.lit(" "),
                    F.array_join(
                        F.slice(w,
                                (k * F.lit(b) + off_at(k) + 1).cast("int"),
                                sl), " "))

            targets = F.concat(
                F.array_join(
                    F.transform(
                        F.when(nblocks > 0,
                               F.sequence(F.lit(0).cast("bigint"),
                                          nblocks - 1))
                        .otherwise(F.expr("array()").cast("array<bigint>")),
                        piece), " "),
                F.when(nblocks > 0, F.lit(" ")).otherwise(F.lit("")),
                sentinel(nblocks))
            return F.struct(corrupted.alias("c"), targets.alias("t"),
                            nblocks.cast("int").alias("k"))

        return let_(offs_arr, body)

    built = let_(_tok(F.col(text_col), lowercase=False), build)
    return (df.withColumn("__sc", built)
            .withColumn(out, F.col("__sc.c"))
            .withColumn(targets_out, F.col("__sc.t"))
            .withColumn("n_spans", F.col("__sc.k"))
            .drop("__sc"))


@register_lens("span_corrupt")
def span_corrupt_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), block (20), span_len (3), out
    ("corrupted"), targets ("span_targets"), salt (""). Inverse drops
    the three outputs."""
    id_col = str(require_arg(arguments, "id", "span_corrupt"))
    text_col = str(require_arg(arguments, "column", "span_corrupt"))
    out = str(arguments.get("out", "corrupted"))
    targets_out = str(arguments.get("targets", "span_targets"))
    return Lens(
        "span_corrupt", arguments,
        lambda df: span_corrupt(
            df, id_col, text_col,
            block=int(arguments.get("block", 20)),
            span_len=int(arguments.get("span_len", 3)),
            out=out, targets_out=targets_out,
            salt=str(arguments.get("salt", ""))),
        lambda df: df.drop(out, targets_out, "n_spans"))
