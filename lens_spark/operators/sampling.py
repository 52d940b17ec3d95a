"""Deterministic content-hash sampling and splitting.

Training-data pipelines need samples and train/eval splits that are
(a) reproducible across runs and engines, (b) stable under
repartitioning, and (c) skew-free regardless of key distribution.
``rand()``-based sampling fails (a)/(b); modulo-on-key sampling fails
(c) for structured keys. Hashing each row's key with md5 and comparing
the hex prefix lexicographically gives all three: md5 is
engine-portable (Spark and DuckDB agree byte-for-byte — the property
the oracle gate relies on), and the prefix is uniform over [0, 16^w).

No reference counterpart (the reference has no row-selection operators
at all, SURVEY.md §2.6) — these are X-series extensions registered as
ordinary lenses. Both are pure narrow ops: no shuffle at any scale.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lens_spark.errors import LensError
from lens_spark.operators.base import Lens, check_reserved, register_lens, require_arg

# Width of the hex prefix compared against thresholds: 8 hex digits =
# 32 bits of resolution, i.e. sampling-rate granularity of 2^-32.
_PREFIX_W = 8


def _hash_prefix(key_cols: list[str], salt: str) -> Column:
    parts: list[Column] = [F.lit(salt)] if salt else []
    for c in key_cols:
        parts.append(F.col(c).cast("string"))
    return F.substring(F.md5(F.concat_ws("|", *parts)), 1, _PREFIX_W)


def fraction_to_threshold(fraction: float) -> str:
    """Hex string h such that P[md5_prefix < h] == fraction (to 2^-32).

    Thresholds compare lexicographically against the fixed-width hex
    prefix, so they must stay the same width; fraction == 1 would need
    a 9-digit value, which sorts *below* "f..." as a string — return
    "g" instead (one char above the hex alphabet, above every prefix).
    """
    if not 0.0 <= fraction <= 1.0:
        raise LensError(f"sample fraction must be in [0, 1], got {fraction}")
    v = int(round(fraction * (16 ** _PREFIX_W)))
    if v >= 16 ** _PREFIX_W:
        return "g"
    return format(v, f"0{_PREFIX_W}x")


def sample_hash(df: DataFrame, key_cols: list[str], fraction: float,
                *, salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key content hash.

    The same key always lands on the same side — re-running, scaling
    up, or changing partitioning never changes membership; ``salt``
    derives an independent sample from the same keys.
    """
    return df.filter(
        _hash_prefix(key_cols, salt) < fraction_to_threshold(fraction))


def hash_split(df: DataFrame, key_cols: list[str],
               splits: Mapping[str, float], *, out: str = "split",
               salt: str = "") -> DataFrame:
    """Assign each row to a named split by hash range.

    ``splits`` maps name → fraction; fractions must sum to 1. Ranges
    are half-open consecutive intervals of the hash space in the given
    order, so adding a new split at the end never reshuffles existing
    membership of earlier splits (stable extension — the property that
    matters when an eval set must stay frozen across dataset versions).
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise LensError(f"split fractions must sum to 1, got {total}")
    prefix = _hash_prefix(key_cols, salt)
    expr: Column | None = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = prefix < fraction_to_threshold(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else \
            expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out, expr)


@register_lens("sample_hash")
def sample_hash_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: keys (list[str]), fraction (float), salt ("")."""
    keys = [str(c) for c in require_arg(arguments, "keys", "sample_hash")]
    fraction = float(require_arg(arguments, "fraction", "sample_hash"))
    salt = str(arguments.get("salt", ""))
    return Lens("sample_hash", arguments,
                lambda df: sample_hash(df, keys, fraction, salt=salt))


@register_lens("hash_split")
def hash_split_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: keys (list[str]), splits ({name: fraction}),
    out ("split"), salt (""). Inverse drops the split column."""
    keys = [str(c) for c in require_arg(arguments, "keys", "hash_split")]
    splits = dict(require_arg(arguments, "splits", "hash_split"))
    out = str(arguments.get("out", "split"))
    salt = str(arguments.get("salt", ""))
    return Lens(
        "hash_split", arguments,
        lambda df: hash_split(df, keys, {str(k): float(v)
                                         for k, v in splits.items()},
                              out=out, salt=salt),
        lambda df: df.drop(out),
    )


def sample_stratified(df: DataFrame, key_cols: list[str], strata_col: str,
                      fractions: Mapping[str, float], *,
                      default_fraction: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling (downsample/rebalance).

    ``fractions`` maps stratum value → keep fraction; strata not listed
    keep ``default_fraction``. Same content-hash machinery as
    ``sample_hash`` — membership is reproducible and repartition-stable
    per stratum, which is how corpus mixing recipes (e.g. downweight a
    crawl source, keep all curated text) stay frozen across runs.
    Narrow op: no shuffle at any scale.
    """
    prefix = _hash_prefix(key_cols, salt)
    expr: Column = F.lit(fraction_to_threshold(default_fraction))
    for value, frac in fractions.items():
        expr = F.when(F.col(strata_col).cast("string") == str(value),
                      F.lit(fraction_to_threshold(float(frac)))).otherwise(expr)
    return df.filter(prefix < expr)


def oversample(df: DataFrame, key_cols: list[str], strata_col: str,
               weights: Mapping[str, float], *, default_weight: float = 1.0,
               out: str = "repeat_idx", salt: str = "") -> DataFrame:
    """Deterministic fractional oversampling per stratum — the
    upsampling half of a corpus mixing recipe (``sample_stratified`` is
    the downsampling half). Weight 2.5 → every row of that stratum
    appears twice, and a content-hash-chosen 50% of its rows a third
    time; weight 0.4 → a 40% sample. ``out`` numbers the copies
    (1..n) so downstream keys stay unique and which-copy is stable.

    Same md5-prefix machinery as ``sample_hash``: membership of the
    fractional copy is reproducible across runs/engines and stable
    under repartitioning. Narrow op — explode of a ≤⌈w⌉-element
    sequence, no shuffle at any scale.
    """
    check_reserved(df, {"__os_n"}, "oversample")
    w_floor: Column = F.lit(int(float(default_weight)))
    thresh: Column = F.lit(
        fraction_to_threshold(float(default_weight) - int(float(default_weight))))
    for value, w in weights.items():
        w = float(w)
        if w < 0:
            raise LensError(f"oversample weight must be >= 0, got {w}")
        match = F.col(strata_col).cast("string") == str(value)
        w_floor = F.when(match, F.lit(int(w))).otherwise(w_floor)
        thresh = F.when(match,
                        F.lit(fraction_to_threshold(w - int(w)))).otherwise(thresh)
    n = w_floor + F.when(_hash_prefix(key_cols, salt) < thresh, 1).otherwise(0)
    return (
        df.withColumn("__os_n", n)
        .filter(F.col("__os_n") > 0)
        .withColumn(out, F.explode(F.sequence(F.lit(1), F.col("__os_n"))))
        .drop("__os_n")
    )


def mix_by_token_budget(df: DataFrame, key_cols: list[str], strata_col: str,
                        budgets: Mapping[str, float], *,
                        token_count_col: str | None = None,
                        text_col: str | None = None,
                        default_weight: float = 1.0,
                        out: str = "repeat_idx", salt: str = "") -> DataFrame:
    """Corpus mixing to per-source TOKEN budgets (the practical mixing
    recipe: "200B tokens of crawl, 30B of curated"): each stratum's
    replication weight is computed FROM the data — weight =
    budget_tokens / stratum_tokens — then applied with the
    deterministic fractional machinery of ``oversample`` (weight < 1
    downsamples, > 1 replicates with hash-chosen fractional copies).
    Strata without a budget keep ``default_weight`` (1.0 = pass
    through; 0.0 = drop).

    Token totals per stratum are a small agg collected driver-side
    (model state, like kmeans centroids: #strata rows); membership is
    expected-value — ~budget tokens per stratum in expectation via the
    md5-prefix CDF, no sort. The exact greedy fill-to-budget
    (cumulative-sum window ordered by md5) gives budgets to the token,
    but orders a whole stratum through one window partition — a
    single-task straggler at web scale; the threshold form is narrow.
    """
    check_reserved(df, {"__mix_nt", "__s", "__t"}, "mix_by_token_budget")
    if token_count_col is None:
        if text_col is None:
            raise LensError(
                "mix_by_token_budget needs token_count_col or text_col")
        from lens_spark.functions.text import whitespace_token_count

        df = df.withColumn("__mix_nt", whitespace_token_count(F.col(text_col)))
        token_count_col = "__mix_nt"
    totals = {
        r["__s"]: r["__t"]
        for r in df.groupBy(F.col(strata_col).cast("string").alias("__s"))
        .agg(F.sum(F.col(token_count_col)).alias("__t")).collect()
    }
    weights = {
        s: (float(b) / totals[s]) if totals.get(s) else 0.0
        for s, b in budgets.items()
    }
    mixed = oversample(df, key_cols, strata_col, weights,
                       default_weight=default_weight, out=out, salt=salt)
    return mixed.drop("__mix_nt") if token_count_col == "__mix_nt" else mixed


def mix_by_temperature(df: DataFrame, key_cols: list[str], strata_col: str,
                       *, total_budget_tokens: float, alpha: float = 0.3,
                       token_count_col: str | None = None,
                       text_col: str | None = None,
                       out: str = "repeat_idx", salt: str = "") -> DataFrame:
    """Temperature-based corpus mixing — the T5 / multilingual
    standard: stratum s receives a token budget ∝ (its token count)^α
    of ``total_budget_tokens``, so α = 1 keeps natural proportions,
    α → 0 approaches uniform, and the 0.2–0.7 range is the published
    low-resource upsampling regime ("Exploring the Limits of Transfer
    Learning…", Raffel et al. 2020, §3.4.3 uses this form;
    "Unsupervised Cross-lingual Representation Learning at Scale",
    Conneau et al. 2020 pick α = 0.3). The derived per-stratum
    replication weights feed the same deterministic fractional
    machinery as ``oversample``/``mix_by_token_budget``.

    Weights are rounded to 6 decimals before application so the
    engine-portable oracle can recompute them bit-stably (pow() may
    differ in the last ulp across libm implementations; the round
    collapses that). Per-stratum token totals are a KB-sized driver
    agg, like every mixing model here.
    """
    check_reserved(df, {"__mix_nt", "__s", "__t"}, "mix_by_temperature")
    if token_count_col is None:
        if text_col is None:
            raise LensError(
                "mix_by_temperature needs token_count_col or text_col")
        from lens_spark.functions.text import whitespace_token_count

        df = df.withColumn("__mix_nt",
                           whitespace_token_count(F.col(text_col)))
        token_count_col = "__mix_nt"
    a = float(alpha)
    if a <= 0:
        raise LensError(f"mix_by_temperature: alpha must be > 0, got {alpha}")
    totals = {
        r["__s"]: r["__t"]
        for r in df.groupBy(F.col(strata_col).cast("string").alias("__s"))
        .agg(F.sum(F.col(token_count_col)).alias("__t")).collect()
    }
    z = sum(float(t) ** a for t in totals.values() if t)
    if z <= 0:
        raise LensError("mix_by_temperature: corpus has no tokens")
    weights = {
        s: round(float(total_budget_tokens) * (float(t) ** a) / z
                 / float(t), 6)
        for s, t in totals.items() if t
    }
    mixed = oversample(df, key_cols, strata_col, weights,
                       default_weight=0.0, out=out, salt=salt)
    return mixed.drop("__mix_nt") if token_count_col == "__mix_nt" else mixed


@register_lens("mix_by_temperature")
def mix_by_temperature_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: keys, strata, total_budget_tokens, alpha (0.3),
    token_count_col or column (text), out ("repeat_idx"), salt."""
    keys = [str(k) for k in require_arg(arguments, "keys",
                                        "mix_by_temperature")]
    strata = str(require_arg(arguments, "strata", "mix_by_temperature"))
    total = float(require_arg(arguments, "total_budget_tokens",
                              "mix_by_temperature"))
    return Lens("mix_by_temperature", arguments, lambda df: mix_by_temperature(
        df, keys, strata, total_budget_tokens=total,
        alpha=float(arguments.get("alpha", 0.3)),
        token_count_col=arguments.get("token_count_col"),
        text_col=arguments.get("column"),
        out=str(arguments.get("out", "repeat_idx")),
        salt=str(arguments.get("salt", ""))))


def sample_exact_k(df: DataFrame, key_cols: list[str], strata_col: str,
                   k: int, *, salt: str = "", safety: int = 8) -> DataFrame:
    """EXACTLY ``k`` rows per stratum (all rows of smaller strata),
    chosen deterministically by content hash — frozen eval panels and
    few-shot pools, where ``sample_stratified``'s expected-fraction
    contract isn't tight enough. Same md5 machinery: membership is
    the global hash top-k of the stratum, so it is reproducible,
    repartition-stable, and SHRINK-STABLE — adding new rows to a
    stratum only ever replaces panel members with lower-hash rows,
    never reshuffles the survivors' order.

    Scale shape (two-phase, the top-k trick applied to sampling): a
    per-stratum hash-threshold pre-filter keeps an expected
    ``safety``·k candidates (narrow), and only the candidates enter
    the per-stratum rank window — the window sorts ~safety·k rows per
    stratum, never the stratum itself. Stratum sizes and candidate
    counts are two KB-sized driver aggs; a stratum whose candidate
    set came up short of k (P ≈ exp(−Θ(safety·k)), but possible)
    falls back to ranking that stratum in full — correct by
    construction: the threshold pre-filter keeps a hash-prefix
    superset of the hash top-k whenever it keeps ≥ k rows.
    """
    check_reserved(df, {"__ek_h", "__ek_r", "__n", "__s"}, "sample_exact_k")
    from pyspark.sql import Window

    if k < 1:
        raise LensError(f"sample_exact_k needs k >= 1, got {k}")
    prefix = _hash_prefix(key_cols, salt)
    sizes = {
        r["__s"]: r["__n"]
        for r in df.groupBy(F.col(strata_col).cast("string").alias("__s"))
        .agg(F.count(F.lit(1)).alias("__n")).collect()
    }
    thr: Column = F.lit("g")  # default: whole stratum is candidate
    for s, n in sizes.items():
        frac = min(1.0, float(safety) * k / n) if n else 1.0
        thr = F.when(F.col(strata_col).cast("string") == s,
                     F.lit(fraction_to_threshold(frac))).otherwise(thr)
    cand = df.withColumn("__ek_h", prefix).filter(F.col("__ek_h") < thr)
    cand_sizes = {
        r["__s"]: r["__n"]
        for r in cand.groupBy(F.col(strata_col).cast("string").alias("__s"))
        .agg(F.count(F.lit(1)).alias("__n")).collect()
    }
    short = {s for s, n in sizes.items()
             if cand_sizes.get(s, 0) < min(k, n)}
    if short:
        fallback = df.filter(
            F.col(strata_col).cast("string").isin(*short)
        ).withColumn("__ek_h", prefix)
        cand = cand.filter(
            ~F.col(strata_col).cast("string").isin(*short)
        ).unionByName(fallback)
    w = Window.partitionBy(strata_col).orderBy(
        F.col("__ek_h"), *[F.col(c) for c in key_cols])
    return (cand.withColumn("__ek_r", F.row_number().over(w))
            .filter(F.col("__ek_r") <= k).drop("__ek_h", "__ek_r"))


@register_lens("sample_exact_k")
def sample_exact_k_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: keys (list[str]), strata (column), k, salt ("")."""
    keys = [str(c) for c in require_arg(arguments, "keys", "sample_exact_k")]
    strata = str(require_arg(arguments, "strata", "sample_exact_k"))
    k = int(require_arg(arguments, "k", "sample_exact_k"))
    return Lens("sample_exact_k", arguments,
                lambda df: sample_exact_k(
                    df, keys, strata, k,
                    salt=str(arguments.get("salt", ""))))


def shuffle_shards(df: DataFrame, key_cols: list[str], num_shards: int, *,
                   salt: str = "", shard_out: str = "shard",
                   pos_out: str = "shard_pos") -> DataFrame:
    """Deterministic global training shuffle: every row gets a
    content-hash-chosen shard and a stable position inside it — the
    export-side op that turns a curated corpus into a reproducible
    training order (write partitioned by ``shard_out``, stream shards
    in ``pos_out`` order). ``rand()``-based shuffles are neither
    reproducible nor repartition-stable; ordering by a content hash is
    both, and ``salt`` derives an independent epoch order from the
    same keys.

    Scale shape: shard assignment is narrow (hash mod); positions are
    ONE row_number window per shard, so a whole shard's (hash, key)
    tuples sort in one task — ``num_shards`` is the task-size dial,
    the same contract as pack_sequences' shards (size so corpus/N rows
    of a few dozen bytes fit a task; at 100 TB that's just a larger N).
    One exchange total, carrying keys + an 8-char hash.
    """
    check_reserved(df, {"__ss_h"}, "shuffle_shards")
    from pyspark.sql import Window

    if num_shards < 1:
        raise LensError(f"num_shards must be >= 1, got {num_shards}")
    prefix = _hash_prefix(key_cols, salt)
    with_shard = df.withColumn("__ss_h", prefix).withColumn(
        shard_out,
        (F.conv(F.col("__ss_h"), 16, 10).cast("bigint")
         % F.lit(int(num_shards))))
    w = Window.partitionBy(shard_out).orderBy(
        F.col("__ss_h"), *[F.col(c) for c in key_cols])
    return (with_shard
            .withColumn(pos_out, F.row_number().over(w).cast("bigint"))
            .drop("__ss_h"))


@register_lens("shuffle_shards")
def shuffle_shards_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: keys (list[str]), num_shards, salt (""),
    shard_out ("shard"), pos_out ("shard_pos"). Inverse drops both."""
    keys = [str(c) for c in require_arg(arguments, "keys", "shuffle_shards")]
    n = int(require_arg(arguments, "num_shards", "shuffle_shards"))
    shard_out = str(arguments.get("shard_out", "shard"))
    pos_out = str(arguments.get("pos_out", "shard_pos"))
    return Lens(
        "shuffle_shards", arguments,
        lambda df: shuffle_shards(df, keys, n,
                                  salt=str(arguments.get("salt", "")),
                                  shard_out=shard_out, pos_out=pos_out),
        lambda df: df.drop(shard_out, pos_out),
    )


@register_lens("mix_by_token_budget")
def mix_by_token_budget_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: keys (list[str]), strata (column), budgets
    ({stratum: token budget}), token_count_col | column (text),
    default_weight (1.0), out ("repeat_idx"), salt ("")."""
    keys = [str(c) for c in require_arg(arguments, "keys",
                                        "mix_by_token_budget")]
    strata = str(require_arg(arguments, "strata", "mix_by_token_budget"))
    budgets = {str(k): float(v) for k, v in
               dict(require_arg(arguments, "budgets",
                                "mix_by_token_budget")).items()}
    tcc = arguments.get("token_count_col")
    text_col = arguments.get("column")
    out = str(arguments.get("out", "repeat_idx"))
    return Lens(
        "mix_by_token_budget", arguments,
        lambda df: mix_by_token_budget(
            df, keys, strata, budgets,
            token_count_col=str(tcc) if tcc else None,
            text_col=str(text_col) if text_col else None,
            default_weight=float(arguments.get("default_weight", 1.0)),
            out=out, salt=str(arguments.get("salt", ""))),
        lambda df: df.filter(F.col(out) == 1).drop(out),
    )


@register_lens("oversample")
def oversample_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: keys (list[str]), strata (column), weights
    ({value: weight}), default_weight (1.0), out ("repeat_idx"),
    salt (""). Inverse keeps copy 1 and drops the index column."""
    keys = [str(c) for c in require_arg(arguments, "keys", "oversample")]
    strata = str(require_arg(arguments, "strata", "oversample"))
    weights = {str(k): float(v) for k, v in
               dict(require_arg(arguments, "weights", "oversample")).items()}
    out = str(arguments.get("out", "repeat_idx"))
    return Lens(
        "oversample", arguments,
        lambda df: oversample(
            df, keys, strata, weights,
            default_weight=float(arguments.get("default_weight", 1.0)),
            out=out, salt=str(arguments.get("salt", ""))),
        lambda df: df.filter(F.col(out) == 1).drop(out),
    )


@register_lens("sample_stratified")
def sample_stratified_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: keys (list[str]), strata (column), fractions
    ({value: fraction}), default_fraction (0.0), salt ("")."""
    keys = [str(c) for c in require_arg(arguments, "keys", "sample_stratified")]
    strata = str(require_arg(arguments, "strata", "sample_stratified"))
    fractions = {str(k): float(v) for k, v in
                 dict(require_arg(arguments, "fractions",
                                  "sample_stratified")).items()}
    return Lens(
        "sample_stratified", arguments,
        lambda df: sample_stratified(
            df, keys, strata, fractions,
            default_fraction=float(arguments.get("default_fraction", 0.0)),
            salt=str(arguments.get("salt", ""))))


def epoch_plan(df: DataFrame, strata_col: str, *,
               total_budget_tokens: int,
               weights: Mapping[str, int] | None = None,
               default_weight: int = 1,
               max_epochs_milli: int = 4000,
               token_count_col: str | None = None,
               text_col: str | None = None) -> DataFrame:
    """Mixture/epoch planner: given per-stratum mixture ``weights``
    (integers, e.g. parts-per-mix) and a total token budget, report —
    per stratum — how many tokens the mixture asks for, how many are
    available, and the resulting epoch count (how many passes over the
    stratum a data loader must schedule), capped at
    ``max_epochs_milli``/1000 epochs (the "don't repeat a tiny source
    40×" guard every real mixture applies).

    Returned columns (ALL exact integer arithmetic — bigint products
    and floor divisions only, so the result is hash-stable across
    engines and partitionings):
      - ``available_tokens``  Σ tokens in the stratum
      - ``target_tokens``     budget·w ÷ Σw   (floor)
      - ``epochs_milli``      min(target·1000 ÷ available, cap)
      - ``served_tokens``     available·epochs_milli ÷ 1000 — what the
        capped plan actually delivers (< target ⇒ the cap bit).

    100 TB shape: ONE partial-aggregated groupBy over the stratum key
    (#strata result rows); the plan arithmetic is a narrow projection
    on the aggregate. Weights are config, not data — Σw is computed
    driver-side from the argument dict, never from a second pass.
    """
    check_reserved(df, {"__ep_nt"}, "epoch_plan")
    if token_count_col is None:
        if text_col is None:
            raise LensError("epoch_plan needs token_count_col or text_col")
        from lens_spark.functions.text import whitespace_token_count

        df = df.withColumn("__ep_nt",
                           whitespace_token_count(F.col(text_col)))
        token_count_col = "__ep_nt"
    w = {str(k): int(v) for k, v in (weights or {}).items()}
    if any(v < 0 for v in w.values()) or default_weight < 0:
        raise LensError("epoch_plan: weights must be non-negative ints")

    # NULL strata are EXCLUDED from the plan (mirroring interleave):
    # a row with no stratum has no weight entry to serve under, and an
    # unfiltered None would TypeError the sort below (ADVICE r7).
    df = df.filter(F.col(strata_col).isNotNull())
    strata = df.select(F.col(strata_col).cast("string")).distinct()
    names = sorted(r[0] for r in strata.collect()
                   if r[0] is not None)  # #strata rows only
    wsum = sum(w.get(s, default_weight) for s in names)
    if wsum <= 0:
        raise LensError("epoch_plan: weight sum is zero")

    weight_expr = F.coalesce(
        *([F.when(F.col(strata_col).cast("string") == F.lit(s),
                  F.lit(w[s]).cast("bigint"))
           for s in names if s in w] +
          [F.lit(int(default_weight)).cast("bigint")]))

    budget = int(total_budget_tokens)
    cap = int(max_epochs_milli)
    agg = (df.groupBy(F.col(strata_col).cast("string").alias(strata_col))
           .agg(F.sum(F.col(token_count_col).cast("bigint"))
                .alias("available_tokens")))
    out = (agg
           .withColumn("target_tokens",
                       F.floor(F.lit(budget).cast("decimal(38,0)")
                               * weight_expr.cast("decimal(38,0)")
                               / F.lit(wsum)).cast("bigint"))
           .withColumn(
               "epochs_milli",
               F.when(F.col("available_tokens") > 0,
                      F.least(
                          F.floor(F.col("target_tokens")
                                  .cast("decimal(38,0)") * 1000
                                  / F.col("available_tokens")
                                  .cast("decimal(38,0)")).cast("bigint"),
                          F.lit(cap).cast("bigint")))
               .otherwise(F.lit(0).cast("bigint")))
           .withColumn(
               "served_tokens",
               F.floor(F.col("available_tokens").cast("decimal(38,0)")
                       * F.col("epochs_milli").cast("decimal(38,0)")
                       / 1000).cast("bigint")))
    return out


@register_lens("epoch_plan")
def epoch_plan_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: strata (column), total_budget_tokens (int), weights
    ({stratum: int}), default_weight (1), max_epochs_milli (4000),
    column (text col) or token_count (count col)."""
    strata = str(require_arg(arguments, "strata", "epoch_plan"))
    budget = int(require_arg(arguments, "total_budget_tokens", "epoch_plan"))
    weights = {str(k): int(v) for k, v in
               dict(arguments.get("weights", {})).items()}
    return Lens(
        "epoch_plan", arguments,
        lambda df: epoch_plan(
            df, strata, total_budget_tokens=budget, weights=weights,
            default_weight=int(arguments.get("default_weight", 1)),
            max_epochs_milli=int(arguments.get("max_epochs_milli", 4000)),
            token_count_col=arguments.get("token_count"),
            text_col=arguments.get("column")))


def interleave(df: DataFrame, strata_col: str, key_cols: list[str],
               weights: Mapping[str, int], *, default_weight: int = 1,
               num_shards: int | None = None, salt: str = "") -> DataFrame:
    """Deterministic weighted round-robin serving order — the
    interleave-datasets step of a training export: a mixture with
    weights {a: 3, b: 1} must SERVE 3 a-rows then 1 b-row per round,
    not merely contain them in ratio (loss curves care about local
    mixture, and reproducible training needs the order pinned).

    Contract (exact integer arithmetic end to end):
    - rows are md5-sharded on ``key_cols`` (the shuffle_shards idiom:
      reproducible, repartition-stable; each shard is an independently
      consumable serving file);
    - within (shard, stratum), rows are ranked by (hash, keys) — a
      PARTITIONED window whose task size is bounded by ``num_shards``
      (the pack_sequences contract);
    - rank r of a stratum with integer weight w lands in round-robin
      ``block`` (r-1) div w at ``slot`` offset_s + (r-1) mod w, where
      offset_s = Σ weights of lexicographically-earlier strata; the
      serving order within a shard is (block, slot) ⇒ every full block
      serves each stratum exactly its weight. ``pos`` = block·W + slot
      is the serving ordinal (strata exhaust at different blocks, so
      late blocks have holes — consumers order by pos, gaps are
      harmless). Weight-0 strata are dropped.

    The stratum set is collected once (#strata rows — the epoch_plan
    contract: strata are a config-scale domain, never corpus-scale);
    weights/offsets compile to a when-chain, so the plan is one
    exchange (the window) over a slim (keys, stratum, hash) frame —
    text never moves.

    ``num_shards=None`` (the default) auto-scales the shard count
    from the input plan's OUTPUT partitioning (``rdd.getNumPartitions``
    — no extra Spark job is spent sizing it). For a direct file scan
    that is the scan split count (splits track bytes via
    maxPartitionBytes, so shards grow with the corpus and the
    per-(shard, stratum) window task stays bounded at 100× data); for
    a shuffled/aggregated upstream it is ``spark.sql.shuffle.
    partitions`` (or AQE's coalesced count), i.e. session config and
    plan shape — NOT the scan split count (r8 advice). Either way the
    schedule is exact and weight-faithful for the derived count, but
    auto mode is only deterministic for a fixed input layout + session
    config: a re-layout, a conf change, or an upstream reshuffle can
    change the derived count and therefore the schedule. Pin
    ``num_shards`` explicitly when the serving order must be
    reproducible across environments (the bench queries do).
    """
    check_reserved(df, {"__h"}, "interleave")
    from pyspark.sql import Window

    if num_shards is None:
        # ~2 window tasks per scan split keeps every (shard, stratum)
        # sort comfortably under a split's row count even when one
        # stratum dominates; floor of 64 preserves small-input
        # behavior (and the pre-r8 default).
        num_shards = max(64, 2 * df.rdd.getNumPartitions())

    w = {str(k): int(v) for k, v in (weights or {}).items()}
    if any(v < 0 for v in w.values()) or int(default_weight) < 0:
        raise LensError("interleave: weights must be non-negative ints")
    names = sorted(
        r[0] for r in
        df.select(F.col(strata_col).cast("string")).distinct().collect()
        if r[0] is not None)
    wmap = {s: w.get(s, int(default_weight)) for s in names}
    active = [s for s in names if wmap[s] > 0]
    if not active:
        raise LensError("interleave: no stratum has positive weight")
    wtotal = sum(wmap[s] for s in active)
    offsets, acc = {}, 0
    for s in active:
        offsets[s] = acc
        acc += wmap[s]

    def chain(mapping: Mapping[str, int]) -> Column:
        expr = F.lit(None).cast("bigint")
        for s, v in mapping.items():
            expr = F.when(F.col(strata_col).cast("string") == F.lit(s),
                          F.lit(v).cast("bigint")).otherwise(expr)
        return expr

    hp = _hash_prefix(key_cols, salt)
    slim = (df.filter(F.col(strata_col).cast("string").isin(active))
            .select(*[F.col(c) for c in key_cols],
                    F.col(strata_col).cast("string").alias(strata_col),
                    hp.alias("__h"),
                    (F.conv(hp, 16, 10).cast("bigint")
                     % F.lit(int(num_shards))).alias("shard")))
    rw = Window.partitionBy("shard", strata_col).orderBy("__h", *key_cols)
    r0 = (F.row_number().over(rw) - 1).cast("bigint")
    wcol, ocol = chain(wmap), chain(offsets)
    block = F.floor(r0 / wcol).cast("bigint")
    slot = (ocol + r0 % wcol).cast("bigint")
    return (slim
            .withColumn("block", block)
            .withColumn("slot", slot)
            .withColumn("pos", (F.col("block") * F.lit(int(wtotal))
                                + F.col("slot")).cast("bigint"))
            .drop("__h"))


@register_lens("interleave")
def interleave_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: strata (column), keys (list[str]), weights
    ({stratum: int}), default_weight (1), num_shards (auto: scales
    with the scan split count; pin for cross-env reproducible
    schedules), salt ("")."""
    strata = str(require_arg(arguments, "strata", "interleave"))
    keys = [str(c) for c in require_arg(arguments, "keys", "interleave")]
    weights = {str(k): int(v) for k, v in
               dict(arguments.get("weights", {})).items()}
    ns = arguments.get("num_shards")
    return Lens(
        "interleave", arguments,
        lambda df: interleave(
            df, strata, keys, weights,
            default_weight=int(arguments.get("default_weight", 1)),
            num_shards=None if ns is None else int(ns),
            salt=str(arguments.get("salt", ""))))


def realize_epochs(df: DataFrame, strata_col: str, key_cols: list[str], *,
                   total_budget_tokens: int,
                   weights: Mapping[str, int] | None = None,
                   default_weight: int = 1,
                   max_epochs_milli: int = 4000,
                   token_count_col: str | None = None,
                   text_col: str | None = None,
                   out: str = "epoch_idx", salt: str = "") -> DataFrame:
    """Materialize an :func:`epoch_plan`: every row appears
    ``epochs_milli div 1000`` times plus once more for a
    deterministic md5-chosen ``(epochs_milli mod 1000)/1000`` fraction
    of its stratum — the realized training mixture whose expected
    token count per stratum equals the plan's ``served_tokens``.

    Unlike ``oversample`` (caller-supplied float weights), the
    fractional membership here is EXACT INTEGER arithmetic end to end:
    with h = the 32-bit md5 prefix of (salt|keys), the extra copy
    fires iff ``h·1000 < frac_milli·2^32`` — bigint products only, so
    the materialized set is hash-stable across engines (the digest
    contract; a float threshold could flip a row on a rounding edge).

    Scale shape: the plan is a #strata-row aggregate broadcast-joined
    back (config-scale, the kmeans-centroid contract); the replication
    is a narrow explode of a ≤⌈epochs⌉-element sequence. ``out``
    numbers the copies 1..n so downstream keys stay unique.
    """
    check_reserved(df, {"__rp_em", "__rp_n", "__rp_s"}, "realize_epochs")
    plan = epoch_plan(df, strata_col,
                      total_budget_tokens=total_budget_tokens,
                      weights=weights, default_weight=default_weight,
                      max_epochs_milli=max_epochs_milli,
                      token_count_col=token_count_col, text_col=text_col)
    pl = plan.select(F.col(strata_col).alias("__rp_s"),
                     F.col("epochs_milli").alias("__rp_em"))
    h = F.conv(_hash_prefix(key_cols, salt), 16, 10).cast("bigint")
    joined = df.join(F.broadcast(pl),
                     df[strata_col].cast("string") == F.col("__rp_s"))
    n = (F.floor(F.col("__rp_em") / 1000).cast("bigint")
         + F.when(h * F.lit(1000)
                  < (F.col("__rp_em") % 1000) * F.lit(1 << 32), 1)
         .otherwise(0))
    return (joined.withColumn("__rp_n", n)
            .filter(F.col("__rp_n") > 0)
            .withColumn(out, F.explode(F.sequence(F.lit(1),
                                                  F.col("__rp_n"))))
            .drop("__rp_s", "__rp_em", "__rp_n"))


@register_lens("realize_epochs")
def realize_epochs_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: strata, keys (list[str]), total_budget_tokens,
    weights ({stratum: int}), default_weight (1), max_epochs_milli
    (4000), column (text) or token_count (count col), out
    ("epoch_idx"), salt (""). Inverse keeps copy 1 and drops the
    index column."""
    strata = str(require_arg(arguments, "strata", "realize_epochs"))
    keys = [str(c) for c in require_arg(arguments, "keys",
                                        "realize_epochs")]
    budget = int(require_arg(arguments, "total_budget_tokens",
                             "realize_epochs"))
    weights = {str(k): int(v) for k, v in
               dict(arguments.get("weights", {})).items()}
    out = str(arguments.get("out", "epoch_idx"))
    return Lens(
        "realize_epochs", arguments,
        lambda df: realize_epochs(
            df, strata, keys, total_budget_tokens=budget, weights=weights,
            default_weight=int(arguments.get("default_weight", 1)),
            max_epochs_milli=int(arguments.get("max_epochs_milli", 4000)),
            token_count_col=arguments.get("token_count"),
            text_col=arguments.get("column"),
            out=out, salt=str(arguments.get("salt", ""))),
        lambda df: df.filter(F.col(out) == 1).drop(out),
    )


def group_quota(df: DataFrame, key_cols: "list[str]", n: int, *,
                order_by: str, tiebreak: "list[str]",
                descending: bool = True,
                rank_col: str = "quota_rank") -> DataFrame:
    """Keep at most ``n`` rows per key group, ranked by ``order_by`` —
    the per-domain cap every web-corpus curation recipe applies so a
    handful of giant hosts can't dominate the training mix (keep the
    best ``n`` pages per domain, best ``n`` docs per source feed).

    No reference counterpart (SURVEY.md §2.6 — the reference has no
    row-selection operators); X-series extension.

    ``order_by`` is a column name or SQL expression (ranked
    descending by default — "best first"); ``tiebreak`` is a REQUIRED
    non-empty list of columns that, together with ``order_by``, totally
    orders rows within a key group. That totality is the determinism
    contract: with it, the survivor set and ``rank_col`` are invariant
    under partitioning and engine (the oracle gate relies on this);
    without it, row_number over ties would be plan-dependent. NULL
    order values rank last under either direction (explicit
    ``NULLS LAST`` on both engines).

    Scale shape — the two-stage top-k (same argument as
    ``similarity._rank_topk``): a single
    ``row_number() OVER (PARTITION BY key)`` funnels the hottest
    domain's rows through one task, and web corpora are exactly where
    keys are Zipf-skewed. Stage 1 ranks within
    ``(key, input-partition)`` and keeps ≤ n per group — a per-key
    top-n is invariant under pruning each partition to its local
    top-n by the same total order — so the final per-key window sorts
    ≤ n · num_partitions rows however hot the key. Both exchanges
    carry only survivors-or-better; nothing global is sorted.
    """
    if n < 1:
        raise LensError(f"group_quota needs n >= 1, got {n}")
    if not key_cols:
        raise LensError("group_quota needs at least one key column")
    if not tiebreak:
        raise LensError(
            "group_quota: tiebreak columns are required — without a "
            "total order within a key group the survivor set would be "
            "partitioning-dependent")
    check_reserved(df, {"__gq_pid", "__gq_lr"}, "group_quota",
                   extra=[rank_col])
    from pyspark.sql import Window

    ov = F.expr(order_by)
    head = ov.desc_nulls_last() if descending else ov.asc_nulls_last()
    order = [head] + [F.col(c).asc_nulls_last() for c in tiebreak]
    # r14 (the similarity._rank_topk change, guide §2.4): within
    # Spark's WindowGroupLimit threshold the single rank window
    # compiles to a map-side Partial prune BEFORE the exchange — the
    # same ≤ n·num_partitions per-key bound the manual two-stage gave,
    # minus one Exchange+Sort (the manual stage 1 shuffled every row
    # once before its first prune). Past the threshold the manual
    # prune is kept — a hot Zipf key must never rely on a rule that
    # cannot fire.
    try:
        wgl_max = int(df.sparkSession.conf.get(
            "spark.sql.optimizer.windowGroupLimitThreshold", "1000"))
    except Exception:  # noqa: BLE001
        wgl_max = 1000
    if n > wgl_max:
        local_w = Window.partitionBy(*key_cols, "__gq_pid").orderBy(*order)
        df = (df.withColumn("__gq_pid", F.spark_partition_id())
              .withColumn("__gq_lr", F.row_number().over(local_w))
              .filter(F.col("__gq_lr") <= n)
              .drop("__gq_pid", "__gq_lr"))
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (df.withColumn(rank_col,
                          F.row_number().over(w).cast("bigint"))
            .filter(F.col(rank_col) <= n))


@register_lens("group_quota")
def group_quota_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: keys (list[str]), n, order_by (col/expr), tiebreak
    (list[str]), descending (true), rank ("quota_rank")."""
    keys = [str(c) for c in require_arg(arguments, "keys", "group_quota")]
    n = int(require_arg(arguments, "n", "group_quota"))
    order_by = str(require_arg(arguments, "order_by", "group_quota"))
    tiebreak = [str(c) for c in
                require_arg(arguments, "tiebreak", "group_quota")]
    rank_col = str(arguments.get("rank", "quota_rank"))
    return Lens(
        "group_quota", arguments,
        lambda df: group_quota(
            df, keys, n, order_by=order_by, tiebreak=tiebreak,
            descending=bool(arguments.get("descending", True)),
            rank_col=rank_col),
        lambda df: df.drop(rank_col),
    )
