"""Byte-pair-encoding tokenizer induction (Sennrich et al. 2016) —
the "learn the tokenizer FROM the corpus" step of a training-data
pipeline (the reference pipes documents through fixed per-item
transforms; a real LLM pipeline also has to fit this corpus-level
model). `vocab_encode` learns a top-V WORD vocabulary; BPE learns
subword merges, so rare words decompose instead of becoming <unk>.

Distributed contract (the classic trick that makes BPE tractable at
corpus scale): training NEVER iterates over documents — one pass
collapses the corpus to its WORD-FREQUENCY table (groupBy word,
map-side combined; |distinct words| ≪ corpus, the vocabulary-domain
contract), and every merge iteration runs on that words frame:

  pair counts  = one explode over adjacent symbol pairs weighted by
                 word count → partial-aggregated groupBy → global
                 argmax via takeOrdered(1) (driver holds ONE row);
  apply merge  = a narrow `aggregate` fold per word (greedy
                 left-to-right, JVM-side), localCheckpoint'ed every
                 few iterations so the lineage stays bounded (the
                 connected-components plan-growth lesson).

Determinism: the winning pair is argmax by (count DESC, left ASC,
right ASC) — no hash order, no floats — so the merge table is
byte-identical across runs, partitionings, and engines. Encoding
applies the learned merges in rank order per word inside ONE
Arrow-batched pandas UDF (iterative per-word merging is genuinely
imperative — the documented escape-hatch shape), memoized per
distinct word within a batch.

No oracle SQL: k-iteration argmax-then-rewrite is not expressible in
one SQL statement; the query is rows-only, pinned by an exact-match
pytest against a pure-python BPE reference (tests/test_operators.py).
"""

from __future__ import annotations

from typing import Any, Mapping

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lens_spark.errors import LensError
from lens_spark.operators.base import (
    Lens,
    ensure_parallelism,
    register_lens,
    require_arg,
)

#: end-of-word marker symbol (its own symbol, the Sennrich convention,
#: so merges can distinguish word-final from word-internal pairs)
EOW = "</w>"


def _word_freq(df: DataFrame, text_col: str) -> DataFrame:
    from lens_spark.functions.text import tokens

    return (ensure_parallelism(df)
            .select(F.explode(tokens(F.col(text_col))).alias("w"))
            .groupBy("w").agg(F.count(F.lit(1)).alias("c")))


def _initial_symbols(words: DataFrame) -> DataFrame:
    syms = F.concat(F.split(F.col("w"), ""), F.array(F.lit(EOW)))
    return words.select("w", "c", syms.alias("s"))


def _merge_expr(s, left: str, right: str):
    """Greedy left-to-right single-merge fold over a symbol array."""
    merged = F.lit(left + right)
    return F.aggregate(
        s,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)))
        .otherwise(F.array_append(acc, x)))


def _fit_local(word_counts: dict[str, int], num_merges: int,
               min_count: int) -> list[tuple[str, str]]:
    """Driver-side merge loop — algorithmically IDENTICAL to the
    distributed path (same argmax rule, same greedy fold), asserted
    equal by pytest."""
    syms = {w: list(w) + [EOW] for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            c = word_counts[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (left, right), n = min(counts.items(),
                               key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((left, right))
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            syms[w] = out
    return merges


#: vocabulary size under which the merge loop runs driver-side — the
#: connected-components size-probe contract: below the bound the whole
#: word-frequency table is a few MB of model-state-grade data, and
#: `num_merges` driver iterations beat `num_merges` Spark jobs by 10×;
#: above it the distributed loop takes over.
BPE_DRIVER_FIT_LIMIT = 200_000


def bpe_fit(df: DataFrame, text_col: str, *, num_merges: int = 50,
            min_count: int = 2, checkpoint_every: int = 8,
            driver_fit_limit: int = BPE_DRIVER_FIT_LIMIT
            ) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    rank-ordered merge list (driver-held model state, the kmeans-
    centroid contract — ~KBs). Stops early when the best remaining
    pair's weighted count falls below ``min_count``.

    One cheap size probe picks the engine: a vocabulary under
    ``driver_fit_limit`` distinct words collects (word, count) pairs
    and iterates driver-side; larger vocabularies run each merge as a
    distributed pair-count + argmax + fold rewrite. Both paths use the
    same deterministic argmax, so the merge table is identical."""
    if int(num_merges) < 1:
        raise LensError("bpe_fit: num_merges must be >= 1")
    words = _word_freq(df, text_col)
    n_words = words.count()
    if n_words <= int(driver_fit_limit):
        wc = {r["w"]: r["c"] for r in words.collect()}
        return _fit_local(wc, int(num_merges), int(min_count))
    syms = _initial_symbols(words)
    syms = syms.localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for i in range(int(num_merges)):
        pairs = (syms
                 .select("c", F.explode(F.zip_with(
                     F.slice(F.col("s"), 1, F.size("s") - 1),
                     F.slice(F.col("s"), 2, F.size("s") - 1),
                     lambda a, b: F.struct(a.alias("l"), b.alias("r"))))
                     .alias("p"))
                 .groupBy("p.l", "p.r").agg(F.sum("c").alias("n")))
        top = pairs.orderBy(F.desc("n"), F.asc("l"), F.asc("r")).take(1)
        if not top or top[0]["n"] < int(min_count):
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        syms = syms.select("w", "c", _merge_expr(F.col("s"), left, right)
                           .alias("s"))
        if (i + 1) % int(checkpoint_every) == 0:
            syms = syms.localCheckpoint(eager=False)
    return merges


def _encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Pure-python twin of the training fold: apply merges in rank
    order, each greedy left-to-right (shared by the pandas-UDF encoder
    and the pytest reference)."""
    s = list(word) + [EOW]
    for left, right in merges:
        out: list[str] = []
        for x in s:
            if out and out[-1] == left and x == right:
                out[-1] = left + right
            else:
                out.append(x)
        s = out
    return s


def bpe_tokenize(df: DataFrame, text_col: str, *, num_merges: int = 50,
                 min_count: int = 2, out: str = "bpe_tokens") -> DataFrame:
    """Fit BPE on the corpus, then append per-doc subword tokens
    (``out``, array<string>) and their count (``n_<out>``). The merge
    table is fitted once driver-side and closed over into ONE
    Arrow-batched pandas UDF; encoding memoizes per distinct word
    within each batch, so repeated words cost one merge walk."""
    merges = bpe_fit(df, text_col, num_merges=num_merges,
                     min_count=min_count)

    from pyspark.sql.functions import pandas_udf

    import re

    # Same whitespace contract as functions.text.tokens (Java/RE2 \s+:
    # ASCII classes only) — Python str.split() splits on ALL Unicode
    # whitespace (e.g. NBSP), which would segment fit vs encode
    # differently and push encoded words outside the fitted domain
    # (ADVICE r7).
    ws = re.compile(r"[ \t\n\r\f\x0b]+")

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def one(t):
            if t is None or not isinstance(t, str):
                return []
            toks: list[str] = []
            for w in ws.split(t.lower()):
                if not w:
                    continue
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, merges)
                toks.extend(got)
            return toks

        return texts.map(one)

    return (ensure_parallelism(df)
            .withColumn(out, enc(F.col(text_col)))
            .withColumn(f"n_{out}", F.size(F.col(out)).cast("bigint")))


@register_lens("bpe_tokenize")
def bpe_tokenize_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column (text), num_merges (50), min_count (2),
    out ("bpe_tokens"). Inverse drops both appended columns."""
    text_col = str(require_arg(arguments, "column", "bpe_tokenize"))
    out = str(arguments.get("out", "bpe_tokens"))
    return Lens(
        "bpe_tokenize", arguments,
        lambda df: bpe_tokenize(
            df, text_col,
            num_merges=int(arguments.get("num_merges", 50)),
            min_count=int(arguments.get("min_count", 2)), out=out),
        lambda df: df.drop(out, f"n_{out}"))
